"""Training/eval orchestration (the reference's NCSNRunner monolith,
runners/ncsn_runner.py:197-2877, re-structured around jitted programs).

Modes: train / video_gen / sample / test (checkpoint-sweep DSM loss) /
fast_fid. The hot paths (train step, block sampler) are single jitted
programs over the data mesh; the host loop only feeds batches and logs.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..config import getattr_nested
from ..data import (
    DataLoader,
    conditioning_fn,
    data_transform,
    get_dataset,
    get_mode,
    inverse_data_transform,
    prefetch_to_device,
)
from ..diffusion import make_schedule
from ..eval.video_gen import make_block_sampler, init_noise, run_video_gen
from ..models import get_model
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel import data_sharding, make_mesh
from ..parallel.mesh import (batch_sharding as mesh_batch_sharding,
                             put_global_batch, wrap_block_collective)
from ..train import (
    checkpoints,
    create_train_state,
    make_eval_loss_step,
    make_train_chunk,
    make_train_step,
)
from . import meters as meters_mod
from . import plots

logger = logging.getLogger(__name__)


def chunk_block(block, max_rows: int = 128, multiple: int = 1):
    """Bound the per-call batch of a block sampler.

    The axon TPU worker hard-crashes ("kernel fault", OOM-shaped) when the
    sampler chain is dispatched with batch >= 250 (NOTES_ROUND4); a user
    config with fast_fid.batch_size: 250 must not be able to kill the
    worker, so every sampler invocation is split into near-equal row chunks
    of <= max_rows (at most two distinct chunk shapes, so at most two
    compiles). Chunk RNG keys are folded from the call key by chunk index;
    batch-size semantics (how many samples a loader round produces) are
    unchanged. Override the cap with MCVD_MAX_SAMPLER_BATCH.

    `multiple` is the sharding unit (the mesh 'data' axis size): every chunk
    stays a multiple of it, because the wrapped block may place rows with a
    P('data') NamedSharding, which rejects non-divisible batches. Chunks may
    exceed max_rows when multiple itself does. A batch that is not a
    multiple is dispatched whole (it would be rejected by the sharding
    layer anyway; _eval_batch_size guarantees divisibility at our call
    sites).

    Applied OUTSIDE wrap_block_collective: chunk counts are derived from
    shapes identical across processes, so every process performs the same
    sequence of collective calls."""
    max_rows = int(os.environ.get("MCVD_MAX_SAMPLER_BATCH", max_rows))
    mult = max(1, int(multiple))

    def wrapped(params, key, init, cond=None, cond_mask=None):
        bs = init.shape[0]
        if max_rows <= 0 or bs <= max_rows or bs % mult:
            return block(params, key, init, cond, cond_mask)
        units = bs // mult                      # chunk in sharding units
        max_units = max(1, max_rows // mult)
        n_chunks = -(-units // max_units)
        base, rem = divmod(units, n_chunks)
        sizes = [(base + 1) * mult] * rem + [base * mult] * (n_chunks - rem)
        outs = []
        start = 0
        for ci, n in enumerate(sizes):
            sl = slice(start, start + n)
            outs.append(block(
                params, jax.random.fold_in(key, ci), init[sl],
                None if cond is None else cond[sl],
                None if cond_mask is None else cond_mask[sl]))
            start += n
        return jnp.concatenate(outs, axis=0)

    return wrapped


class Runner:
    def __init__(self, args, config, config_uncond=None):
        self.args = args
        self.config = config
        self.config_uncond = config_uncond or config
        self.version = getattr(config.model, "version", "DDPM").upper()
        self.mode_pred, self.mode_interp, self.mode_gen = get_mode(config)
        os.makedirs(args.log_path, exist_ok=True)
        # config.parallel.tensor > 1 adds a 'tensor' mesh axis that shards
        # activations' H (spatial parallelism) for the 128px/ngf>=192 configs;
        # GSPMD inserts conv halos + norm/attention reductions.
        tensor = int(getattr(getattr(config, "parallel", None), "tensor", 1) or 1)
        n_dev = len(jax.devices())
        if tensor > 1 and n_dev % tensor == 0:
            self.mesh = make_mesh(axis_names=("data", "tensor"),
                                  shape=(n_dev // tensor, tensor))
        else:
            self.mesh = make_mesh(axis_names=("data",))
        self.sched = make_schedule(config)
        self.model = get_model(config)
        self.start_time = time.time()

    # ------------------------------------------------------------------ utils

    def _sample_args(self, batch_size: int):
        config = self.config
        C, sz = config.data.channels, config.data.image_size
        F = config.data.num_frames
        Fc = config.data.num_frames_cond + getattr(config.data, "num_frames_future", 0)
        x = jnp.zeros((batch_size, sz, sz, F * C))
        cond = jnp.zeros((batch_size, sz, sz, Fc * C)) if Fc > 0 else None
        y = jnp.zeros((batch_size,), jnp.int32)
        cond_mask = (
            jnp.ones((batch_size,), jnp.int32)
            if getattr(config.model, "cond_emb", False)
            else None
        )
        return x, y, cond, cond_mask

    def _init_state(self, batch_size: int, rng):
        return create_train_state(
            self.config, self.model, self._sample_args(batch_size), rng
        )

    def _ckpt_dir(self) -> str:
        return os.path.join(self.args.log_path)

    def _agreed_ckpt_steps(self, ckpt_dir: str):
        """Numbered-checkpoint steps, IDENTICAL across processes: orbax
        writes on the primary host only, so on non-shared disks peers may
        list fewer checkpoints and would run a different number of
        collective eval calls (hang at the next barrier). Process 0's
        listing is authoritative.

        Shared-filesystem assumption (ADVICE r4): this closes LISTING races
        only. Restoring a checkpoint still does a local orbax read on every
        process (train/checkpoints.py), so the checkpoint directory must be
        on a filesystem all hosts can read (NFS/GCS — the normal multi-host
        deployment). On truly disjoint disks the agreed steps would fail at
        restore time on the peers; that failure is at least loud and names
        the missing path."""
        import json

        from ..parallel.mesh import broadcast_from_primary

        steps = []
        if os.path.isdir(ckpt_dir):
            for d in os.listdir(ckpt_dir):
                if d.startswith("checkpoint_"):
                    try:
                        steps.append(int(d.split("_")[1]))
                    except ValueError:
                        pass
        return list(json.loads(broadcast_from_primary(
            json.dumps(sorted(steps)), name="ckpt_steps")))

    # ------------------------------------------------------------------ train

    def train(self):
        args, config = self.args, self.config
        # Training kernel policy: pure XLA. The dot-stats GN
        # (layers.group_norm_folded) beats the pallas GN kernel + custom VJP
        # by 18% e2e (60.9 vs 74.6 ms/step, B=32 flagship,
        # tools/profile_train.py) — a pallas call pins {3,2,1,0} layouts and
        # forces relayouts around every conv in both passes. Pallas kernels
        # remain available via ops.set_use_pallas for configs where they win.
        from .. import ops

        ops.set_use_pallas(False)
        train_ds, test_ds = get_dataset(
            args.data_path, config, video_frames_pred=config.data.num_frames
        )
        # in-training video_gen needs longer clips (reference rebuilds the
        # dataset with video_frames_pred=sampling.num_frames_pred,
        # ncsn_runner.py:1411)
        _, eval_test_ds = get_dataset(
            args.data_path, config,
            video_frames_pred=getattr(config.sampling, "num_frames_pred",
                                      config.data.num_frames),
        )
        bs = config.training.batch_size
        # per-host input sharding (SURVEY §2.5 TPU plan; the reference is
        # single-process DataParallel and has no analog): batch_size is the
        # GLOBAL batch; each process loads a disjoint 1/process_count slice
        # of the dataset in bs/process_count-sized local batches, assembled
        # into global arrays by put_global_batch.
        n_proc = jax.process_count()
        is_main = jax.process_index() == 0
        if bs % max(1, n_proc):
            raise ValueError(
                f"training.batch_size={bs} (global) must be a multiple of "
                f"jax.process_count()={n_proc}")
        bs_local = bs // max(1, n_proc)
        if n_proc > 1:
            # Meet at a coordination-service barrier (pure gRPC, long
            # timeout) before any compiles: detects a dead peer early. The
            # gloo-context rendezvous hazard itself (first EXECUTION of each
            # compiled collective program has a ~30s window, while compiles
            # can skew processes by minutes) is handled per-program by
            # parallel.mesh.lockstep below: AOT-compile, barrier, execute.
            from ..parallel.mesh import coord_barrier

            coord_barrier("mcvd:train_start")
        num_workers = int(getattr(config.data, "num_workers", 0) or 0)
        loader = DataLoader(train_ds, batch_size=bs_local, shuffle=True,
                            seed=getattr(args, "seed", 0),
                            drop_last=True, repeat=True,
                            num_processes=jax.process_count(),
                            process_index=jax.process_index(),
                            num_workers=num_workers)
        # clamp the (global) val batch to the split — drop_last+repeat with
        # an oversize batch would otherwise never yield — and to a multiple
        # of the mesh data axis (device_put sharding; divisibility by
        # process_count follows since the data axis spans all processes)
        bs_val = self._eval_batch_size(
            bs, (len(test_ds) // max(1, n_proc)) * max(1, n_proc), "val loader")
        test_loader = DataLoader(test_ds, batch_size=bs_val // max(1, n_proc), shuffle=True,
                                 seed=getattr(args, "seed", 0) + 1, drop_last=True, repeat=True,
                                 num_processes=jax.process_count(),
                                 process_index=jax.process_index(),
                                 num_workers=num_workers)
        test_iter = iter(test_loader)

        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        rng, init_rng = jax.random.split(rng)
        state = self._init_state(bs, init_rng)

        meters = None
        if getattr(args, "resume_training", False):
            state = checkpoints.load_checkpoint(self._ckpt_dir(), target=state)
            meters = meters_mod.load_meters(args.log_path)
            logger.info("resumed from step %d", int(state.step))
        meters = meters or meters_mod.init_meters()

        # Host-loop design for the ~65MB/s tunnel (BENCH_NOTES.md): batches
        # travel in training.wire_dtype (default float16 in generated
        # configs; f32 math resumes on-device), go STRAIGHT into the jitted
        # step as numpy (jit's implicit transfer is async and overlaps
        # device compute; an explicit device_put serializes at 81ms/5MB),
        # and the loop syncs only every `sync_every` steps for backpressure.
        # steps_per_dispatch > 1 optionally chains K steps into one lax.scan
        # dispatch (amortizes the ~30ms dispatch+sync for tiny models whose
        # step compute is far below it).
        K = max(1, int(getattr(config.training, "steps_per_dispatch", 1)))
        # Donate the state buffers (halves peak state memory). The axon
        # client rejected donation in r1/r2; the r3 probe and a tiny CLI
        # drive both pass (after fixing the params/ema aliasing that
        # double-donated buffers), gated on a live probe each launch.
        from ..utils import donation_supported

        donate = (bool(getattr(config.training, "donate", True))
                  and donation_supported())
        from ..parallel.mesh import lockstep

        if K > 1:
            chunk_fn = lockstep(
                make_train_chunk(self.model, self.sched, config, K,
                                 mesh=self.mesh, donate=donate), "train_chunk")
        else:
            step_fn = lockstep(
                make_train_step(self.model, self.sched, config,
                                mesh=self.mesh, donate=donate), "train_step")
        eval_fn = lockstep(
            make_eval_loss_step(self.model, self.sched, config, mesh=self.mesh),
            "eval_loss")
        # multi-process: local batches must be assembled into global arrays
        # with the jit's exact in_shardings (single-process keeps the numpy
        # fast path — jit's implicit transfer is async, see below)
        batch_sh = mesh_batch_sharding(self.mesh, 5, h_axis=2)
        chunk_sh = NamedSharding(self.mesh, P(None, *batch_sh.spec))

        def to_global(x, sh):
            return put_global_batch(self.mesh, x, sh) if n_proc > 1 else x

        wire = str(getattr(config.training, "wire_dtype", "float32"))
        wire_table = {"float32": None, "float16": np.float16,
                      "bfloat16": jnp.bfloat16, "uint8": np.uint8}
        if wire not in wire_table:
            raise ValueError(
                f"training.wire_dtype={wire!r} is not one of "
                f"{sorted(wire_table)} (a typo here would silently fall "
                "back to full-f32 wire transport)")
        wire_np = wire_table[wire]
        if wire_np is np.uint8 and (
                float(getattr(config.data, "color_jitter", 0.0) or 0.0) > 0
                or getattr(config.data, "gaussian_dequantization", False)):
            logger.warning(
                "wire_dtype=uint8 quantizes non-uint8-exact inputs "
                "(color_jitter/gaussian_dequantization active) — use "
                "float16 for lossless-enough transport there")
        sync_every = max(1, int(getattr(config.training, "sync_every", 16)))

        n_iters = config.training.n_iters
        snapshot_freq = getattr(config.training, "snapshot_freq", 50000)
        val_freq = getattr(config.training, "val_freq", 100)
        log_freq = getattr(config.training, "log_freq", 50)
        ckpt_freq = getattr(config.training, "checkpoint_freq", 1000)

        step = int(state.step)
        data_iter = prefetch_to_device(iter(loader), sharding=None,
                                       wire_dtype=wire_np)
        t_start = time.time()
        profile_at = getattr(config.training, "profile_at_step", 0)
        profile_dir = os.path.join(args.log_path, "profile")

        def crossed(freq, lo, hi):
            return freq > 0 and (lo // freq) != (hi // freq)

        # The axon IFRT client leaks every host->device staging buffer in
        # native memory (~wire bytes per step, unreachable from Python —
        # BENCH_NOTES.md). Long runs therefore segment: stop after
        # max_steps_per_run steps, checkpoint, and let the caller relaunch
        # with --resume_training (crash-safe resume is first-class anyway).
        max_run = int(getattr(config.training, "max_steps_per_run", 0) or 0)
        seg_start = step

        # training.stall_timeout > 0 arms a watchdog that hard-exits the
        # process when no device barrier completes within the window (a hung
        # backend dispatch wedges this loop beyond in-process recovery —
        # utils.start_stall_watchdog). Size it above worst-case compile.
        stall_timeout = float(getattr(config.training, "stall_timeout", 0) or 0)
        heartbeat = {"t": time.monotonic(), "step": step, "suspended": False}
        if stall_timeout > 0:
            from ..utils import start_stall_watchdog

            start_stall_watchdog(heartbeat, stall_timeout, logger)

        while step < n_iters:
            if max_run and step - seg_start >= max_run:
                logger.info(
                    "segment budget %d steps reached at step %d; "
                    "checkpointing — relaunch with --resume_training",
                    max_run, step)
                break
            rng, k = jax.random.split(rng)
            if profile_at and step < profile_at <= step + K:
                # jax.profiler trace around a few steps (SURVEY §5: the
                # reference has no tracing; this is the TPU-native equivalent)
                try:
                    jax.profiler.start_trace(profile_dir)
                except Exception as e:
                    logger.warning("profiler unavailable: %s", e)
            if K > 1:
                n_active = min(K, n_iters - step)
                Xs = np.stack([next(data_iter)[0] for _ in range(K)])
                state, metrics = chunk_fn(state, to_global(Xs, chunk_sh), k,
                                          jnp.int32(n_active))
                prev_step, step = step, step + n_active
                last = n_active - 1
            else:
                X, _ = next(data_iter)
                state, metrics = step_fn(state, to_global(X, batch_sh), k)
                prev_step, step = step, step + 1
                last = None
            if crossed(sync_every, prev_step, step):
                # drain the async dispatch queue so the host can't run
                # unboundedly ahead (each in-flight step pins its input);
                # np.asarray is the reliable barrier on axon
                _ = np.asarray(metrics["grad_norm"])
                # a completed barrier proves the system is live: bump AND
                # clear any suspension (non-main processes park at a
                # snapshot crossing and have no other resume point)
                heartbeat["t"] = time.monotonic()
                heartbeat["step"] = step
                heartbeat["suspended"] = False
            if profile_at and prev_step < profile_at + 3 <= step:
                try:
                    jax.profiler.stop_trace()
                    logger.info("profile written to %s", profile_dir)
                except Exception:
                    pass

            if crossed(log_freq, prev_step, step) or prev_step == 0:
                loss = float(metrics["loss"][last] if last is not None
                             else metrics["loss"])
                gn = float(metrics["grad_norm"][last] if last is not None
                           else metrics["grad_norm"])
                meters["losses_train"].update(loss, step)
                meters["grad_norm"].update(gn, step)
                warm = getattr(config.optim, "warmup", 0) or 1
                meters["lr_meter"].update(
                    config.optim.lr * min(step / warm, 1.0), step
                )
                elapsed = time.time() - t_start
                # per-step time + epoch meters (reference:
                # ncsn_runner.py:388,402-405 time bookkeeping)
                meters["time_train"].update(
                    elapsed / max(step - seg_start, 1) * 1e3, step)
                meters["epochs"].update(
                    step * bs / max(len(train_ds), 1), step)
                try:
                    import psutil

                    mem_gb = psutil.Process().memory_info().rss / 1e9
                except Exception:
                    mem_gb = 0.0
                logger.info(
                    "step %d | loss %.2f | grad %.3f | %.2f steps/s | "
                    "elapsed %s | host mem %.2fGB",
                    step, loss, gn, (step - seg_start) / max(elapsed, 1e-9),
                    str(__import__("datetime").timedelta(seconds=int(elapsed))),
                    mem_gb,
                )
            if crossed(val_freq, prev_step, step):
                Xv, _ = next(test_iter)
                rng, k = jax.random.split(rng)
                Xv = put_global_batch(self.mesh, np.asarray(Xv, np.float32),
                                      batch_sh)
                val = float(eval_fn(state.ema_params, Xv, k))
                heartbeat["t"] = time.monotonic()
                heartbeat["suspended"] = False
                meters["losses_test"].update(val, step)
                logger.info("step %d | test loss %.2f", step, val)
            if crossed(ckpt_freq, prev_step, step):
                # checkpoint saves are COLLECTIVE under multi-process (all
                # processes call; orbax's primary host writes); meters/plots
                # are plain host files, process-0 only
                checkpoints.save_checkpoint(self._ckpt_dir(), state)
                if is_main:
                    meters_mod.save_meters(meters, args.log_path)
                    plots.plot_graphs_process(meters, args.log_path)
            if crossed(snapshot_freq, prev_step, step):
                # with steps_per_dispatch K>1 the crossing step can overshoot
                # the multiple by up to K-1; name the snapshot after the
                # crossed multiple so test()/fast_fid freq-thinning finds it
                snap_step = (step // snapshot_freq) * snapshot_freq
                checkpoints.save_checkpoint(
                    self._ckpt_dir(), state, name=f"checkpoint_{snap_step}")
                # in-training eval: single-process it is a local jit on
                # process 0; multi-process EVERY process joins (the sampler
                # is a collective island, _mp_block_sampler) and process 0
                # owns the meters/yml writes
                if getattr(config.training, "snapshot_sampling", True):
                    # in-training eval legitimately blocks for a long time —
                    # park the watchdog on every process for its duration
                    heartbeat["suspended"] = True
                if getattr(config.training, "snapshot_sampling", True) and (
                        is_main or n_proc > 1):
                    eval_ok = True
                    try:
                        vm = self._video_gen_inner(state, eval_test_ds, train=True, ckpt=step)
                        logger.info("snapshot metrics @%d: %s", step, vm)
                        for task in ("", "2", "3"):
                            for name in ("mse", "psnr", "ssim", "lpips", "fvd"):
                                if vm and f"{name}{task}" in vm:
                                    meters[f"{name}{task}_meter"].update(
                                        vm[f"{name}{task}"], step)
                        best = meters_mod.update_best(meters, vm or {}, step)
                        if is_main:
                            logger.info("best so far: %s", best)
                            with open(os.path.join(args.log_path, "best_metrics.yml"),
                                      "w") as f:
                                yaml.safe_dump(best, f)
                    except Exception as e:  # eval must not kill training
                        eval_ok = False
                        logger.exception("in-training video_gen failed: %s", e)
                    finally:
                        heartbeat["t"] = time.monotonic()
                        heartbeat["suspended"] = False
                    if n_proc > 1:
                        # A per-process eval failure would desync every later
                        # collective (the survivors' next train step could
                        # silently pair with a wedged process's island
                        # collective). Agree on ok/fail NOW — unanimous ok
                        # continues training; any failure aborts ALL
                        # processes so the restart loop resumes them
                        # together from the checkpoint. (Un-suspending the
                        # watchdog above bounds this sync: a peer wedged
                        # mid-collective never votes, and the stall timeout
                        # converts the wait into a clean restart.)
                        from ..parallel.mesh import all_processes_true

                        if not all_processes_true(eval_ok):
                            raise RuntimeError(
                                "in-training eval failed on at least one "
                                "process; aborting all processes for a "
                                "collective restart from the checkpoint")
        # disarm the watchdog for good: the loop is over, and anything that
        # legitimately outlives it (final collective checkpoint save, a
        # caller chaining test()/video_gen() on this Runner) must not be
        # hard-killed by a stale heartbeat
        heartbeat["suspended"] = True
        checkpoints.save_checkpoint(self._ckpt_dir(), state)
        if is_main:
            meters_mod.save_meters(meters, args.log_path)
        if step < n_iters:
            logger.info("training paused at step %d (segment budget)", step)
        else:
            logger.info("training done at step %d", step)
        return state

    # -------------------------------------------------------------- video_gen

    def _load_eval_params(self, ckpt: Optional[int] = None):
        bs = getattr(self.config.sampling, "batch_size", 16)
        state = self._init_state(bs, jax.random.PRNGKey(0))
        name = f"checkpoint_{ckpt}" if ckpt else "checkpoint"
        state = checkpoints.load_checkpoint(self._ckpt_dir(), name=name, target=state)
        params = state.ema_params if getattr(self.config.model, "ema", False) else state.params
        return params, int(state.step)

    def _eval_batch_size(self, bs, n_avail, what: str) -> int:
        """Clamp an eval/val batch to the available split AND round down to a
        multiple of the mesh data axis: jax.device_put with a P('data')
        NamedSharding throws on a non-divisible batch on a multi-chip mesh,
        and drop_last with an oversize batch silently yields zero batches."""
        d = int(self.mesh.shape.get("data", 1)) if self.mesh is not None else 1
        out = (min(int(bs), int(n_avail)) // d) * d
        if out <= 0:
            raise ValueError(
                f"{what}: batch_size={bs} with only {n_avail} available "
                f"samples cannot fill one multiple of the mesh data axis "
                f"({d}); shrink the mesh or grow the split/subset")
        return out

    def _test_loader_repeated(self, test_ds, preds_per_test, batch_size):
        """Each video repeated preds_per_test times (reference my_collate,
        ncsn_runner.py:1392-1414). Batch size is clamped to the repeated
        split (an oversize batch with drop_last would silently yield zero
        batches) and to the mesh data axis."""
        batch_size = self._eval_batch_size(
            batch_size, len(test_ds) * preds_per_test, "video_gen loader")

        class Repeated:
            def __init__(self, ds, r):
                self.ds, self.r = ds, r

            def __len__(self):
                return len(self.ds) * self.r

            def __getitem__(self, i):
                return self.ds[i // self.r]

            def set_epoch(self, e):
                if hasattr(self.ds, "set_epoch"):
                    self.ds.set_epoch(e)

        return DataLoader(Repeated(test_ds, preds_per_test), batch_size=batch_size,
                          shuffle=False, drop_last=True)

    def _video_gen_inner(self, state, test_ds, train: bool, ckpt: int,
                         lpips_fn=None, i3d_embedder=None):
        config = self.config
        preds_per_test = 1 if train else getattr(config.sampling, "preds_per_test", 1)
        max_data_iter = 1 if train else getattr(config.sampling, "max_data_iter", 1)
        bs = getattr(config.sampling, "batch_size", 16)
        loader = self._test_loader_repeated(test_ds, preds_per_test, bs)
        params = state.ema_params if getattr(config.model, "ema", False) else state.params
        return run_video_gen(
            config, self.model, params, self.sched, iter(loader),
            jax.random.PRNGKey(getattr(self.args, "seed", 0) + ckpt),
            ckpt=ckpt, max_data_iter=max_data_iter, preds_per_test=preds_per_test,
            train=train, lpips_fn=lpips_fn, i3d_embedder=i3d_embedder,
            block_sampler=self._guarded_block_sampler(),
        )

    def _enable_eval_kernels(self):
        """Inference kernel policy: ALL pallas kernels off — a pallas GN
        forces layout relayouts around every conv; the dot-stats XLA GN
        (layers.group_norm_folded) fuses into conv inputs and is 31% faster
        end-to-end (5.98 -> 4.15 ms/eval, BENCH_NOTES.md)."""
        from .. import ops

        ops.set_use_pallas(False)

    def _mp_block_sampler(self, ensemble: bool = False):
        """Multi-process eval sampler: every process runs the identical
        host-side harness over the FULL eval split; only the jitted
        reverse-diffusion block is a cross-process SPMD program (see
        parallel.mesh.wrap_block_collective). Params are passed at call
        time, not baked in. Returns None single-process (callers fall back
        to the local jit)."""
        if jax.process_count() == 1:
            return None
        if not hasattr(self, "_mp_block_jits"):
            self._mp_block_jits = {}
        # memoize the WRAPPED collective, not just the inner jit: the
        # wrapper owns lockstep's AOT memo and the param-put memo; a fresh
        # wrapper per snapshot would re-lower the block and re-barrier on
        # every in-training eval
        wrapped = self._mp_block_jits.get(ensemble)
        if wrapped is None:
            block = make_block_sampler(self.config, self.model, self.sched,
                                       ensemble=ensemble)
            wrapped = wrap_block_collective(block, self.mesh)
            self._mp_block_jits[ensemble] = wrapped
        return wrapped

    def _guarded_block_sampler(self, ensemble: bool = False):
        """The one route to a block sampler for every eval consumer
        (sample/video_gen/fast_fid/fid-loop): the multi-process collective
        wrap when running distributed, plus the axon per-call batch cap
        (chunk_block), with chunk sizes kept multiples of the mesh data
        axis so the P('data') sharding inside wrap_block_collective stays
        valid for every chunk."""
        d = int(self.mesh.shape.get("data", 1)) if self.mesh is not None else 1
        block = self._mp_block_sampler(ensemble=ensemble)
        if block is None:
            # memoize the local jit too: a fresh sampler per in-training
            # snapshot would re-trace the whole reverse-diffusion scan
            if not hasattr(self, "_local_block_jits"):
                self._local_block_jits = {}
            block = self._local_block_jits.get(ensemble)
            if block is None:
                block = make_block_sampler(self.config, self.model,
                                           self.sched, ensemble=ensemble)
                self._local_block_jits[ensemble] = block
        return chunk_block(block, multiple=d)

    def video_gen(self, ckpt: Optional[int] = None):
        args, config = self.args, self.config
        is_main = jax.process_index() == 0
        self._enable_eval_kernels()
        num_frames_pred = config.sampling.num_frames_pred
        _, test_ds = get_dataset(
            args.data_path, config, video_frames_pred=num_frames_pred,
            start_at=getattr(args, "start_at", 0),
        )
        params, step = self._load_eval_params(ckpt)
        preds_per_test = getattr(config.sampling, "preds_per_test", 1)
        bs = getattr(config.sampling, "batch_size", 16)
        loader = self._test_loader_repeated(test_ds, preds_per_test, bs)

        lpips_fn, i3d_embedder = self._metric_providers()
        out_dir = getattr(args, "video_folder", args.log_path)
        os.makedirs(out_dir, exist_ok=True)

        def save_artifacts(real=None, pred=None, cond=None, tag=""):
            from ..data.conditioning import unfold_frames
            C = config.data.channels

            def unfold(a):
                if a is None:
                    return None
                return np.asarray(unfold_frames(jnp.asarray(a), a.shape[-1] // C))

            suffix = f"_{tag}" if tag else ""
            plots.save_video_grid(
                os.path.join(out_dir, f"videos_{ckpt or step}{suffix}"),
                pred=unfold(pred), real=unfold(real), cond=unfold(cond),
            )

        mp_block = self._guarded_block_sampler()
        vm = run_video_gen(
            config, self.model, params, self.sched, iter(loader),
            jax.random.PRNGKey(getattr(args, "seed", 0)),
            ckpt=ckpt or step, max_data_iter=getattr(config.sampling, "max_data_iter", 1),
            preds_per_test=preds_per_test, lpips_fn=lpips_fn,
            i3d_embedder=i3d_embedder,
            save_artifacts=save_artifacts if is_main else None,
            block_sampler=mp_block,
            batch_sharding=mesh_batch_sharding(self.mesh, 5, h_axis=2)
            if mp_block is None and self.mesh.devices.size > 1 else None,
        )
        if is_main:
            with open(os.path.join(out_dir, "vid_metrics.yml"), "w") as f:
                yaml.safe_dump({k: float(v) if isinstance(v, (int, float, np.floating)) else v
                                for k, v in vm.items()}, f)
        logger.info("video_gen metrics: %s", vm)
        return vm

    def _metric_providers(self):
        """LPIPS/FVD feature extractors: activated when their weight files are
        available (explicit config.eval.* paths, else conventional locations —
        the reference downloads these at runtime, eval/weights.py)."""
        from ..eval import weights as W

        lpips_fn = i3d_embedder = None
        i3d_path = W.find_weights(
            getattr_nested(self.config, "eval.i3d_weights"), W.I3D)
        if i3d_path:
            # TPU-native path: TorchScript state dict -> flax I3D, jitted
            # on-device; torch-CPU sidecar only as a fallback.
            try:
                from ..eval.i3d import make_jax_i3d_embedder

                i3d_embedder = make_jax_i3d_embedder(i3d_path)
            except Exception as e:
                logger.warning("JAX I3D unavailable (%s); torch sidecar", e)
                try:
                    from ..eval.fvd import make_i3d_embedder

                    i3d_embedder = make_i3d_embedder(i3d_path)
                except Exception as e2:
                    logger.warning("FVD disabled: %s", e2)
        lpips_path = W.find_weights(
            getattr_nested(self.config, "eval.lpips_weights"), W.LPIPS_LIN)
        if lpips_path:
            try:
                from ..eval.lpips import make_lpips_fn

                alex_path = W.find_weights(
                    getattr_nested(self.config, "eval.lpips_alexnet_weights"),
                    W.ALEXNET)
                lpips_fn = make_lpips_fn(lpips_path, alex_path)
            except Exception as e:
                logger.warning("LPIPS disabled: %s", e)
        return lpips_fn, i3d_embedder

    # ------------------------------------------------------------------ sample

    def sample(self, ckpt: Optional[int] = None):
        """Conditional video batch sampling -> saved arrays (reference
        `sample`, ncsn_runner.py:914-1301). The legacy SMLD image
        inpainting/interpolation branches (:957-1094) dispatch to
        diffusion/langevin_extras."""
        args, config = self.args, self.config
        self._enable_eval_kernels()
        if getattr(config.sampling, "inpainting", False):
            return self._sample_inpainting(ckpt)
        if getattr(config.sampling, "interpolation", False):
            return self._sample_interpolation(ckpt)
        if getattr(config.sampling, "fid", False):
            return self._sample_fid_loop(ckpt)
        params, step = self._load_eval_params(ckpt)
        _, test_ds = get_dataset(args.data_path, config,
                                 video_frames_pred=config.data.num_frames)
        bs = self._eval_batch_size(
            getattr(config.sampling, "batch_size", 16), len(test_ds), "sample()")
        loader = DataLoader(test_ds, batch_size=bs, shuffle=False, drop_last=True)
        X, _ = next(iter(loader))
        Xt = data_transform(config, jnp.asarray(X))
        conditional = config.data.num_frames_cond > 0
        real, cond, cond_mask = conditioning_fn(
            config, Xt, key=jax.random.PRNGKey(0),
            num_frames_pred=config.data.num_frames,
            prob_mask_cond=0.0, prob_mask_future=0.0, conditional=conditional,
        )
        block = self._guarded_block_sampler()
        key = jax.random.PRNGKey(getattr(args, "seed", 0))
        shape = real.shape
        init = init_noise(key, config, self.sched, shape)
        gen = block(params, key, init, cond, cond_mask)
        gen = np.asarray(inverse_data_transform(config, gen))
        out_dir = getattr(args, "image_folder", args.log_path)
        os.makedirs(out_dir, exist_ok=True)
        if jax.process_index() == 0:
            np.savez(
                os.path.join(out_dir, f"samples_{ckpt or step}.npz"),
                samples=gen,
                real=np.asarray(inverse_data_transform(config, real)),
                cond=np.asarray(inverse_data_transform(config, cond)) if cond is not None else None,
            )
            logger.info("wrote samples to %s", out_dir)
        return gen

    def _sample_fid_loop(self, ckpt: Optional[int] = None):
        """Bulk sample dump for offline FID (reference: ncsn_runner.py:1190-1301,
        the sampling.fid branch): generate sampling.num_samples4fid frames in
        batches — conditioned on shuffled test clips when the model is
        conditional — and write them under image_folder as npz shards."""
        args, config = self.args, self.config
        params, step = self._load_eval_params(ckpt)
        total = getattr(config.sampling, "num_samples4fid", 10000)
        bs = getattr(config.sampling, "batch_size", 16)
        if jax.process_count() > 1:
            # the collective-island sampler shards the batch P('data')
            bs = self._eval_batch_size(bs, bs, "sample fid loop")
        n_rounds = max(1, (total + bs - 1) // bs)  # ceil: never undershoot
        conditional = config.data.num_frames_cond > 0
        _, test_ds = get_dataset(args.data_path, config,
                                 video_frames_pred=config.data.num_frames)
        # drop_last: a ragged final batch each epoch would mismatch the
        # always-full-bs `init` (and, multi-process, break the P('data')
        # device placement) — the loader's fail-fast guard covers the
        # zero-batch case
        data_iter = iter(DataLoader(test_ds, batch_size=bs, shuffle=True,
                                    seed=getattr(args, "seed", 0), repeat=True,
                                    drop_last=True))
        block = self._guarded_block_sampler()
        out_dir = getattr(args, "image_folder", args.log_path)
        os.makedirs(out_dir, exist_ok=True)
        key = jax.random.PRNGKey(getattr(args, "seed", 0))
        C, F, sz = config.data.channels, config.data.num_frames, config.data.image_size
        n_written = 0
        for i in range(n_rounds):
            cond = cond_mask = None
            if conditional:
                X, _ = next(data_iter)
                Xt = data_transform(config, jnp.asarray(X))
                _, cond, cond_mask = conditioning_fn(
                    config, Xt, key=jax.random.PRNGKey(i),
                    num_frames_pred=F, conditional=True,
                )
            key, k1, k2 = jax.random.split(key, 3)
            init = init_noise(k1, config, self.sched, (bs, sz, sz, C * F))
            gen = block(params, k2, init, cond, cond_mask)
            gen = np.asarray(inverse_data_transform(config, gen))
            if jax.process_index() == 0:
                np.savez(os.path.join(out_dir, f"fid_samples_{ckpt or step}_{i:05d}.npz"),
                         samples=gen)
            n_written += len(gen)
        logger.info("wrote %d FID sample batches (%d videos) to %s",
                    n_rounds, n_written, out_dir)
        return n_written

    def _eps_closure(self, params, cond=None, cond_mask=None):
        def eps_fn(x, labels):
            return self.model.apply({"params": params}, x, labels, cond, cond_mask,
                                    sched=self.sched, rng=jax.random.PRNGKey(0))
        return eps_fn

    def _sample_inpainting(self, ckpt):
        """Right-half-unknown inpainting (reference: ncsn_runner.py:957-1021,
        SMLD legacy image path). Generalized to the video model: the folded
        pred-frame block is inpainted, conditioned on past frames as usual."""
        from ..diffusion.langevin_extras import anneal_langevin_inpainting

        args, config = self.args, self.config
        assert self.version == "SMLD", "inpainting sampling is the SMLD legacy path"
        params, step = self._load_eval_params(ckpt)
        _, test_ds = get_dataset(args.data_path, config,
                                 video_frames_pred=config.data.num_frames)
        # clamp to the SPLIT SIZE too (not just the mesh axis): a first
        # batch shorter than bs would violate the P('data') sharding below,
        # and single-process it would desync init/cond row counts
        bs = self._eval_batch_size(
            getattr(config.sampling, "batch_size", 8), len(test_ds),
            "sample inpainting")
        X, _ = next(iter(DataLoader(test_ds, batch_size=bs, shuffle=False)))
        Xt = data_transform(config, jnp.asarray(X))
        refer, cond, cond_mask = conditioning_fn(
            config, Xt, key=jax.random.PRNGKey(0),
            num_frames_pred=config.data.num_frames,
            conditional=config.data.num_frames_cond > 0,
        )
        key = jax.random.PRNGKey(getattr(args, "seed", 0))
        init = jax.random.uniform(key, refer.shape)

        # the chain takes its batch args EXPLICITLY (not via the eps closure)
        # so that multi-process runs can shard it over 'data' like the block
        # sampler — no replicated Langevin work per process (VERDICT r4 #7)
        def chain_fn(p, k, init_, refer_, cond_, cond_mask_):
            return anneal_langevin_inpainting(
                k, init_, refer_,
                self._eps_closure(p, cond_, cond_mask_), self.sched,
                n_steps_each=getattr(config.sampling, "n_steps_each", 100),
                step_lr=getattr(config.sampling, "step_lr", 8e-6),
            )

        chain = jax.jit(chain_fn)
        if jax.process_count() > 1:
            from ..parallel.mesh import wrap_chain_collective

            chain = wrap_chain_collective(chain, self.mesh, "inpainting_chain")
        out = chain(params, key, data_transform(config, init), refer,
                    cond, cond_mask)
        out = np.asarray(inverse_data_transform(config, out))
        out_dir = getattr(args, "image_folder", args.log_path)
        os.makedirs(out_dir, exist_ok=True)
        if jax.process_index() == 0:
            np.savez(os.path.join(out_dir, f"inpainting_{ckpt or step}.npz"),
                     samples=out,
                     refer=np.asarray(inverse_data_transform(config, refer)))
        return out

    def _sample_interpolation(self, ckpt):
        """Slerp-noise interpolation grid (reference: ncsn_runner.py:1023-1094)."""
        from ..diffusion.langevin_extras import anneal_langevin_interpolation

        args, config = self.args, self.config
        assert self.version == "SMLD", "interpolation sampling is the SMLD legacy path"
        params, step = self._load_eval_params(ckpt)
        _, test_ds = get_dataset(args.data_path, config,
                                 video_frames_pred=config.data.num_frames)
        # clamp to the split size too: `init` below is built with bs rows
        # while cond comes from the loader's first batch — a short first
        # batch would desync them (and break P('data') multi-process)
        bs = self._eval_batch_size(
            getattr(config.sampling, "batch_size", 8), len(test_ds),
            "sample interpolation")
        n_interp = getattr(config.sampling, "n_interpolations", 15)
        sz, C = config.data.image_size, config.data.channels
        F = config.data.num_frames
        X, _ = next(iter(DataLoader(test_ds, batch_size=bs, shuffle=False)))
        Xt = data_transform(config, jnp.asarray(X))
        _, cond, cond_mask = conditioning_fn(
            config, Xt, key=jax.random.PRNGKey(0), num_frames_pred=F,
            conditional=config.data.num_frames_cond > 0,
        )
        if cond is not None:  # each row repeated n_interp times by the sampler
            cond = jnp.repeat(cond, n_interp, axis=0)
            cond_mask = jnp.repeat(cond_mask, n_interp, axis=0) if cond_mask is not None else None
        key = jax.random.PRNGKey(getattr(args, "seed", 0))
        init = data_transform(config, jax.random.uniform(key, (bs, sz, sz, F * C)))

        # batch args explicit so multi-process runs shard the chain over
        # 'data' instead of replicating it per process (VERDICT r4 #7).
        # init has bs rows and cond bs*n_interp: both axis-0 shard evenly
        # because bs is a multiple of the data axis (_eval_batch_size above).
        def chain_fn(p, k, init_, cond_, cond_mask_):
            return anneal_langevin_interpolation(
                k, init_, self._eps_closure(p, cond_, cond_mask_), self.sched,
                n_interp,
                n_steps_each=getattr(config.sampling, "n_steps_each", 200),
                step_lr=getattr(config.sampling, "step_lr", 8e-6),
            )

        chain = jax.jit(chain_fn)
        if jax.process_count() > 1:
            from ..parallel.mesh import wrap_chain_collective

            chain = wrap_chain_collective(chain, self.mesh,
                                          "interpolation_chain")
        out = chain(params, key, init, cond, cond_mask)
        out = np.asarray(inverse_data_transform(config, out))
        out_dir = getattr(args, "image_folder", args.log_path)
        os.makedirs(out_dir, exist_ok=True)
        if jax.process_index() == 0:
            np.savez(os.path.join(out_dir, f"interpolation_{ckpt or step}.npz"), samples=out)
        return out

    # ------------------------------------------------------------------ test

    def test(self, begin_ckpt: Optional[int] = None, end_ckpt: Optional[int] = None,
             freq: Optional[int] = None):
        """Checkpoint-sweep average DSM test loss over the FULL test split
        (reference: ncsn_runner.py:2370-2430). `config.test.max_batches`
        (default: unlimited) can cap it for smoke runs; `freq` thins the
        checkpoint sweep like the reference's --freq."""
        args, config = self.args, self.config
        _, test_ds = get_dataset(args.data_path, config,
                                 video_frames_pred=config.data.num_frames)
        # multi-process capable (beyond the reference's single-process
        # DataParallel): the global batch is assembled from per-process
        # disjoint loader shards exactly like the train path; eval_fn's
        # mesh-wide mean is identical on every process, process 0 writes.
        n_proc = jax.process_count()
        is_main = jax.process_index() == 0
        # clamp: a batch size above the (possibly subset) split with
        # drop_last would yield zero batches and a NaN mean; also a multiple
        # of the mesh data axis (the batch is sharded with P('data'))
        bs = self._eval_batch_size(
            config.test.batch_size,
            (len(test_ds) // max(1, n_proc)) * max(1, n_proc), "test()")
        loader = DataLoader(test_ds, batch_size=bs // max(1, n_proc),
                            shuffle=False, drop_last=True,
                            num_processes=n_proc,
                            process_index=jax.process_index())
        from ..parallel.mesh import lockstep

        eval_fn = lockstep(
            make_eval_loss_step(self.model, self.sched, config, mesh=self.mesh),
            "test_eval_loss")
        sharding = data_sharding(self.mesh)
        max_batches = getattr(config.test, "max_batches", None)
        # strided sharding (idx[p::P]) gives some processes one extra item;
        # with per-process drop_last the shards can yield UNEQUAL batch
        # counts, and an unmatched put_global_batch/eval_fn is a collective
        # the other processes never join (hang, or worse: silent pairing of
        # different checkpoints' batches). Cap every process at the count
        # the SMALLEST shard is guaranteed to yield.
        n_common = (len(test_ds) // max(1, n_proc)) // max(
            1, bs // max(1, n_proc))
        if max_batches is not None:
            n_common = min(n_common, int(max_batches))

        results = {}
        ckpt_dir = self._ckpt_dir()
        steps = self._agreed_ckpt_steps(ckpt_dir)
        steps = sorted(
            s for s in steps
            if (begin_ckpt is None or s >= begin_ckpt) and (end_ckpt is None or s <= end_ckpt)
        ) or [None]
        if freq and len(steps) > 1:
            # thin by checkpoint NUMBER like the reference's
            # range(begin, end, freq) (ncsn_runner.py:2370), not list index
            base = begin_ckpt if begin_ckpt is not None else steps[0]
            steps = [s for s in steps if (s - base) % freq == 0]
        for s in steps:
            params, loaded_step = self._load_eval_params(s)
            losses = []
            for i, (X, _) in enumerate(iter(loader)):
                if i >= n_common:
                    break
                Xd = put_global_batch(self.mesh, np.asarray(X, np.float32),
                                      sharding)
                losses.append(float(eval_fn(params, Xd, jax.random.PRNGKey(i))))
            results[s or loaded_step] = float(np.mean(losses))
            logger.info("ckpt %s: test DSM loss %.3f", s or loaded_step, results[s or loaded_step])
        if is_main:
            out = os.path.join(args.log_path, "test_losses.yml")
            with open(out, "w") as f:
                yaml.safe_dump(results, f)
        return results

    # ---------------------------------------------------------------- fast_fid

    def fast_fid(self):
        """FID(+P/R) sweep over checkpoints (reference: ncsn_runner.py:2432-2586):
        for each numbered checkpoint, sample num_samples frames, extract
        Inception features (jit-compiled JAX when the weight schema allows,
        else a torch-CPU sidecar), compute FID + kNN precision/recall against
        real data features, cache samples and features per checkpoint, write
        fids.yml. With fast_fid.ensemble, each checkpoint's samples are drawn
        with the score-network OUTPUTS averaged over a trailing window of up
        to 5 checkpoints (reference fast_ensemble_fid,
        ncsn_runner.py:2588-2700)."""
        from ..eval import weights as W
        from ..eval.fid import get_fid_pr, make_inception_embedder

        args, config = self.args, self.config
        inc_path = W.find_weights(
            getattr_nested(config, "eval.inception_weights"), W.INCEPTION)
        if not inc_path:
            raise FileNotFoundError(
                "fast_fid needs Inception feature weights: set "
                "eval.inception_weights (the reference downloads pt_inception "
                "at runtime; zero-egress here)"
            )
        try:
            from ..eval.i3d import make_jax_inception_embedder

            embed = make_jax_inception_embedder(inc_path)
        except Exception as e:
            logger.warning("JAX Inception unavailable (%s); torch sidecar", e)
            embed = make_inception_embedder(inc_path)

        ff = config.fast_fid
        _, test_ds = get_dataset(args.data_path, config,
                                 video_frames_pred=config.data.num_frames)
        num_samples = getattr(ff, "num_samples", 1000)
        bs = min(getattr(ff, "batch_size", 100), num_samples)
        if jax.process_count() > 1:
            # the collective-island sampler shards the batch P('data')
            bs = self._eval_batch_size(bs, bs, "fast_fid")
        k = getattr(ff, "pr_nn_k", 3)
        no_pr = bool(getattr(args, "no_pr", False))

        # real features: precomputed (--feats_dir, reference fid_PR.py
        # feats-path registry) or embedded from the test split and cached
        from ..parallel.mesh import all_processes_true

        feat_r = None
        ds_name = getattr(config.data, "dataset", "data")
        feats_dir = getattr(args, "feats_dir", None)
        if feats_dir:
            p = os.path.join(feats_dir, f"{ds_name}_feats.npy")
            # the branch must be COLLECTIVE: on non-shared disks only some
            # processes may see the file, and a per-process branch would
            # silently diverge feat_r (breaking the identical-harness
            # invariant) — load only if every process can
            if all_processes_true(os.path.isfile(p)):
                feat_r = np.load(p)
                logger.info("loaded real features from %s", p)
        if feat_r is None:
            loader = DataLoader(test_ds, batch_size=bs, shuffle=False)
            reals = []
            for X, _ in iter(loader):
                reals.append(X.reshape(-1, *X.shape[2:]))
                if sum(len(r) for r in reals) >= num_samples:
                    break
            real_imgs = np.concatenate(reals)[:num_samples]
            feat_r = embed(real_imgs)
            if feats_dir and jax.process_index() == 0:
                os.makedirs(feats_dir, exist_ok=True)
                np.save(os.path.join(feats_dir, f"{ds_name}_feats.npy"), feat_r)

        cache_dir = getattr(args, "image_folder", args.log_path)
        os.makedirs(cache_dir, exist_ok=True)
        ensemble = bool(getattr(ff, "ensemble", False))
        num_ensembles = int(getattr(ff, "num_ensembles", 5))
        # multi-process: the sampler chain is the collective island;
        # loaders/feature-embedding/Fréchet math run identically on every
        # process (same seeds), process 0 owns the cache/yml writes
        block = self._guarded_block_sampler(ensemble=ensemble)
        is_main = jax.process_index() == 0
        C, F = config.data.channels, config.data.num_frames

        fids = {}
        ckpt_dir = self._ckpt_dir()
        steps = sorted(self._agreed_ckpt_steps(ckpt_dir)) or [None]
        begin = getattr(args, "ckpt", None) or getattr(ff, "begin_ckpt", 0)
        end = getattr(args, "end_ckpt", None) or getattr(ff, "end_ckpt", 10**12)
        eligible = [s for s in steps if s is None or begin <= s <= end]
        freq = getattr(args, "freq", None)
        if freq and len(eligible) > 1:
            # thin by checkpoint NUMBER (reference range(begin, end, freq),
            # fast_fid ncsn_runner.py:2537), not list index
            base = eligible[0]
            eligible = [s for s in eligible if (s - base) % freq == 0]
        for idx, s in enumerate(eligible):
            params, loaded = self._load_eval_params(s)
            tag = s or loaded
            if ensemble:
                # trailing window of up to num_ensembles checkpoints ending
                # at s; eps outputs averaged inside the sampler
                window = eligible[max(0, idx - (num_ensembles - 1)):idx + 1]
                trees = [self._load_eval_params(w)[0] for w in window[:-1]]
                trees.append(params)
                params = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
                tag = f"{tag}_ens{len(trees)}"
            feats_cache = os.path.join(cache_dir, f"feats_{tag}.npy")
            # collective cache decision: only process 0 writes the cache, so
            # on non-shared disks a per-process isfile() branch would have
            # process 0 skip the sampling loop while the others enter the
            # collective sampler — desync, hang, watchdog crash-loop. Enter
            # the cache path only when EVERY process has the file.
            if all_processes_true(os.path.isfile(feats_cache)):
                feat_g = np.load(feats_cache)
            else:
                samples = []
                key = jax.random.PRNGKey(getattr(args, "seed", 0))
                # drop_last: a ragged final batch would break the collective
                # sampler's fixed P('data') batch shape
                loader2 = iter(DataLoader(test_ds, batch_size=bs, shuffle=False,
                                          repeat=True, drop_last=True))
                while sum(len(x) for x in samples) < num_samples:
                    X, _ = next(loader2)
                    Xt = data_transform(config, jnp.asarray(X))
                    _, cond, cond_mask = conditioning_fn(
                        config, Xt, key=jax.random.PRNGKey(0),
                        num_frames_pred=F, conditional=config.data.num_frames_cond > 0,
                    )
                    key, k1, k2 = jax.random.split(key, 3)
                    sz = config.data.image_size
                    from ..eval.video_gen import init_noise

                    init = init_noise(k1, config, self.sched, (X.shape[0], sz, sz, C * F))
                    gen = block(params, k2, init, cond, cond_mask)
                    gen = np.asarray(inverse_data_transform(config, gen))
                    # frames as images (B*F, H, W, C)
                    B_, H_, W_, _ = gen.shape
                    samples.append(
                        gen.reshape(B_, H_, W_, F, C).transpose(0, 3, 1, 2, 4).reshape(
                            B_ * F, H_, W_, C
                        )
                    )
                sample_imgs = np.concatenate(samples)[:num_samples]
                feat_g = embed(sample_imgs)
                if is_main:
                    np.save(os.path.join(cache_dir, f"samples_{tag}.npy"), sample_imgs)
                    np.save(feats_cache, feat_g)
            if no_pr:
                from ..eval.fid import activation_statistics, calculate_frechet_distance

                mu_r, sig_r = activation_statistics(feat_r)
                mu_g, sig_g = activation_statistics(feat_g)
                res = {"fid": calculate_frechet_distance(mu_r, sig_r, mu_g, sig_g)}
            else:
                res = get_fid_pr(feat_r, feat_g, k=k)
            fids[s or loaded] = res
            logger.info("ckpt %s%s: %s", s or loaded,
                        " (ensemble)" if ensemble else "", res)

        out = {int(kk): {m: float(v) for m, v in vv.items()} for kk, vv in fids.items()}
        if is_main:
            with open(os.path.join(args.log_path, "fids.yml"), "w") as f:
                yaml.safe_dump(out, f)
        return out
