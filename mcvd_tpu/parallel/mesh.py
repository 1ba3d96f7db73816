"""Device mesh and shardings.

The reference's only parallelism is single-process torch DataParallel
(SURVEY.md §2.5); the TPU-native equivalent is a jax.sharding.Mesh over ICI
with the batch sharded on a 'data' axis and params replicated — pjit inserts
the gradient all-reduce.

For the big configs (128px, ngf>=192: cityscapes/ucf) a second 'tensor'
mesh axis shards the activations' H dimension (sequence/spatial
parallelism): convs get their halo exchanges, and norms/attention their
cross-shard reductions, from the GSPMD partitioner — no hand-written
collectives. Params stay replicated (27-360M params fit per chip; it is
activations at 128px that don't). Build with
make_mesh(axis_names=("data","tensor"), shape=(d, t)).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global_batch(mesh: Mesh, x, sharding: Optional[NamedSharding] = None):
    """Device-put a batch for a possibly multi-process mesh.

    Single-process: plain device_put (or pass-through numpy for jit's
    implicit async transfer when sharding is None). Multi-process: `x` is
    this process's LOCAL shard of the batch (the per-host DataLoader slice);
    assemble the global jax.Array whose 'data'-sharded axes are the
    concatenation of every process's local data. This is the host->device
    seam of the multi-host launch path (SURVEY §2.5)."""
    sharding = sharding if sharding is not None else data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def put_full_batch(mesh: Mesh, x, sharding: Optional[NamedSharding] = None):
    """Device-put an array whose FULL global value is present on every
    process (the eval paths load the whole split on each host and only the
    device compute is sharded — unlike the train path's disjoint per-host
    loading in put_global_batch). Single-process: plain device_put.
    Multi-process: make_array_from_callback slices each process's
    addressable shards out of the full host value."""
    sharding = sharding if sharding is not None else data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        # already a global array (e.g. replicated train-state params at an
        # in-training snapshot eval) — hand it to the SPMD program as-is
        return x
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def host_value(a) -> np.ndarray:
    """Materialize a (possibly non-fully-addressable) jax.Array on host.
    For multi-process global arrays this is a collective allgather — every
    process must call it on the same array in the same order."""
    if isinstance(a, jax.Array) and not a.is_fully_addressable:
        from jax.experimental import multihost_utils

        # tiled=True is REQUIRED for global arrays (multihost_utils raises
        # on tiled=False); for the non-fully-addressable case it returns
        # the full global value (replicate-and-fetch), NOT a concatenation,
        # so the shape is unchanged — exactly this function's contract.
        return np.asarray(multihost_utils.process_allgather(a, tiled=True))
    return np.asarray(a)


def coord_barrier(name: str, timeout_s: Optional[float] = None) -> None:
    """Barrier every process at `name` via the distributed COORDINATION
    SERVICE (gRPC wait_at_barrier) — NOT a device collective.

    multihost_utils.sync_global_devices is an allgather over devices: its
    first execution creates a gloo context whose rendezvous window is ~30s,
    so it cannot be used to absorb compile-time skew (the very thing that
    needs a barrier). This one blocks for up to MCVD_BARRIER_TIMEOUT seconds
    (default 900 — above the worst observed axon compile, CLAUDE.md)."""
    import os

    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return
    if timeout_s is None:
        timeout_s = float(os.environ.get("MCVD_BARRIER_TIMEOUT", "900"))
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def prime_collectives(timeout_s: Optional[float] = None) -> None:
    """Create the all-devices cross-process communicator clique ONCE, at
    startup, with every process barrier-aligned.

    XLA:CPU caches gloo contexts PER CLIQUE (set of participating devices),
    not per compiled program — verified by a 2-process probe (r4): after one
    aligned allgather, a *different* collective program survived a 45s
    one-sided skew (the early process just blocked inside the collective;
    only context INITIALIZATION has the ~30s KV rendezvous deadline). So one
    aligned priming collective protects every later collective whose first
    execution we cannot barrier ourselves — most importantly orbax's
    internal sync_global_processes during save/restore (the r4 cold-cache
    failure: checkpointer.restore -> sync_global_devices ->
    process_allgather -> "Gloo context initialization failed:
    DEADLINE_EXCEEDED", tests/test_multihost_main.py --test phase).

    The priming program itself is made skew-proof the lockstep way:
    AOT-compile (unbounded), coordination-service barrier (gRPC,
    MCVD_BARRIER_TIMEOUT), then execute. No-op single-process; on real TPU
    pods this also warms the ICI path."""
    if jax.process_count() == 1:
        return
    devs = jax.devices()
    mesh = Mesh(np.asarray(devs), ("all",))
    in_sharding = NamedSharding(mesh, P("all"))
    out_sharding = NamedSharding(mesh, P())
    n = len(devs)
    host = np.ones((n,), np.float32)
    x = jax.make_array_from_callback((n,), in_sharding, lambda idx: host[idx])
    f = jax.jit(lambda a: a + 0.0, out_shardings=out_sharding)
    compiled = f.lower(x).compile()
    coord_barrier("mcvd:prime_collectives", timeout_s)
    np.asarray(compiled(x).addressable_data(0))
    # Second clique: host-value process_allgather (multihost_utils builds a
    # (processes, local_devices) mesh with the value sharded over
    # 'processes', so GSPMD gathers via ONE-device-per-process subgroups —
    # e.g. gloo key "0,2048" with 2 procs x 2 devices). That is the exact
    # clique orbax's sync_global_processes needs at restore time (the r4
    # cold-cache failure). Still aligned from the barrier above (this tiny
    # program compiles in well under the 30s rendezvous window).
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mcvd:prime_collectives")


def lockstep(fn, name: str, timeout_s: Optional[float] = None):
    """Make a jitted collective program safe against compile-time skew.

    Each compiled XLA:CPU collective program creates its own gloo context on
    FIRST EXECUTION, with a ~30s KV rendezvous window. If processes reach
    that first execution minutes apart (asymmetric compile-cache hit/miss,
    compile-time variance), the rendezvous DEADLINE_EXCEEDs and the job
    dies (observed: r3 judge run, tests/test_multihost_main.py cold-cache).

    Fix: on the first call with a new abstract signature, AOT-compile the
    program (fn.lower(*args).compile() — however long that takes, no
    timeout is involved), then meet every process at a coordination-service
    barrier, then execute. The first gloo rendezvous therefore always
    happens with all processes in lockstep, bounded only by the barrier
    timeout (MCVD_BARRIER_TIMEOUT, default 900s). Single-process returns fn
    unchanged. All processes must call the wrapped fn in the same order
    (they run identical host code — already a collective requirement)."""
    if jax.process_count() == 1:
        return fn
    seen: dict = {}

    def signature(args):
        leaves, treedef = jax.tree_util.tree_flatten(args)
        return (
            str(treedef),
            tuple((getattr(l, "shape", ()), str(getattr(l, "dtype", type(l).__name__)))
                  for l in leaves),
        )

    def wrapped(*args):
        key = signature(args)
        if key not in seen:
            compiled = None
            try:
                compiled = fn.lower(*args).compile()
            except Exception:
                # non-jit callable or lowering corner: still barrier so the
                # in-call compile at least starts in lockstep
                pass
            import os
            import time

            # fault injection for the skew-hardening tests: pretend this
            # process's compile took MCVD_TEST_COMPILE_DELAY extra seconds
            delay = float(os.environ.get("MCVD_TEST_COMPILE_DELAY", "0") or 0)
            if delay:
                time.sleep(delay)
            coord_barrier(f"mcvd:lockstep:{name}:{len(seen)}", timeout_s)
            seen[key] = compiled
        compiled = seen[key]
        if compiled is not None:
            try:
                return compiled(*args)
            except Exception as e:
                # Fall back to the jit path ONLY for input-signature
                # rejections (sharding/layout drift vs the AOT signature).
                # Anything else is a real runtime failure: re-executing
                # fn(*args) would run on possibly-donated (deleted) inputs
                # and mask the original error. Classification: an input
                # rejection is raised BEFORE execution, so every array
                # argument is still live; if any input buffer was deleted
                # the program executed (and donated) — re-raise. The message
                # heuristic alone is unsafe: real XLA runtime errors often
                # say "incompatible" too (ADVICE r4).
                leaves = jax.tree_util.tree_leaves(args)
                any_deleted = any(
                    getattr(l, "is_deleted", lambda: False)()
                    for l in leaves if isinstance(l, jax.Array))
                msg = str(e).lower()
                looks_like_input_rejection = any(
                    s in msg for s in ("layout", "sharding", "incompatible",
                                       "donat"))
                if any_deleted or not looks_like_input_rejection:
                    raise
                import logging

                logging.getLogger(__name__).warning(
                    "lockstep[%s]: AOT-compiled call rejected its inputs "
                    "(%s); falling back to the jit path", name, e)
                seen[key] = None
        return fn(*args)

    return wrapped


_APT_SEQ = [0]


def all_processes_true(flag) -> bool:
    """Collective AND of a per-process host-side predicate.

    Keeps filesystem-dependent branches (cache hits, artifact existence)
    IDENTICAL across processes: on non-shared disks only some processes may
    see a file, and branching per-process would desync the subsequent
    collectives (hang / silent mispairing). Every process must call this at
    the same host-code point — which is what makes the module-level call
    counter a valid key namespace.

    Implemented over the COORDINATION-SERVICE KV store (gRPC, long
    timeouts), not a device collective: a per-process predicate must never
    itself be able to hit the gloo context-init deadline it exists to
    prevent."""
    if jax.process_count() == 1:
        return bool(flag)
    import os

    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return bool(flag)
    timeout_ms = int(float(os.environ.get("MCVD_BARRIER_TIMEOUT", "900")) * 1000)
    seq = _APT_SEQ[0]
    _APT_SEQ[0] += 1
    key = f"mcvd:apt:{seq}"
    client.key_value_set(f"{key}/{jax.process_index()}", str(int(bool(flag))))
    client.wait_at_barrier(f"{key}:votes_in", timeout_in_ms=timeout_ms)
    return all(
        client.blocking_key_value_get(f"{key}/{i}", timeout_ms) == "1"
        for i in range(jax.process_count()))


_BCAST_SEQ = [0]


def broadcast_from_primary(value: str, name: str = "") -> str:
    """Process 0's string, delivered to every process over the
    coordination-service KV store (same transport rationale as
    all_processes_true). For filesystem-derived host decisions that must be
    identical across processes but where process 0 is authoritative — e.g.
    checkpoint listings: orbax writes on the primary host only, so on
    non-shared disks peers may see none and would otherwise run a different
    number of collective eval calls (hang at the next barrier).

    ``name`` should identify the call site: it goes into the KV key, so if
    processes ever reach broadcast calls in different orders the mismatched
    key fails loudly (blocking get times out) instead of silently delivering
    the wrong payload to the wrong consumer (ADVICE r4)."""
    if jax.process_count() == 1:
        return value
    import os

    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return value
    timeout_ms = int(float(os.environ.get("MCVD_BARRIER_TIMEOUT", "900")) * 1000)
    seq = _BCAST_SEQ[0]
    _BCAST_SEQ[0] += 1
    key = f"mcvd:bcast:{name}:{seq}" if name else f"mcvd:bcast:{seq}"
    if jax.process_index() == 0:
        client.key_value_set(key, value)
    return client.blocking_key_value_get(key, timeout_ms)


def wrap_chain_collective(fn, mesh: Mesh, name: str):
    """Turn a jitted chain `fn(params, key, *batch_args)` into a
    multi-process collective island: inputs are full host values identical
    on every process (params replicated, every non-None batch arg sharded
    over 'data' on axis 0), the inner jit runs as ONE SPMD program over the
    global mesh, and the output is allgathered back to a full local value.

    This is the eval-side multi-host pattern (reference analog: the
    DataParallel wrap at ncsn_runner.py:924/1377/2442): every process runs
    the identical host-side harness (loading the full eval split, metric
    math, RNG threading), so results agree bit-for-bit without any
    cross-process metric reduction — only the expensive reverse-diffusion
    chain is sharded. Every process MUST call the wrapped fn the same
    number of times with the same shapes (it is a collective)."""
    repl = replicated_sharding(mesh)
    dsh = data_sharding(mesh)
    # compile-skew hardening: the chain's first execution rendezvouses a
    # fresh gloo context — AOT-compile + coordination barrier first
    fn = lockstep(fn, name)
    # memo holds a strong ref to the source tree so the identity check can't
    # alias a new tree to a stale put (id() reuse after GC)
    memo = {"src": None, "put": None}

    def wrapped(params, key, *batch_args):
        if memo["src"] is not params:  # one live param tree (ensemble re-puts)
            memo["src"] = params
            memo["put"] = jax.tree_util.tree_map(
                lambda a: put_full_batch(mesh, a, repl), params)
        out = fn(
            memo["put"],
            np.asarray(key),
            *(None if a is None else put_full_batch(mesh, a, dsh)
              for a in batch_args),
        )
        return jax.numpy.asarray(host_value(out))

    return wrapped


def wrap_block_collective(block, mesh: Mesh):
    """wrap_chain_collective specialized to the block sampler signature
    `block(params, key, init, cond, cond_mask)` (kept as the established
    name for the video_gen/fast_fid call sites)."""
    return wrap_chain_collective(block, mesh, "block_sampler")


def has_tensor_axis(mesh: Optional[Mesh]) -> bool:
    return (mesh is not None and "tensor" in mesh.axis_names
            and mesh.shape["tensor"] > 1)


def batch_sharding(mesh: Mesh, ndim: int, h_axis: Optional[int] = None) -> NamedSharding:
    """Sharding for an activation batch: axis 0 over 'data' and, when the
    mesh has a non-trivial 'tensor' axis, the H axis over 'tensor'
    (spatial parallelism). h_axis defaults to ndim-3 (..., H, W, C)."""
    spec = [None] * ndim
    spec[0] = "data"
    if has_tensor_axis(mesh):
        spec[ndim - 3 if h_axis is None else h_axis] = "tensor"
    return NamedSharding(mesh, P(*spec))
