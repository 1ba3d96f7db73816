#!/usr/bin/env python
"""Headline benchmark: frames/sec/chip for 100-step DDPM sampling of 16
predicted 64x64 frames with the flagship smmnist_DDPM_big5-scale model
(ngf=64, 27.9M params), autoregressive 5-frame blocks conditioned on 5 frames
— the protocol of BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Crash-proofing (round 3): the axon TPU backend has documented weather —
compile latency varies 20-500s for identical programs, and the device can
enter windows where any dispatch raises FAILED_PRECONDITION or hangs.  A
single such window must not zero the round's headline metric, so this script
is an orchestrator: the actual measurement runs in a fresh worker subprocess
(``bench.py --worker``) with per-phase stderr telemetry, and the parent
retries the whole measurement in a new process on failure/timeout until a
wall-clock budget (MCVD_BENCH_BUDGET_S, default 3000s) is spent.  The JSON
line is ALWAYS emitted with rc=0: on total failure it carries the best
partial measurement seen (workers stream a PARTIAL_JSON line after every
timed rep) plus ``"degraded": true`` and an ``"error"`` note.

vs_baseline anchor: the reference publishes no throughput (BASELINE.md), so
the A100 anchor is computed analytically from the measured model FLOPs:
  anchor = effective_flops_A100 / flops_per_generated_frame
with A100 TF32 peak 156 TFLOP/s at an (optimistic for torch eager) 40% MFU —
the reference runs fp32/TF32 torch eager with no AMP or compile. Details on
stderr and in BENCH_NOTES.md.
"""

import json
import os
import subprocess
import sys
import time


def log(msg: str) -> None:
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Worker: one measurement attempt in this process. Emits telemetry per phase,
# a PARTIAL_JSON stdout line after every successful timed rep, and finally
# RESULT_JSON on full success.
# ---------------------------------------------------------------------------


def big_worker() -> None:
    """Secondary driver-visible measurement (VERDICT r3 next #9): the
    cityscapes_big (128px, ngf=128) eval path — the framework's best MFU
    evidence (BENCH_NOTES.md big-config table) — as a machine-captured line.
    Prints BIG_JSON with frames/s + MFU; methodology = tools/bench_big.py
    time_eval (bf16, B=8, 30-eval lax.scan)."""
    from mcvd_tpu.utils import setup_jax

    setup_jax()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.bench_big import load_config, time_eval

    config = load_config("cityscapes_big")
    B = 8
    sub = int(getattr(config.sampling, "subsample", 100) or 100)
    F = config.data.num_frames
    t0 = time.time()
    e = time_eval(config, B, reps=3)
    log(f"phase=big_eval ms={e['ms']:.2f} mfu={e['mfu']:.3f} dt={time.time()-t0:.0f}s")
    payload = {
        "config": "cityscapes_big (128px ngf=128, bf16 eval)",
        "frames_per_s": round(B * F / (e["ms"] / 1e3 * (sub + 1)), 2),
        "mfu": round(e["mfu"], 3),
        "ms_per_eval": round(e["ms"], 2),
    }
    print(f"BIG_JSON: {json.dumps(payload)}", flush=True)


def worker(batch_size: int) -> None:
    from mcvd_tpu.utils import setup_jax

    t_boot = time.time()
    setup_jax()  # persistent compile cache — critical on this backend
    import jax
    import jax.numpy as jnp

    from mcvd_tpu import ops

    log(f"phase=init devices={jax.devices()} dt={time.time()-t_boot:.1f}s")

    # Kernel/dtype picks, each measured end-to-end on TPU v5e (bf16, B=16;
    # log in BENCH_NOTES.md):
    #   * bf16 score-network compute: 7.0 -> 6.6 ms/eval
    #   * dot-stats XLA GroupNorm (layers.group_norm_folded): 5.98 -> 4.15
    #     ms/eval — a pallas GN forces {3,2,1,0}<->{3,0,2,1} relayouts
    #     around EVERY conv (tools/profile_trace.py); the dot-stats GN fuses
    #     into the conv inputs instead. All pallas kernels stay OFF on the
    #     inference path.
    #   * Pallas attention: wins in fp32, loses slightly to XLA in bf16
    #   * Winograd conv (ops/winograd.py): wins isolated, loses 2x e2e
    ops.set_use_pallas(False)

    from __graft_entry__ import _flagship_config
    from mcvd_tpu.diffusion import make_schedule
    from mcvd_tpu.eval.video_gen import autoregressive_predict, make_block_sampler
    from mcvd_tpu.models import get_model

    config = _flagship_config()
    B = batch_size
    num_frames_pred = 16
    subsample = 100
    config.sampling.subsample = subsample
    config.sampling.num_frames_pred = num_frames_pred
    # bf16 inference: the TPU-idiomatic counterpart of the reference's
    # TF32-on-A100 conv path (similar mantissa class); sampler chain math
    # stays fp32 (video_gen.make_block_sampler)
    config.sampling.compute_dtype = "bfloat16"

    model = get_model(config)
    sched = make_schedule(config)
    sz = config.data.image_size
    C = config.data.channels
    F = config.data.num_frames
    Fc = config.data.num_frames_cond

    key = jax.random.PRNGKey(0)
    x = jnp.zeros((B, sz, sz, F * C))
    cond = jax.random.normal(key, (B, sz, sz, Fc * C))
    y = jnp.zeros((B,), jnp.int32)
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, y, cond)
    params = params["params"]
    log(f"phase=param_init dt={time.time()-t0:.1f}s")

    # model FLOPs for the analytic A100 anchor (XLA path: pallas kernel flops
    # are invisible to cost_analysis and would understate the anchor)
    t0 = time.time()
    fwd = jax.jit(lambda p, x, y, c: model.apply({"params": p}, x, y, c))
    flops_fwd = fwd.lower(params, x, y, cond).compile().cost_analysis()["flops"]
    log(f"phase=fwd_flops flops={flops_fwd/1e12:.2f}T dt={time.time()-t0:.1f}s")

    import math

    n_blocks = math.ceil(num_frames_pred / F)
    model_evals = n_blocks * (subsample + 1)  # +1 denoise step
    flops_per_video = model_evals * flops_fwd / B
    a100_flops = 156e12 * 0.40
    anchor_frames_per_sec = num_frames_pred * a100_flops / flops_per_video
    log(f"B={B} blocks={n_blocks} evals={model_evals} anchor={anchor_frames_per_sec:.1f} f/s")

    block_sampler = make_block_sampler(config, model, sched)

    def run(key):
        return autoregressive_predict(
            config, block_sampler, params, key, cond, None, num_frames_pred, 0, sched
        )

    def force(x):
        # block_until_ready does NOT wait on the axon backend; a host
        # transfer of a dependent scalar does.
        return float(jnp.sum(x))

    def emit(frames_per_sec: float, tag: str, n_rep: int) -> None:
        payload = {
            "metric": "frames/sec/chip, 100-step DDPM, 16 pred frames 64x64 (ngf=64)",
            "value": round(frames_per_sec, 2),
            "unit": "frames/sec",
            "vs_baseline": round(frames_per_sec / anchor_frames_per_sec, 3),
        }
        if tag == "PARTIAL_JSON":
            payload["n_rep"] = n_rep
        print(f"{tag}: {json.dumps(payload)}", flush=True)

    # compile + warmup (separate phase so telemetry distinguishes a slow
    # compile from a hung execution)
    t0 = time.time()
    force(run(jax.random.PRNGKey(1)))
    log(f"phase=compile+first_run dt={time.time()-t0:.1f}s")

    # timed runs; stream a partial result after every rep so the parent can
    # salvage a measurement even if the backend dies mid-benchmark
    n_rep = 3
    times = []
    for i in range(n_rep):
        t0 = time.time()
        force(run(jax.random.PRNGKey(2 + i)))
        times.append(time.time() - t0)
        log(f"phase=timed_rep i={i} dt={times[-1]:.3f}s")
        emit(B * num_frames_pred / (sum(times) / len(times)), "PARTIAL_JSON", len(times))

    dt = sum(times) / len(times)
    emit(B * num_frames_pred / dt, "RESULT_JSON", n_rep)


# ---------------------------------------------------------------------------
# Parent: retry the worker in fresh processes until success or budget spent;
# always emit the JSON line.
# ---------------------------------------------------------------------------


def parse_tagged(lines: list[str], tag: str):
    out = None
    for ln in lines:
        if ln.startswith(tag + ": "):
            try:
                out = json.loads(ln[len(tag) + 2 :])
            except json.JSONDecodeError:
                pass
    return out


LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_last_good.json")
# Committed fallback: the live last-good file is untracked and the VM image
# is rebuilt between rounds (r5: a reboot wiped it along with the compile
# cache), which would blind the degradation guard exactly when it matters —
# on a cold host where compiles are slowest. The seed is a real capture,
# updated by hand when a clean bench run moves the record.
SEED_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "bench_last_good_seed.json")


def _read_last_good():
    for path in (LAST_GOOD_PATH, SEED_PATH):
        try:
            with open(path) as f:
                return json.load(f)
        except Exception:
            continue
    return None


def _write_last_good(result: dict) -> None:
    try:
        with open(LAST_GOOD_PATH, "w") as f:
            json.dump({**result, "captured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}, f)
    except Exception as e:
        log(f"could not persist last-good result: {e}")


def run_big(deadline: float) -> dict | None:
    """Run the big-config measurement in a fresh worker process, bounded by
    the remaining budget, retrying while budget allows (compile latency on
    this backend varies 20-500s and is host-contention-sensitive — one slow
    window must not forfeit the live measurement). Returns the BIG_JSON
    payload or None. Never raises: the big line is an enrichment — it must
    not endanger the headline."""
    attempt = 0
    while True:
        attempt += 1
        remaining = deadline - time.time()
        if remaining < 120:
            log(f"big: no more attempts ({remaining:.0f}s budget left)")
            return None
        this_timeout = min(720.0, remaining)
        log(f"big: attempt {attempt} timeout={this_timeout:.0f}s")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--big-worker"],
                capture_output=True,
                text=True,
                timeout=this_timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            sys.stderr.write(proc.stderr)
            sys.stderr.flush()
            result = parse_tagged(proc.stdout.splitlines(), "BIG_JSON")
            if result is not None:
                return result
            log(f"big: attempt {attempt} produced no result (rc={proc.returncode})")
        except subprocess.TimeoutExpired:
            log(f"big: attempt {attempt} timed out")
        except Exception as e:  # noqa: BLE001 — enrichment only, never fatal
            log(f"big: attempt {attempt} failed ({e})")
            return None


def main() -> None:
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    budget_s = float(os.environ.get("MCVD_BENCH_BUDGET_S", "3000"))
    attempt_timeout_s = float(os.environ.get("MCVD_BENCH_ATTEMPT_S", "900"))
    deadline = time.time() + budget_s

    best_partial = None  # highest-n_rep, then latest, PARTIAL_JSON seen
    last_error = None
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        remaining = deadline - time.time()
        this_timeout = min(attempt_timeout_s, max(120.0, remaining))
        log(f"attempt={attempt} timeout={this_timeout:.0f}s remaining_budget={remaining:.0f}s")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(batch_size), "--worker"],
                capture_output=True,
                text=True,
                timeout=this_timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            sys.stderr.write(proc.stderr)
            sys.stderr.flush()
            lines = proc.stdout.splitlines()
            result = parse_tagged(lines, "RESULT_JSON")
            partial = parse_tagged(lines, "PARTIAL_JSON")
            if partial is not None and (
                best_partial is None or partial.get("n_rep", 0) >= best_partial.get("n_rep", 0)
            ):
                best_partial = partial
            if proc.returncode == 0 and result is not None:
                lg = _read_last_good()
                lg_big = (lg or {}).get("big") or None
                lg_big_clean = (lg_big if lg_big and not lg_big.get("degraded")
                                and not lg_big.get("stale_from") else None)
                big = run_big(deadline)
                # Degradation guard (VERDICT r4 weak #1: a 3.7x backend-
                # weather collapse shipped as data). If the live number is
                # >1.5x off the last clean capture, retry once in a fresh
                # worker; if still off, mark it degraded and carry the
                # last-good values alongside — captured vs attested stays
                # distinguishable, and a bad window can't silently become
                # the round's record.
                if big is not None and lg_big_clean is not None and (
                        big["ms_per_eval"] > 1.5 * lg_big_clean["ms_per_eval"]):
                    log(f"big: {big['ms_per_eval']}ms is >1.5x last-good "
                        f"{lg_big_clean['ms_per_eval']}ms; retrying once")
                    big2 = run_big(deadline)
                    if big2 is not None and big2["ms_per_eval"] < big["ms_per_eval"]:
                        big = big2
                    if big["ms_per_eval"] > 1.5 * lg_big_clean["ms_per_eval"]:
                        big = {**big, "degraded": True,
                               "last_good": {k: lg_big_clean[k] for k in
                                             ("frames_per_s", "mfu",
                                              "ms_per_eval")},
                               "error": "live big measurement >1.5x off "
                                        "last-good; backend window suspected"}
                if big is None and lg_big is not None:
                    # preserve an existing stale_from: the measurement's
                    # age is when it was TAKEN, not the last time a
                    # failing run copied it forward
                    big = {**lg_big,
                           "stale_from": lg_big.get("stale_from")
                           or (lg or {}).get("captured_at")}
                if big is not None:
                    result["big"] = big
                # headline round-over-round visibility (VERDICT r4 next #8)
                if lg and lg.get("value"):
                    result["vs_prev"] = round(result["value"] / lg["value"], 3)
                # never let a degraded/stale big poison the last-good record
                to_store = dict(result)
                if big is not None and (big.get("degraded")
                                        or big.get("stale_from")):
                    if lg_big is not None:
                        to_store["big"] = lg_big
                    else:
                        to_store.pop("big", None)
                _write_last_good(to_store)
                print(json.dumps(result), flush=True)
                return
            tail = "\n".join(proc.stderr.splitlines()[-4:])
            last_error = f"rc={proc.returncode}: {tail[-400:]}"
            log(f"attempt={attempt} failed: {last_error}")
        except subprocess.TimeoutExpired as e:
            if e.stderr:
                sys.stderr.write(e.stderr if isinstance(e.stderr, str) else e.stderr.decode())
            if e.stdout:
                out = e.stdout if isinstance(e.stdout, str) else e.stdout.decode()
                partial = parse_tagged(out.splitlines(), "PARTIAL_JSON")
                if partial is not None and (
                    best_partial is None
                    or partial.get("n_rep", 0) >= best_partial.get("n_rep", 0)
                ):
                    best_partial = partial
            last_error = f"timeout after {this_timeout:.0f}s"
            log(f"attempt={attempt} {last_error}")
        if time.time() < deadline:
            time.sleep(min(30.0, max(0.0, deadline - time.time())))

    # Budget exhausted with no clean result: emit degraded JSON, rc=0. A
    # prior round/run's captured measurement rides along as `last_good`
    # (clearly labeled with its capture time — informative, never the value:
    # captured vs attested stays distinguishable).
    last_good = _read_last_good()
    if best_partial is not None:
        best_partial.pop("n_rep", None)
        best_partial["degraded"] = True
        best_partial["error"] = f"backend unhealthy; best partial used ({last_error})"
        if last_good is not None:
            best_partial["last_good"] = last_good
        print(json.dumps(best_partial), flush=True)
    else:
        payload = {
            "metric": "frames/sec/chip, 100-step DDPM, 16 pred frames 64x64 (ngf=64)",
            "value": 0.0,
            "unit": "frames/sec",
            "vs_baseline": 0.0,
            "degraded": True,
            "error": f"TPU backend unhealthy for {budget_s:.0f}s: {last_error}",
        }
        if last_good is not None:
            payload["last_good"] = last_good
        print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    if "--big-worker" in sys.argv:
        big_worker()
    elif "--worker" in sys.argv:
        worker(int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 16)
    else:
        main()
