#!/usr/bin/env python
"""Headline benchmark: frames/sec/chip for 100-step DDPM sampling of 16
predicted 64x64 frames with the flagship smmnist_DDPM_big5-scale model
(ngf=64, 27.9M params), autoregressive 5-frame blocks conditioned on 5 frames
— the protocol of BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline anchor: the reference publishes no throughput (BASELINE.md), so
the A100 anchor is computed analytically from the measured model FLOPs:
  anchor = effective_flops_A100 / flops_per_generated_frame
with A100 TF32 peak 156 TFLOP/s at an (optimistic for torch eager) 40% MFU —
the reference runs fp32/TF32 torch eager with no AMP or compile. Details on
stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    from mcvd_tpu.utils import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from mcvd_tpu import ops

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
    from mcvd_tpu.eval.video_gen import autoregressive_predict, init_noise, make_block_sampler
    from mcvd_tpu.models import get_model

    config = _flagship_config()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
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
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, y, cond)
    params = params["params"]

    # model FLOPs for the analytic A100 anchor (XLA path: pallas kernel flops
    # are invisible to cost_analysis and would understate the anchor)
    fwd = jax.jit(lambda p, x, y, c: model.apply({"params": p}, x, y, c))
    flops_fwd = fwd.lower(params, x, y, cond).compile().cost_analysis()["flops"]

    block_sampler = make_block_sampler(config, model, sched)

    def run(key):
        return autoregressive_predict(
            config, block_sampler, params, key, cond, None, num_frames_pred, 0, sched
        )

    def force(x):
        # block_until_ready does NOT wait on the axon backend; a host
        # transfer of a dependent scalar does.
        return float(jnp.sum(x))

    # compile + warmup
    t0 = time.time()
    force(run(jax.random.PRNGKey(1)))
    print(f"# compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

    # timed runs
    n_rep = 3
    t0 = time.time()
    for i in range(n_rep):
        force(run(jax.random.PRNGKey(2 + i)))
    dt = (time.time() - t0) / n_rep
    frames_per_sec = B * num_frames_pred / dt

    # analytic A100 anchor (reference torch eager, TF32)
    import math

    n_blocks = math.ceil(num_frames_pred / F)
    model_evals = n_blocks * (subsample + 1)  # +1 denoise step
    flops_per_video = model_evals * flops_fwd / B
    a100_flops = 156e12 * 0.40
    anchor_frames_per_sec = num_frames_pred * a100_flops / flops_per_video

    print(
        f"# B={B} blocks={n_blocks} evals={model_evals} "
        f"fwd_flops={flops_fwd/1e12:.2f}T t={dt:.2f}s "
        f"anchor={anchor_frames_per_sec:.1f} f/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "frames/sec/chip, 100-step DDPM, 16 pred frames 64x64 (ngf=64)",
                "value": round(frames_per_sec, 2),
                "unit": "frames/sec",
                "vs_baseline": round(frames_per_sec / anchor_frames_per_sec, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
