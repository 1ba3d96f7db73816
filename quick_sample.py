#!/usr/bin/env python
"""Quick sampling from a checkpoint (reference: quick_sample.py:41-130):
load model + config next to the checkpoint, condition on dataset frames,
sample one block, save arrays.

    python quick_sample.py --ckpt_path EXP/logs/checkpoint --data_path DATA \\
        [--out samples.npz] [--subsample 100]
"""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", required=True)
    p.add_argument("--data_path", default="datasets")
    p.add_argument("--out", default="quick_samples.npz")
    p.add_argument("--subsample", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from mcvd_tpu.utils import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from load_model_from_ckpt import get_sampler, init_samples, load_model
    from mcvd_tpu.data import DataLoader, conditioning_fn, data_transform, get_dataset
    from mcvd_tpu.data.transforms import inverse_data_transform

    model, params, config, sched = load_model(args.ckpt_path)
    if args.subsample:
        config.sampling.subsample = args.subsample
    config.sampling.batch_size = args.batch_size

    _, test_ds = get_dataset(args.data_path, config,
                             video_frames_pred=config.data.num_frames)
    loader = DataLoader(test_ds, batch_size=args.batch_size, shuffle=False)
    X, _ = next(iter(loader))
    Xt = data_transform(config, jnp.asarray(X))
    real, cond, cond_mask = conditioning_fn(
        config, Xt, key=jax.random.PRNGKey(args.seed),
        num_frames_pred=config.data.num_frames,
        conditional=config.data.num_frames_cond > 0,
    )

    key = jax.random.PRNGKey(args.seed)
    init = init_samples(key, config)[: args.batch_size]
    sample = get_sampler(config, model, params, sched)
    gen = sample(key, init, cond, cond_mask)

    np.savez(
        args.out,
        samples=np.asarray(gen),
        real=np.asarray(inverse_data_transform(config, real)),
        cond=np.asarray(inverse_data_transform(config, cond)) if cond is not None else None,
    )
    print(f"wrote {args.out}: samples {np.asarray(gen).shape}")


if __name__ == "__main__":
    main()
