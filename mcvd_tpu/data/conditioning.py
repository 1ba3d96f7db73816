"""Masked conditioning — the paper's central mechanism.

Reference: runners/ncsn_runner.py:104-147 (`conditioning_fn`). Splits a clip
into pred / past-cond / future-cond frames, folds frames into channels, and
Bernoulli-masks past/future independently (or synchronized). Fully jit-safe
with an explicit PRNG key; mask probabilities are trace-time constants.

Layouts: input clip X is (B, T, H, W, C); outputs are NHWC with frames folded
into the channel axis frame-major — (B, H, W, F*C).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def fold_frames(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, H, W, T*C), frame-major channel order."""
    B, T, H, W, C = x.shape
    return x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, T * C)


def unfold_frames(x: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """(B, H, W, T*C) -> (B, T, H, W, C)."""
    B, H, W, TC = x.shape
    C = TC // n_frames
    return x.reshape(B, H, W, n_frames, C).transpose(0, 3, 1, 2, 4)


def conditioning_fn(
    config,
    X: jnp.ndarray,
    key: Optional[jax.Array] = None,
    num_frames_pred: int = 0,
    prob_mask_cond: float = 0.0,
    prob_mask_future: float = 0.0,
    conditional: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Returns (pred_frames, cond_frames, cond_mask).

    pred_frames: (B, H, W, pred*C); cond_frames: past[+future] folded, or None
    if not conditional; cond_mask: (B,) int32 in {0,1} or None (only produced
    when prob_mask_cond > 0, feeding model.cond_emb).
    """
    B = X.shape[0]
    if not conditional:
        return fold_frames(X), None, None

    cond = config.data.num_frames_cond
    pred = num_frames_pred
    train = config.data.num_frames
    future = getattr(config.data, "num_frames_future", 0)

    pred_frames = fold_frames(X[:, cond : cond + pred])
    cond_frames = fold_frames(X[:, :cond])

    cond_mask = None
    if prob_mask_cond > 0.0:
        key, k1 = jax.random.split(key)
        keep = jax.random.uniform(k1, (B,)) > prob_mask_cond
        cond_frames = keep.astype(cond_frames.dtype)[:, None, None, None] * cond_frames
        cond_mask = keep.astype(jnp.int32)

    if future > 0:
        if prob_mask_future == 1.0:
            future_frames = jnp.zeros(
                (B,) + cond_frames.shape[1:3] + (config.data.channels * future,),
                dtype=cond_frames.dtype,
            )
        else:
            future_frames = fold_frames(X[:, cond + train : cond + train + future])
            if prob_mask_future > 0.0:
                if getattr(config.data, "prob_mask_sync", False):
                    keep_f = cond_mask.astype(bool)
                else:
                    key, k2 = jax.random.split(key)
                    keep_f = jax.random.uniform(k2, (B,)) > prob_mask_future
                future_frames = (
                    keep_f.astype(future_frames.dtype)[:, None, None, None] * future_frames
                )
        cond_frames = jnp.concatenate([cond_frames, future_frames], axis=-1)

    return pred_frames, cond_frames, cond_mask


def get_mode(config):
    """Task-taxonomy switch (reference: ncsn_runner.py:207-227): returns
    (mode_pred, mode_interp, mode_gen) given the masking config."""
    condp = getattr(config.data, "prob_mask_cond", 0.0)
    futrf = getattr(config.data, "num_frames_future", 0)
    futrp = getattr(config.data, "prob_mask_future", 0.0)
    sync = getattr(config.data, "prob_mask_sync", False)
    if not getattr(config.sampling, "ssim", False):
        if getattr(config.sampling, "fvd", False):
            return None, None, "three"
        return None, None, None
    if condp == 0.0 and futrf == 0:
        return "one", None, None                 # prediction
    if condp == 0.0 and futrf > 0 and futrp == 0.0:
        return None, "one", None                 # interpolation
    if condp == 0.0 and futrf > 0 and futrp > 0.0:
        return "two", "one", None                # interp + pred
    if condp > 0.0 and futrf == 0:
        return "one", None, "three"              # pred + gen
    if condp > 0.0 and futrf > 0 and futrp > 0.0 and not sync:
        return "two", "one", "three"             # interp + pred + gen
    if condp > 0.0 and futrf > 0 and futrp > 0.0 and sync:
        return None, "one", "three"              # interp + gen
    return None, None, None
