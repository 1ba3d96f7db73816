"""Autoregressive blockwise video generation + metric harness.

Reference: runners/ncsn_runner.py:1303-2368 (`video_gen`). The three passes:
  (1) pred-or-interp with full conditioning (prob masks 0);
  (2) pure prediction with future masked (prob_mask_future=1) when the model
      was trained interp+pred;
  (3) unconditional generation (both masks 1), unmasking after the first
      block (cond_mask := 1, ncsn_runner.py:1884-1886).
Each pass runs the reverse-diffusion sampler blockwise with a sliding cond
window (ncsn_runner.py:1501-1539, future-aware variant :1695-1708).

TPU-native structure: ONE jitted block-sampler (static shapes) reused across
blocks/batches/passes; window slides are jnp concats, HBM-resident; metric
math runs on host numpy. LPIPS/FVD are pluggable callables (None -> skipped),
since their pretrained weights are external downloads in the reference too.
"""

from __future__ import annotations

import logging
from math import ceil
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from ..data.conditioning import conditioning_fn, unfold_frames
from ..data.transforms import data_transform, inverse_data_transform
from ..diffusion import samplers as samplers_mod
from ..diffusion.schedules import DiffusionSchedule
from .metrics import video_metrics_batch

logger = logging.getLogger(__name__)


def make_block_sampler(config, model, sched: DiffusionSchedule,
                       ensemble: bool = False):
    """One jitted reverse-diffusion block over (params, key, init, cond,
    cond_mask). Returns folded (B, H, W, F*C).

    With ensemble=True, `params` is a STACKED param tree (each leaf has a
    leading checkpoint axis) and the score-network OUTPUTS are averaged
    across checkpoints inside eps_fn — the reference's fast_ensemble_fid
    semantics (ncsn_runner.py:2624-2626: sum(scorenets[i](x,...))/num_ckpts),
    not an average of final metric scores."""
    version = getattr(config.model, "version", "DDPM").upper()
    sampler = samplers_mod.get_sampler(version)
    sampling = config.sampling
    kwargs = dict(
        final_only=True,
        denoise=getattr(sampling, "denoise", True),
        subsample_steps=getattr(sampling, "subsample", None),
        clip_before=getattr(sampling, "clip_before", True),
        t_min=getattr(sampling, "init_prev_t", -1),
        gamma=getattr(config.model, "gamma", False),
        n_steps_each=getattr(sampling, "n_steps_each", 0),
        step_lr=getattr(sampling, "step_lr", 0.0),
    )
    if version == "SMLD":
        kwargs = {k: v for k, v in kwargs.items()
                  if k in ("final_only", "denoise", "n_steps_each", "step_lr")}
        kwargs["n_steps_each"] = getattr(sampling, "n_steps_each", 200)
        kwargs["step_lr"] = getattr(sampling, "step_lr", 8e-6)

    # sampling.compute_dtype = "bfloat16" runs the score network in bf16
    # (params + activations; +10% on TPU v5e) while the sampler's chain math
    # (x0 clip, posterior mean, noise add) stays fp32 on the scan carry.
    comp = getattr(sampling, "compute_dtype", "float32")
    comp_dtype = jnp.bfloat16 if comp in ("bfloat16", "bf16") else jnp.float32

    def block(params, key, init, cond, cond_mask):
        if comp_dtype != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(comp_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
            cond = None if cond is None else cond.astype(comp_dtype)

        def apply_one(p, x, labels):
            return model.apply({"params": p}, x.astype(comp_dtype), labels,
                               cond, cond_mask, sched=sched, rng=key)

        if ensemble:
            def eps_fn(x, labels):
                eps = jax.vmap(apply_one, in_axes=(0, None, None))(
                    params, x, labels)
                return eps.mean(axis=0)
        else:
            def eps_fn(x, labels):
                return apply_one(params, x, labels)
        return sampler(key, init, eps_fn, sched, **kwargs)[-1]

    return jax.jit(block)


def init_noise(key, config, sched: DiffusionSchedule, shape):
    """Initial reverse-diffusion state (reference: ncsn_runner.py:1465-1477).
    SMLD: data_transform(U[0,1)); DDPM-family: N(0,1) (gamma: centered Gamma)."""
    version = getattr(config.model, "version", "DDPM").upper()
    if version == "SMLD":
        z = jax.random.uniform(key, shape)
        return data_transform(config, z)
    if getattr(config.model, "gamma", False):
        k0, th0 = float(sched.k_cum[0]), float(sched.theta_t[0])
        g = jax.random.gamma(key, k0, shape) * th0
        return g - k0 * th0
    return jax.random.normal(key, shape)


def slide_cond_window(config, cond, gen, future: int, one_frame: bool):
    """Autoregressive cond update (reference: ncsn_runner.py:1530-1539 and
    future-aware :1695-1708). Folded NHWC channel slices."""
    C = config.data.channels
    F = config.data.num_frames
    Fc = config.data.num_frames_cond
    if cond is None:
        return gen
    if future == 0:
        if one_frame:
            return jnp.concatenate([cond[..., C:], gen[..., :C]], axis=-1)
        return jnp.concatenate(
            [cond[..., F * C:], gen[..., C * max(0, F - Fc):]], axis=-1
        )
    if one_frame:
        return jnp.concatenate(
            [cond[..., C: cond.shape[-1] - future * C],
             gen[..., :C],
             cond[..., -future * C:]], axis=-1
        )
    return jnp.concatenate(
        [cond[..., F * C: cond.shape[-1] - future * C],
         gen[..., C * max(0, F - Fc):],
         cond[..., -future * C:]], axis=-1
    )


def autoregressive_predict(config, block_sampler, params, key, cond, cond_mask,
                           num_frames_pred: int, future: int, sched: DiffusionSchedule,
                           unmask_after_first: bool = False):
    """Blockwise generation of num_frames_pred frames; returns folded
    (B, H, W, num_frames_pred*C) in model (transformed) space.

    The reference re-samples init noise only when init_prev_t <= 0 and
    otherwise warm-starts from the previous block (ncsn_runner.py:1513-1515);
    with init_prev_t > 0 the sampler itself re-noises via t_min."""
    C = config.data.channels
    F = config.data.num_frames
    sz = config.data.image_size
    B = cond.shape[0]
    one_frame = getattr(config.sampling, "one_frame_at_a_time", False)
    n_iter = num_frames_pred if one_frame else ceil(num_frames_pred / F)
    shape = (B, sz, sz, C * F)

    preds = []
    gen = None
    for i_frame in range(n_iter):
        key, k_init, k_samp = jax.random.split(key, 3)
        if i_frame == 0 or getattr(config.sampling, "init_prev_t", -1) <= 0:
            init = init_noise(k_init, config, sched, shape)
        else:
            init = gen
        gen = block_sampler(params, k_samp, init, cond, cond_mask)
        preds.append(gen)
        if i_frame == n_iter - 1:
            continue
        cond = slide_cond_window(config, cond, gen, future, one_frame)
        if unmask_after_first and i_frame == 0 and cond_mask is not None:
            cond_mask = jnp.ones_like(cond_mask)
    pred = jnp.concatenate(preds, axis=-1)[..., : C * num_frames_pred]
    return pred


def _metric_stats(values: np.ndarray):
    avg, std = float(values.mean()), float(values.std())
    sem = st.sem(values) if len(values) > 1 else 0.0
    if sem and sem > 0:
        conf95 = avg - float(st.norm.interval(0.95, loc=avg, scale=sem)[0])
    else:
        conf95 = 0.0
    return avg, std, conf95


def frechet_distance(x1: np.ndarray, x2: np.ndarray) -> float:
    """FVD/FID Frechet distance between feature sets (reference:
    models/fvd/fvd.py:275-287)."""
    from scipy.linalg import sqrtm

    x1, x2 = x1.astype(np.float64), x2.astype(np.float64)
    m1, m2 = x1.mean(axis=0), x2.mean(axis=0)
    sigma1 = np.cov(x1, rowvar=False)
    sigma2 = np.cov(x2, rowvar=False)
    cs, _ = sqrtm(sigma1 @ sigma2, disp=False)
    dist = np.sum((m1 - m2) ** 2) + np.trace(sigma1 + sigma2 - 2 * cs.real)
    return float(dist)


def run_video_gen(
    config,
    model,
    params,
    sched: DiffusionSchedule,
    test_loader,
    key: jax.Array,
    *,
    ckpt: int = 0,
    max_data_iter: Optional[int] = None,
    preds_per_test: int = 1,
    train: bool = False,
    lpips_fn: Optional[Callable] = None,
    i3d_embedder: Optional[Callable] = None,
    save_artifacts: Optional[Callable] = None,
    batch_sharding=None,
    block_sampler: Optional[Callable] = None,
) -> Dict:
    """Full 3-pass metric harness. `test_loader` yields raw (B,T,H,W,C)
    batches in [0,1] where each video is repeated preds_per_test times.
    Returns the vid_metrics dict (reference key layout)."""
    data = config.data
    condp = getattr(data, "prob_mask_cond", 0.0)
    future = getattr(data, "num_frames_future", 0)
    futrp = getattr(data, "prob_mask_future", 0.0)
    sync = getattr(data, "prob_mask_sync", False)
    conditional = data.num_frames_cond > 0
    calc_ssim = getattr(config.sampling, "ssim", False)
    calc_fvd = getattr(config.sampling, "fvd", False) and i3d_embedder is not None
    # FVD pass selection (reference: ncsn_runner.py:1313-1340)
    calc_fvd1 = calc_fvd and (condp == 0.0 and future == 0 or condp == 0.0 and future > 0)
    calc_fvd2 = calc_fvd and condp == 0.0 and future > 0 and futrp > 0 and not sync
    calc_fvd3 = calc_fvd and (condp > 0.0)
    is_mnist = data.dataset.upper() in ("STOCHASTICMOVINGMNIST", "MOVINGMNIST")

    # an injected block_sampler overrides the default jit — the runner passes
    # a wrap_block_collective-wrapped one under multi-process (all host-side
    # logic here stays process-local and identical on every process; only the
    # sampler chain is a cross-process SPMD program)
    if block_sampler is None:
        block_sampler = make_block_sampler(config, model, sched)
    max_data_iter = max_data_iter or getattr(config.sampling, "max_data_iter", 1)

    vid = {k: [] for k in ("mse", "ssim", "lpips")}
    vid2 = {k: [] for k in ("mse", "ssim", "lpips")}
    emb = {"real": [], "fake": [], "real2": [], "fake2": [], "real3": [], "fake3": []}
    second_calc = False

    for i, batch in enumerate(test_loader):
        if i >= max_data_iter:
            break
        X = batch[0] if isinstance(batch, tuple) else batch
        X = jnp.asarray(X)
        if batch_sharding is not None:
            # shard the eval batch over the data mesh: the jitted block
            # sampler then runs data-parallel across chips
            X = jax.device_put(X, batch_sharding)
        Xt = data_transform(config, X)
        C = data.channels

        # ---- (1) pred or interp, fully conditioned
        if future == 0:
            num_frames_pred = config.sampling.num_frames_pred
        else:
            num_frames_pred = data.num_frames
        real_f, cond, cond_mask = conditioning_fn(
            config, Xt, key=None, num_frames_pred=num_frames_pred,
            prob_mask_cond=0.0, prob_mask_future=0.0, conditional=conditional,
        )
        real = np.asarray(inverse_data_transform(config, real_f))
        key, k = jax.random.split(key)
        pred_f = autoregressive_predict(
            config, block_sampler, params, k, cond, cond_mask, num_frames_pred,
            future, sched,
        )
        pred = np.asarray(inverse_data_transform(config, pred_f))

        n_pred_frames = min(real.shape[-1] // C, pred.shape[-1] // C)
        if real.shape[-1] < pred.shape[-1]:
            logger.warning("predicting beyond training data range; metrics zeroed")
            for _ in range(len(pred)):
                vid["mse"].append(0.0); vid["ssim"].append(0.0); vid["lpips"].append(0.0)
        else:
            r5 = np.asarray(unfold_frames(jnp.asarray(real), real.shape[-1] // C))
            p5 = np.asarray(unfold_frames(jnp.asarray(pred), pred.shape[-1] // C))
            m = video_metrics_batch(r5[:, :n_pred_frames], p5[:, :n_pred_frames],
                                    is_mnist=is_mnist, calc_ssim=calc_ssim)
            vid["mse"] += m["mse"]; vid["ssim"] += m["ssim"]
            if lpips_fn is not None:
                vid["lpips"] += list(lpips_fn(r5[:, :n_pred_frames], p5[:, :n_pred_frames]))
            else:
                vid["lpips"] += [0.0] * len(m["mse"])

        if calc_fvd1:
            cond_np = np.asarray(inverse_data_transform(config, cond))
            emb["real"].append(i3d_embedder(_with_cond(config, cond_np, real, future)))
            emb["fake"].append(i3d_embedder(_with_cond(config, cond_np, pred, future)))

        # ---- (2) pure prediction when pass 1 was interpolation
        if future > 0 and futrp > 0.0 and not sync:
            second_calc = True
            num_frames_pred2 = config.sampling.num_frames_pred
            real2_f, cond2, cond_mask2 = conditioning_fn(
                config, Xt, key=None, num_frames_pred=num_frames_pred2,
                prob_mask_cond=0.0, prob_mask_future=1.0, conditional=conditional,
            )
            real2 = np.asarray(inverse_data_transform(config, real2_f))
            key, k = jax.random.split(key)
            pred2_f = autoregressive_predict(
                config, block_sampler, params, k, cond2, cond_mask2,
                num_frames_pred2, future, sched,
            )
            pred2 = np.asarray(inverse_data_transform(config, pred2_f))
            n2 = min(real2.shape[-1] // C, pred2.shape[-1] // C)
            r5 = np.asarray(unfold_frames(jnp.asarray(real2), real2.shape[-1] // C))
            p5 = np.asarray(unfold_frames(jnp.asarray(pred2), pred2.shape[-1] // C))
            m = video_metrics_batch(r5[:, :n2], p5[:, :n2], is_mnist=is_mnist,
                                    calc_ssim=calc_ssim)
            vid2["mse"] += m["mse"]; vid2["ssim"] += m["ssim"]
            if lpips_fn is not None:
                vid2["lpips"] += list(lpips_fn(r5[:, :n2], p5[:, :n2]))
            else:
                vid2["lpips"] += [0.0] * len(m["mse"])
            if calc_fvd2:
                cond2_np = np.asarray(inverse_data_transform(config, cond2))
                emb["real2"].append(i3d_embedder(_with_cond(config, cond2_np, real2, future)))
                emb["fake2"].append(i3d_embedder(_with_cond(config, cond2_np, pred2, future)))

        # ---- (3) unconditional generation (FVD only)
        if calc_fvd3:
            nfp3 = data.num_frames_cond + config.sampling.num_frames_pred
            _, cond3, cond_mask3 = conditioning_fn(
                config, Xt, key=jax.random.PRNGKey(0), num_frames_pred=nfp3,
                prob_mask_cond=1.0, prob_mask_future=1.0, conditional=conditional,
            )
            key, k = jax.random.split(key)
            pred3_f = autoregressive_predict(
                config, block_sampler, params, k, cond3, cond_mask3, nfp3, future,
                sched, unmask_after_first=True,
            )
            pred3 = np.asarray(inverse_data_transform(config, pred3_f))
            realX = np.asarray(X)  # raw [0,1]
            T3 = min(realX.shape[1], pred3.shape[-1] // C)
            p53 = np.asarray(unfold_frames(jnp.asarray(pred3), pred3.shape[-1] // C))
            emb["real3"].append(i3d_embedder(realX[:, :T3]))
            emb["fake3"].append(i3d_embedder(p53[:, :T3]))

        if save_artifacts is not None and i == 0:
            # first-batch artifacts for every executed pass (reference dumps
            # all three passes' grids/gifs, ncsn_runner.py:1984-2190)
            save_artifacts(
                real=real, pred=pred,
                cond=np.asarray(inverse_data_transform(config, cond)) if cond is not None else None,
            )
            if second_calc:
                save_artifacts(
                    real=real2, pred=pred2,
                    cond=np.asarray(inverse_data_transform(config, cond2)) if cond2 is not None else None,
                    tag="pass2",
                )
            if calc_fvd3:
                save_artifacts(real=None, pred=pred3, cond=None, tag="gen")

    # ---- aggregate: best-of-preds_per_test (reference: ncsn_runner.py:2196-2229)
    mse_arr = np.asarray(vid["mse"])
    if len(mse_arr) == 0:
        raise ValueError(
            "run_video_gen consumed zero batches — the loader was empty "
            "(e.g. sampling.batch_size > len(test_ds)*preds_per_test with "
            "drop_last); shrink sampling.batch_size or grow the test split")
    mse_list = mse_arr.reshape(-1, preds_per_test).min(-1)
    psnr_list = (10 * np.log10(1 / np.maximum(mse_arr, 1e-20))).reshape(-1, preds_per_test).max(-1)
    ssim_list = np.asarray(vid["ssim"]).reshape(-1, preds_per_test).max(-1)
    lpips_list = np.asarray(vid["lpips"]).reshape(-1, preds_per_test).min(-1)

    vm = {"ckpt": ckpt, "preds_per_test": preds_per_test}
    for name, arr in (("mse", mse_list), ("psnr", psnr_list), ("ssim", ssim_list),
                      ("lpips", lpips_list)):
        avg, std, conf = _metric_stats(arr)
        vm[name], vm[f"{name}_std"], vm[f"{name}_conf95"] = avg, std, conf

    def fvd_stuff(fake, real_):
        avg_fvd = frechet_distance(fake, real_)
        if preds_per_test > 1:
            fvds = [
                frechet_distance(fake[t::preds_per_test], real_)
                for t in range(preds_per_test)
            ]
            mean, stdv = float(np.mean(fvds)), float(np.std(fvds))
            sem = st.sem(fvds)
            conf = mean - float(st.norm.interval(0.95, loc=mean, scale=sem)[0]) if sem > 0 else 0.0
            return avg_fvd, mean, stdv, conf
        return avg_fvd, -1, -1, -1

    if calc_fvd1 and emb["real"]:
        a, m_, s_, c_ = fvd_stuff(np.concatenate(emb["fake"]), np.concatenate(emb["real"]))
        vm.update({"fvd": a, "fvd_traj_mean": m_, "fvd_traj_std": s_, "fvd_traj_conf95": c_})

    if second_calc:
        mse2 = np.asarray(vid2["mse"])
        m2 = mse2.reshape(-1, preds_per_test).min(-1)
        p2 = (10 * np.log10(1 / np.maximum(mse2, 1e-20))).reshape(-1, preds_per_test).max(-1)
        s2 = np.asarray(vid2["ssim"]).reshape(-1, preds_per_test).max(-1)
        l2 = np.asarray(vid2["lpips"]).reshape(-1, preds_per_test).min(-1)
        for name, arr in (("mse2", m2), ("psnr2", p2), ("ssim2", s2), ("lpips2", l2)):
            avg, std, conf = _metric_stats(arr)
            vm[name], vm[f"{name}_std"], vm[f"{name}_conf95"] = avg, std, conf
        if calc_fvd2 and emb["real2"]:
            a, m_, s_, c_ = fvd_stuff(np.concatenate(emb["fake2"]), np.concatenate(emb["real2"]))
            vm.update({"fvd2": a, "fvd2_traj_mean": m_, "fvd2_traj_std": s_,
                       "fvd2_traj_conf95": c_})

    if calc_fvd3 and emb["real3"]:
        a, m_, s_, c_ = fvd_stuff(np.concatenate(emb["fake3"]), np.concatenate(emb["real3"]))
        vm.update({"fvd3": a, "fvd3_traj_mean": m_, "fvd3_traj_std": s_,
                   "fvd3_traj_conf95": c_})

    return vm


def _with_cond(config, cond: np.ndarray, pred: np.ndarray, future: int) -> np.ndarray:
    """Prepend past-cond frames to the prediction for FVD embedding
    (the reference embeds cond+pred; ncsn_runner.py:1918-1940). Returns
    (B, T, H, W, C) in [0,1]."""
    C = config.data.channels
    if future > 0:
        cond = cond[..., : cond.shape[-1] - future * C]
    full = np.concatenate([cond, pred], axis=-1)
    B, H, W, TC = full.shape
    return full.reshape(B, H, W, TC // C, C).transpose(0, 3, 1, 2, 4)
