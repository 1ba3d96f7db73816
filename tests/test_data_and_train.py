"""Conditioning semantics, data pipeline, and the pjit train step on the
8-device virtual mesh (the reference's 'multi-GPU without a cluster' analog,
SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcvd_tpu.config import dict2namespace
from mcvd_tpu.data import (
    DataLoader,
    StochasticMovingMNIST,
    conditioning_fn,
    data_transform,
    fold_frames,
    get_mode,
    inverse_data_transform,
    unfold_frames,
)
from mcvd_tpu.diffusion import make_schedule
from mcvd_tpu.models import get_model
from mcvd_tpu.parallel import make_mesh, data_sharding, replicated_sharding
from mcvd_tpu.train import create_train_state, make_train_step, make_eval_loss_step, checkpoints


def make_config(**kw):
    d = {
        "data": {
            "channels": 1, "image_size": 16, "num_frames": 2, "num_frames_cond": 2,
            "num_frames_future": kw.get("future", 0), "logit_transform": False,
            "rescaled": True, "prob_mask_cond": kw.get("pmc", 0.0),
            "prob_mask_future": kw.get("pmf", 0.0), "prob_mask_sync": kw.get("sync", False),
            "dataset": "StochasticMovingMNIST", "step_length": 0.1, "random_flip": True,
            "num_digits": 2, "num_workers": 0,
        },
        "model": {
            "arch": "unetmore", "version": "DDPM", "spade": False,
            "cond_emb": kw.get("cond_emb", False), "time_conditional": True,
            "dropout": 0.1, "sigma_dist": "linear", "sigma_begin": 0.02,
            "sigma_end": 0.0001, "num_classes": 20, "ngf": 16, "ch_mult": [1, 2],
            "num_res_blocks": 1, "attn_resolutions": [8], "n_head_channels": 8,
            "conditional": True, "noise_in_cond": False, "output_all_frames": False,
            "gamma": False, "ema": True, "ema_rate": 0.9,
        },
        "training": {"L1": False, "batch_size": 16, "n_epochs": 1, "n_iters": 3,
                     "snapshot_freq": 100, "log_freq": 1},
        "sampling": {"ssim": True, "fvd": False, "subsample": 5, "num_frames_pred": 4,
                     "preds_per_test": 1, "clip_before": True},
        "optim": {"weight_decay": 0.0, "optimizer": "Adam", "lr": 1e-3, "warmup": 2,
                  "beta1": 0.9, "amsgrad": False, "eps": 1e-8, "grad_clip": 1.0},
    }
    return dict2namespace(d)


def test_fold_unfold_roundtrip():
    X = np.random.RandomState(0).randn(2, 4, 8, 8, 3).astype(np.float32)
    folded = fold_frames(jnp.asarray(X))
    assert folded.shape == (2, 8, 8, 12)
    back = unfold_frames(folded, 4)
    np.testing.assert_allclose(np.asarray(back), X)
    # frame-major ordering: frame f lives at channels [f*C:(f+1)*C]
    np.testing.assert_allclose(np.asarray(folded[..., 3:6]), X[:, 1].transpose(0, 2, 3, 1) if False else X[:, 1])


def test_conditioning_shapes_and_masks():
    config = make_config(pmc=1.0, future=1, pmf=1.0)
    X = jnp.asarray(np.random.RandomState(0).rand(4, 5, 16, 16, 1).astype(np.float32))
    pred, cond, cond_mask = conditioning_fn(
        config, X, key=jax.random.PRNGKey(0), num_frames_pred=2,
        prob_mask_cond=1.0, prob_mask_future=1.0,
    )
    assert pred.shape == (4, 16, 16, 2)
    assert cond.shape == (4, 16, 16, 3)  # 2 past + 1 future
    # prob 1.0 -> all masked to zero
    assert float(jnp.abs(cond).max()) == 0.0
    assert cond_mask.shape == (4,) and int(cond_mask.sum()) == 0

    # prob 0: nothing masked, no mask returned
    pred, cond, cond_mask = conditioning_fn(
        config, X, key=jax.random.PRNGKey(0), num_frames_pred=2,
        prob_mask_cond=0.0, prob_mask_future=0.0,
    )
    assert cond_mask is None
    np.testing.assert_allclose(np.asarray(cond[..., :2]), np.asarray(fold_frames(X[:, :2])))
    np.testing.assert_allclose(np.asarray(cond[..., 2:]), np.asarray(fold_frames(X[:, 4:5])))
    np.testing.assert_allclose(np.asarray(pred), np.asarray(fold_frames(X[:, 2:4])))


def test_get_mode_taxonomy():
    # (condp, futrf, futrp, sync) -> (pred, interp, gen); reference ncsn_runner.py:207-227
    cases = [
        (dict(), ("one", None, None)),
        (dict(future=2), (None, "one", None)),
        (dict(future=2, pmf=0.5), ("two", "one", None)),
        (dict(pmc=0.5), ("one", None, "three")),
        (dict(pmc=0.5, future=2, pmf=0.5), ("two", "one", "three")),
        (dict(pmc=0.5, future=2, pmf=0.5, sync=True), (None, "one", "three")),
    ]
    for kw, expected in cases:
        assert get_mode(make_config(**kw)) == expected, kw


def test_transforms_roundtrip():
    config = make_config()
    X = jnp.asarray(np.random.RandomState(0).rand(2, 3, 4, 4, 1).astype(np.float32))
    Y = data_transform(config, X)
    assert float(Y.min()) >= -1.0 and float(Y.max()) <= 1.0
    back = inverse_data_transform(config, Y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(X), atol=1e-6)


def test_smmnist_and_loader():
    ds = StochasticMovingMNIST("/nonexistent", train=True, seq_len=5, num_digits=2,
                               image_size=64, total_videos=16, synthetic_ok=True)
    x, _ = ds[0]
    assert x.shape == (5, 64, 64, 1)
    assert x.min() >= 0.0 and x.max() <= 1.0
    # determinism per (seed, epoch, index)
    x2, _ = ds[0]
    np.testing.assert_allclose(x, x2)
    ds.set_epoch(1)
    x3, _ = ds[0]
    assert np.abs(x3 - x).max() > 0  # different epoch -> different sample

    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == (len(ds) + 3) // 4
    xb, yb = batches[0]
    assert xb.shape == (4, 5, 64, 64, 1)


@pytest.mark.heavy
def test_train_step_on_mesh():
    config = make_config()
    mesh = make_mesh(axis_names=("data",))
    assert mesh.devices.size == 8
    model = get_model(config)
    sched = make_schedule(config)

    B, T = 16, 4  # cond 2 + pred 2
    X = np.random.RandomState(0).rand(B, T, 16, 16, 1).astype(np.float32)
    x0 = jnp.zeros((B, 16, 16, 2))
    cond0 = jnp.zeros((B, 16, 16, 2))
    y0 = jnp.zeros((B,), jnp.int32)
    state = create_train_state(config, model, (x0, y0, cond0), jax.random.PRNGKey(0))

    step = make_train_step(model, sched, config, mesh=mesh, donate=False)
    Xd = jax.device_put(jnp.asarray(X), data_sharding(mesh))
    state1, m1 = step(state, Xd, jax.random.PRNGKey(1))
    state2, m2 = step(state1, Xd, jax.random.PRNGKey(2))
    assert int(state2.step) == 2
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["grad_norm"]))
    # EMA moved toward params
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    e2 = jax.tree_util.tree_leaves(state2.ema_params)[0]
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    assert float(jnp.abs(e2 - p2).max()) > 0  # not equal to params
    assert float(jnp.abs(e2 - p0).max()) > 0  # moved from init

    # eval loss runs on ema params
    eval_step = make_eval_loss_step(model, sched, config, mesh=mesh)
    val = eval_step(state2.ema_params, Xd, jax.random.PRNGKey(3))
    assert np.isfinite(float(val))


@pytest.mark.heavy
def test_train_step_bf16_compute():
    """training.compute_dtype=bfloat16: step runs, loss tracks the fp32 loss
    on identical data/keys (bf16 noise tolerance), grads stay finite, and
    master params remain fp32."""
    config = make_config()
    config.optim.warmup = 0  # warmup lr=0 would zero the first update
    model = get_model(config)
    sched = make_schedule(config)

    B, T = 8, 4
    X = jnp.asarray(np.random.RandomState(1).rand(B, T, 16, 16, 1).astype(np.float32))
    x0 = jnp.zeros((B, 16, 16, 2))
    cond0 = jnp.zeros((B, 16, 16, 2))
    y0 = jnp.zeros((B,), jnp.int32)
    state = create_train_state(config, model, (x0, y0, cond0), jax.random.PRNGKey(0))

    step32 = make_train_step(model, sched, config, donate=False)
    s32, m32 = step32(state, X, jax.random.PRNGKey(5))

    config.training.compute_dtype = "bfloat16"
    step16 = make_train_step(model, sched, config, donate=False)
    s16, m16 = step16(state, X, jax.random.PRNGKey(5))

    l32, l16 = float(m32["loss"]), float(m16["loss"])
    assert np.isfinite(l16) and np.isfinite(float(m16["grad_norm"]))
    assert abs(l16 - l32) / max(abs(l32), 1.0) < 0.05, (l16, l32)
    # master params stay fp32 after the update
    for leaf in jax.tree_util.tree_leaves(s16.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    # the two updates move params in a consistent direction
    d32 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a, b: b - a, state.params, s32.params))
    d16 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a, b: b - a, state.params, s16.params))
    num = sum(float(jnp.vdot(a, b)) for a, b in zip(d32, d16))
    den = np.sqrt(sum(float(jnp.vdot(a, a)) for a in d32)) * np.sqrt(
        sum(float(jnp.vdot(b, b)) for b in d16))
    assert num / den > 0.9, num / den  # update cosine similarity


@pytest.mark.heavy
def test_train_chunk_matches_per_step():
    """make_train_chunk(K): one lax.scan dispatch == K make_train_step calls
    with the same split keys; the tail chunk (n_active < K) no-ops trailing
    slots exactly and NaNs their metrics."""
    from mcvd_tpu.train import make_train_chunk

    config = make_config()
    config.optim.warmup = 0
    model = get_model(config)
    sched = make_schedule(config)

    B, T, K = 4, 4, 3
    Xs = jnp.asarray(np.random.RandomState(2).rand(K, B, T, 16, 16, 1).astype(np.float32))
    x0 = jnp.zeros((B, 16, 16, 2))
    cond0 = jnp.zeros((B, 16, 16, 2))
    y0 = jnp.zeros((B,), jnp.int32)
    state0 = create_train_state(config, model, (x0, y0, cond0), jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(7)
    chunk_fn = make_train_chunk(model, sched, config, K)
    sc, mc = chunk_fn(state0, Xs, key, jnp.int32(K))

    step_fn = make_train_step(model, sched, config, donate=False)
    keys = jax.random.split(key, K)
    s = state0
    losses = []
    for i in range(K):
        s, m = step_fn(s, Xs[i], keys[i])
        losses.append(float(m["loss"]))
    assert int(sc.step) == int(s.step) == K
    np.testing.assert_allclose(np.asarray(mc["loss"]), np.asarray(losses),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(sc.params),
                    jax.tree_util.tree_leaves(s.params)):
        # scan-vs-unrolled compile reassociation: ~3e-6 over 3 Adam steps
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    # tail: only 2 of 3 slots active
    st, mt = chunk_fn(state0, Xs, key, jnp.int32(2))
    assert int(st.step) == 2
    np.testing.assert_allclose(np.asarray(mt["loss"][:2]),
                               np.asarray(losses[:2]), rtol=1e-5)
    assert np.isnan(float(mt["loss"][2]))


def test_update_best_skips_nan():
    from mcvd_tpu.runners import meters as meters_mod

    m = meters_mod.init_meters()
    best = meters_mod.update_best(m, {"fvd": float("nan"), "ssim": 0.5}, 10)
    assert "fvd" not in best and best["ssim"]["value"] == 0.5
    best = meters_mod.update_best(m, {"fvd": 12.0, "ssim": 0.6}, 20)
    assert best["fvd"]["value"] == 12.0 and best["ssim"]["value"] == 0.6
    # a later NaN never displaces a real best
    best = meters_mod.update_best(m, {"fvd": float("nan")}, 30)
    assert best["fvd"]["value"] == 12.0


def test_loader_oversize_batch_with_drop_last_raises():
    ds = StochasticMovingMNIST("/nonexistent", train=False, seq_len=4,
                               num_digits=1, image_size=64, total_videos=8,
                               synthetic_ok=True)
    with pytest.raises(ValueError, match="drop_last"):
        DataLoader(ds, batch_size=16, shuffle=False, drop_last=True,
                   repeat=True)
    # without drop_last a short final batch is fine
    loader = DataLoader(ds, batch_size=16, shuffle=False, drop_last=False)
    xb, _ = next(iter(loader))
    assert xb.shape[0] == 8


@pytest.mark.heavy
def test_uint8_wire_roundtrip_lossless():
    """wire_dtype=uint8: k/255 f32 values survive the host wire cast exactly,
    and the train loss on uint8 wire equals the f32 loss bit-for-bit for
    uint8-sourced data (KTH/BAIR h5 store uint8 frames)."""
    from mcvd_tpu.data.loader import prefetch_to_device
    from mcvd_tpu.train.step import _loss_for_batch

    rng = np.random.RandomState(0)
    x = (rng.randint(0, 256, (2, 3, 8, 8, 1)) / 255.0).astype(np.float32)
    it = prefetch_to_device(iter([(x, None)]), wire_dtype=np.uint8)
    xw, _ = next(it)
    assert xw.dtype == np.uint8
    np.testing.assert_array_equal(xw, np.rint(x * 255).astype(np.uint8))

    config = make_config()
    model = get_model(config)
    sched = make_schedule(config)
    B, T = 4, 4
    Xf = jnp.asarray((np.random.RandomState(3).randint(0, 256, (B, T, 16, 16, 1))
                      / 255.0).astype(np.float32))
    Xu = jnp.asarray(np.rint(np.asarray(Xf) * 255).astype(np.uint8))
    x0 = jnp.zeros((B, 16, 16, 2))
    cond0 = jnp.zeros((B, 16, 16, 2))
    y0 = jnp.zeros((B,), jnp.int32)
    state = create_train_state(config, model, (x0, y0, cond0), jax.random.PRNGKey(0))
    lf = float(_loss_for_batch(model, sched, config, state.params, Xf,
                               jax.random.PRNGKey(4), True))
    lu = float(_loss_for_batch(model, sched, config, state.params, Xu,
                               jax.random.PRNGKey(4), True))
    assert lf == lu, (lf, lu)


def test_checkpoint_roundtrip(tmp_path):
    config = make_config()
    model = get_model(config)
    x0 = jnp.zeros((2, 16, 16, 2)); cond0 = jnp.zeros((2, 16, 16, 2))
    y0 = jnp.zeros((2,), jnp.int32)
    state = create_train_state(config, model, (x0, y0, cond0), jax.random.PRNGKey(0))
    path = checkpoints.save_checkpoint(str(tmp_path), state)
    restored = checkpoints.load_checkpoint(str(tmp_path), target=state)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 0


def test_loader_per_host_shards_disjoint_and_complete():
    """2-process sharding: each host sees a disjoint slice; union covers the
    dataset (SURVEY §2.5 TPU plan: host data loading sharded per process)."""
    from mcvd_tpu.data.loader import DataLoader

    class Idx:
        def __len__(self):
            return 37

        def __getitem__(self, i):
            return np.full((2, 2), i, np.float32), i

    seen = []
    for pi in (0, 1):
        dl = DataLoader(Idx(), batch_size=4, shuffle=True, seed=7,
                        num_processes=2, process_index=pi)
        ids = []
        for xs, ys in iter(dl):
            ids += [int(y) for y in np.atleast_1d(ys)]
        seen.append(set(ids))
    assert seen[0].isdisjoint(seen[1])
    assert seen[0] | seen[1] == set(range(37))


def test_loader_num_workers_matches_serial():
    """Thread-pool batch assembly yields identical batches in identical
    order (deterministic shuffle, ordered pool.map)."""
    from mcvd_tpu.data.loader import DataLoader

    class Sq:
        def __len__(self):
            return 19

        def __getitem__(self, i):
            return np.full((3,), i * i, np.float32), i

    a = [b for b in iter(DataLoader(Sq(), batch_size=5, shuffle=True, seed=3))]
    b = [b for b in iter(DataLoader(Sq(), batch_size=5, shuffle=True, seed=3,
                                    num_workers=4))]
    assert len(a) == len(b)
    for (xa, ya), (xb, yb) in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)


@pytest.mark.heavy
def test_train_step_rng_impl():
    """training.rng_impl: the default 'rbg' (TPU-fast RngBitGenerator; see
    train/step.py:_as_impl_key) and the backend-invariant 'threefry' both
    produce finite losses and learning updates; streams differ by impl."""
    from mcvd_tpu.train.step import _as_impl_key

    config = make_config()
    key = jax.random.PRNGKey(7)
    # threefry passthrough is the identity on the incoming key
    config.training.rng_impl = "threefry"
    assert _as_impl_key(key, config) is key

    losses = {}
    for impl in ("rbg", "threefry"):
        config = make_config()
        config.training.rng_impl = impl
        model = get_model(config)
        sched = make_schedule(config)
        B, sz = 4, config.data.image_size
        F, Fc = config.data.num_frames, config.data.num_frames_cond
        x0 = jnp.zeros((B, sz, sz, F))
        cond0 = jnp.zeros((B, sz, sz, Fc))
        y0 = jnp.zeros((B,), jnp.int32)
        state = create_train_state(config, model, (x0, y0, cond0),
                                   jax.random.PRNGKey(0))
        step = make_train_step(model, sched, config)
        X = jnp.asarray(np.random.RandomState(0).rand(B, F + Fc, sz, sz, 1),
                        jnp.float32)
        state, m = step(state, X, key)
        losses[impl] = float(m["loss"])
        assert np.isfinite(losses[impl]) and losses[impl] > 0
    # different PRNG impls draw different noise -> different loss values
    assert losses["rbg"] != losses["threefry"]
