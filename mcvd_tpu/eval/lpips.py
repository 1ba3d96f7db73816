"""LPIPS (net-lin, alex) in flax.

Reference stack: models/eval_models.py PerceptualLoss -> models/dist_model.py
-> models/networks_basic.py PNetLin (scaling layer, AlexNet feature slices,
unit-normalize per channel-vector, squared diffs, 1x1 'lin' heads, spatial
average, sum over layers). Weights are external (torchvision alexnet + the
reference's lin heads, models/weights/v0.1/alex.pth) — pass their paths; the
math is equivalence-tested against a torch oracle with random weights.

Inputs follow the reference protocol (ncsn_runner.py:1427-1431): frames
resized to 128, RGB in [-1, 1]; NHWC here.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ImageNet-derived scaling constants (reference: networks_basic.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision AlexNet feature config: (out_ch, kernel, stride, pad)
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_CHNS = [64, 192, 384, 256, 256]


class AlexFeatures(nn.Module):
    """The 5 relu slices of torchvision AlexNet.features."""

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3)
        feats = []
        for i, (ch, k, s, p) in enumerate(_ALEX_CONVS):
            x = nn.Conv(ch, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                        name=f"conv{i}")(x)
            x = nn.relu(x)
            feats.append(x)
            if i in (0, 1):  # maxpool after relu1 and relu2
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return feats


class LPIPSAlex(nn.Module):
    """PNetLin(pnet_type='alex', lpips=True, spatial=False, version='0.1')."""

    @nn.compact
    def __call__(self, in0, in1):  # NHWC in [-1, 1]
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        net = AlexFeatures(name="net")
        f0 = net((in0 - shift) / scale)
        f1 = net((in1 - shift) / scale)

        val = 0.0
        for kk in range(len(_CHNS)):
            a = _unit_normalize(f0[kk])
            b = _unit_normalize(f1[kk])
            diff = (a - b) ** 2
            w = self.param(f"lin{kk}", nn.initializers.ones, (_CHNS[kk],))
            # 1x1 conv with a single output channel == channel-weighted sum
            res = jnp.sum(diff * w, axis=-1, keepdims=True)
            val = val + res.mean(axis=(1, 2), keepdims=True)
        return val[:, 0, 0, 0]  # (B,)


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


def convert_lpips_weights(alexnet_sd, lin_sd):
    """Build the LPIPSAlex param tree from torch state dicts.

    alexnet_sd: torchvision alexnet (or its .features) state dict;
    lin_sd: the reference lin heads (models/weights/v0.1/alex.pth), keys
    lin{k}.model.1.weight of shape (1, C, 1, 1)."""
    def np_(v):
        try:
            return v.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(v)

    feature_idx = [0, 3, 6, 8, 10]  # conv indices within alexnet.features
    params = {"net": {}}
    for i, fi in enumerate(feature_idx):
        for prefix in (f"features.{fi}", str(fi)):
            wkey, bkey = f"{prefix}.weight", f"{prefix}.bias"
            if wkey in alexnet_sd:
                params["net"][f"conv{i}"] = {
                    "kernel": np_(alexnet_sd[wkey]).transpose(2, 3, 1, 0),
                    "bias": np_(alexnet_sd[bkey]),
                }
                break
        else:
            raise KeyError(f"alexnet conv {fi} not found")
    for kk in range(5):
        w = np_(lin_sd[f"lin{kk}.model.1.weight"])
        params[f"lin{kk}"] = w.reshape(-1)
    return params


def make_lpips_fn(lin_weights_path: str,
                  alexnet_weights_path: Optional[str] = None) -> Callable:
    """Returns lpips(real, pred) -> per-video mean LPIPS list.

    real/pred: (B, T, H, W, C) numpy in [0,1]. Frames are resized to 128
    (bilinear) and mapped to [-1,1] per the reference protocol."""
    import torch

    lin_sd = torch.load(lin_weights_path, map_location="cpu", weights_only=False)
    if alexnet_weights_path is None:
        raise ValueError("LPIPS needs torchvision alexnet weights (no egress here)")
    alex_sd = torch.load(alexnet_weights_path, map_location="cpu", weights_only=False)
    if hasattr(alex_sd, "state_dict"):
        alex_sd = alex_sd.state_dict()
    params = convert_lpips_weights(alex_sd, lin_sd)
    model = LPIPSAlex()

    @jax.jit
    def _dist(a, b):
        return model.apply({"params": params}, a, b)

    def lpips(real: np.ndarray, pred: np.ndarray):
        B, T = real.shape[:2]
        def prep(v):
            x = jnp.asarray(v.reshape(B * T, *v.shape[2:]))
            if x.shape[-1] == 1:
                x = jnp.tile(x, (1, 1, 1, 3))
            x = jax.image.resize(x, (x.shape[0], 128, 128, 3), "bilinear")
            return x * 2.0 - 1.0
        d = _dist(prep(real), prep(pred))
        d = np.asarray(d).reshape(B, T)
        return d.mean(axis=1).tolist()

    return lpips
