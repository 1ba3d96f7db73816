"""TPU-native I3D (Inception-v1 3D) feature extractor in flax.

The reference computes FVD features with a TorchScript I3D run on GPU/CPU
(models/fvd/fvd.py:30-49); its in-repo architecture spec is
models/fvd/pytorch_i3d.py:135 (InceptionI3d). This is a from-scratch flax
port of that architecture (NDHWC layout, TF-"same" dynamic padding resolved
at trace time, BatchNorm folded into the convs at weight-conversion time so
inference is a pure conv/relu pipeline XLA can fuse), plus a converter from
torch state dicts — including state dicts extracted directly from a
TorchScript archive (`torch.jit.load(...).state_dict()`), which is how the
reference's downloaded `i3d_torchscript.pt` becomes JAX-runnable without any
torch compute at eval time.

Two weight schemas are accepted:
  * the full InceptionI3d naming scheme (`Conv3d_1a_7x7.conv3d.weight`, ...,
    `logits.conv3d.weight`) as produced by pytorch_i3d.py /
    convert_tf_pretrained.py;
  * a minimal `conv.weight`/`head.weight` TorchScript embedder (conv3d ->
    global mean -> linear), the schema of the small stand-in weight files
    shipped with some eval environments.
Both yield a jit-compiled JAX embedder with the identical preprocessing
protocol (shortest side bilinear-resized to 224, center crop, [-1,1];
reference: models/fvd/fvd.py:160-186).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _same_pad(size: int, k: int, s: int) -> Tuple[int, int]:
    """TF-'same' padding as computed dynamically by the reference
    (pytorch_i3d.py:72-77); static under jit since shapes are static."""
    if size % s == 0:
        pad = max(k - s, 0)
    else:
        pad = max(k - (size % s), 0)
    return (pad // 2, pad - pad // 2)


def _pad_same_3d(x, kernel, stride):
    pads = [
        _same_pad(x.shape[1 + i], kernel[i], stride[i]) for i in range(3)
    ]
    return jnp.pad(x, ((0, 0), pads[0], pads[1], pads[2], (0, 0)))


class Unit3D(nn.Module):
    """Conv3d + (folded) BatchNorm + ReLU (pytorch_i3d.py:37-103).

    BatchNorm is folded into the conv kernel/bias by the converter, so the
    module itself is pad -> conv -> [relu].
    """

    out_ch: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    act: bool = True

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        x = _pad_same_3d(x, self.kernel, self.stride)
        x = nn.Conv(self.out_ch, tuple(self.kernel), strides=tuple(self.stride),
                    padding="VALID", name="conv3d")(x)
        if self.act:
            x = nn.relu(x)
        return x


def _max_pool_same_3d(x, kernel, stride):
    """MaxPool3dSamePadding (pytorch_i3d.py:7-34): zero-pad (NOT -inf — the
    reference F.pads with zeros before pooling) then VALID max pool."""
    x = _pad_same_3d(x, kernel, stride)
    return nn.max_pool(x, tuple(kernel), strides=tuple(stride), padding="VALID")


class InceptionModule(nn.Module):
    """4-branch inception block (pytorch_i3d.py:106-133)."""

    out: Sequence[int]  # [b0, b1a, b1b, b2a, b2b, b3b]

    @nn.compact
    def __call__(self, x):
        o = self.out
        b0 = Unit3D(o[0], name="b0")(x)
        b1 = Unit3D(o[2], (3, 3, 3), name="b1b")(Unit3D(o[1], name="b1a")(x))
        b2 = Unit3D(o[4], (3, 3, 3), name="b2b")(Unit3D(o[3], name="b2a")(x))
        b3 = Unit3D(o[5], name="b3b")(_max_pool_same_3d(x, (3, 3, 3), (1, 1, 1)))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


_MIXED = {
    "Mixed_3b": [64, 96, 128, 16, 32, 32],
    "Mixed_3c": [128, 128, 192, 32, 96, 64],
    "Mixed_4b": [192, 96, 208, 16, 48, 64],
    "Mixed_4c": [160, 112, 224, 24, 64, 64],
    "Mixed_4d": [128, 128, 256, 24, 64, 64],
    "Mixed_4e": [112, 144, 288, 32, 64, 64],
    "Mixed_4f": [256, 160, 320, 32, 128, 128],
    "Mixed_5b": [256, 160, 320, 32, 128, 128],
    "Mixed_5c": [384, 192, 384, 48, 128, 128],
}


class InceptionI3d(nn.Module):
    """Full I3D up to the 400-d logits (pytorch_i3d.py:135-322), which the
    FVD protocol uses as features (fvd.py:43 return_features=True)."""

    num_classes: int = 400

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, 3) in [-1, 1]
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = _max_pool_same_3d(x, (1, 3, 3), (1, 2, 2))  # MaxPool3d_2a
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = _max_pool_same_3d(x, (1, 3, 3), (1, 2, 2))  # MaxPool3d_3a
        x = InceptionModule(_MIXED["Mixed_3b"], name="Mixed_3b")(x)
        x = InceptionModule(_MIXED["Mixed_3c"], name="Mixed_3c")(x)
        x = _max_pool_same_3d(x, (3, 3, 3), (2, 2, 2))  # MaxPool3d_4a
        for k in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = InceptionModule(_MIXED[k], name=k)(x)
        x = _max_pool_same_3d(x, (2, 2, 2), (2, 2, 2))  # MaxPool3d_5a
        x = InceptionModule(_MIXED["Mixed_5b"], name="Mixed_5b")(x)
        x = InceptionModule(_MIXED["Mixed_5c"], name="Mixed_5c")(x)
        # Logits: AvgPool3d([2,7,7], stride 1, VALID) -> eval-mode dropout
        # (identity) -> 1x1x1 conv with bias -> squeeze spatial, mean over time
        x = nn.avg_pool(x, (2, 7, 7), strides=(1, 1, 1), padding="VALID")
        x = Unit3D(self.num_classes, act=False, name="logits")(x)
        return x.mean(axis=1)[:, 0, 0, :]  # (B, num_classes)


class SimpleScriptEmbedder3d(nn.Module):
    """conv3d -> global mean -> linear head: the minimal TorchScript embedder
    schema (stand-in i3d weight files). stride/padding mirror the script's
    Conv3d attributes."""

    out_ch: int
    feat_dim: int
    kernel: Sequence[int]
    stride: Sequence[int] = (1, 1, 1)
    pad: Sequence[int] = (0, 0, 0)

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        x = nn.Conv(self.out_ch, tuple(self.kernel), strides=tuple(self.stride),
                    padding=[(p, p) for p in self.pad], name="conv")(x)
        x = x.mean(axis=(1, 2, 3))
        return nn.Dense(self.feat_dim, name="head")(x)


class SimpleScriptEmbedder2d(nn.Module):
    """conv2d -> global mean -> linear head (stand-in inception files)."""

    out_ch: int
    feat_dim: int
    kernel: Sequence[int]
    stride: Sequence[int] = (1, 1)
    pad: Sequence[int] = (0, 0)

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        x = nn.Conv(self.out_ch, tuple(self.kernel), strides=tuple(self.stride),
                    padding=[(p, p) for p in self.pad], name="conv")(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.feat_dim, name="head")(x)


def _np(v):
    try:
        return v.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(v)


def _fold_bn(sd, prefix, eps=1e-5):
    """Fold eval-mode BatchNorm3d into the preceding conv.

    y = gamma*(conv(x)-mu)/sqrt(var+eps) + beta
      = conv'(x) + b'  with  conv' = conv*g, b' = beta - mu*g,
      g = gamma/sqrt(var+eps) (per output channel).
    """
    w = _np(sd[f"{prefix}.conv3d.weight"])  # (O, I, kt, kh, kw)
    bias = _np(sd[f"{prefix}.conv3d.bias"]) if f"{prefix}.conv3d.bias" in sd \
        else np.zeros(w.shape[0], np.float32)
    if f"{prefix}.bn.weight" in sd:
        gamma = _np(sd[f"{prefix}.bn.weight"])
        beta = _np(sd[f"{prefix}.bn.bias"])
        mu = _np(sd[f"{prefix}.bn.running_mean"])
        var = _np(sd[f"{prefix}.bn.running_var"])
        g = gamma / np.sqrt(var + eps)
        w = w * g[:, None, None, None, None]
        bias = beta + (bias - mu) * g
    # torch conv3d (O, I, kt, kh, kw) -> flax (kt, kh, kw, I, O)
    return {"kernel": w.transpose(2, 3, 4, 1, 0), "bias": bias}


def convert_i3d_state_dict(sd) -> dict:
    """Reference InceptionI3d state dict -> flax params (BN folded)."""
    params = {}
    for name in ("Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3"):
        params[name] = {"conv3d": _fold_bn(sd, name)}
    for name in _MIXED:
        params[name] = {
            b: {"conv3d": _fold_bn(sd, f"{name}.{b}")}
            for b in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b")
        }
    params["logits"] = {"conv3d": _fold_bn(sd, "logits")}
    return params


def _detect_schema(sd):
    if any(k.startswith("Conv3d_1a_7x7") for k in sd):
        return "i3d"
    if "conv.weight" in sd and "head.weight" in sd:
        w = _np(sd["conv.weight"])
        return "simple3d" if w.ndim == 5 else "simple2d"
    raise ValueError(f"unrecognized embedder state dict: {sorted(sd)[:8]}")


def build_jax_embedder_from_state_dict(sd, conv_spec=None):
    """(model, params) for any accepted schema; input NDHWC / NHWC.

    conv_spec: optional {'stride': ..., 'padding': ...} extracted from the
    TorchScript Conv module (the simple-schema state dict alone doesn't
    carry hyperparameters)."""
    schema = _detect_schema(sd)
    if schema == "i3d":
        num_classes = _np(sd["logits.conv3d.weight"]).shape[0]
        return InceptionI3d(num_classes=num_classes), convert_i3d_state_dict(sd)
    w = _np(sd["conv.weight"])
    hw = _np(sd["head.weight"])  # (F, O)
    nd = w.ndim - 2
    spec = conv_spec or {}
    stride = tuple(spec.get("stride", (1,) * nd))
    pad = tuple(spec.get("padding", (0,) * nd))
    if schema == "simple3d":
        model = SimpleScriptEmbedder3d(out_ch=w.shape[0], feat_dim=hw.shape[0],
                                       kernel=w.shape[2:], stride=stride,
                                       pad=pad)
        kernel = w.transpose(2, 3, 4, 1, 0)
    else:
        model = SimpleScriptEmbedder2d(out_ch=w.shape[0], feat_dim=hw.shape[0],
                                       kernel=w.shape[2:], stride=stride,
                                       pad=pad)
        kernel = w.transpose(2, 3, 1, 0)
    params = {
        "conv": {"kernel": kernel, "bias": _np(sd["conv.bias"])},
        "head": {"kernel": hw.T, "bias": _np(sd["head.bias"])},
    }
    return model, params


def load_embedder_weights(path: str):
    """State dict from a TorchScript archive or a plain torch checkpoint."""
    sd, _ = load_embedder_spec(path)
    return sd


def _strip_wrapper_prefixes(sd):
    """TorchScript archives often nest the net under a wrapper submodule
    ('inner.', 'module.', 'i3d.', ...). Strip shared leading components
    until the keys match a known schema (at most 2 levels)."""
    for _ in range(2):
        try:
            _detect_schema(sd)
            return sd
        except ValueError:
            pass
        firsts = {k.split(".", 1)[0] for k in sd}
        if len(firsts) != 1 or not all("." in k for k in sd):
            return sd
        sd = {k.split(".", 1)[1]: v for k, v in sd.items()}
    return sd


def load_embedder_spec(path: str):
    """(state_dict, conv_spec) from a TorchScript archive or torch ckpt.
    conv_spec carries the script Conv module's stride/padding when present
    (needed because a state dict has no hyperparameters)."""
    import torch

    try:
        mod = torch.jit.load(path, map_location="cpu")
        spec = {}
        conv = getattr(mod, "conv", None)
        if conv is not None:
            for attr in ("stride", "padding"):
                try:
                    spec[attr] = tuple(getattr(conv, attr))
                except Exception:
                    pass
        return _strip_wrapper_prefixes(mod.state_dict()), spec
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        return _strip_wrapper_prefixes(sd), {}


def preprocess_videos(videos: jnp.ndarray, resolution: int = 224) -> jnp.ndarray:
    """(B, T, H, W, C) [0,1] -> (B, T, res, res, 3) [-1,1]: shortest side
    bilinear-resized, center crop (reference: fvd.py preprocess_single)."""
    B, T, H, W, C = videos.shape
    v = jnp.asarray(videos, jnp.float32)
    if C == 1:  # grayscale -> 3ch repeat (reference: ncsn_runner.py:1918-1923)
        v = jnp.tile(v, (1, 1, 1, 1, 3))
    scale = resolution / min(H, W)
    th, tw = (resolution, math.ceil(W * scale)) if H < W else (
        math.ceil(H * scale), resolution)
    v = jax.image.resize(v, (B, T, th, tw, 3), "bilinear")
    h0, w0 = (th - resolution) // 2, (tw - resolution) // 2
    v = v[:, :, h0:h0 + resolution, w0:w0 + resolution, :]
    return (v - 0.5) * 2.0


def make_jax_i3d_embedder(path: str, batch_size: int = 8) -> Callable:
    """embed(videos (B,T,H,W,C) [0,1]) -> (B, 400) features, fully on-device
    (jit-compiled JAX; no torch compute at eval time)."""
    sd, spec = load_embedder_spec(path)
    model, params = build_jax_embedder_from_state_dict(sd, spec)

    @jax.jit
    def _embed(v):
        return model.apply({"params": params}, preprocess_videos(v))

    def embed(videos: np.ndarray) -> np.ndarray:
        feats = []
        n = len(videos)
        for i in range(0, n, batch_size):
            chunk = np.asarray(videos[i:i + batch_size])
            pad = batch_size - len(chunk)  # static batch: one compile
            if pad and n > batch_size:
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
            out = np.asarray(_embed(jnp.asarray(chunk, jnp.float32)))
            feats.append(out[:len(out) - pad] if pad and n > batch_size else out)
        return np.concatenate(feats)

    return embed


def make_jax_inception_embedder(path: str, batch_size: int = 50) -> Callable:
    """embed(images (B,H,W,C) [0,1]) -> (B, F) pool features on-device.

    Only the simple TorchScript schema runs in JAX; a full InceptionV3 state
    dict falls back to the torch sidecar in eval/fid.py.
    """
    sd, spec = load_embedder_spec(path)
    if _detect_schema(sd) != "simple2d":
        raise ValueError("not a simple 2d embedder; use the torch sidecar")
    model, params = build_jax_embedder_from_state_dict(sd, spec)

    @jax.jit
    def _embed(x):
        return model.apply({"params": params}, x)

    def embed(images: np.ndarray) -> np.ndarray:
        feats = []
        for i in range(0, len(images), batch_size):
            x = jnp.asarray(np.asarray(images[i:i + batch_size]), jnp.float32)
            if x.shape[-1] == 1:
                x = jnp.tile(x, (1, 1, 1, 3))
            feats.append(np.asarray(_embed(x)))
        return np.concatenate(feats)

    return embed
