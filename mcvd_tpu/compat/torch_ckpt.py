"""Reference (torch) checkpoint -> JAX params converter.

The reference saves torch.save([state_dict, optim, epoch, step, ema_shadow])
(reference: ncsn_runner.py:424-439) with positional module naming
`unet.all_modules.{i}.<attr>`; our flax modules are created in the same order
with names `all_modules_{i}` (models/ncsnpp.py), so conversion walks OUR
param tree and derives each leaf's torch key + layout transform:

  nn.Dense    kernel (in,out)        <- Linear weight (out,in)^T
  nn.Conv 2D  kernel (kh,kw,I,O)     <- Conv2d weight (O,I,kh,kw)
  nn.Conv 1D  kernel (k,I,O)         <- Conv1d weight (O,I,k)
  Conv3dFolded weight (kd,kh,kw,I,O) <- MyConv3d .conv.weight (O,I,kd,kh,kw)
  UpDownConv2d weight (kh,kw,I,O)    <- up_or_down_sampling.Conv2d .weight
  FrameConverter weight (Nin,Nout)   <- Conv2d 1x1 weight (Nout,Nin,1,1)
  GroupNorm scale/bias               <- GroupNorm weight/bias
  NIN W/b                            <- NIN W/b (identical layout)
  nn.Embed embedding                 <- Embedding weight

Works on numpy arrays (no torch import needed if the caller already
deserialized the state dict to numpy).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _strip_module_prefix(sd: Mapping[str, Any]) -> Dict[str, Any]:
    return {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    try:
        return v.detach().cpu().numpy()  # torch tensor
    except AttributeError:
        return np.asarray(v)


def _flax_path_to_torch(path: Tuple[str, ...]) -> Tuple[str, str, str]:
    """Map a flax param path to (torch_key, kind). kind selects the layout
    transform. path like ('unet','all_modules_3','Conv_0','Conv_0','kernel')."""
    *mods, leaf = path
    segs = []
    for m in mods:
        listy = ("all_modules_", "downblocks_", "middleblocks_", "upblocks_")
        if m.startswith(listy):
            name, idx = m.rsplit("_", 1)
            segs.append(f"{name}.{idx}")
        elif m == "mlp_shared":
            # torch MySPADE: mlp_shared = Sequential(conv, act) -> conv is .0
            segs.append("mlp_shared.0")
        elif m == "temb_dense_0":
            # legacy UNet temb_dense = Sequential(Linear, act, Linear, act)
            segs.append("temb_dense.0")
        elif m == "temb_dense_1":
            segs.append("temb_dense.2")
        else:
            segs.append(m)

    # collapse Conv2dSame's inner nn.Conv ("X/Conv_0/kernel" where X already
    # ends the torch module): our Conv2dSame wraps nn.Conv named Conv_0; in
    # torch the module itself IS the conv. Detect: parent of leaf is 'Conv_0'
    # and the leaf is kernel/bias and the grandparent is not an attn/resblock
    # that legitimately has a Conv_0 child... disambiguated structurally:
    # our wrapper nesting always looks like <name>/Conv_0/<leaf> where <name>
    # is the torch attribute; a torch Conv_0 attribute appears as
    # Conv_0/Conv_0/<leaf>.
    if leaf in ("kernel", "bias") and len(segs) >= 1 and segs[-1] == "Conv_0":
        # find whether this Conv_0 is the wrapper's inner conv: the wrapper
        # inner conv always duplicates or follows the torch attr name.
        if len(segs) >= 2 and segs[-2].rsplit(".", 1)[-1] in (
            "Conv_0", "Conv_1", "Conv_2", "mlp_shared", "mlp_gamma", "mlp_beta",
            "out", "conv", "conv0", "conv1",
        ):
            segs = segs[:-1]

    base = ".".join(segs)

    if leaf == "kernel":
        return f"{base}.weight", "conv_or_dense", base
    if leaf == "embedding":
        return f"{base}.weight", "embed", base
    if leaf == "scale":
        return f"{base}.weight", "direct", base
    if leaf == "Norm_0_scale":
        return f"{base}.Norm_0.weight", "direct", base
    if leaf == "Norm_0_bias":
        return f"{base}.Norm_0.bias", "direct", base
    if leaf == "weight":
        return f"{base}.weight", "special_weight", base
    if leaf in ("bias", "b"):
        return f"{base}.{leaf}", "direct", base
    if leaf == "W":
        return f"{base}.W", "direct", base
    if leaf == "weights":
        # legacy UNet Nin stores (out,in) (reference: models/unet.py:49-58)
        return f"{base}.weights", "transpose2d", base
    raise KeyError(f"unmapped flax leaf {path}")


def convert_state_dict(flax_params: Mapping, torch_sd: Mapping[str, Any]) -> Dict:
    """Fill a flax param tree (template, e.g. from model.init) with weights
    from a torch state dict. Returns the new tree; raises on any missing or
    shape-incompatible entry."""
    import jax

    torch_sd = _strip_module_prefix(torch_sd)
    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    out: Dict = jax.tree_util.tree_map(lambda x: None, dict(flax_params))

    def path_names(kp):
        names = []
        for p in kp:
            names.append(getattr(p, "key", getattr(p, "name", str(p))))
        return tuple(str(n) for n in names)

    new_leaves = {}
    for kp, leaf in flat:
        path = path_names(kp)
        torch_key, kind, base = _flax_path_to_torch(path)
        if torch_key not in torch_sd:
            # Conv3dFolded: torch MyConv3d wraps nn.Conv3d as `.conv`
            alt = f"{base}.conv.{torch_key.rsplit('.', 1)[-1]}"
            if alt in torch_sd:
                torch_key = alt
            else:
                raise KeyError(
                    f"{torch_key} (for flax {'/'.join(path)}) not in torch ckpt"
                )
        w = _to_numpy(torch_sd[torch_key]).astype(np.float32)
        tgt_shape = leaf.shape

        if kind == "conv_or_dense":
            if w.ndim == 2:       # Linear (out,in) -> (in,out)
                w = w.T
            elif w.ndim == 3:     # Conv1d (O,I,k) -> (k,I,O)
                w = w.transpose(2, 1, 0)
            elif w.ndim == 4:     # Conv2d (O,I,kh,kw) -> (kh,kw,I,O)
                w = w.transpose(2, 3, 1, 0)
            else:
                raise ValueError(f"{torch_key}: unexpected conv ndim {w.ndim}")
        elif kind == "transpose2d":
            w = w.T
        elif kind == "special_weight":
            # our raw 'weight' params: UpDownConv2d (kh,kw,I,O),
            # Conv3dFolded (kd,kh,kw,I,O), FrameConverter (Nin,Nout)
            if w.ndim == 4 and len(tgt_shape) == 4:      # UpDownConv2d
                w = w.transpose(2, 3, 1, 0)
            elif w.ndim == 5 and len(tgt_shape) == 5:    # Conv3d
                w = w.transpose(2, 3, 4, 1, 0)
            elif w.ndim == 4 and len(tgt_shape) == 2:    # 1x1 Conv2d -> matrix
                w = w[:, :, 0, 0].T
            elif w.ndim == 5 and len(tgt_shape) == 2:    # 1x1x1 Conv3d -> matrix
                w = w[:, :, 0, 0, 0].T
            else:
                raise ValueError(
                    f"{torch_key}: cannot map weight {w.shape} -> {tgt_shape}"
                )
        # 'direct'/'embed': as-is

        if tuple(w.shape) != tuple(tgt_shape):
            raise ValueError(f"{torch_key}: shape {w.shape} != target {tgt_shape}")
        new_leaves["/".join(path)] = w

    def rebuild(tree, prefix=()):
        if isinstance(tree, Mapping):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return new_leaves["/".join(prefix)]

    return rebuild(flax_params)


def load_reference_checkpoint(ckpt_path: str, flax_params_template: Mapping,
                              use_ema: bool = True):
    """Load a reference .pt checkpoint (list [sd, optim, epoch, step, ema])
    and convert. Requires torch for deserialization."""
    import torch

    states = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = states[0]
    if use_ema and len(states) >= 5 and isinstance(states[-1], dict):
        # EMA shadow dict uses the same (unprefixed) names
        sd = {**_strip_module_prefix(sd), **_strip_module_prefix(states[-1])}
    return convert_state_dict(flax_params_template, sd)
