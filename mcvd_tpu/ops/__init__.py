"""Pallas TPU kernels for the hot ops, each with a lax reference
implementation and equivalence tests — the TPU-native equivalent of the
reference's CUDA/CPU dual implementations (models/better/op/).

`set_use_pallas(True)` switches the model blocks onto the kernels; kinds can
be toggled individually (`set_use_pallas(True, kinds=("groupnorm",))`). The
GroupNorm kernel has a custom VJP and is training-safe; attention is
forward-only (eval paths).
"""

# the dormant kernels live in the bounded lab/ (see README.md decision
# record) but keep their `ops.<kind>` attribute paths for the
# set_use_pallas switch and the shoot-out harnesses — loaded LAZILY so a
# default (pallas-off) run never imports the lab
from . import fused_act, upfirdn

_KINDS = ("attention", "groupnorm", "winograd")


def __getattr__(name):
    if name in _KINDS:
        from . import lab

        mod = getattr(lab, name)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
_USE: dict = {k: False for k in _KINDS}


def set_use_pallas(value: bool, kinds=None) -> None:
    for k in kinds or _KINDS:
        _USE[k] = bool(value)


def use_pallas(kind: str = "attention") -> bool:
    return _USE.get(kind, False)


__all__ = ["attention", "fused_act", "groupnorm", "upfirdn", "set_use_pallas", "use_pallas"]
