"""Pallas TPU kernels for the hot ops, each with a lax reference
implementation and equivalence tests — the TPU-native equivalent of the
reference's CUDA/CPU dual implementations (models/better/op/).

`set_use_pallas(True)` switches the model blocks onto the kernels; the
default is the XLA path (XLA already fuses most of these well — the kernels
exist for the cases where profiling shows a win and as the native-op parity
surface).
"""

from . import attention, fused_act, groupnorm, upfirdn

_USE_PALLAS = False


def set_use_pallas(value: bool) -> None:
    global _USE_PALLAS
    _USE_PALLAS = bool(value)


def use_pallas() -> bool:
    return _USE_PALLAS


__all__ = ["attention", "fused_act", "groupnorm", "upfirdn", "set_use_pallas", "use_pallas"]
