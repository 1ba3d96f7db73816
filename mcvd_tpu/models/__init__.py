from .ncsnpp import NCSNpp, UNetMoreDDPM
from .ema import EMA
from . import blocks, layers, resample


def get_model(config):
    """Model dispatch by config.model.arch (reference: ncsn_runner.py:180-195).

    The reference's dispatcher silently returns None for arch='unet' (a bug —
    bare `Exception(...)` without raise); here the legacy UNet is actually
    constructible.
    """
    arch = getattr(config.model, "arch", "unetmore")
    if arch in ("unetmore", "unetmore3d", "unetmorepseudo3d"):
        return UNetMoreDDPM(config)
    elif arch == "unet":
        from .unet import UNetLegacy

        return UNetLegacy(config)
    elif arch in ("ncsn", "ncsnv2"):
        # dead upstream (the reference's else-branch never raises and
        # returns None for its own configs/cifar10.yml arch) — live here
        from .ncsnv2 import get_ncsn_model

        return get_ncsn_model(config)
    raise ValueError(
        f"arch not valid: {arch} "
        "(expected unet/unetmore/unetmore3d/unetmorepseudo3d/ncsn/ncsnv2)")


__all__ = ["NCSNpp", "UNetMoreDDPM", "EMA", "get_model", "blocks", "layers", "resample"]
