"""Eval-weight discovery.

The reference downloads its metric weights at runtime (I3D TorchScript from
Dropbox, fvd.py:30; pt_inception via fid_PR.py; torchvision alexnet + in-repo
LPIPS lin heads). This environment has zero egress, so instead: an explicit
config path (config.eval.*) wins, then conventional on-disk locations are
probed ($MCVD_WEIGHTS_DIR, /tmp/weights).
"""

from __future__ import annotations

import os
from typing import Optional

# canonical filenames per metric
I3D = "i3d_torchscript.pt"
INCEPTION = "inception.pt"
LPIPS_LIN = "lpips_alex_lin.pth"
ALEXNET = "alexnet.pth"


def _default_dirs():
    dirs = []
    env = os.environ.get("MCVD_WEIGHTS_DIR")
    if env:
        dirs.append(env)
    dirs.append("/tmp/weights")
    return dirs


def find_weights(config_path: Optional[str], filename: str) -> Optional[str]:
    """Resolve a metric-weights file: explicit config path, else defaults."""
    if config_path and os.path.isfile(config_path):
        return config_path
    for d in _default_dirs():
        p = os.path.join(d, filename)
        if os.path.isfile(p):
            return p
    return None
