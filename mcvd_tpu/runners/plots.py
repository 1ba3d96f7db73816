"""Metric-curve plots and sample-grid/GIF artifacts.

Reference: ncsn_runner.py plot_graphs:740-797 / plot_video_graphs:799-904
(matplotlib Agg PNGs rendered in a forked process) and the gif/png grid dumps
(:626-697, 1995-2190: cond | real | pred side-by-side).
"""

from __future__ import annotations

import multiprocessing
import os
from typing import Dict, Optional

import numpy as np


def _plot_series(ax, meter, label):
    if not meter.vals:
        return
    xs = meter.steps if len(meter.steps) == len(meter.vals) else range(len(meter.vals))
    ax.plot(list(xs), meter.vals, label=label)


def plot_graphs(meters: Dict, log_path: str) -> None:
    """Loss/grad/lr curves -> <log_path>/curves.png."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 4, figsize=(19, 4))
    _plot_series(axes[0], meters["losses_train"], "train")
    _plot_series(axes[0], meters["losses_test"], "test")
    axes[0].set_title("DSM loss")
    axes[0].set_yscale("log")
    axes[0].legend()
    _plot_series(axes[1], meters["grad_norm"], "grad norm")
    axes[1].set_title("grad norm")
    _plot_series(axes[2], meters["lr_meter"], "lr")
    axes[2].set_title("lr")
    tm = meters.get("time_train")
    if tm is not None:
        _plot_series(axes[3], tm, "ms/step")
    axes[3].set_title("ms/step")
    fig.tight_layout()
    fig.savefig(os.path.join(log_path, "curves.png"), dpi=100)
    plt.close(fig)


def plot_video_graphs(meters: Dict, log_path: str) -> None:
    """Per-task metric curves with best-point annotation ->
    <log_path>/video_metrics.png."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = ["mse", "psnr", "ssim", "lpips", "fvd"]
    fig, axes = plt.subplots(1, len(names), figsize=(4 * len(names), 3.5))
    for ax, name in zip(axes, names):
        m = meters.get(f"{name}_meter")
        if m is None or not m.vals:
            ax.set_visible(False)
            continue
        _plot_series(ax, m, name)
        vals = np.asarray(m.vals)
        best = vals.argmax() if name in ("psnr", "ssim") else vals.argmin()
        xs = m.steps if len(m.steps) == len(m.vals) else list(range(len(m.vals)))
        ax.scatter([xs[best]], [vals[best]], color="red", zorder=3)
        ax.annotate(f"{vals[best]:.4g}", (xs[best], vals[best]))
        ax.set_title(name)
    fig.tight_layout()
    fig.savefig(os.path.join(log_path, "video_metrics.png"), dpi=100)
    plt.close(fig)


def plot_graphs_process(meters: Dict, log_path: str) -> None:
    """Render plots in a spawned process so the train loop never blocks
    (reference: ncsn_runner.py:483-487)."""
    p = multiprocessing.Process(target=_plot_all, args=(meters, log_path))
    p.daemon = True
    p.start()


def _plot_all(meters, log_path):
    try:
        plot_graphs(meters, log_path)
        plot_video_graphs(meters, log_path)
    except Exception:
        pass


def _to_uint8(x: np.ndarray) -> np.ndarray:
    return np.clip(np.round(x * 255.0), 0, 255).astype(np.uint8)


def save_video_grid(path_prefix: str, *, pred: np.ndarray,
                    real: Optional[np.ndarray] = None,
                    cond: Optional[np.ndarray] = None,
                    max_videos: int = 8, fps: int = 4) -> None:
    """cond|real|pred side-by-side PNG grid + animated GIF.

    Arrays are (B, T, H, W, C) in [0,1]. PNG: rows = videos (stacked
    cond/real/pred bands), cols = time. GIF: animate over T.
    """
    from PIL import Image

    B = min(len(pred), max_videos)
    T = pred.shape[1]
    H, W, C = pred.shape[2:]

    def band(video_set, b):
        if video_set is None:
            return None
        frames = _to_uint8(video_set[b])
        if frames.shape[-1] == 1:
            frames = np.repeat(frames, 3, axis=-1)
        return frames  # (T', H, W, 3)

    # PNG grid
    rows = []
    for b in range(B):
        bands = [x for x in (band(cond, b), band(real, b), band(pred, b)) if x is not None]
        strip_rows = []
        for fr in bands:
            padded = np.concatenate(list(fr), axis=1)  # (H, T'*W, 3)
            strip_rows.append(padded)
        w_max = max(r.shape[1] for r in strip_rows)
        strip_rows = [
            np.pad(r, ((0, 0), (0, w_max - r.shape[1]), (0, 0))) for r in strip_rows
        ]
        rows.append(np.concatenate(strip_rows, axis=0))
    grid = np.concatenate(rows, axis=0)
    Image.fromarray(grid).save(path_prefix + ".png")

    # GIF: real | pred side by side over time
    gif_frames = []
    for t in range(T):
        cols = []
        for b in range(B):
            fr = _to_uint8(pred[b, t])
            if fr.shape[-1] == 1:
                fr = np.repeat(fr, 3, axis=-1)
            if real is not None and t < real.shape[1]:
                rl = _to_uint8(real[b, t])
                if rl.shape[-1] == 1:
                    rl = np.repeat(rl, 3, axis=-1)
                fr = np.concatenate([rl, fr], axis=0)
            cols.append(fr)
        gif_frames.append(Image.fromarray(np.concatenate(cols, axis=1)))
    gif_frames[0].save(
        path_prefix + ".gif", save_all=True, append_images=gif_frames[1:],
        duration=int(1000 / fps), loop=0,
    )
