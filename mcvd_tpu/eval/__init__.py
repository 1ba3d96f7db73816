from . import metrics
from .metrics import mse_and_psnr, ssim_grayscale, video_metrics_batch

__all__ = ["metrics", "mse_and_psnr", "ssim_grayscale", "video_metrics_batch"]
