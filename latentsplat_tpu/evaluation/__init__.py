from .metrics import compute_dists, compute_lpips, compute_psnr, compute_ssim
from .types import IndexEntry

__all__ = [
    "compute_psnr",
    "compute_ssim",
    "compute_lpips",
    "compute_dists",
    "IndexEntry",
]
