from .sh import eval_sh, rotate_sh, sh_basis
from .gaussians import build_covariance, quaternion_to_matrix
from .distributions import (
    DiagonalGaussian,
    gather_discrete_topk,
    sample_discrete_distribution,
)
from .grid_sample import grid_sample_2d

__all__ = [
    "eval_sh",
    "rotate_sh",
    "sh_basis",
    "build_covariance",
    "quaternion_to_matrix",
    "DiagonalGaussian",
    "gather_discrete_topk",
    "sample_discrete_distribution",
    "grid_sample_2d",
]
