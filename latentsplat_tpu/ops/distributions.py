"""Probability utilities: diagonal Gaussians and discrete sampling.

DiagonalGaussian is the JAX twin of the reference's any-shape
DiagonalGaussianDistribution (src/model/diagonal_gaussian_distribution.py:8-95)
as an immutable pytree; sampling takes an explicit PRNG key. A `logvar=None`
distribution is degenerate (zero variance), mirroring the reference.

Discrete sampling matches src/misc/discrete_probability_distribution.py:7-42
(inverse-CDF multinomial via searchsorted, and top-k gathering).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

import math

_F32_EPS = float(jnp.finfo(jnp.float32).eps)
_LOG_TWO_PI = math.log(2.0 * math.pi)  # pure python: no device op at import


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DiagonalGaussian:
    """Diagonal Gaussian over arrays of any shape.

    Either construct from (mean, logvar) or from packed params with
    `DiagonalGaussian.from_params(params, axis)` where params stacks
    [mean, logvar] along `axis`.
    """

    mean: jnp.ndarray
    logvar: Optional[jnp.ndarray] = None
    logvar_interval: Tuple[float, float] = (-30.0, 20.0)

    def __post_init__(self):
        if self.logvar is not None:
            lo, hi = self.logvar_interval
            # Straight-through clamp: forward values are clipped exactly
            # like the reference (diagonal_gaussian_distribution.py:23-25,
            # torch.clamp), but the gradient passes through 1:1 outside the
            # bounds too. A hard clip zeroes d(logvar)/d(raw) at saturation,
            # killing the KL's restoring gradient exactly when it is needed
            # most — the observed collapse mode saturates logvar at +20 and
            # then KL runs away unopposed (NOTES.md round-4 ledger). Inside
            # the bounds (every healthy run, always) this is bitwise
            # identical to jnp.clip in both value and gradient.
            #
            # INFINITE raw values must take the plain clip: the splatting
            # decoder's logvar := log1p(-mask) trick yields -inf wherever
            # accumulated alpha saturates to exactly 1, and the straight-
            # through form would compute -inf + (+inf) = NaN there (found
            # as a deterministic mid-training NaN freeze, NOTES.md round-5).
            raw = self.logvar
            clipped = jnp.clip(raw, lo, hi)
            st = raw + jax.lax.stop_gradient(clipped - raw)
            object.__setattr__(
                self, "logvar", jnp.where(jnp.isfinite(raw), st, clipped)
            )

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        if self.logvar is None:
            return (self.mean,), ("degenerate", self.logvar_interval)
        return (self.mean, self.logvar), ("full", self.logvar_interval)

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, interval = aux
        obj = object.__new__(cls)
        object.__setattr__(obj, "mean", children[0])
        object.__setattr__(obj, "logvar", None if kind == "degenerate" else children[1])
        object.__setattr__(obj, "logvar_interval", interval)
        return obj

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_params(cls, params: jnp.ndarray, axis: int = 0,
                    logvar_interval: Tuple[float, float] = (-30.0, 20.0)):
        mean, logvar = jnp.split(params, 2, axis=axis)
        return cls(mean, logvar, logvar_interval)

    def params(self, axis: int = 0) -> jnp.ndarray:
        assert self.logvar is not None
        return jnp.concatenate([self.mean, self.logvar], axis=axis)

    # -- stats ----------------------------------------------------------------
    @property
    def std(self):
        return 0.0 if self.logvar is None else jnp.exp(0.5 * self.logvar)

    @property
    def var(self):
        return 0.0 if self.logvar is None else jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        if self.logvar is None:
            return self.mean
        noise = jax.random.normal(key, self.mean.shape, self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussian"] = None) -> jnp.ndarray:
        """Elementwise KL vs N(0, 1) or another diagonal Gaussian."""
        if self.logvar is None:
            return jnp.zeros_like(self.mean)
        if other is None:
            return 0.5 * (self.mean**2 + self.var - 1.0 - self.logvar)
        return 0.5 * (
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar
        )

    def nll(self, sample: jnp.ndarray) -> jnp.ndarray:
        if self.logvar is None:
            return jnp.zeros_like(self.mean)
        return 0.5 * (
            _LOG_TWO_PI + self.logvar + (sample - self.mean) ** 2 / self.var
        )


def sample_discrete_distribution(
    key: jax.Array,
    pdf: jnp.ndarray,
    num_samples: int,
    eps: float = _F32_EPS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Multinomial sampling via inverse CDF.

    pdf: (*batch, bucket) unnormalized -> (index (*batch, sample) int32,
    density (*batch, sample)).
    """
    *batch, bucket = pdf.shape
    normalized_pdf = pdf / (eps + pdf.sum(axis=-1, keepdims=True))
    cdf = jnp.cumsum(normalized_pdf, axis=-1)
    samples = jax.random.uniform(key, (*batch, num_samples), dtype=pdf.dtype)
    # Batched searchsorted(side="right") as a broadcasted comparison count
    # (bucket counts are small, e.g. 32, so this is cheaper than a vmapped
    # binary search on TPU).
    index = (cdf[..., None, :] <= samples[..., :, None]).sum(axis=-1)
    index = index.clip(max=bucket - 1)
    density = jnp.take_along_axis(normalized_pdf, index, axis=-1)
    return index.astype(jnp.int32), density


def gather_discrete_topk(
    pdf: jnp.ndarray,
    num_samples: int,
    eps: float = _F32_EPS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic top-k buckets and their normalized densities."""
    normalized_pdf = pdf / (eps + pdf.sum(axis=-1, keepdims=True))
    _, index = jax.lax.top_k(pdf, num_samples)
    density = jnp.take_along_axis(normalized_pdf, index, axis=-1)
    return index.astype(jnp.int32), density
