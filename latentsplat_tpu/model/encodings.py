"""Sinusoidal positional encoding.

Parity with reference src/model/encodings/positional_encoding.py:8-36:
encodes values in [0, 1]; the lowest frequency has period 1; sin and cos
phases interleaved per octave. Implemented as a pure function (it has no
parameters).
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(samples: jnp.ndarray, num_octaves: int) -> jnp.ndarray:
    """(..., d) -> (..., d * num_octaves * 2)."""
    octaves = jnp.arange(num_octaves, dtype=jnp.float32)
    frequencies = 2.0 * jnp.pi * 2.0**octaves                    # (f,)
    phases = jnp.asarray([0.0, 0.5 * jnp.pi], dtype=jnp.float32)  # (p,)
    angle = samples[..., None, None] * frequencies[:, None] + phases
    out = jnp.sin(angle)  # (..., d, f, p)
    return out.reshape(*samples.shape[:-1], samples.shape[-1] * num_octaves * 2)


def positional_encoding_d_out(dimensionality: int, num_octaves: int) -> int:
    return dimensionality * num_octaves * 2
