"""Generic pre-norm transformer blocks (flax.linen).

Functional parity with the reference's SRT-derived transformer
(src/model/transformer/{transformer,attention,pre_norm,feed_forward}.py):
pre-LayerNorm residual blocks, multi-head attention with optional
cross-attention (kv_dim), and a pluggable feed-forward module.

TPU notes: attention contractions use dot_general in bf16-friendly form and
rely on XLA's flash-style fusion; sequence lengths here are tiny (32
epipolar samples / (H/4 * W/4) tokens) so a custom attention kernel is not
on the critical path.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


class Attention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    selfatt: bool = True
    kv_dim: Optional[int] = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, z: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        inner_dim = self.dim_head * self.heads
        project_out = not (self.heads == 1 and self.dim_head == self.dim)

        if z is None:
            qkv = nn.Dense(inner_dim * 3, use_bias=False, name="to_qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(inner_dim, use_bias=False, name="to_q")(x)
            kv = nn.Dense(inner_dim * 2, use_bias=False, name="to_kv")(z)
            k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scale = self.dim_head**-0.5
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
        attn = nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], inner_dim)
        if project_out:
            out = nn.Dense(self.dim, name="to_out")(out)
        return out


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, **_: Any) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim)(x)
        return x


class Transformer(nn.Module):
    """Stack of pre-norm attention + feed-forward residual blocks."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    selfatt: bool = True
    kv_dim: Optional[int] = None
    dropout: float = 0.0
    feed_forward_factory: Optional[Callable[[], nn.Module]] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, z: Optional[jnp.ndarray] = None, **ff_kwargs: Any
    ) -> jnp.ndarray:
        for i in range(self.depth):
            attn_in = nn.LayerNorm(name=f"norm_attn_{i}")(x)
            x = Attention(
                self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                selfatt=self.selfatt,
                kv_dim=self.kv_dim,
                dropout=self.dropout,
                name=f"attn_{i}",
            )(attn_in, z=z) + x
            ff_in = nn.LayerNorm(name=f"norm_ff_{i}")(x)
            if self.feed_forward_factory is not None:
                ff = self.feed_forward_factory()
            else:
                ff = FeedForward(self.dim, self.mlp_dim, self.dropout, name=f"ff_{i}")
            x = ff(ff_in, **ff_kwargs) + x
        return x
