"""Transformer building blocks for DETR-family heads.

Parity target: mmdet models/utils/transformer.py + positional_encoding.py —
sine positional encoding, post-norm encoder/decoder layers, intermediate
decoder outputs for auxiliary losses.
"""
from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["sine_positional_encoding", "TransformerEncoderLayer",
           "TransformerDecoderLayer"]


def sine_positional_encoding(mask: jnp.ndarray, num_feats: int = 128,
                             temperature: float = 10000.0,
                             normalize: bool = True,
                             scale: float = 2 * np.pi) -> jnp.ndarray:
    """mask (B, H, W): True where VALID. Returns (B, H, W, 2*num_feats)."""
    not_mask = mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, 1)
    x_embed = jnp.cumsum(not_mask, 2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      -1).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      -1).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], -1)


class FFN(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        return nn.Dense(self.dim, dtype=self.dtype)(y)


class TransformerEncoderLayer(nn.Module):
    dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos, key_mask: Optional[jnp.ndarray] = None):
        """x (B, N, C); pos (B, N, C); key_mask (B, N) True=valid."""
        attn_mask = None
        if key_mask is not None:
            attn_mask = key_mask[:, None, None, :]
        q = k = x + pos
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype)(
                q, k, x, mask=attn_mask)
        x = nn.LayerNorm(dtype=self.dtype)(x + y)
        y = FFN(self.dim, self.ffn_dim, dtype=self.dtype)(x)
        return nn.LayerNorm(dtype=self.dtype)(x + y)


class TransformerDecoderLayer(nn.Module):
    dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, memory, mem_pos,
                 mem_key_mask: Optional[jnp.ndarray] = None):
        q = k = tgt + query_pos
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype)(q, k, tgt)
        tgt = nn.LayerNorm(dtype=self.dtype)(tgt + y)
        attn_mask = None
        if mem_key_mask is not None:
            attn_mask = mem_key_mask[:, None, None, :]
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype)(
                tgt + query_pos, memory + mem_pos, memory, mask=attn_mask)
        tgt = nn.LayerNorm(dtype=self.dtype)(tgt + y)
        y = FFN(self.dim, self.ffn_dim, dtype=self.dtype)(tgt)
        return nn.LayerNorm(dtype=self.dtype)(tgt + y)
