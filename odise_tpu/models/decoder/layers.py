"""Shared decoder layers: sine position embedding, MHA, MLP.

Capability parity with the reference's Mask2Former building blocks
(reference third_party/Mask2Former/mask2former/modeling/transformer_decoder/
position_encoding.py:12-53, mask2former_transformer_decoder.py:40-180).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def position_embedding_sine(h: int, w: int, num_pos_feats: int = 128,
                            temperature: int = 10000, normalize: bool = True,
                            dtype=jnp.float32) -> jnp.ndarray:
    """2D sine positional encoding -> [h, w, 2*num_pos_feats]."""
    y_embed = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    x_embed = jnp.ones((h, 1)) * jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    if normalize:
        eps = 1e-6
        scale = 2 * math.pi
        y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])],
                      axis=3).reshape(h, w, num_pos_feats)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])],
                      axis=3).reshape(h, w, num_pos_feats)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


class MultiheadAttention(nn.Module):
    """Q/KV attention (torch nn.MultiheadAttention capability).

    ``attn_mask``: bool, broadcastable to [B, heads, Lq, Lk]; True = masked.
    """

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, attn_mask: Optional[jnp.ndarray] = None):
        B, Lq, _ = query.shape
        Lk = key.shape[1]
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(value)
        q = q.reshape(B, Lq, self.heads, hd)
        k = k.reshape(B, Lk, self.heads, hd)
        v = v.reshape(B, Lk, self.heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        if attn_mask is not None:
            if attn_mask.ndim == 3:  # [B, Lq, Lk]
                attn_mask = attn_mask[:, None]
            logits = jnp.where(attn_mask, -1e30, logits)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Lq, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class MLP(nn.Module):
    """num_layers-deep ReLU MLP (reference M2F MLP)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            x = nn.Dense(self.output_dim if last else self.hidden_dim,
                         dtype=self.dtype, name=f"layer_{i}")(x)
            if not last:
                x = nn.relu(x)
        return x
