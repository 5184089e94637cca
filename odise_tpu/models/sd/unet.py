"""Stable Diffusion UNet in Flax with native feature taps.

Capability parity with the CompVis LDM ``UNetModel`` the reference drives via
``unet_forward`` (reference odise/modeling/meta_arch/ldm.py:469-491).
Architecture re-derived from the standard SD v1 definition:
model_channels=320, channel_mult=(1,2,4,4), 2 res blocks/level, spatial
transformers (self + cross attention on a 768-d text context) at downsample
factors 1/2/4, 8 heads, time embedding 4*320.

TPU-native design decisions:
  * NHWC; attention is done on [B, HW, C] token layout with einsum matmuls on
    the MXU; bf16 compute with fp32 softmax/normalization.
  * Feature taps are first-class: ``tap_indices`` selects output blocks; the
    tapped activation is the block *input after skip concatenation*
    (matching reference ldm.py:485-488), returned alongside eps.
  * The conditioning embedding delta (``cond_emb``, the implicit captioner's
    learnable time-embedding shift, ldm.py:711-714) is an explicit argument.
  * ``remat`` wraps each top-level block in jax.checkpoint for memory scaling
    (the reference uses torch.utils.checkpoint one level up).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .vae import GroupNorm32


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embedding, LDM convention (cos first)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResBlock(nn.Module):
    """UNet residual block with additive time-embedding injection."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        in_ch = x.shape[-1]
        h = GroupNorm32(epsilon=1e-5, name="in_norm")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(h)
        emb_out = nn.Dense(self.out_channels, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        h = h + emb_out[:, None, None, :]
        h = GroupNorm32(epsilon=1e-5, name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="out_conv")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None."""

    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        B, N, _ = q.shape
        M = k.shape[1]
        q = q.reshape(B, N, self.heads, self.dim_head)
        k = k.reshape(B, M, self.heads, self.dim_head)
        v = v.reshape(B, M, self.heads, self.dim_head)
        scale = self.dim_head ** -0.5
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * scale, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, inner)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * nn.gelu(gate)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        dim = x.shape[-1]
        x = x + CrossAttention(self.heads, self.dim_head, dtype=self.dtype, name="attn1")(
            nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(x.dtype)
        )
        x = x + CrossAttention(self.heads, self.dim_head, dtype=self.dtype, name="attn2")(
            nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(x.dtype), context
        )
        h = nn.LayerNorm(dtype=jnp.float32, name="norm3")(x).astype(x.dtype)
        h = GEGLU(dim * 4, dtype=self.dtype, name="ff_geglu")(h)
        h = nn.Dense(dim, dtype=self.dtype, name="ff_out")(h)
        return x + h


class SpatialTransformer(nn.Module):
    heads: int
    dim_head: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        residual = x
        h = GroupNorm32(epsilon=1e-6, name="norm")(x)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        for i in range(self.depth):
            h = BasicTransformerBlock(self.heads, self.dim_head, dtype=self.dtype,
                                      name=f"block_{i}")(h, context)
        h = h.reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="proj_out")(h)
        return h + residual


class DownsampleConv(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(x.shape[-1], (3, 3), strides=2, padding=1,
                       dtype=self.dtype, name="op")(x)


class UpsampleConv(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(x.shape[-1], (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class UNetModel(nn.Module):
    """SD v1 UNet. ``__call__(x, t, context, cond_emb)`` -> (eps, taps)."""

    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_ds: Tuple[int, ...] = (1, 2, 4)  # downsample factors with attention
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    context_dim: int = 768
    transformer_depth: int = 1
    tap_indices: Tuple[int, ...] = (2, 5, 8, 11)  # output_block indices
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, timesteps, context, cond_emb: Optional[jnp.ndarray] = None):
        """
        Args:
          x: [B, h, w, 4] noisy latent (NHWC).
          timesteps: [B] int/float timesteps.
          context: [B, 77, context_dim] text conditioning.
          cond_emb: optional [B, 4*model_channels] additive time-embedding
            delta (implicit captioner, reference ldm.py:476-477).

        Returns:
          (eps [B, h, w, 4], taps: list of output-block inputs post skip-concat)
        """
        time_embed_dim = self.model_channels * 4
        t_emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(
            t_emb.astype(self.dtype))
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))
        if cond_emb is not None:
            emb = emb + cond_emb

        maybe_remat = (lambda f: nn.remat(f)) if self.remat else (lambda f: f)

        def res(ch, name):
            return maybe_remat(ResBlock)(ch, dtype=self.dtype, name=name)

        def attn(name):
            dim_head = None  # computed at call site

            def make(ch):
                return maybe_remat(SpatialTransformer)(
                    self.num_heads, ch // self.num_heads,
                    depth=self.transformer_depth, dtype=self.dtype, name=name)
            return make

        taps = []
        hs = []
        h = nn.Conv(self.model_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="input_conv")(x.astype(self.dtype))
        hs.append(h)

        ds = 1
        block_id = 0
        # ---- input (down) blocks
        for i_level, mult in enumerate(self.channel_mult):
            ch = self.model_channels * mult
            for i_block in range(self.num_res_blocks):
                block_id += 1
                h = res(ch, f"in_{block_id}_res")(h, emb)
                if ds in self.attention_ds:
                    h = attn(f"in_{block_id}_attn")(ch)(h, context)
                hs.append(h)
            if i_level != len(self.channel_mult) - 1:
                block_id += 1
                h = DownsampleConv(dtype=self.dtype, name=f"in_{block_id}_down")(h)
                hs.append(h)
                ds *= 2

        # ---- middle
        ch = self.model_channels * self.channel_mult[-1]
        h = res(ch, "mid_res_0")(h, emb)
        h = attn("mid_attn")(ch)(h, context)
        h = res(ch, "mid_res_1")(h, emb)

        # ---- output (up) blocks
        out_idx = 0
        for i_level, mult in reversed(list(enumerate(self.channel_mult))):
            ch = self.model_channels * mult
            for i_block in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                if out_idx in self.tap_indices:
                    taps.append(h)  # input after skip concat (ldm.py:485-488)
                h = res(ch, f"out_{out_idx}_res")(h, emb)
                if ds in self.attention_ds:
                    h = attn(f"out_{out_idx}_attn")(ch)(h, context)
                if i_level != 0 and i_block == self.num_res_blocks:
                    h = UpsampleConv(dtype=self.dtype, name=f"out_{out_idx}_up")(h)
                    ds //= 2
                out_idx += 1

        h = GroupNorm32(epsilon=1e-5, name="out_norm")(h)
        h = nn.silu(h)
        eps = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                      kernel_init=nn.initializers.zeros, name="out_conv")(h)
        return eps, taps
