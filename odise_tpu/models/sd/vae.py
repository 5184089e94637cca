"""Stable Diffusion VAE (AutoencoderKL) in Flax, with native feature taps.

Capability parity with the CompVis first-stage model the reference drives via
its inline re-implementations ``encoder_forward`` / ``decoder_forward``
(reference odise/modeling/meta_arch/ldm.py:424-541). Architecture re-derived
from the standard LDM autoencoder definition (ch=128, ch_mult=(1,2,4,4),
2 res blocks, mid attention, z=4 channels, scale 0.18215).

TPU-native design decisions:
  * NHWC layout throughout (TPU conv-friendly).
  * Feature taps are first-class: ``Encoder``/``Decoder`` take static
    ``tap_indices`` and return ``(out, taps)`` — the tapped activation is the
    *input* of the indexed res block, exactly matching the reference's capture
    points (ldm.py:437-438 for the encoder, ldm.py:514-516 for the decoder).
  * Deterministic encode: the latent is the posterior *mean* (ldm.py:464-465).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

SD_SCALE_FACTOR = 0.18215


def swish(x):
    return x * nn.sigmoid(x)


class GroupNorm32(nn.Module):
    """GroupNorm(32) in float32 (normalization is precision-sensitive).

    Falls back to gcd(C, 32) groups for tiny test configs.
    """

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        import math

        orig_dtype = x.dtype
        c = x.shape[-1]
        groups = 32 if c % 32 == 0 else math.gcd(c, 32)
        x = nn.GroupNorm(num_groups=groups, epsilon=self.epsilon, dtype=jnp.float32,
                         name="norm")(x.astype(jnp.float32))
        return x.astype(orig_dtype)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = GroupNorm32(name="norm1")(x)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(name="norm2")(h)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention used in the VAE mid block."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm32(name="norm")(x)
        q = nn.Conv(C, (1, 1), dtype=self.dtype, name="q")(h).reshape(B, H * W, C)
        k = nn.Conv(C, (1, 1), dtype=self.dtype, name="k")(h).reshape(B, H * W, C)
        v = nn.Conv(C, (1, 1), dtype=self.dtype, name="v")(h).reshape(B, H * W, C)
        attn = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        attn = nn.softmax(attn * (C ** -0.5), axis=-1).astype(v.dtype)
        h = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return x + h


class Downsample(nn.Module):
    """Stride-2 conv with the VAE's asymmetric (0,1,0,1) padding."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=2, padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
        return nn.Conv(C, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    """VAE encoder. Returns (moments [B,h,w,2*z], taps)."""

    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    tap_indices: Tuple[int, ...] = ()
    dtype: jnp.dtype = jnp.float32

    @property
    def num_resolutions(self):
        return len(self.ch_mult)

    @nn.compact
    def __call__(self, x):
        taps = []
        block_idx = 0
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i_level, mult in enumerate(self.ch_mult):
            out_ch = self.ch * mult
            for i_block in range(self.num_res_blocks):
                if block_idx in self.tap_indices:
                    taps.append(h)  # input of this res block (ldm.py:437-438)
                h = ResnetBlock(out_ch, dtype=self.dtype,
                                name=f"down_{i_level}_block_{i_block}")(h)
                block_idx += 1
            if i_level != self.num_resolutions - 1:
                h = Downsample(dtype=self.dtype, name=f"down_{i_level}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = GroupNorm32(name="norm_out")(h)
        h = swish(h)
        moments = nn.Conv(2 * self.z_channels, (3, 3), padding=1, dtype=self.dtype,
                          name="conv_out")(h)
        return moments, taps


class Decoder(nn.Module):
    """VAE decoder. Returns (rgb, taps).

    Decoder blocks are enumerated from the lowest resolution up (reversed
    levels, num_res_blocks+1 blocks per level), matching the reference's tap
    enumeration (ldm.py:324-328).
    """

    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_channels: int = 3
    tap_indices: Tuple[int, ...] = ()
    dtype: jnp.dtype = jnp.float32

    @property
    def num_resolutions(self):
        return len(self.ch_mult)

    @nn.compact
    def __call__(self, z):
        taps = []
        block_idx = 0
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_2")(h)
        for rev, i_level in enumerate(reversed(range(self.num_resolutions))):
            out_ch = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                if block_idx in self.tap_indices:
                    taps.append(h)  # input of this res block (ldm.py:514-516)
                h = ResnetBlock(out_ch, dtype=self.dtype,
                                name=f"up_{i_level}_block_{i_block}")(h)
                block_idx += 1
            if i_level != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
        h = GroupNorm32(name="norm_out")(h)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)
        return h, taps


class AutoencoderKL(nn.Module):
    """Full VAE with quant convs; encode is deterministic (posterior mean)."""

    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    encoder_tap_indices: Tuple[int, ...] = ()
    decoder_tap_indices: Tuple[int, ...] = ()
    scale_factor: float = SD_SCALE_FACTOR
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            z_channels=self.z_channels, tap_indices=self.encoder_tap_indices,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            tap_indices=self.decoder_tap_indices, dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(2 * self.z_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype)

    def encode(self, x):
        """x [B,H,W,3] normalized to [-1,1] -> (scaled latent mean, taps)."""
        moments, taps = self.encoder(x)
        moments = self.quant_conv(moments)
        mean = moments[..., : self.z_channels]
        return self.scale_factor * mean, taps

    def decode(self, z):
        """scaled latent -> (rgb, taps)."""
        z = z / self.scale_factor
        z = self.post_quant_conv(z)
        return self.decoder(z)

    def __call__(self, x):
        z, enc_taps = self.encode(x)
        rgb, dec_taps = self.decode(z)
        return rgb, z, enc_taps, dec_taps
