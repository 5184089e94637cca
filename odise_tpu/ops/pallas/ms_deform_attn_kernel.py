"""Pallas TPU kernel for the multi-scale deformable-attention gather.

The op is fundamentally gather-bound (SURVEY.md hard part #4: the reference
solves it with a CUDA im2col kernel). On TPU the XLA path issues one large
HBM gather (`ops/ms_deform_attn.py`, impl="fused"); this kernel instead pins
each (batch*head) value table in VMEM — at ODISE shapes the per-head table is
only ~350 KB — and performs the 12-corner gathers as VMEM dynamic gathers,
tiling queries over the grid.

Index/weight preparation (bilinear corners, validity, attention fold-in) is
plain XLA (cheap, fully fused); the kernel does only the bandwidth-critical
gather+reduce.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _prepare_indices_weights(spatial_shapes, sampling_locations,
                             attention_weights):
    """[B,Lq,H,L,P,2] locations -> flat VMEM row indices + folded weights.

    Returns idx [B,H,Lq,C] int32 (C = 4*L*P corners, rows within one head's
    level-concat table) and wgt [B,H,Lq,C] f32.
    """
    B, Lq, H, L, P, _ = sampling_locations.shape
    idx_parts = []
    wgt_parts = []
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lvl].astype(jnp.float32)  # [B,Lq,H,P,2]
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        a = attention_weights[:, :, :, lvl].astype(jnp.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                xi = x0 + dx
                yi = y0 + dy
                wgt = (1.0 - jnp.abs(x - xi)) * (1.0 - jnp.abs(y - yi))
                valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
                xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
                yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
                idx_parts.append(yi * w + xi + offset)
                wgt_parts.append(wgt * valid.astype(wgt.dtype) * a)
        offset += h * w
    idx = jnp.stack(idx_parts, axis=-1).reshape(B, Lq, H, -1)
    wgt = jnp.stack(wgt_parts, axis=-1).reshape(B, Lq, H, -1)
    # -> [B,H,Lq,C]
    return idx.transpose(0, 2, 1, 3), wgt.transpose(0, 2, 1, 3)


def _kernel(value_ref, idx_ref, wgt_ref, out_ref):
    """Per (bh, query-tile): gather C rows per query from the VMEM value
    table and reduce with the folded weights."""
    v = value_ref[0]                   # [Lv, hd] (VMEM)
    idx = idx_ref[0]                   # [T, C]
    wgt = wgt_ref[0]                   # [T, C]
    T, C = idx.shape
    g = jnp.take(v, idx.reshape(-1), axis=0, fill_value=0)  # [T*C, hd]
    g = g.reshape(T, C, v.shape[-1]).astype(jnp.float32)
    out_ref[0] = jnp.einsum("tcd,tc->td", g, wgt.astype(jnp.float32)).astype(
        out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("spatial_shapes_t", "tile"))
def _pallas_forward(value, idx, wgt, spatial_shapes_t, tile):
    B, Lv, H, hd = value.shape
    Lq = idx.shape[2]
    C = idx.shape[3]
    vt = value.transpose(0, 2, 1, 3).reshape(B * H, Lv, hd)
    idx2 = idx.reshape(B * H, Lq, C)
    wgt2 = wgt.reshape(B * H, Lq, C)

    # pad queries to a tile multiple
    pad = (-Lq) % tile
    if pad:
        idx2 = jnp.pad(idx2, ((0, 0), (0, pad), (0, 0)))
        wgt2 = jnp.pad(wgt2, ((0, 0), (0, pad), (0, 0)))
    n_tiles = (Lq + pad) // tile

    out = pl.pallas_call(
        _kernel,
        grid=(B * H, n_tiles),
        in_specs=[
            pl.BlockSpec((1, Lv, hd), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, hd), lambda bh, t: (bh, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq + pad, hd), value.dtype),
    )(vt, idx2, wgt2)

    out = out[:, :Lq].reshape(B, H, Lq, hd).transpose(0, 2, 1, 3)
    return out.reshape(B, Lq, H * hd)


def ms_deform_attn_pallas(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    tile: int = 512,
) -> jnp.ndarray:
    """Pallas forward (no custom VJP — use the XLA impl for training)."""
    idx, wgt = _prepare_indices_weights(
        tuple(spatial_shapes), sampling_locations, attention_weights)
    return _pallas_forward(value, idx, wgt, tuple(spatial_shapes), tile)
