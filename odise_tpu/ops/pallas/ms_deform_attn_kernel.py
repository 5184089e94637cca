"""Pallas TPU kernel (EXPERIMENTAL) for the deformable-attention gather.

The op is fundamentally gather-bound (SURVEY.md hard part #4: the reference
solves it with a CUDA im2col kernel). This kernel keeps each (batch*head)
value table resident in VMEM (~350 KB at ODISE shapes) and gathers with
Mosaic's ``dynamic_gather``, with index/weight prep (bilinear corners,
validity, attention fold-in) in plain fused XLA.

STATUS — blocked by current Mosaic limitations (kept as documentation and as
the landing slot when support arrives):
  * ``tpu.dynamic_gather`` requires index/output shapes to EQUAL the table
    shape (element-wise take_along_axis) — worked around by tiling queries so
    ``tile * corners == Lv``.
  * index/data bitwidths must match — worked around by gathering in f32.
  * FATAL: "Multiple source vregs along gather dimension" — the gather only
    permutes *within one vreg* (8 sublanes / 128 lanes), so a 5k-row table
    cannot be gathered at all. No formulation fixes this without per-row DMA
    loops (latency-bound) or one-hot matmuls (FLOP-bound, measured worse).

The production path is therefore the XLA single-fused-gather implementation
(`ops/ms_deform_attn.py`, impl="fused"): measured 2.7x faster than per-level
gathers and within ~4x of the pure HBM streaming bound for the same bytes on
v5e. ``ms_deform_attn_pallas`` raises NotImplementedError eagerly so callers
fall back.
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
    """[B,Lq,H,L,P,2] locations -> flat row indices + folded weights.

    Returns idx [B,H,Lq,C] int32 (rows within one head's level-concat table)
    and wgt [B,H,Lq,C] f32 (bilinear * validity * attention).
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
    return idx.transpose(0, 2, 1, 3), wgt.transpose(0, 2, 1, 3)


def _make_kernel(T: int, C: int, hd: int):
    def kernel(value_ref, idx_ref, wgt_ref, out_ref):
        # Mosaic dynamic_gather requires data/index bitwidths to match:
        # gather in f32 (indices are i32)
        v = value_ref[0].astype(jnp.float32)  # [Lv_pad, hd], Lv_pad == T*C
        idx = idx_ref[0]          # [T*C, 1] int32 (sublane-major, 1 lane)
        wgt = wgt_ref[0]          # [T*C, 1] f32
        idxb = jnp.broadcast_to(idx, (T * C, hd))      # lane broadcast
        g = jnp.take_along_axis(v, idxb, axis=0, mode="promise_in_bounds")
        g = g * jnp.broadcast_to(wgt.astype(jnp.float32), (T * C, hd))
        # split sublanes (lane dim untouched) and reduce the corner axis
        out_ref[0] = jnp.sum(g.reshape(T, C, hd), axis=1).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("tile", "corners"))
def _pallas_forward(value_bh, idx, wgt, tile, corners):
    """value_bh [BH, Lv_pad, hd]; idx/wgt [BH, Lq_pad*C, 1] with
    Lq_pad % tile == 0 and Lv_pad == tile*C."""
    BH, Lv_pad, hd = value_bh.shape
    C = corners
    assert Lv_pad == tile * C, (Lv_pad, tile, C)
    Lq_pad = idx.shape[1] // C
    n_tiles = Lq_pad // tile

    return pl.pallas_call(
        _make_kernel(tile, C, hd),
        grid=(BH, n_tiles),
        in_specs=[
            pl.BlockSpec((1, Lv_pad, hd), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile * C, 1), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile * C, 1), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, hd), lambda bh, t: (bh, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Lq_pad, hd), value_bh.dtype),
    )(value_bh, idx, wgt)


def ms_deform_attn_pallas(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    force: bool = False,
) -> jnp.ndarray:
    """Pallas forward (no custom VJP — use the XLA impl for training).

    Currently blocked by Mosaic gather limits (see module docstring); raises
    unless ``force=True`` (for when a future Mosaic lifts the vreg limit).
    """
    if not force:
        raise NotImplementedError(
            "Mosaic dynamic_gather cannot span multiple vregs; use "
            "ms_deform_attn(impl='fused'). Pass force=True to try anyway.")
    B, Lv, H, hd = value.shape
    Lq = sampling_locations.shape[1]
    idx, wgt = _prepare_indices_weights(
        tuple(spatial_shapes), sampling_locations, attention_weights)
    C = idx.shape[-1]

    # tile so that tile * C == padded table size (Mosaic gather contract)
    tile = max(Lv // C, 1)
    Lv_pad = tile * C
    if Lv_pad < Lv:
        tile += 1
        Lv_pad = tile * C
    vt = value.transpose(0, 2, 1, 3).reshape(B * H, Lv, hd)
    if Lv_pad > Lv:
        vt = jnp.pad(vt, ((0, 0), (0, Lv_pad - Lv), (0, 0)))

    pad_q = (-Lq) % tile
    idx2 = idx.reshape(B * H, Lq, C)
    wgt2 = wgt.reshape(B * H, Lq, C)
    if pad_q:
        idx2 = jnp.pad(idx2, ((0, 0), (0, pad_q), (0, 0)))
        wgt2 = jnp.pad(wgt2, ((0, 0), (0, pad_q), (0, 0)))
    # sublane-major single-lane layout for in-kernel lane broadcast
    idx2 = idx2.reshape(B * H, -1, 1)
    wgt2 = wgt2.reshape(B * H, -1, 1)

    out = _pallas_forward(vt, idx2, wgt2, tile, C)
    out = out[:, :Lq].reshape(B, H, Lq, hd).transpose(0, 2, 1, 3)
    return out.reshape(B, Lq, H * hd)
