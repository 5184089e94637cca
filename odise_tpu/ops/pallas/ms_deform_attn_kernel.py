"""Pallas TPU kernel for the deformable-attention gather.

The op is fundamentally gather-bound (SURVEY.md hard part #4: the reference
solves it with a CUDA im2col kernel, ``ms_deform_im2col_cuda.cuh:242-928``).
The XLA paths in ``ops/ms_deform_attn.py`` stream quad rows from HBM through
XLA's gather unit; this kernel instead keeps one (batch*head) level table
RESIDENT IN VMEM across all query tiles and serves each sample with a VMEM
row load — no HBM transaction per sample at all.

Design (``impl="pallas"`` routes large levels here, small levels keep the
one-hot-matmul path — same split as ``impl="hybrid"``):

  * The quad-row trick from the XLA path carries over: each table row is the
    4 bilinear corners concatenated (``4*head_dim == 128`` — exactly one
    vector register row), built with three cyclic rolls outside the kernel.
  * Grid is ``(B*H, query_tiles)`` with the table block's index_map constant
    in the tile coordinate, so Mosaic DMAs the table into VMEM once per
    (batch, head) and revisits it for every tile (stride-8 level at 1024px:
    16384 rows x 128 lanes x bf16 = 4 MB, well inside VMEM).
  * Per tile, a scalar ``fori_loop`` copies ``tile*P`` dynamically-indexed
    table rows into a VMEM scratch block (indices come from SMEM); then the
    4 corner weights of every sample are expanded to the 128-lane row layout
    with ONE tiny MXU matmul against a static [4, 128] corner-selector
    matrix, the weighted rows are reduced over the P points, and the 4
    corner sub-rows are folded — all fully vectorized.
  * Backward is the XLA quad path's VJP via ``jax.custom_vjp`` (the two
    forwards are mathematically identical, so the gradients agree; the
    kernel targets the eval/encoder hot path).

Numerics match the XLA quad path: f32 sampling locations / corner weights,
value-dtype (bf16) row storage, f32 accumulation.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _level_quad_table(v_bh_lvl: jnp.ndarray, w: int) -> jnp.ndarray:
    """[BH, R, hd] level values -> [BH, R, 4*hd] neighbor-concat quad rows.

    Corner order {+0, +1, +w, +w+1} (cyclic), identical to the XLA quad path
    (ops/ms_deform_attn.py `_quad_impl`).
    """
    return jnp.concatenate([
        v_bh_lvl,
        jnp.roll(v_bh_lvl, -1, axis=1),
        jnp.roll(v_bh_lvl, -w, axis=1),
        jnp.roll(v_bh_lvl, -(w + 1), axis=1),
    ], axis=-1)


def _level_idx_w4(loc_lvl: jnp.ndarray, a_lvl: jnp.ndarray, h: int, w: int):
    """Top-left flat row index (mod h*w, cyclic-roll semantics) and the four
    folded corner weights (bilinear * validity * attention), matching the
    XLA quad path bit-for-bit.

    loc_lvl [B,Lq,H,P,2] in [0,1]; a_lvl [B,Lq,H,P].
    Returns idx [B,Lq,H,P] int32, w4 [B,Lq,H,P,4] f32 (corner order
    {+0, +1, +w, +w+1}).
    """
    loc = loc_lvl.astype(jnp.float32)
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    a = a_lvl.astype(jnp.float32)
    corner_w = []
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            wgt = (1.0 - jnp.abs(x - xi)) * (1.0 - jnp.abs(y - yi))
            valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            corner_w.append(wgt * valid.astype(wgt.dtype) * a)
    base = (y0.astype(jnp.int32) * w + x0.astype(jnp.int32)) % (h * w)
    base = jnp.where(base < 0, base + h * w, base)
    return base, jnp.stack(corner_w, axis=-1)


def _make_level_kernel(QT: int, P: int, hd: int, unroll: int):
    S = QT * P

    def kernel(idx_ref, w4_ref, table_ref, out_ref, g_ref):
        # idx_ref: SMEM [1, S] i32; w4_ref: VMEM [1, S, 4] f32
        # table_ref: VMEM [1, R_pad, 4*hd]; g_ref: VMEM scratch [S, 4*hd]
        def body(j, _):
            g_ref[pl.ds(j, 1), :] = table_ref[0, pl.ds(idx_ref[0, j], 1), :]
            return 0

        jax.lax.fori_loop(0, S, body, 0, unroll=unroll)

        # corner-selector: E[c, lane] = 1 iff lane // hd == c; ONE tiny MXU
        # matmul expands each sample's 4 corner weights to the 128-lane row
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * hd), 1) // hd
        corner = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * hd), 0)
        E = (lane_c == corner).astype(jnp.float32)
        W = jnp.dot(w4_ref[0], E, preferred_element_type=jnp.float32)  # [S,128]

        p = g_ref[:].astype(jnp.float32) * W
        p = jnp.sum(p.reshape(QT, P, 4 * hd), axis=1)      # reduce points
        out_ref[0] = (p[:, :hd] + p[:, hd:2 * hd]
                      + p[:, 2 * hd:3 * hd] + p[:, 3 * hd:])  # fold corners

    return kernel


@functools.partial(jax.jit, static_argnames=("q_tile", "unroll"))
def _pallas_level_gather(table: jnp.ndarray, idx: jnp.ndarray,
                         w4: jnp.ndarray, q_tile: int = 256,
                         unroll: int = 8) -> jnp.ndarray:
    """One level's gather+reduce. table [BH, R, 4*hd] (any dtype); idx
    [BH, Lq, P] i32 (< R); w4 [BH, Lq, P, 4] f32. Returns [BH, Lq, hd] f32.
    """
    BH, R, four_hd = table.shape
    hd = four_hd // 4
    _, Lq, P = idx.shape

    # sublane alignment for the table block; extra rows are never indexed
    r_pad = (-R) % 32
    if r_pad:
        table = jnp.pad(table, ((0, 0), (0, r_pad), (0, 0)))
    q_pad = (-Lq) % q_tile
    if q_pad:
        idx = jnp.pad(idx, ((0, 0), (0, q_pad), (0, 0)))
        w4 = jnp.pad(w4, ((0, 0), (0, q_pad), (0, 0), (0, 0)))
    Lq_pad = Lq + q_pad
    n_tiles = Lq_pad // q_tile
    S = q_tile * P

    out = pl.pallas_call(
        _make_level_kernel(q_tile, P, hd, unroll),
        grid=(BH, n_tiles),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((1, S), lambda bh, t: (bh, t),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, 4), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R + r_pad, four_hd), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, hd), lambda bh, t: (bh, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Lq_pad, hd), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, four_hd), table.dtype)],
    )(idx.reshape(BH, Lq_pad * P), w4.reshape(BH, Lq_pad * P, 4), table)
    return out[:, :Lq]


def _pallas_forward(value, spatial_shapes, sampling_locations,
                    attention_weights, matmul_max_rows: int = 1024,
                    q_tile: int = 256, unroll: int = 8):
    """Hybrid forward: one-hot matmul for small levels (MXU, same as the XLA
    hybrid path), VMEM-resident Pallas gather for large levels."""
    from ..ms_deform_attn import _matmul_level

    B, Len_v, n_heads, head_dim = value.shape
    v_bh = value.transpose(0, 2, 1, 3).reshape(B * n_heads, Len_v, head_dim)

    offsets = []
    off = 0
    for (h, w) in spatial_shapes:
        offsets.append(off)
        off += h * w

    out = 0.0
    for i, (h, w) in enumerate(spatial_shapes):
        v_lvl = v_bh[:, offsets[i]:offsets[i] + h * w]
        loc = sampling_locations[:, :, :, i]
        att = attention_weights[:, :, :, i]
        if h * w <= matmul_max_rows:
            out = out + _matmul_level(v_lvl, h, w, loc, att)
        else:
            idx, w4 = _level_idx_w4(loc, att, h, w)
            Lq = idx.shape[1]
            idx = idx.transpose(0, 2, 1, 3).reshape(B * n_heads, Lq, -1)
            w4 = w4.transpose(0, 2, 1, 3, 4).reshape(B * n_heads, Lq, -1, 4)
            g = _pallas_level_gather(_level_quad_table(v_lvl, w), idx, w4,
                                     q_tile=q_tile, unroll=unroll)
            out = out + g.reshape(B, n_heads, Lq, head_dim).transpose(0, 2, 1, 3)

    B_, Lq = value.shape[0], sampling_locations.shape[1]
    return out.astype(value.dtype).reshape(B_, Lq, n_heads * head_dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights):
    """Multi-scale deformable attention, Pallas VMEM-gather forward.

    Same signature/semantics as ``ms_deform_attn`` (ops/ms_deform_attn.py).
    Backward delegates to the XLA quad path's VJP (identical math).
    """
    return _pallas_forward(value, tuple(spatial_shapes), sampling_locations,
                           attention_weights)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _pallas_forward(value, tuple(spatial_shapes), sampling_locations,
                          attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, res, g):
    from ..ms_deform_attn import _hybrid_impl

    value, sampling_locations, attention_weights = res
    _, vjp = jax.vjp(
        lambda v, l, a: _hybrid_impl(v, tuple(spatial_shapes), l, a),
        value, sampling_locations, attention_weights)
    return vjp(g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
