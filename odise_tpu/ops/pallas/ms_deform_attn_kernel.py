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
  * ALL large levels are served by ONE ``pallas_call``: their quad tables are
    concatenated along rows (level row offsets folded into the indices), and
    each query carries ``P_eff = n_large_levels * n_points`` samples. At the
    1024px encoder shapes that is one 5 MB VMEM-resident table (16384 + 4096
    rows x 128 lanes x bf16) and 6 kernel launches per forward instead of 12
    — halving the fixed pallas_call overhead and the XLA<->kernel boundary
    buffers that cost the per-level variant its op-level win end-to-end.
  * Grid is ``(B*H, query_tiles)`` with the table block's index_map constant
    in the tile coordinate, so Mosaic DMAs the table into VMEM once per
    (batch, head) and revisits it for every tile.
  * Per tile, a scalar ``fori_loop`` copies ``tile*P_eff`` dynamically-indexed
    table rows into a VMEM scratch block (indices come from SMEM); then the
    4 corner weights of every sample are expanded to the 128-lane row layout
    with ONE tiny MXU matmul against a static [4, 128] corner-selector
    matrix, the weighted rows are reduced over the P_eff samples, and the 4
    corner sub-rows are folded — all fully vectorized. (A bf16 within-8-block
    row select was tried and rejected: Mosaic lowers minor-dim insertion —
    the [S, 8] -> [S, 8, 1] mask reshape — only for 32-bit vectors.)
  * Backward is the XLA quad path's VJP via ``jax.custom_vjp`` (the two
    forwards are mathematically identical, so the gradients agree; the
    kernel targets the eval/encoder hot path).

Numerics match the XLA quad path: f32 sampling locations / corner weights,
value-dtype (bf16) row storage, f32 accumulation.

Status (measured on v5e 2026-08-18): WORKS on hardware and, at the default
config (q_tile=128, FULL loop unroll so Mosaic software-pipelines the VMEM
loads), is the FASTEST impl at the production encoder shapes (21504
queries, 1024px): **16.4 ms net vs 21.5 (quad) / 23.2 (hybrid)** the same
day, compiling in ~12 s. Mosaic constraints hit along the way, worked
around here: SMEM blocks need an 8-divisible (or full-dim) sublane dim;
``fori_loop`` lowers only with unroll=1 or a FULL unroll (unroll=1 runs
40.4 ms — the scalar loop dominates without pipelining); dynamic VMEM
sublane indices must be provably 8-aligned (hence the aligned 8-row block
load + one-hot row-select folded into the linear weighting); q_tile=512
overflows the 16 MB scoped-VMEM stack (16.5 MB). quad/hybrid remain the
bench/production defaults until the full eval graph is revalidated on
hardware with this kernel inside.
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

    def kernel(idx_ref, w4_ref, w8_ref, table_ref, out_ref, g8_ref):
        # idx_ref: SMEM [BH, S] i32 (Mosaic requires the sublane dim of an
        # SMEM block to be 8-divisible or the full array dim, so the block
        # carries ALL bh rows and the kernel picks its row by program_id);
        # w4_ref: VMEM [1, S, 4] f32; w8_ref: VMEM [1, S, 8] one-hot of
        # idx%8 (table dtype); table_ref: VMEM [1, R_pad, 4*hd];
        # g8_ref: scratch [S, 8, 4*hd]
        #
        # Mosaic cannot load ONE dynamically-indexed VMEM row (the sublane
        # index must be provably 8-aligned), so each sample loads its ALIGNED
        # 8-row block and the within-block row choice — which is linear —
        # folds into the weighting as a one-hot [S, 8] contraction on the VPU.
        bh = pl.program_id(0)

        def body(j, _):
            a8 = pl.multiple_of((idx_ref[bh, j] // 8) * 8, 8)
            g8_ref[j] = table_ref[0, pl.ds(a8, 8), :]
            return 0

        # Mosaic's fori_loop lowering supports only unroll=1 or a FULL
        # unroll (unroll == num_steps); full is the default — it is what
        # lets Mosaic pipeline the loads (16.4 vs 40.4 ms measured)
        jax.lax.fori_loop(0, S, body, 0, unroll=unroll)

        # select each sample's row from its 8-row block (one-hot contraction;
        # the mask stays f32 — Mosaic only lowers minor-dim insertion for
        # 32-bit vectors, so a bf16 [S,8,1] mask reshape fails to compile)
        rows = jnp.sum(g8_ref[:].astype(jnp.float32)
                       * w8_ref[0][:, :, None], axis=1)    # [S, 4*hd]

        # corner-selector: E[c, lane] = 1 iff lane // hd == c; ONE tiny MXU
        # matmul expands each sample's 4 corner weights to the 128-lane row
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * hd), 1) // hd
        corner = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * hd), 0)
        E = (lane_c == corner).astype(jnp.float32)
        W = jnp.dot(w4_ref[0], E, preferred_element_type=jnp.float32)  # [S,128]

        p = rows * W
        p = jnp.sum(p.reshape(QT, P, 4 * hd), axis=1)      # reduce points
        out_ref[0] = (p[:, :hd] + p[:, hd:2 * hd]
                      + p[:, 2 * hd:3 * hd] + p[:, 3 * hd:])  # fold corners

    return kernel


@functools.partial(jax.jit, static_argnames=("q_tile", "unroll"))
def _pallas_level_gather(table: jnp.ndarray, idx: jnp.ndarray,
                         w4: jnp.ndarray, q_tile: int = 128,
                         unroll: int = 0) -> jnp.ndarray:
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
    if unroll == 0:
        # FULL unroll (Mosaic's only alternative to unroll=1): lets Mosaic
        # software-pipeline the per-sample VMEM block loads — measured 16.4
        # vs 40.4 ms net at q_tile=128 on v5e. Bigger tiles OOM the 16 MB
        # scoped-VMEM stack (q_tile=512: 16.5 MB) — 128 is the sweet spot.
        unroll = S

    idx_flat = idx.reshape(BH, Lq_pad * P)
    w8 = jax.nn.one_hot(idx_flat % 8, 8, dtype=jnp.float32)
    out = pl.pallas_call(
        _make_level_kernel(q_tile, P, hd, unroll),
        grid=(BH, n_tiles),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((BH, S), lambda bh, t: (0, t),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, 4), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 8), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R + r_pad, four_hd), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, hd), lambda bh, t: (bh, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Lq_pad, hd), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, 8, four_hd), table.dtype)],
        # the merged multi-level table (5 MB) + f32 scratch exceed the 16 MB
        # default scoped-VMEM budget at q_tile=128 (16.7 MB); v5e has 128 MB
        # of VMEM — raise the cap and let Mosaic allocate what it needs
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(idx_flat, w4.reshape(BH, Lq_pad * P, 4), w8, table)
    return out[:, :Lq]


def _pallas_forward(value, spatial_shapes, sampling_locations,
                    attention_weights, matmul_max_rows: int = 1024,
                    q_tile: int = 128, unroll: int = 0):
    """Hybrid forward: one-hot matmul for small levels (MXU, same as the XLA
    hybrid path), ONE merged VMEM-resident Pallas gather for all large levels
    (their quad tables concatenated along rows, per-query samples stacked
    level-major so P_eff = n_large * n_points)."""
    from ..ms_deform_attn import _matmul_level

    B, Len_v, n_heads, head_dim = value.shape
    v_bh = value.transpose(0, 2, 1, 3).reshape(B * n_heads, Len_v, head_dim)

    offsets = []
    off = 0
    for (h, w) in spatial_shapes:
        offsets.append(off)
        off += h * w

    out = 0.0
    tables = []
    idx_parts = []
    w4_parts = []
    row_off = 0
    for i, (h, w) in enumerate(spatial_shapes):
        v_lvl = v_bh[:, offsets[i]:offsets[i] + h * w]
        loc = sampling_locations[:, :, :, i]
        att = attention_weights[:, :, :, i]
        if h * w <= matmul_max_rows:
            out = out + _matmul_level(v_lvl, h, w, loc, att)
        else:
            tables.append(_level_quad_table(v_lvl, w))
            idx, w4 = _level_idx_w4(loc, att, h, w)
            idx_parts.append(idx + row_off)  # fold level offset into the row
            w4_parts.append(w4)
            row_off += h * w

    if tables:
        table = (tables[0] if len(tables) == 1
                 else jnp.concatenate(tables, axis=1))
        Lq = idx_parts[0].shape[1]
        # [B,Lq,H,L,P] -> [BH, Lq, L*P]; samples level-major per query
        idx = jnp.stack(idx_parts, axis=3)
        w4 = jnp.stack(w4_parts, axis=3)
        idx = idx.transpose(0, 2, 1, 3, 4).reshape(B * n_heads, Lq, -1)
        w4 = w4.transpose(0, 2, 1, 3, 4, 5).reshape(B * n_heads, Lq, -1, 4)
        g = _pallas_level_gather(table, idx, w4, q_tile=q_tile, unroll=unroll)
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
