"""Kernel-vs-reference tests, mirroring the reference's ops/test.py pattern
(CUDA-vs-pytorch forward equivalence + gradcheck): our XLA ops are checked
against torch CPU oracles and scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odise_tpu.ops.grid_sample import grid_sample, point_sample
from odise_tpu.ops.lap import auction_lap, linear_sum_assignment
from odise_tpu.ops.ms_deform_attn import ms_deform_attn


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    im = rng.randn(2, 5, 7, 3).astype(np.float32)  # NHWC
    grid = (rng.rand(2, 11, 2).astype(np.float32) * 2.4 - 1.2)  # includes OOB

    ours = np.asarray(grid_sample(jnp.asarray(im), jnp.asarray(grid)))

    im_t = torch.from_numpy(im).permute(0, 3, 1, 2)  # NCHW
    grid_t = torch.from_numpy(grid).unsqueeze(2)  # [B, N, 1, 2]
    ref = F.grid_sample(im_t, grid_t, mode="bilinear", padding_mode="zeros",
                        align_corners=False)
    ref = ref.squeeze(-1).permute(0, 2, 1).numpy()  # [B, N, C]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_grid_sample_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    im = rng.randn(1, 4, 4, 2).astype(np.float32)
    grid = (rng.rand(1, 9, 2).astype(np.float32) * 2 - 1)
    ours = np.asarray(grid_sample(jnp.asarray(im), jnp.asarray(grid), align_corners=True))
    im_t = torch.from_numpy(im).permute(0, 3, 1, 2)
    ref = F.grid_sample(im_t, torch.from_numpy(grid).unsqueeze(2), align_corners=True)
    ref = ref.squeeze(-1).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_point_sample_center():
    im = jnp.arange(16.0).reshape(1, 4, 4, 1)
    # point at exact center of pixel (1,1): normalized ((1+0.5)/4, (1+0.5)/4)
    pts = jnp.array([[[1.5 / 4, 1.5 / 4]]])
    out = point_sample(im, pts)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], 5.0, atol=1e-5)


def _torch_ms_deform_attn_ref(value, shapes, loc, weights):
    """Pure-torch reference of the deformable-attn math (as in the paper)."""
    import torch
    import torch.nn.functional as F

    value = torch.from_numpy(value)
    loc = torch.from_numpy(loc)
    weights = torch.from_numpy(weights)
    B, _, n_heads, hd = value.shape
    _, Lq, _, n_levels, n_points, _ = loc.shape
    value_list = value.split([h * w for h, w in shapes], dim=1)
    sampling_grids = 2 * loc - 1
    out = torch.zeros(B, Lq, n_heads, hd)
    for lvl, (h, w) in enumerate(shapes):
        v = value_list[lvl].reshape(B, h, w, n_heads, hd)
        v = v.permute(0, 3, 4, 1, 2).reshape(B * n_heads, hd, h, w)
        g = sampling_grids[:, :, :, lvl].permute(0, 2, 1, 3, 4)
        g = g.reshape(B * n_heads, Lq, n_points, 2)
        sampled = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                                align_corners=False)  # [B*h, hd, Lq, P]
        sampled = sampled.reshape(B, n_heads, hd, Lq, n_points)
        w_l = weights[:, :, :, lvl].permute(0, 2, 1, 3)  # [B, heads, Lq, P]
        out += torch.einsum("bhcqp,bhqp->bqhc", sampled, w_l)
    return out.reshape(B, Lq, n_heads * hd).numpy()


def test_ms_deform_attn_matches_torch_reference():
    pytest.importorskip("torch")
    rng = np.random.RandomState(42)
    shapes = [(6, 8), (3, 4)]
    B, n_heads, hd, Lq, n_points = 2, 4, 8, 10, 4
    Lv = sum(h * w for h, w in shapes)
    value = rng.randn(B, Lv, n_heads, hd).astype(np.float32)
    loc = rng.rand(B, Lq, n_heads, len(shapes), n_points, 2).astype(np.float32)
    w = rng.rand(B, Lq, n_heads, len(shapes), n_points).astype(np.float32)
    w /= w.sum(axis=(-2, -1), keepdims=True)

    ours = np.asarray(ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                                     jnp.asarray(w)))
    ref = _torch_ms_deform_attn_ref(value, shapes, loc, w)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_differentiable():
    shapes = [(4, 4)]
    value = jnp.ones((1, 16, 2, 4))
    loc = jnp.full((1, 3, 2, 1, 2, 2), 0.5)
    w = jnp.full((1, 3, 2, 1, 2), 0.5)

    def loss(v):
        return jnp.sum(ms_deform_attn(v, shapes, loc, w) ** 2)

    g = jax.grad(loss)(value)
    assert g.shape == value.shape
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).sum()) > 0


def test_auction_lap_square_matches_scipy():
    from scipy.optimize import linear_sum_assignment as scipy_lap

    rng = np.random.RandomState(7)
    for n in [4, 16, 50]:
        cost = rng.rand(n, n).astype(np.float32) * 10
        col = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
        assert sorted(col.tolist()) == list(range(n))  # valid permutation
        ours = cost[np.arange(n), col].sum()
        r, c = scipy_lap(cost)
        ref = cost[r, c].sum()
        assert ours <= ref + 1e-3 * n, (ours, ref)


def test_auction_lap_rectangular():
    from scipy.optimize import linear_sum_assignment as scipy_lap

    rng = np.random.RandomState(3)
    cost = rng.rand(10, 4).astype(np.float32)
    col = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    matched = {int(c): int(r) for r, c in enumerate(col) if c < 4}
    assert len(matched) == 4  # every real column assigned exactly once
    ours = sum(cost[r, c] for c, r in matched.items())
    r_ref, c_ref = scipy_lap(cost)
    ref = cost[r_ref, c_ref].sum()
    assert ours <= ref + 1e-3, (ours, ref)


def test_auction_lap_jits():
    cost = jnp.asarray(np.random.RandomState(0).rand(20, 20), jnp.float32)
    f = jax.jit(lambda c: auction_lap(-c))
    col = np.asarray(f(cost))
    assert sorted(col.tolist()) == list(range(20))


def test_ms_deform_attn_fused_matches_reference():
    rng = np.random.RandomState(11)
    shapes = [(6, 8), (3, 4)]
    B, n_heads, hd, Lq, n_points = 2, 4, 8, 10, 4
    Lv = sum(h * w for h, w in shapes)
    value = rng.randn(B, Lv, n_heads, hd).astype(np.float32)
    loc = rng.rand(B, Lq, n_heads, len(shapes), n_points, 2).astype(np.float32)
    # include out-of-bounds locations to exercise zero padding
    loc = loc * 1.4 - 0.2
    w = rng.rand(B, Lq, n_heads, len(shapes), n_points).astype(np.float32)
    w /= w.sum(axis=(-2, -1), keepdims=True)

    ref = np.asarray(ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                                    jnp.asarray(w), impl="reference"))
    fused = np.asarray(ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                                      jnp.asarray(w), impl="fused"))
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_fused_differentiable():
    shapes = [(4, 4)]
    value = jnp.ones((1, 16, 2, 4))
    loc = jnp.full((1, 3, 2, 1, 2, 2), 0.5)
    w = jnp.full((1, 3, 2, 1, 2), 0.5)
    g = jax.grad(lambda v: jnp.sum(ms_deform_attn(v, shapes, loc, w) ** 2))(value)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).sum()) > 0


def test_ms_deform_attn_quad_matches_reference():
    """Quad-row gather must be numerically identical to the fused/reference
    paths, including out-of-bounds corner masking and the cyclic wrap of the
    top-left index (negative x0/y0, bottom/right edges)."""
    rng = np.random.RandomState(13)
    shapes = [(6, 8), (3, 4), (5, 5)]
    B, n_heads, hd, Lq, n_points = 2, 4, 8, 10, 4
    Lv = sum(h * w for h, w in shapes)
    value = rng.randn(B, Lv, n_heads, hd).astype(np.float32)
    loc = rng.rand(B, Lq, n_heads, len(shapes), n_points, 2).astype(np.float32)
    # heavy out-of-bounds coverage: corners off every edge
    loc = loc * 1.8 - 0.4
    w = rng.rand(B, Lq, n_heads, len(shapes), n_points).astype(np.float32)
    w /= w.sum(axis=(-2, -1), keepdims=True)

    ref = np.asarray(ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                                    jnp.asarray(w), impl="reference"))
    quad = np.asarray(ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                                     jnp.asarray(w), impl="quad"))
    np.testing.assert_allclose(quad, ref, rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_quad_differentiable():
    shapes = [(4, 4)]
    value = jnp.ones((1, 16, 2, 4))
    loc = jnp.full((1, 3, 2, 1, 2, 2), 0.5)
    w = jnp.full((1, 3, 2, 1, 2), 0.5)
    g = jax.grad(lambda v: jnp.sum(
        ms_deform_attn(v, shapes, loc, w, impl="quad") ** 2))(value)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).sum()) > 0


def test_auction_lap_tied_costs_matcher_distribution():
    """Drift check on matcher-like cost matrices (VERDICT weak #5): 100
    queries vs few targets with heavily-tied, quantized costs — the
    distribution after convergence where many queries predict near-identical
    masks. The auction's TOTAL cost must match scipy's optimum tightly even
    when individual assignments differ among ties."""
    from scipy.optimize import linear_sum_assignment as scipy_lap

    rng = np.random.RandomState(42)
    for trial in range(10):
        Q, T = 100, rng.randint(2, 15)
        # class cost in {-1, 0} (one-hot-ish), mask/dice quantized to a
        # coarse grid so exact ties are common
        cls_cost = -(rng.rand(Q, T) < 0.2).astype(np.float32) * 2.0
        mask_cost = np.round(rng.rand(Q, T) * 8) / 8 * 5.0
        dice_cost = np.round(rng.rand(Q, T) * 4) / 4 * 5.0
        cost = cls_cost + mask_cost + dice_cost
        # duplicate queries: rows that are exactly identical
        for _ in range(Q // 4):
            a, b = rng.randint(0, Q, 2)
            cost[a] = cost[b]
        cost = cost.astype(np.float32)
        col = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
        matched = {int(c): int(r) for r, c in enumerate(col) if c < T}
        assert len(matched) == T, trial
        ours = sum(cost[r, c] for c, r in matched.items())
        rr, cc = scipy_lap(cost)
        ref = cost[rr, cc].sum()
        # tie-tolerant: total assignment cost within auction epsilon bound
        assert ours <= ref + 1e-3 * T + 1e-5, (trial, ours, ref)


def test_ms_deform_attn_hybrid_matches_reference():
    """Hybrid (matmul small levels + quad large) == reference oracle."""
    rng = np.random.RandomState(7)
    B, H, hd, P = 2, 4, 8, 4
    shapes = [(12, 16), (6, 8), (3, 4)]
    Lv = sum(h * w for h, w in shapes)
    Lq = 50
    value = jnp.asarray(rng.randn(B, Lv, H, hd).astype(np.float32))
    loc = jnp.asarray(rng.rand(B, Lq, H, len(shapes), P, 2).astype(np.float32))
    # include out-of-bounds samples
    loc = loc * 1.2 - 0.1
    att = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Lq, H, len(shapes), P).astype(np.float32)).reshape(
        B, Lq, H, -1), -1).reshape(B, Lq, H, len(shapes), P)
    ref = ms_deform_attn(value, shapes, loc, att, impl="reference")
    for cutoff in (0, 50, 10**9):  # all-quad / mixed / all-matmul
        from odise_tpu.ops.ms_deform_attn import _hybrid_impl
        out = _hybrid_impl(value, shapes, loc, att, matmul_max_rows=cutoff)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-2, atol=2e-3)


def test_ms_deform_attn_hybrid_differentiable():
    rng = np.random.RandomState(8)
    B, H, hd, P = 1, 2, 4, 2
    shapes = [(6, 8), (3, 4)]
    Lv = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.randn(B, Lv, H, hd).astype(np.float32))
    loc = jnp.asarray(rng.rand(B, 10, H, 2, P, 2).astype(np.float32))
    att = jnp.full((B, 10, H, 2, P), 1.0 / (2 * P), jnp.float32)

    def f(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a, impl="hybrid") ** 2)

    gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(value, loc, att)
    for g in (gv, gl, ga):
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0


def test_ms_deform_attn_pallas_matches_reference():
    """VMEM-resident Pallas gather (interpret mode on CPU) == reference
    oracle, incl. out-of-bounds corners, the cyclic top-left wrap, query
    padding to the tile size, and the matmul/pallas hybrid split."""
    from odise_tpu.ops.pallas.ms_deform_attn_kernel import _pallas_forward

    rng = np.random.RandomState(21)
    B, H, hd, P = 2, 2, 8, 4
    shapes = [(12, 16), (6, 8), (3, 4)]
    Lv = sum(h * w for h, w in shapes)
    Lq = 50
    value = jnp.asarray(rng.randn(B, Lv, H, hd).astype(np.float32))
    loc = jnp.asarray(rng.rand(B, Lq, H, len(shapes), P, 2).astype(np.float32))
    loc = loc * 1.4 - 0.2
    att = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Lq, H, len(shapes), P).astype(np.float32)).reshape(
        B, Lq, H, -1), -1).reshape(B, Lq, H, len(shapes), P)
    ref = ms_deform_attn(value, shapes, loc, att, impl="reference")
    for cutoff in (0, 50):  # all-pallas / mixed matmul+pallas
        out = _pallas_forward(value, tuple(shapes), loc, att,
                              matmul_max_rows=cutoff, q_tile=32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_pallas_differentiable():
    """impl="pallas" end-to-end: custom_vjp backward (XLA quad VJP) produces
    finite, nonzero grads for value / locations / attention weights."""
    rng = np.random.RandomState(22)
    B, H, hd, P = 1, 2, 4, 2
    shapes = [(40, 40), (3, 4)]  # first level above the matmul cutoff
    Lv = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.randn(B, Lv, H, hd).astype(np.float32))
    loc = jnp.asarray(rng.rand(B, 10, H, 2, P, 2).astype(np.float32))
    att = jnp.full((B, 10, H, 2, P), 1.0 / (2 * P), jnp.float32)

    def f(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a, impl="pallas") ** 2)

    gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(value, loc, att)
    for g in (gv, gl, ga):
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0


def test_grid_sample_quad_c1_matches_general_path():
    """The single-channel quad-row fast path must equal the general
    multi-channel gather path exactly (force the general path by
    duplicating the channel)."""
    from odise_tpu.ops.grid_sample import grid_sample

    rng = np.random.RandomState(11)
    im = jnp.asarray(rng.randn(3, 9, 13, 1).astype(np.float32))
    grid = jnp.asarray((rng.rand(3, 500, 2) * 2.4 - 1.2).astype(np.float32))
    fast = grid_sample(im, grid)
    general = grid_sample(jnp.concatenate([im, im], -1), grid)[..., :1]
    np.testing.assert_allclose(np.asarray(fast), np.asarray(general),
                               rtol=1e-6, atol=1e-6)
    for ac in (True, False):
        f = grid_sample(im, grid, align_corners=ac)
        g = grid_sample(jnp.concatenate([im, im], -1), grid,
                        align_corners=ac)[..., :1]
        np.testing.assert_allclose(np.asarray(f), np.asarray(g), atol=1e-6)


def test_grid_sample_quad_override_equal_and_differentiable():
    """Explicit quad=True/False must agree with each other and the auto
    heuristic, in value AND gradient (the override only moves time between
    a table build and scatter-adds; see CriterionConfig.pred_quad_sample)."""
    import jax

    from odise_tpu.ops.grid_sample import point_sample

    rng = np.random.RandomState(17)
    im = jnp.asarray(rng.randn(2, 11, 7, 1).astype(np.float32))
    pts = jnp.asarray((rng.rand(2, 200, 2) * 1.2 - 0.1).astype(np.float32))

    auto = point_sample(im, pts)
    for q in (True, False):
        np.testing.assert_allclose(np.asarray(point_sample(im, pts, quad=q)),
                                   np.asarray(auto), rtol=1e-6, atol=1e-6)
    g_true = jax.grad(lambda m: point_sample(m, pts, quad=True).sum())(im)
    g_false = jax.grad(lambda m: point_sample(m, pts, quad=False).sum())(im)
    np.testing.assert_allclose(np.asarray(g_true), np.asarray(g_false),
                               rtol=1e-5, atol=1e-5)


def test_point_sample_packed_binary_matches_dense():
    """Bit-plane-packed binary sampling must be exact vs the dense float
    path: the corner values are exactly 0/1 so f32 bilinear weighting is
    unchanged. Cover one-word (N<=32) and multi-word (N>32) packing,
    out-of-range points (zero padding), and both align conventions."""
    from odise_tpu.ops.grid_sample import (point_sample,
                                           point_sample_packed_binary)

    rng = np.random.RandomState(13)
    for N in (20, 40):
        masks = (rng.rand(N, 37, 53) > 0.6).astype(np.float32)
        pts = (rng.rand(N, 300, 2) * 1.4 - 0.2).astype(np.float32)
        for ac in (False, True):
            dense = point_sample(jnp.asarray(masks)[..., None],
                                 jnp.asarray(pts), align_corners=ac)[..., 0]
            packed = point_sample_packed_binary(
                jnp.asarray(masks), jnp.asarray(pts), align_corners=ac)
            np.testing.assert_allclose(np.asarray(packed), np.asarray(dense),
                                       rtol=1e-6, atol=1e-6)


def test_grid_sample_c1_large_map_plain_path():
    """Single-channel maps above the 512^2 quad-table threshold take the
    plain 4-corner gather (the quad table build would dominate at GT-mask
    resolution); it must agree with the quad path run on the same data at a
    sub-threshold shape via zero-padding equivalence, and with small-map
    sampling of the identical region."""
    from odise_tpu.ops.grid_sample import grid_sample

    rng = np.random.RandomState(12)
    H, W = 520, 513  # H*W > 512*512 -> plain path
    im = rng.randn(1, H, W, 1).astype(np.float32)
    pts = (rng.rand(1, 400, 2) * 2.4 - 1.2).astype(np.float32)
    plain = grid_sample(jnp.asarray(im), jnp.asarray(pts))
    # duplicate channel -> general C=2 path (independent of the C=1 branch)
    general = grid_sample(jnp.asarray(np.concatenate([im, im], -1)),
                          jnp.asarray(pts))[..., :1]
    np.testing.assert_allclose(np.asarray(plain), np.asarray(general),
                               rtol=1e-6, atol=1e-6)


def test_ms_deform_attn_quad_split_matches_quad():
    """quad_split (per-level gathers from small own tables) must be
    bit-close to quad (single concatenated-table gather) — same math,
    different gather decomposition (NOTES.md round 5 table-size study)."""
    rng = np.random.RandomState(7)
    shapes = [(16, 16), (8, 8), (4, 4)]
    B, n_heads, hd, n_points = 1, 8, 32, 4
    Lv = sum(h * w for h, w in shapes)
    Lq = Lv
    value = jnp.asarray(rng.randn(B, Lv, n_heads, hd).astype(np.float32))
    loc = jnp.asarray(
        rng.rand(B, Lq, n_heads, len(shapes), n_points, 2).astype(np.float32))
    w = jnp.asarray(
        rng.rand(B, Lq, n_heads, len(shapes), n_points).astype(np.float32))

    a = np.asarray(ms_deform_attn(value, shapes, loc, w, impl="quad"))
    b = np.asarray(ms_deform_attn(value, shapes, loc, w, impl="quad_split"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
