"""Micro-bench the set-criterion internals on the real chip.

VERDICT r2 #4: the criterion (not the model) still dominates the 1024px LSJ
slide train step. This tool splits the per-layer loss-forward cost —
candidate RNG, candidate point-sample, top_k vs approx_max_k uncertainty
selection, final pred/GT point-samples — plus the whole 10-layer criterion
forward and grad, so optimizations target measured numbers instead of
guesses. Reference surface: third_party/Mask2Former/mask2former/modeling/
criterion.py:147-197 (point-sampled losses) and point_features.py (the
PointRend importance sampling).

Run on the chip: python tools/bench_criterion.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from odise_tpu.losses.set_criterion import (
        CriterionConfig, get_uncertain_point_coords_with_randomness,
        set_criterion)
    from odise_tpu.ops.grid_sample import point_sample

    B, Q, K, T, P = 1, 100, 133, 20, 12544
    rng = np.random.RandomState(0)
    masks = jnp.asarray(rng.randn(B, Q, 256, 256), jnp.float32)
    gt_m = jnp.asarray((rng.rand(B, T, 1024, 1024) > 0.7), jnp.float32)
    flat_pred = jnp.asarray(rng.randn(B * T, 256, 256), jnp.float32)
    key = jax.random.PRNGKey(0)
    S = int(P * 3.0)

    @jax.jit
    def tiny(x):
        return jnp.sum(x[0, 0, 0])

    float(tiny(masks))
    t0 = time.perf_counter()
    for _ in range(6):
        float(tiny(masks))
    rtt = (time.perf_counter() - t0) / 6
    print(f"rtt {rtt * 1000:.1f} ms", flush=True)

    def timed(f, args, name, iters=4):
        g = jax.jit(f)
        float(g(*args))
        float(g(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(g(*args))
        dt = ((time.perf_counter() - t0) / iters - rtt) * 1000
        print(f"{name:44s} {dt:8.1f} ms", flush=True)

    n_unc = int(0.75 * P)
    timed(lambda k: jnp.sum(jax.random.uniform(k, (B * T, S, 2))), (key,),
          f"rng uniform cand [{B*T},{S},2]")
    cand = jax.random.uniform(key, (B * T, S, 2))
    timed(lambda m, c: jnp.sum(point_sample(m[..., None], c)),
          (flat_pred, cand), f"point_sample pred256@cand {S}")
    lg = point_sample(flat_pred[..., None], cand)[..., 0]
    timed(lambda l: jnp.sum(jax.lax.top_k(-jnp.abs(l), n_unc)[1]), (lg,),
          f"top_k {n_unc} of {S}")
    timed(lambda l: jnp.sum(jax.lax.approx_max_k(
        -jnp.abs(l), n_unc, recall_target=0.95)[1]), (lg,),
          f"approx_max_k {n_unc} of {S}")
    pts = jax.random.uniform(key, (B * T, P, 2))
    timed(lambda m, c: jnp.sum(point_sample(m[..., None], c)),
          (flat_pred, pts), f"point_sample pred256@final {P}")
    flat_gt = gt_m.reshape(B * T, 1024, 1024)
    timed(lambda m, c: jnp.sum(point_sample(m[..., None], c)),
          (flat_gt, pts), f"point_sample GT1024@final {P}")
    timed(lambda m, c: jnp.sum(point_sample(
        m.astype(jnp.bfloat16)[..., None], c)),
          (flat_gt, pts), f"point_sample GT1024 bf16@final {P}")
    from odise_tpu.ops.grid_sample import point_sample_packed_binary
    timed(lambda m, c: jnp.sum(point_sample_packed_binary(m, c)),
          (flat_gt, pts), f"packed-binary GT1024@final {P}")
    for approx in (False, True):
        timed(lambda m, k, a=approx: jnp.sum(
            get_uncertain_point_coords_with_randomness(
                m, k, P, 3.0, 0.75, approx_topk=a)),
              (flat_pred, key), f"uncertainty sampling x1 approx={approx}")

    logits = jnp.asarray(rng.randn(B, Q, K + 1), jnp.float32)
    gt_l = jnp.asarray(rng.randint(0, K, (B, T)), jnp.int32)
    valid = jnp.ones((B, T), bool)

    # differentiable pred sampling: quad table vs plain 4-corner gather
    # (the table build re-runs in backward; scatters don't)
    for q in (True, False):
        timed(lambda m, c, q=q: jnp.sum(
            point_sample(m[..., None], c, quad=q)),
              (flat_pred, pts), f"pred fwd point_sample quad={q}")
        timed(lambda m, c, q=q: jax.grad(lambda mm: jnp.sum(
            point_sample(mm[..., None], c, quad=q)))(m).sum(),
              (flat_pred, pts), f"pred grad point_sample quad={q}")

    def crit(o_l, o_m, k, approx, pred_quad=None):
        return sum(set_criterion(
            {"pred_logits": o_l, "pred_masks": o_m,
             "aux_outputs": [{"pred_logits": o_l, "pred_masks": o_m}
                             for _ in range(9)]},
            {"labels": gt_l, "masks": gt_m, "valid": valid}, k,
            CriterionConfig(approx_topk=approx,
                            pred_quad_sample=pred_quad)).values())

    for approx in (False, True):
        timed(lambda o_l, o_m, k, a=approx: crit(o_l, o_m, k, a),
              (logits, masks, key),
              f"set_criterion fwd x10 approx={approx}", iters=2)
        timed(lambda o_l, o_m, k, a=approx: jax.grad(
            lambda m: crit(o_l, m, k, a))(o_m).sum(),
              (logits, masks, key),
              f"set_criterion grad x10 approx={approx}", iters=2)
    for pq in (True, False):
        timed(lambda o_l, o_m, k, p=pq: jax.grad(
            lambda m: crit(o_l, m, k, False, pred_quad=p))(o_m).sum(),
              (logits, masks, key),
              f"set_criterion grad x10 pred_quad={pq}", iters=2)


if __name__ == "__main__":
    main()
