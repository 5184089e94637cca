"""Hungarian matcher with point-sampled costs, fully on device.

Capability parity with ``HungarianMatcher`` (reference third_party/Mask2Former/
mask2former/modeling/matcher.py:96-189): per-image cost = class cost
(-prob[target]) + point-sampled sigmoid-BCE + dice over ``num_points`` shared
random points, solved with linear assignment. The reference syncs to the CPU
for scipy per image (matcher.py:149-156); here the LAP runs on device
(odise_tpu.ops.lap) under fixed shapes: targets are padded to a static T with
a validity mask.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.grid_sample import point_sample
from ..ops.lap import linear_sum_assignment


class MatchResult(NamedTuple):
    matched_query: jnp.ndarray  # [B, T] int32: query index assigned to target t
    valid: jnp.ndarray          # [B, T] bool (copied from targets)


def batch_sigmoid_ce_cost(pred_pts: jnp.ndarray, tgt_pts: jnp.ndarray) -> jnp.ndarray:
    """[Q, P] pred logits x [T, P] targets -> [Q, T] mean BCE cost."""
    P = pred_pts.shape[-1]
    pos = jax.nn.softplus(-pred_pts)        # -log sigmoid(x)
    neg = jax.nn.softplus(pred_pts)         # -log(1 - sigmoid(x))
    # cost[q, t] = mean_p [ pos[q,p] * tgt[t,p] + neg[q,p] * (1 - tgt[t,p]) ]
    return (jnp.einsum("qp,tp->qt", pos, tgt_pts)
            + jnp.einsum("qp,tp->qt", neg, 1.0 - tgt_pts)) / P


def batch_dice_cost(pred_pts: jnp.ndarray, tgt_pts: jnp.ndarray) -> jnp.ndarray:
    """[Q, P] x [T, P] -> [Q, T] dice cost."""
    p = jax.nn.sigmoid(pred_pts)
    numerator = 2.0 * jnp.einsum("qp,tp->qt", p, tgt_pts)
    denominator = p.sum(-1)[:, None] + tgt_pts.sum(-1)[None, :]
    return 1.0 - (numerator + 1.0) / (denominator + 1.0)


def hungarian_match(
    pred_logits: jnp.ndarray,   # [B, Q, K+1]
    pred_masks: jnp.ndarray,    # [B, Q, h, w]
    gt_labels: jnp.ndarray,     # [B, T] int32 (any value where invalid)
    gt_masks: jnp.ndarray,      # [B, T, H, W] float (0/1)
    gt_valid: jnp.ndarray,      # [B, T] bool
    rng: jax.Array,
    num_points: int = 12544,
    cost_class: float = 2.0,
    cost_mask: float = 5.0,
    cost_dice: float = 5.0,
) -> MatchResult:
    """Batched on-device Hungarian matching. Returns, per valid target, its
    assigned query (arbitrary for invalid targets)."""
    B, Q, K1 = pred_logits.shape
    T = gt_labels.shape[1]
    assert T <= Q, "pad targets to at most num_queries"

    rngs = jax.random.split(rng, B)

    def per_image(logits, masks, labels, tgt_masks, valid, key):
        prob = jax.nn.softmax(logits, axis=-1)  # [Q, K+1]
        cc = -prob[:, jnp.clip(labels, 0, K1 - 2)]  # [Q, T]

        pts = jax.random.uniform(key, (1, num_points, 2))
        pred_pts = point_sample(masks[:, :, :, None],  # [Q, h, w, 1]
                                jnp.broadcast_to(pts, (Q, num_points, 2)),
                                align_corners=False)[..., 0]  # [Q, P]
        tgt_pts = point_sample(tgt_masks[:, :, :, None],
                               jnp.broadcast_to(pts, (T, num_points, 2)),
                               align_corners=False)[..., 0]  # [T, P]

        cm = batch_sigmoid_ce_cost(pred_pts, tgt_pts)
        cd = batch_dice_cost(pred_pts, tgt_pts)
        cost = cost_class * cc + cost_mask * cm + cost_dice * cd
        # Invalid targets cost slightly more than any real entry. The penalty
        # must stay on the data's scale: a huge constant (e.g. 1e6) would blow
        # up the auction's bidding increment (eps ~ cost range) and destroy
        # assignment precision for the real entries.
        real_max = jnp.max(jnp.where(valid[None, :], cost, -jnp.inf))
        real_max = jnp.where(jnp.isfinite(real_max), real_max, 0.0)
        cost = jnp.where(valid[None, :], cost, real_max + 1.0)
        col_of_row = linear_sum_assignment(cost)  # [Q], values in [0, Q)
        # invert: for each target t, the query assigned to it
        matched_q = jnp.full((T,), 0, jnp.int32)
        rows = jnp.arange(Q, dtype=jnp.int32)
        matched_q = matched_q.at[jnp.where(col_of_row < T, col_of_row, T)].set(
            rows, mode="drop")
        return matched_q

    matched = jax.vmap(per_image)(pred_logits, pred_masks, gt_labels, gt_masks,
                                  gt_valid, rngs)
    return MatchResult(matched_query=matched, valid=gt_valid)
