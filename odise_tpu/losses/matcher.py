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


def match_cost_matrix(
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
) -> jnp.ndarray:
    """Per-image matching cost matrices [B, Q, T] (invalid targets already
    penalized).  Split from the assignment so multiple decoder layers' cost
    matrices can be solved by ONE batched auction — a vmapped
    ``lax.while_loop`` runs max-iterations-over-problems instead of the sum
    of 10 sequential per-layer loops (the dominant train-step cost before
    this split)."""
    B, Q, K1 = pred_logits.shape
    T = gt_labels.shape[1]
    assert T <= Q, "pad targets to at most num_queries"

    rngs = jax.random.split(rng, B)

    def per_image(logits, masks, labels, tgt_masks, valid, key):
        prob = jax.nn.softmax(logits, axis=-1)  # [Q, K+1]
        cc = -prob[:, jnp.clip(labels, 0, K1 - 2)]  # [Q, T]

        pts = jax.random.uniform(key, (1, num_points, 2))
        # the P points are SHARED by all masks, so sample channel-major:
        # one gathered row carries all Q (or T) mask values at that point
        # (4*Q bytes/transaction) instead of Q separate scalar gathers —
        # the gather is transaction-bound, same as deformable attention
        pred_pts = point_sample(jnp.transpose(masks, (1, 2, 0))[None],
                                pts, align_corners=False)[0].T  # [Q, P]
        tgt_pts = point_sample(jnp.transpose(tgt_masks, (1, 2, 0))[None],
                               pts, align_corners=False)[0].T   # [T, P]

        cm = batch_sigmoid_ce_cost(pred_pts, tgt_pts)
        cd = batch_dice_cost(pred_pts, tgt_pts)
        cost = cost_class * cc + cost_mask * cm + cost_dice * cd
        # Invalid targets cost slightly more than any real entry. The penalty
        # must stay on the data's scale: a huge constant (e.g. 1e6) would blow
        # up the auction's bidding increment (eps ~ cost range) and destroy
        # assignment precision for the real entries.
        real_max = jnp.max(jnp.where(valid[None, :], cost, -jnp.inf))
        real_max = jnp.where(jnp.isfinite(real_max), real_max, 0.0)
        return jnp.where(valid[None, :], cost, real_max + 1.0)

    return jax.vmap(per_image)(pred_logits, pred_masks, gt_labels, gt_masks,
                               gt_valid, rngs)


def assign_from_cost(cost: jnp.ndarray) -> jnp.ndarray:
    """cost [N, Q, T] -> matched query per target [N, T] via one batched
    on-device auction (single vmapped while_loop for all N problems)."""
    N, Q, T = cost.shape

    def per_problem(c):
        col_of_row = linear_sum_assignment(c)  # [Q], values in [0, Q)
        # invert: for each target t, the query assigned to it
        matched_q = jnp.full((T,), 0, jnp.int32)
        rows = jnp.arange(Q, dtype=jnp.int32)
        return matched_q.at[jnp.where(col_of_row < T, col_of_row, T)].set(
            rows, mode="drop")

    return jax.vmap(per_problem)(cost)


def hungarian_match(
    pred_logits: jnp.ndarray,
    pred_masks: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_masks: jnp.ndarray,
    gt_valid: jnp.ndarray,
    rng: jax.Array,
    num_points: int = 12544,
    cost_class: float = 2.0,
    cost_mask: float = 5.0,
    cost_dice: float = 5.0,
) -> MatchResult:
    """Batched on-device Hungarian matching. Returns, per valid target, its
    assigned query (arbitrary for invalid targets)."""
    cost = match_cost_matrix(pred_logits, pred_masks, gt_labels, gt_masks,
                             gt_valid, rng, num_points=num_points,
                             cost_class=cost_class, cost_mask=cost_mask,
                             cost_dice=cost_dice)
    return MatchResult(matched_query=assign_from_cost(cost), valid=gt_valid)
