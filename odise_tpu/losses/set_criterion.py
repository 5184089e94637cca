"""Set criterion: Hungarian-matched classification + point-sampled mask losses.

Capability parity with ``SetCriterion`` (reference third_party/Mask2Former/
mask2former/modeling/criterion.py:92-270): cross-entropy over matched classes
with eos_coef down-weighting of no-object, point-sampled sigmoid-BCE + dice
mask losses over 12544 importance-sampled points
(criterion.py:147-197), num_masks averaged across ranks
(criterion.py:231-238), and per-decoder-layer auxiliary losses
(criterion.py:246-252).

Functional: ``set_criterion(outputs, targets, rng, cfg, axis_name=None)``
returns a dict of scalar losses. Targets are fixed-shape padded arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.grid_sample import point_sample, point_sample_packed_binary
from .matcher import assign_from_cost, match_cost_matrix


@dataclasses.dataclass(frozen=True)
class CriterionConfig:
    num_classes: int = 133
    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    eos_coef: float = 0.1
    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    deep_supervision: bool = True
    # lax.top_k over the 3x-oversampled candidates is a full sort on TPU;
    # approx_max_k is the hardware-friendly partial reduction. The selected
    # points only parameterize a Monte-Carlo estimate of the mask losses
    # (reference criterion.py:168-176 samples them randomly to begin with),
    # so approximate selection changes nothing about the loss semantics.
    # Exact mode remains for bit-parity studies.
    approx_topk: bool = False
    # quad-table override for the DIFFERENTIABLE pred-mask point sample
    # (None = grid_sample's auto heuristic). The quad table wins forward
    # transactions but its build re-runs in the backward pass; the plain
    # 4-corner gather backward is 4 small scatter-adds. Outputs are equal
    # either way (tests/test_ops.py); this only moves time.
    pred_quad_sample: Optional[bool] = None


def get_uncertain_point_coords_with_randomness(
    mask_logits: jnp.ndarray, rng: jax.Array, num_points: int,
    oversample_ratio: float, importance_sample_ratio: float,
    approx_topk: bool = False) -> jnp.ndarray:
    """PointRend importance sampling (used at criterion.py:168-176).

    mask_logits: [N, h, w]. Returns [N, P, 2] xy in [0, 1]: the most uncertain
    (|logit| smallest) among oversampled candidates, topped up with random
    points.
    """
    N = mask_logits.shape[0]
    k1, k2 = jax.random.split(rng)
    n_sampled = int(num_points * oversample_ratio)
    cand = jax.random.uniform(k1, (N, n_sampled, 2))
    logits = point_sample(mask_logits[..., None], cand)[..., 0]  # [N, S]
    uncertainty = -jnp.abs(logits)
    n_unc = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_unc
    if approx_topk:
        _, idx = jax.lax.approx_max_k(uncertainty, n_unc,
                                      recall_target=0.95)
    else:
        _, idx = jax.lax.top_k(uncertainty, n_unc)
    unc_pts = jnp.take_along_axis(cand, idx[..., None], axis=1)
    if n_rand > 0:
        rand_pts = jax.random.uniform(k2, (N, n_rand, 2))
        return jnp.concatenate([unc_pts, rand_pts], axis=1)
    return unc_pts


def _one_layer_losses(pred_logits, pred_masks, targets, matched, rng, cfg,
                      num_masks):
    B, Q, K1 = pred_logits.shape
    T = targets["labels"].shape[1]
    valid = targets["valid"]

    # ---- classification: scatter matched targets into [B, Q] class map
    target_classes = jnp.full((B, Q), cfg.num_classes, jnp.int32)
    scatter_q = jnp.where(valid, matched, Q)  # drop invalid
    target_classes = jax.vmap(
        lambda tc, qidx, lbl: tc.at[qidx].set(lbl, mode="drop")
    )(target_classes, scatter_q, targets["labels"].astype(jnp.int32))
    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
    w = jnp.where(target_classes == cfg.num_classes, cfg.eos_coef, 1.0)
    loss_ce = jnp.sum(ce * w) / jnp.sum(w)

    # ---- masks: gather matched pred masks per valid target
    pred_m = jax.vmap(lambda m, q: jnp.take(m, q, axis=0))(pred_masks, matched)
    # [B, T, h, w] predicted; [B, T, H, W] gt
    flat_pred = pred_m.reshape(B * T, *pred_m.shape[2:])
    flat_gt = targets["masks"].reshape(B * T, *targets["masks"].shape[2:])
    flat_valid = valid.reshape(B * T).astype(jnp.float32)

    pts = get_uncertain_point_coords_with_randomness(
        jax.lax.stop_gradient(flat_pred), rng, cfg.num_points,
        cfg.oversample_ratio, cfg.importance_sample_ratio,
        approx_topk=cfg.approx_topk)
    pred_pts = point_sample(flat_pred[..., None], pts,
                            quad=cfg.pred_quad_sample)[..., 0]   # [BT, P]
    # GT masks are binary: bit-plane-packed sampling is exact and turns the
    # random access into a ~4 MB table instead of the ~80 MB float planes
    # (12.8 -> ~2 ms/layer measured; see tools/bench_criterion.py)
    gt_pts = point_sample_packed_binary(flat_gt.astype(jnp.float32),
                                        jax.lax.stop_gradient(pts))

    bce = (jax.nn.softplus(-pred_pts) * gt_pts
           + jax.nn.softplus(pred_pts) * (1.0 - gt_pts)).mean(-1)
    loss_mask = jnp.sum(bce * flat_valid) / num_masks

    p = jax.nn.sigmoid(pred_pts)
    numerator = 2.0 * jnp.sum(p * gt_pts, axis=-1)
    denominator = jnp.sum(p, -1) + jnp.sum(gt_pts, -1)
    dice = 1.0 - (numerator + 1.0) / (denominator + 1.0)
    loss_dice = jnp.sum(dice * flat_valid) / num_masks

    return {
        "loss_ce": loss_ce * cfg.class_weight,
        "loss_mask": loss_mask * cfg.mask_weight,
        "loss_dice": loss_dice * cfg.dice_weight,
    }


def set_criterion(
    outputs: Dict,
    targets: Dict[str, jnp.ndarray],
    rng: jax.Array,
    cfg: CriterionConfig = CriterionConfig(),
    axis_name: Optional[str] = None,
    num_masks_override: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Compute main + auxiliary losses.

    outputs: dict with pred_logits [B,Q,K+1], pred_masks [B,Q,h,w], and
      aux_outputs (list of same). targets: labels [B,T] int, masks [B,T,H,W],
      valid [B,T] bool.
    axis_name: if set, num_masks is averaged across that mesh axis
      (reference criterion.py:231-238 all_reduce).
    num_masks_override: traced scalar replacing the local num_masks — used by
      gradient accumulation to reproduce the reference's DDP normalization
      (the all-reduced num_masks mean) across micro-steps.
    """
    if num_masks_override is not None:
        num_masks = num_masks_override
    else:
        num_masks = jnp.maximum(
            jnp.sum(targets["valid"].astype(jnp.float32)), 1.0)
        if axis_name is not None:
            num_masks = jax.lax.pmean(num_masks, axis_name)

    layers = [outputs] + list(outputs.get("aux_outputs", []) if cfg.deep_supervision else [])
    losses: Dict[str, jnp.ndarray] = {}
    rngs = jax.random.split(rng, 2 * len(layers))

    # cost matrices per layer (dense math, parallel-friendly), then ONE
    # batched auction for every (layer, image) problem: the assignment's
    # sequential while_loop is the train step's dominant cost, and a
    # vmapped loop runs max-iterations-over-problems instead of the sum
    # of per-layer loops (measured 1.88 -> see NOTES.md)
    costs = [
        match_cost_matrix(
            jax.lax.stop_gradient(l["pred_logits"]).astype(jnp.float32),
            jax.lax.stop_gradient(l["pred_masks"]).astype(jnp.float32),
            targets["labels"], targets["masks"].astype(jnp.float32),
            targets["valid"], rngs[2 * i],
            num_points=cfg.num_points, cost_class=cfg.class_weight,
            cost_mask=cfg.mask_weight, cost_dice=cfg.dice_weight)
        for i, l in enumerate(layers)
    ]
    B = costs[0].shape[0]
    matched_all = assign_from_cost(jnp.concatenate(costs, axis=0))
    for i, layer_out in enumerate(layers):
        ld = _one_layer_losses(
            layer_out["pred_logits"].astype(jnp.float32),
            layer_out["pred_masks"].astype(jnp.float32),
            targets, matched_all[i * B:(i + 1) * B], rngs[2 * i + 1], cfg,
            num_masks)
        if i == 0:
            losses.update(ld)
        else:
            losses.update({f"{k}_{i - 1}": v for k, v in ld.items()})
    return losses
