"""Losses: matcher correctness, criterion behavior, grounding loss."""

import jax
import jax.numpy as jnp
import numpy as np

from odise_tpu.losses import (
    CriterionConfig,
    GroundingConfig,
    hungarian_match,
    mask_grounding_criterion,
    set_criterion,
)


def _make_outputs_targets(B=2, Q=6, K=3, T=4, H=16, W=16, seed=0):
    rng = np.random.RandomState(seed)
    pred_logits = jnp.asarray(rng.randn(B, Q, K + 1), jnp.float32)
    pred_masks = jnp.asarray(rng.randn(B, Q, H // 4, W // 4), jnp.float32)
    gt_labels = jnp.asarray(rng.randint(0, K, (B, T)), jnp.int32)
    gt_masks = jnp.asarray(rng.rand(B, T, H, W) > 0.5, jnp.float32)
    gt_valid = jnp.asarray([[True, True, False, False], [True, True, True, False]])
    return pred_logits, pred_masks, gt_labels, gt_masks, gt_valid


def test_matcher_prefers_matching_masks():
    # query masks == target masks => matcher must find the identity-ish map
    Q, T, H = 4, 3, 16
    masks = np.zeros((1, Q, H, H), np.float32) - 10
    gts = np.zeros((1, T, H, H), np.float32)
    for i in range(T):
        masks[0, i, i * 5:(i + 1) * 5] = 10.0
        gts[0, i, i * 5:(i + 1) * 5] = 1.0
    logits = np.zeros((1, Q, T + 1), np.float32)
    for i in range(T):
        logits[0, i, i] = 5.0  # query i predicts class i
    labels = jnp.asarray([[0, 1, 2]], jnp.int32)
    valid = jnp.asarray([[True, True, True]])
    res = hungarian_match(jnp.asarray(logits), jnp.asarray(masks), labels,
                          jnp.asarray(gts), valid, jax.random.PRNGKey(0),
                          num_points=256)
    np.testing.assert_array_equal(np.asarray(res.matched_query[0]), [0, 1, 2])


def test_set_criterion_runs_and_perfect_prediction_is_lower():
    pred_logits, pred_masks, gt_labels, gt_masks, gt_valid = _make_outputs_targets()
    outputs = {"pred_logits": pred_logits, "pred_masks": pred_masks,
               "aux_outputs": [{"pred_logits": pred_logits,
                                "pred_masks": pred_masks}]}
    targets = {"labels": gt_labels, "masks": gt_masks, "valid": gt_valid}
    cfg = CriterionConfig(num_classes=3, num_points=128)
    losses = set_criterion(outputs, targets, jax.random.PRNGKey(0), cfg)
    assert set(losses) == {"loss_ce", "loss_mask", "loss_dice",
                           "loss_ce_0", "loss_mask_0", "loss_dice_0"}
    assert all(bool(jnp.isfinite(v)) for v in losses.values())

    # perfect predictions: masks = gt (as +-10 logits), classes exact for
    # valid targets, no-object for padding queries
    B, T, H, W = gt_masks.shape
    K = 3
    Q = T
    perfect_masks = (gt_masks * 20 - 10)
    cls_target = jnp.where(gt_valid, gt_labels, K)  # invalid -> no-object
    perfect_logits = jax.nn.one_hot(cls_target, K + 1) * 20
    outputs2 = {"pred_logits": perfect_logits, "pred_masks": perfect_masks}
    losses2 = set_criterion(outputs2, targets, jax.random.PRNGKey(0),
                            CriterionConfig(num_classes=3, num_points=128,
                                            deep_supervision=False))
    assert float(losses2["loss_dice"]) < float(losses["loss_dice"])
    # NOTE: loss_mask is not compared — uncertainty-based point sampling
    # concentrates points on mask boundaries, where even perfect (+-10 logit)
    # masks pay ~ln2 BCE per point; only dice/classification separate the two.
    assert float(losses2["loss_ce"]) < float(losses["loss_ce"])


def test_set_criterion_approx_topk():
    """approx_topk swaps the uncertainty top_k for approx_max_k (a TPU
    partial reduction); the selected points still parameterize valid losses
    — finite, same keys, same scale as the exact mode."""
    pred_logits, pred_masks, gt_labels, gt_masks, gt_valid = _make_outputs_targets()
    outputs = {"pred_logits": pred_logits, "pred_masks": pred_masks}
    targets = {"labels": gt_labels, "masks": gt_masks, "valid": gt_valid}
    exact = set_criterion(outputs, targets, jax.random.PRNGKey(0),
                          CriterionConfig(num_classes=3, num_points=128,
                                          deep_supervision=False))
    approx = set_criterion(outputs, targets, jax.random.PRNGKey(0),
                           CriterionConfig(num_classes=3, num_points=128,
                                           deep_supervision=False,
                                           approx_topk=True))
    assert set(approx) == set(exact)
    for k in exact:
        assert bool(jnp.isfinite(approx[k]))
        # same Monte-Carlo estimate up to point-selection noise
        assert abs(float(approx[k]) - float(exact[k])) \
            <= 0.5 * abs(float(exact[k])) + 0.1


def test_grounding_loss_single_device():
    rng = np.random.RandomState(0)
    B, Q, K, C = 2, 5, 3, 8
    outputs = {
        "mask_embed": jnp.asarray(rng.randn(B, Q, C), jnp.float32),
        "word_embed": jnp.asarray(rng.randn(B, K, C), jnp.float32),
        "logit_scale": jnp.asarray(10.0),
    }
    valid = jnp.ones((B, K), bool)
    losses = mask_grounding_criterion(outputs, valid,
                                      GroundingConfig(collect_mode=None))
    assert "loss_mask_word" in losses
    assert bool(jnp.isfinite(losses["loss_mask_word"]))


def test_grounding_loss_identical_embeds_lower_than_random():
    rng = np.random.RandomState(1)
    B, Q, K, C = 4, 5, 3, 8
    words = rng.randn(B, K, C).astype(np.float32)
    # masks aligned with own words: include word vectors among mask embeds
    masks_aligned = np.concatenate([words, rng.randn(B, Q - K, C).astype(np.float32) * 0.01], 1)
    out_aligned = {"mask_embed": jnp.asarray(masks_aligned),
                   "word_embed": jnp.asarray(words), "logit_scale": jnp.asarray(20.0)}
    out_rand = {"mask_embed": jnp.asarray(rng.randn(B, Q, C), jnp.float32),
                "word_embed": jnp.asarray(words), "logit_scale": jnp.asarray(20.0)}
    valid = jnp.ones((B, K), bool)
    cfg = GroundingConfig(collect_mode=None)
    l_a = float(mask_grounding_criterion(out_aligned, valid, cfg)["loss_mask_word"])
    l_r = float(mask_grounding_criterion(out_rand, valid, cfg)["loss_mask_word"])
    assert l_a < l_r


def test_grounding_loss_multidevice_allgather():
    import os
    devices = jax.devices()
    if len(devices) < 2:
        import pytest
        pytest.skip("needs multi-device")
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    n = len(devices)
    B, Q, K, C = n * 2, 4, 3, 8
    rng = np.random.RandomState(0)
    outputs = {
        "mask_embed": jnp.asarray(rng.randn(B, Q, C), jnp.float32),
        "word_embed": jnp.asarray(rng.randn(B, K, C), jnp.float32),
        "logit_scale": jnp.asarray(10.0),
    }
    valid = jnp.ones((B, K), bool)
    mesh = Mesh(np.array(devices), ("data",))

    def f(me, we, v):
        loss = mask_grounding_criterion(
            {"mask_embed": me, "word_embed": we, "logit_scale": jnp.asarray(10.0)},
            v, GroundingConfig(collect_mode="diff"), axis_name="data",
        )["loss_mask_word"]
        return jax.lax.pmean(loss, "data")

    sharded = shard_map(f, mesh=mesh,
                        in_specs=(P("data"), P("data"), P("data")),
                        out_specs=P())
    loss_sharded = float(sharded(outputs["mask_embed"], outputs["word_embed"], valid))
    # single-device global computation must agree
    loss_global = float(mask_grounding_criterion(
        outputs, valid, GroundingConfig(collect_mode=None))["loss_mask_word"])
    np.testing.assert_allclose(loss_sharded, loss_global, rtol=1e-4)


def test_batched_assignment_matches_per_layer():
    """set_criterion's single batched auction must assign identically to
    solving each layer's cost matrix separately."""
    from odise_tpu.losses.matcher import assign_from_cost

    rng = np.random.RandomState(5)
    costs = jnp.asarray(rng.rand(6, 20, 7).astype(np.float32) * 10)
    batched = np.asarray(assign_from_cost(costs))
    for i in range(costs.shape[0]):
        single = np.asarray(assign_from_cost(costs[i:i + 1]))[0]
        np.testing.assert_array_equal(batched[i], single)
