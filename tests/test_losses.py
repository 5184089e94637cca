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
    from jax import shard_map

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


def test_grounding_concat_mode_forward_equals_diff_grads_local_only():
    """collect_mode="concat" (reference concat_all_gather, odise.py:64-90,
    855-858): forward values identical to "diff"; gradients flow ONLY through
    the local factor of each similarity product (the gathered copies are
    stop-gradient). Verified against an inline oracle that computes the same
    loss with the gathered tensors as constants."""
    devices = jax.devices()
    if len(devices) < 2:
        import pytest
        pytest.skip("needs multi-device")
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    n = len(devices)
    b = 2                      # per-shard batch
    B, Q, K, C = n * b, 4, 3, 8
    rng = np.random.RandomState(2)
    me = jnp.asarray(rng.randn(B, Q, C), jnp.float32)
    we = jnp.asarray(rng.randn(B, K, C), jnp.float32)
    # one invalid image exercises the weighted-CE branch
    valid = jnp.asarray(np.arange(B) != 1).reshape(B, 1) * jnp.ones((B, K), bool)
    scale = jnp.asarray(10.0)
    mesh = Mesh(np.array(devices), ("data",))

    def make_sharded(mode):
        def f(me, we, v):
            loss = mask_grounding_criterion(
                {"mask_embed": me, "word_embed": we, "logit_scale": scale},
                v, GroundingConfig(collect_mode=mode), axis_name="data",
            )["loss_mask_word"]
            return jax.lax.pmean(loss, "data")

        return shard_map(f, mesh=mesh,
                         in_specs=(P("data"), P("data"), P("data")),
                         out_specs=P())

    loss_diff = float(make_sharded("diff")(me, we, valid))
    loss_concat = float(make_sharded("concat")(me, we, valid))
    np.testing.assert_allclose(loss_concat, loss_diff, rtol=1e-5)

    # ---- oracle: same math, gathered copies as constants ----
    from odise_tpu.models.helper import l2_normalize

    def oracle(me, we):
        mn = l2_normalize(me).reshape(B * Q, C)
        wn = l2_normalize(we).reshape(B * K, C)
        gm = jax.lax.stop_gradient(mn)
        gw = jax.lax.stop_gradient(wn)
        gvalid = jnp.any(valid, axis=-1)  # [B] global
        total = 0.0
        for r in range(n):
            m_loc = mn[r * b * Q:(r + 1) * b * Q]
            w_loc = wn[r * b * K:(r + 1) * b * K]
            v_loc = gvalid[r * b:(r + 1) * b]
            sim_gmw = (gm @ w_loc.T * scale).reshape(B, Q, b, K)
            s1 = (jax.nn.softmax(sim_gmw, 1) * sim_gmw).sum(1).mean(-1)  # [B,b]
            sim_mgw = (m_loc @ gw.T * scale).reshape(b, Q, B, K)
            s2 = (jax.nn.softmax(sim_mgw, 1) * sim_mgw).sum(1).mean(-1)  # [b,B]
            labels = jnp.arange(b) + b * r
            lp1 = jax.nn.log_softmax(s1.T, axis=-1)
            l1 = -jnp.take_along_axis(lp1, labels[:, None], -1)[..., 0]
            l1 = (l1 * v_loc).mean()
            lp2 = jax.nn.log_softmax(s2, axis=-1)
            l2 = -jnp.take_along_axis(lp2, labels[:, None], -1)[..., 0]
            wsum = jnp.take(gvalid.astype(l2.dtype), labels)
            l2 = jnp.sum(l2 * wsum) / jnp.clip(jnp.sum(wsum), 1e-6)
            total = total + 0.5 * (l1 + l2)
        return total / n

    g_concat = jax.grad(lambda m, w: make_sharded("concat")(m, w, valid),
                        argnums=(0, 1))(me, we)
    g_oracle = jax.grad(oracle, argnums=(0, 1))(me, we)
    for a, o in zip(g_concat, g_oracle):
        np.testing.assert_allclose(np.asarray(a), np.asarray(o),
                                   rtol=1e-4, atol=1e-6)

    # and the diff-mode gradient must carry the extra cross-shard terms
    g_diff = jax.grad(lambda m, w: make_sharded("diff")(m, w, valid),
                      argnums=(0, 1))(me, we)
    assert float(jnp.abs(g_diff[0] - g_concat[0]).max()) > 1e-6
