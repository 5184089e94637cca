"""Fusion vs a literal numpy oracle of the reference's post-processing.

The oracle re-implements, line for line in numpy, the semantics of
reference third_party/Mask2Former/mask2former/maskformer_model.py:
  * panoptic_inference (:286-342) — keep = (labels != K) & (score > thr)
    over the FULL K+1 softmax, overlap ratio numerator = argmax winners
    WITHOUT the prob>=0.5 condition, sequential id assignment with stuff
    merging.
  * instance_inference (:344-380) — top-k over the unmasked Q*K matrix
    first, thing filtering after.
Randomized inputs; the device implementations must agree exactly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from odise_tpu.models.inference import instance_inference, panoptic_inference


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def ref_panoptic(mask_cls, mask_pred, thing_mask, obj_thr, overlap_thr):
    Q, K1 = mask_cls.shape
    K = K1 - 1
    probs = _softmax(mask_cls)
    scores = probs.max(-1)
    labels = probs.argmax(-1)
    keep = (labels != K) & (scores > obj_thr)
    cur_scores = scores[keep]
    cur_classes = labels[keep]
    cur_masks = _sigmoid(mask_pred[keep])
    H, W = mask_pred.shape[1:]
    pan = np.zeros((H, W), np.int32)
    segments = []
    if cur_masks.shape[0] == 0:
        return pan, segments
    cur_prob_masks = cur_scores[:, None, None] * cur_masks
    cur_mask_ids = cur_prob_masks.argmax(0)
    stuff_memory = {}
    cur_id = 0
    for k in range(cur_classes.shape[0]):
        pred_class = int(cur_classes[k])
        isthing = bool(thing_mask[pred_class])
        mask_area = int((cur_mask_ids == k).sum())
        original_area = int((cur_masks[k] >= 0.5).sum())
        mask = (cur_mask_ids == k) & (cur_masks[k] >= 0.5)
        if mask_area > 0 and original_area > 0 and mask.sum() > 0:
            if mask_area / original_area < overlap_thr:
                continue
            if not isthing:
                if pred_class in stuff_memory:
                    pan[mask] = stuff_memory[pred_class]
                    continue
                stuff_memory[pred_class] = cur_id + 1
            cur_id += 1
            pan[mask] = cur_id
            segments.append((cur_id, isthing, pred_class))
    return pan, segments


def ref_instance(mask_cls, mask_pred, thing_mask, topk):
    Q, K1 = mask_cls.shape
    K = K1 - 1
    scores = _softmax(mask_cls)[:, :-1].reshape(-1)
    top_idx = np.argsort(-scores, kind="stable")[:topk]
    labels = top_idx % K
    queries = top_idx // K
    keep = thing_mask[labels]
    labels, queries, top_scores = labels[keep], queries[keep], scores[top_idx][keep]
    masks = mask_pred[queries] > 0
    prob = _sigmoid(mask_pred[queries])
    mask_scores = (prob * masks).sum((1, 2)) / (masks.sum((1, 2)) + 1e-6)
    return top_scores * mask_scores, labels, masks


def test_panoptic_matches_reference_oracle():
    rng = np.random.RandomState(0)
    for trial in range(8):
        Q, K, H, W = 20, 7, 24, 24
        mask_cls = rng.randn(Q, K + 1).astype(np.float32) * 3
        mask_pred = rng.randn(Q, H, W).astype(np.float32) * 2
        thing_mask = rng.rand(K) < 0.5
        # exercise both thresholds, including ODISE's obj_thr=0.0
        obj_thr = [0.0, 0.0, 0.3, 0.5][trial % 4]
        overlap_thr = [0.8, 0.5, 0.8, 0.95][trial % 4]
        want_pan, want_segments = ref_panoptic(
            mask_cls, mask_pred, thing_mask, obj_thr, overlap_thr)
        got = panoptic_inference(
            jnp.asarray(mask_cls), jnp.asarray(mask_pred), jnp.asarray(thing_mask),
            object_mask_threshold=obj_thr, overlap_threshold=overlap_thr)
        np.testing.assert_array_equal(np.asarray(got.panoptic_seg), want_pan)
        n = int(got.num_segments)
        assert n == len(want_segments), (trial, n, want_segments)
        cats = np.asarray(got.segment_category)[:n]
        things = np.asarray(got.segment_isthing)[:n]
        for i, (sid, isthing, cat) in enumerate(want_segments):
            assert sid == i + 1
            assert cats[i] == cat
            assert bool(things[i]) == isthing


def test_panoptic_null_confident_query_dropped():
    # a query whose argmax over K+1 lands on null must never paint a segment,
    # even with object_mask_threshold=0.0 (the ODISE default)
    Q, K, H, W = 2, 3, 8, 8
    mask_cls = np.full((Q, K + 1), -10.0, np.float32)
    mask_cls[0, K] = 10.0   # confidently null
    mask_cls[1, 0] = 10.0   # confidently class 0
    mask_pred = np.full((Q, H, W), -10.0, np.float32)
    mask_pred[0, :4] = 10.0
    mask_pred[1, 4:] = 10.0
    thing_mask = np.array([True, True, False])
    got = panoptic_inference(
        jnp.asarray(mask_cls), jnp.asarray(mask_pred), jnp.asarray(thing_mask),
        object_mask_threshold=0.0, overlap_threshold=0.8)
    pan = np.asarray(got.panoptic_seg)
    assert int(got.num_segments) == 1
    assert (pan[:4] == 0).all()      # null query's region stays void
    assert (pan[4:] == 1).all()


def test_instance_matches_reference_oracle():
    rng = np.random.RandomState(1)
    for _ in range(6):
        Q, K, H, W = 15, 6, 16, 16
        topk = 25
        mask_cls = rng.randn(Q, K + 1).astype(np.float32) * 3
        mask_pred = rng.randn(Q, H, W).astype(np.float32)
        thing_mask = rng.rand(K) < 0.6
        want_scores, want_labels, want_masks = ref_instance(
            mask_cls, mask_pred, thing_mask, topk)
        got = instance_inference(
            jnp.asarray(mask_cls), jnp.asarray(mask_pred), jnp.asarray(thing_mask),
            topk=topk)
        got_scores = np.asarray(got.scores)
        nz = got_scores > 0
        # stuff entries are flagged with score 0; surviving rows must match the
        # reference's post-topk filtered set, in score order
        order_got = np.argsort(-got_scores[nz], kind="stable")
        order_want = np.argsort(-want_scores, kind="stable")
        assert nz.sum() == len(want_scores)
        np.testing.assert_allclose(
            np.sort(got_scores[nz]), np.sort(want_scores), rtol=1e-5)
        got_labels = np.asarray(got.classes)[nz][order_got]
        np.testing.assert_array_equal(got_labels, want_labels[order_want])
        got_masks = np.asarray(got.masks)[nz][order_got]
        np.testing.assert_array_equal(got_masks, want_masks[order_want])


def test_buckets_cover_and_pick():
    from odise_tpu.evaluation.buckets import compute_eval_buckets, pick_bucket

    buckets = compute_eval_buckets(1024, 2560)
    assert all(b[0] % 64 == 0 and b[1] % 64 == 0 for b in buckets)
    assert (1024, 1024) in buckets
    # typical COCO landscape after ResizeShortestEdge(1024, 2560)
    b = pick_bucket(1024, 1408, buckets)
    assert b is not None and b[0] >= 1024 and b[1] >= 1408
    # max_size-capped wide image: short side shrinks below 1024
    b = pick_bucket(960, 2560, buckets)
    assert b == (1024, 2560)
    # portrait
    b = pick_bucket(1536, 1024, buckets)
    assert b is not None and b[0] >= 1536
    assert pick_bucket(4096, 4096, buckets) is None


def test_fusion_valid_hw_equals_crop():
    """Fusion on a padded bucket with valid_hw must equal fusion on the
    cropped arrays (the pre-bucketing semantics)."""
    import jax

    rng = np.random.RandomState(3)
    Q, K = 12, 5
    h, w, H, W = 19, 27, 32, 32
    mask_cls = rng.randn(Q, K + 1).astype(np.float32) * 3
    mask_pred_full = rng.randn(Q, H, W).astype(np.float32) * 2
    thing_mask = np.array([True, True, False, True, False])
    cropped = mask_pred_full[:, :h, :w]

    want = panoptic_inference(jnp.asarray(mask_cls), jnp.asarray(cropped),
                              jnp.asarray(thing_mask), 0.0, 0.8)
    got = jax.jit(lambda mc, mp, hw: panoptic_inference(
        mc, mp, jnp.asarray(thing_mask), 0.0, 0.8, valid_hw=hw))(
            jnp.asarray(mask_cls), jnp.asarray(mask_pred_full),
            (jnp.int32(h), jnp.int32(w)))
    np.testing.assert_array_equal(np.asarray(got.panoptic_seg)[:h, :w],
                                  np.asarray(want.panoptic_seg))
    assert (np.asarray(got.panoptic_seg)[h:] == 0).all()
    assert (np.asarray(got.panoptic_seg)[:, w:] == 0).all()
    assert int(got.num_segments) == int(want.num_segments)
    n = int(want.num_segments)
    np.testing.assert_array_equal(np.asarray(got.segment_category)[:n],
                                  np.asarray(want.segment_category)[:n])

    want_i = instance_inference(jnp.asarray(mask_cls), jnp.asarray(cropped),
                                jnp.asarray(thing_mask), topk=20)
    got_i = jax.jit(lambda mc, mp, hw: instance_inference(
        mc, mp, jnp.asarray(thing_mask), topk=20, valid_hw=hw))(
            jnp.asarray(mask_cls), jnp.asarray(mask_pred_full),
            (jnp.int32(h), jnp.int32(w)))
    np.testing.assert_allclose(np.asarray(got_i.scores),
                               np.asarray(want_i.scores), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i.classes),
                                  np.asarray(want_i.classes))
    np.testing.assert_array_equal(np.asarray(got_i.masks)[:, :h, :w],
                                  np.asarray(want_i.masks))
