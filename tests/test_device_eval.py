"""Device-side eval statistics vs host-side oracles.

The device path (evaluation/device_eval.py) must produce the same evaluator
results as host postprocessing at the same (original) resolution: tent
resize == reference bilinear, confusion == SemSegEvaluator.process, PQ from
counts == PQ from dense maps, instance AP from intersection counts ==
instance AP from dense masks.
"""

import numpy as np
import jax.numpy as jnp

from odise_tpu.evaluation.device_eval import DeviceEvalRunner, resize_chw
from odise_tpu.evaluation.instance_eval import InstanceSegEvaluator
from odise_tpu.evaluation.panoptic_eval import PanopticEvaluator
from odise_tpu.evaluation.sem_seg_eval import SemSegEvaluator
from odise_tpu.models.inference import (instance_inference,
                                        panoptic_inference,
                                        semantic_inference)


def _np_tent_resize(x, src_hw, dst_hw):
    """Numpy oracle for align_corners=False bilinear (same math as torch
    F.interpolate / cv2 INTER_LINEAR)."""
    c, _, _ = x.shape
    h, w = src_hw
    oh, ow = dst_hw
    ys = np.clip((np.arange(oh) + 0.5) * h / oh - 0.5, 0, h - 1)
    xs = np.clip((np.arange(ow) + 0.5) * w / ow - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None]
    wx = (xs - x0)[None, None, :]
    v = x[:, :h, :w].astype(np.float64)
    top = v[:, y0][:, :, x0] * (1 - wx) + v[:, y0][:, :, x1] * wx
    bot = v[:, y1][:, :, x0] * (1 - wx) + v[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def test_resize_chw_matches_numpy_and_cv2():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 24, 32).astype(np.float32)
    out = np.asarray(resize_chw(jnp.asarray(x), (20, 28), (13, 17), (16, 24)))
    oracle = _np_tent_resize(x, (20, 28), (13, 17))
    np.testing.assert_allclose(out[:, :13, :17], oracle, atol=2e-5)
    # zero outside the content region
    assert np.all(out[:, 13:, :] == 0) and np.all(out[:, :, 17:] == 0)

    import cv2
    got = out[:, :13, :17]
    want = cv2.resize(x[:, :20, :28].transpose(1, 2, 0), (17, 13),
                      interpolation=cv2.INTER_LINEAR).transpose(2, 0, 1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def _fixture(rng, q=12, k=7, h=24, w=32, oh=19, ow=27):
    mask_cls = rng.randn(q, k + 1).astype(np.float32) * 2
    mask_pred = rng.randn(q, h, w).astype(np.float32) * 3
    thing = np.zeros(k, bool)
    thing[: k // 2] = True
    return mask_cls, mask_pred, thing


def test_device_eval_full_equivalence():
    rng = np.random.RandomState(1)
    q, k, hp, wp = 12, 7, 24, 32
    h, w = 22, 29          # valid content in the padded source
    oh, ow = 19, 27        # original image size
    grid = (20, 28)
    mask_cls, mask_pred, thing = _fixture(rng, q, k, hp, wp, oh, ow)

    # ground truths at original resolution
    sem_gt = rng.randint(0, k, (oh, ow)).astype(np.int32)
    sem_gt[0, :5] = 255  # ignore pixels
    # panoptic gt: 3 segments + void
    gt_ids = np.zeros((oh, ow), np.uint32)
    gt_ids[2:10, 3:12] = 7
    gt_ids[11:18, 5:20] = 42
    gt_ids[0:6, 15:26] = 13
    gt_segments = [
        {"id": 7, "category_id": 1, "iscrowd": 0},
        {"id": 42, "category_id": 5, "iscrowd": 0},
        {"id": 13, "category_id": 2, "iscrowd": 1},
    ]
    # instance gt (things only)
    inst_gt_masks = np.stack([gt_ids == 7, gt_ids == 13])
    inst_gt_classes = np.array([1, 2], np.int64)
    inst_gt_crowd = np.array([False, True])

    runner = DeviceEvalRunner(
        num_classes=k, thing_mask=thing, object_mask_threshold=0.0,
        overlap_threshold=0.8, topk=10, ignore_label=255,
        grids=(grid,), s_max=8)
    stats = runner.process(
        jnp.asarray(mask_cls), jnp.asarray(mask_pred), (h, w), (oh, ow),
        sem_gt=sem_gt, pan_gt_ids=gt_ids,
        pan_seg_ids=np.asarray([s["id"] for s in gt_segments], np.uint32),
        inst_gt_masks=inst_gt_masks)
    assert stats is not None

    # ---- host oracle at the same resolution -------------------------------
    # consume the DEVICE resize so the comparison isolates the statistics
    # math (resize correctness is covered by test_resize_chw_*)
    mr = resize_chw(jnp.asarray(mask_pred), (h, w), (oh, ow),
                    grid)[:, :oh, :ow]

    # semantic
    sem_probs = np.asarray(semantic_inference(jnp.asarray(mask_cls), mr))
    labels = np.argmax(sem_probs, axis=0).astype(np.int32)
    sem_host = SemSegEvaluator(num_classes=k, ignore_label=255)
    sem_host.process(labels, sem_gt)
    conf_dev = runner.flush_confusion()
    np.testing.assert_array_equal(conf_dev, sem_host.conf)

    # panoptic
    pan = panoptic_inference(jnp.asarray(mask_cls), mr, jnp.asarray(thing),
                             object_mask_threshold=0.0, overlap_threshold=0.8)
    nseg = int(pan.num_segments)
    cats = np.asarray(pan.segment_category)
    things = np.asarray(pan.segment_isthing)
    pred_segments = [{"id": i + 1, "category_id": int(cats[i]),
                      "isthing": bool(things[i])} for i in range(nseg)]
    pan_host = PanopticEvaluator(categories=list(range(k)))
    pan_host.process(gt_ids, gt_segments,
                     np.asarray(pan.panoptic_seg).astype(np.uint32),
                     pred_segments)

    pan_dev = PanopticEvaluator(categories=list(range(k)))
    sorted_ids = stats["pan_gt_ids_sorted"]
    segs_by_id = {s["id"]: s for s in gt_segments}
    gt_sorted = [segs_by_id[int(i)] for i in sorted_ids]
    nseg_d = stats["pan_num_segments"]
    pred_segments_d = [
        {"category_id": int(stats["pan_segment_category"][i]),
         "isthing": bool(stats["pan_segment_isthing"][i])}
        for i in range(nseg_d)]
    pan_dev.process_counts(stats["pan_counts"][:, : nseg_d + 1], gt_sorted,
                           pred_segments_d)
    host_res = pan_host.evaluate()
    dev_res = pan_dev.evaluate()
    for key in host_res:
        np.testing.assert_allclose(dev_res[key], host_res[key], atol=1e-9,
                                   err_msg=key)

    # instance
    inst = instance_inference(jnp.asarray(mask_cls), mr, jnp.asarray(thing),
                              topk=10)
    scores = np.asarray(inst.scores)
    keeps = scores > 0
    inst_host = InstanceSegEvaluator(num_classes=k)
    inst_host.process(np.asarray(inst.masks)[keeps],
                      np.asarray(inst.classes)[keeps], scores[keeps],
                      inst_gt_masks, inst_gt_classes, inst_gt_crowd)
    inst_dev = InstanceSegEvaluator(num_classes=k)
    sd = stats["inst_scores"]
    kd = sd > 0
    inst_dev.process_from_counts(sd[kd], stats["inst_classes"][kd],
                                 stats["inst_dt_area"][kd],
                                 stats["inst_inter"][kd],
                                 inst_gt_classes, stats["inst_gt_area"],
                                 inst_gt_crowd)
    host_ap = inst_host.evaluate()
    dev_ap = inst_dev.evaluate()
    for key in host_ap:
        np.testing.assert_allclose(dev_ap[key], host_ap[key], atol=1e-9,
                                   err_msg=key)


def test_device_eval_grid_too_small_returns_none():
    rng = np.random.RandomState(2)
    mask_cls, mask_pred, thing = _fixture(rng)
    runner = DeviceEvalRunner(
        num_classes=7, thing_mask=thing, object_mask_threshold=0.0,
        overlap_threshold=0.8, topk=10, grids=((16, 16),))
    out = runner.process(jnp.asarray(mask_cls), jnp.asarray(mask_pred),
                         (22, 29), (19, 27),
                         sem_gt=np.zeros((19, 27), np.int32))
    assert out is None


def test_device_eval_empty_instance_gt():
    """Zero gt instances: detections must still register (as FPs)."""
    rng = np.random.RandomState(3)
    mask_cls, mask_pred, thing = _fixture(rng)
    runner = DeviceEvalRunner(
        num_classes=7, thing_mask=thing, object_mask_threshold=0.0,
        overlap_threshold=0.8, topk=10, grids=((20, 28),))
    stats = runner.process(jnp.asarray(mask_cls), jnp.asarray(mask_pred),
                           (22, 29), (19, 27),
                           inst_gt_masks=np.zeros((0, 19, 27), bool))
    assert stats is not None and stats["inst_inter"].shape[1] == 0
    assert stats["inst_gt_area"].shape == (0,)


def test_device_eval_oversized_gt_falls_back():
    """More panoptic segments than s_max (crowded street scenes) or more
    instances than the largest bucket must return None (host fallback),
    never raise mid-eval."""
    rng = np.random.RandomState(4)
    mask_cls, mask_pred, thing = _fixture(rng)
    runner = DeviceEvalRunner(
        num_classes=7, thing_mask=thing, object_mask_threshold=0.0,
        overlap_threshold=0.8, topk=10, grids=((20, 28),), s_max=4)
    out = runner.process(
        jnp.asarray(mask_cls), jnp.asarray(mask_pred), (22, 29), (19, 27),
        pan_gt_ids=np.ones((19, 27), np.uint32),
        pan_seg_ids=np.arange(1, 7, dtype=np.uint32))  # 6 > s_max=4
    assert out is None
    out = runner.process(
        jnp.asarray(mask_cls), jnp.asarray(mask_pred), (22, 29), (19, 27),
        inst_gt_masks=np.zeros((129, 19, 27), bool))  # > largest bucket
    assert out is None
