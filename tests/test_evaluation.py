"""Evaluator unit tests against hand-computed values."""

import numpy as np

from odise_tpu.evaluation.instance_eval import InstanceSegEvaluator, mask_iou
from odise_tpu.evaluation.panoptic_eval import PanopticEvaluator
from odise_tpu.evaluation.sem_seg_eval import SemSegEvaluator


def test_sem_seg_perfect_and_half():
    ev = SemSegEvaluator(num_classes=3, ignore_label=255)
    gt = np.array([[0, 0, 1, 1], [2, 2, 255, 255]])
    ev.process(gt.copy(), gt)
    r = ev.evaluate()
    assert r["mIoU"] == 100.0 and r["pACC"] == 100.0

    ev.reset()
    pred = gt.copy()
    pred[0, 1] = 1  # one of two class-0 pixels wrong
    ev.process(pred, gt)
    r = ev.evaluate()
    # class0: IoU 1/2; class1: 2/3; class2: 1 -> mIoU = (0.5+0.6667+1)/3
    np.testing.assert_allclose(r["mIoU"], 100 * (0.5 + 2 / 3 + 1) / 3, rtol=1e-6)


def test_panoptic_pq_perfect():
    gt = np.zeros((8, 8), np.int32)
    gt[:4] = 1
    gt[4:] = 2
    segs = [{"id": 1, "category_id": 0}, {"id": 2, "category_id": 1}]
    ev = PanopticEvaluator(categories=[0, 1], isthing_map={0: True, 1: False})
    ev.process(gt, segs, gt.copy(), [dict(s) for s in segs])
    r = ev.evaluate()
    assert r["PQ"] == 100.0 and r["SQ"] == 100.0 and r["RQ"] == 100.0
    assert r["PQ_th"] == 100.0 and r["PQ_st"] == 100.0


def test_panoptic_pq_partial_overlap():
    gt = np.zeros((10, 10), np.int32)
    gt[:, :] = 1
    pred = np.zeros((10, 10), np.int32)
    pred[:6] = 1  # IoU 0.6 -> match
    # the rest of pred is void (0)
    ev = PanopticEvaluator(categories=[0])
    ev.process(gt, [{"id": 1, "category_id": 0}],
               pred, [{"id": 1, "category_id": 0}])
    r = ev.evaluate()
    np.testing.assert_allclose(r["PQ"], 100 * 0.6, rtol=1e-6)
    np.testing.assert_allclose(r["RQ"], 100.0)


def test_panoptic_pq_wrong_class_is_fp_fn():
    gt = np.ones((4, 4), np.int32)
    ev = PanopticEvaluator(categories=[0, 1])
    ev.process(gt, [{"id": 1, "category_id": 0}],
               gt.copy(), [{"id": 1, "category_id": 1}])
    r = ev.evaluate()
    # cat0: 1 FN -> PQ 0; cat1: 1 FP -> PQ 0
    assert r["PQ"] == 0.0


def test_mask_iou():
    a = np.zeros((4, 4), bool)
    b = np.zeros((4, 4), bool)
    a[:2] = True
    b[1:3] = True
    np.testing.assert_allclose(mask_iou(a, b), 4 / 12)


def test_instance_ap_perfect():
    H = W = 8
    gt = np.zeros((2, H, W), bool)
    gt[0, :4] = True
    gt[1, 4:] = True
    ev = InstanceSegEvaluator(num_classes=2)
    ev.process(gt.copy(), np.array([0, 1]), np.array([0.9, 0.8]),
               gt, np.array([0, 1]))
    r = ev.evaluate()
    np.testing.assert_allclose(r["AP"], 100.0, rtol=1e-5)
    np.testing.assert_allclose(r["AP50"], 100.0, rtol=1e-5)


def test_instance_ap_false_positive_ranked_low():
    H = W = 8
    gt = np.zeros((1, H, W), bool)
    gt[0, :4] = True
    preds = np.zeros((2, H, W), bool)
    preds[0] = gt[0]
    preds[1, 6:] = True  # FP with lower score
    ev = InstanceSegEvaluator(num_classes=1)
    ev.process(preds, np.array([0, 0]), np.array([0.9, 0.5]), gt, np.array([0]))
    r = ev.evaluate()
    np.testing.assert_allclose(r["AP50"], 100.0, rtol=1e-5)


import pytest


@pytest.mark.parametrize("backend", ["pickle", "orbax"])
def test_checkpointer_roundtrip(tmp_path, backend):
    from odise_tpu.engine.checkpoint import Checkpointer, split_frozen

    params = {
        "decoder": {"w": np.ones((2, 2), np.float32)},
        "backbone": {"unet": {"w": np.zeros((3,), np.float32)},
                     "clip_project": {"w": np.full((2,), 2.0, np.float32)}},
    }
    trainable, frozen = split_frozen(params)
    assert "unet" not in trainable.get("backbone", {})
    assert "clip_project" in trainable["backbone"]

    ck = Checkpointer(str(tmp_path), max_to_keep=2, backend=backend)
    ck.save("model_0000001", params, opt_state=None, step=1)
    assert ck.has_checkpoint()

    init = {
        "decoder": {"w": np.zeros((2, 2), np.float32)},
        "backbone": {"unet": {"w": np.full((3,), 7.0, np.float32)},
                     "clip_project": {"w": np.zeros((2,), np.float32)}},
    }
    loaded, _, step, _ = ck.resume_or_load(None, init, resume=True)
    assert step == 1
    np.testing.assert_allclose(loaded["decoder"]["w"], 1.0)     # restored
    np.testing.assert_allclose(loaded["backbone"]["unet"]["w"], 7.0)  # frozen kept
    np.testing.assert_allclose(loaded["backbone"]["clip_project"]["w"], 2.0)


@pytest.mark.parametrize("backend", ["pickle", "orbax"])
def test_checkpointer_opt_state_roundtrip(tmp_path, backend):
    """The REAL optimizer state (optax namedtuple chain incl. the frozen
    multi_transform mask) must survive a save/load cycle structurally intact."""
    import jax

    from odise_tpu.engine.checkpoint import Checkpointer
    from odise_tpu.engine.optimizer import make_optimizer

    params = {"decoder": {"w": np.ones((2, 2), np.float32),
                          "bias": np.zeros((2,), np.float32)}}
    tx = make_optimizer(params, lr=1e-4, milestones=(10,), grad_clip=0.01,
                        warmup_steps=5)
    opt = tx.init(params)
    grads = jax.tree_util.tree_map(lambda x: np.full_like(x, 0.5), params)
    updates, opt = tx.update(grads, opt, params)  # non-trivial moments

    ck = Checkpointer(str(tmp_path), backend=backend)
    ck.save("model_0000001", params, opt_state=opt, step=1)

    tx2 = make_optimizer(params, lr=1e-4, milestones=(10,), grad_clip=0.01,
                         warmup_steps=5)
    target = tx2.init(jax.tree_util.tree_map(np.zeros_like, params))
    _, opt_loaded, step, _ = ck.resume_or_load(None, params, resume=True,
                                               init_opt_state=target)
    assert step == 1
    assert opt_loaded is not None
    assert (jax.tree_util.tree_structure(opt_loaded)
            == jax.tree_util.tree_structure(opt))
    for a, b in zip(jax.tree_util.tree_leaves(opt_loaded),
                    jax.tree_util.tree_leaves(opt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # the restored state must drive another update without error
    tx2.update(grads, opt_loaded, params)


@pytest.mark.parametrize("backend", ["pickle", "orbax"])
def test_checkpointer_gc_keeps_max(tmp_path, backend):
    from odise_tpu.engine.checkpoint import Checkpointer

    ck = Checkpointer(str(tmp_path), max_to_keep=2, backend=backend)
    params = {"a": np.zeros(1)}
    import os
    for i in range(4):
        ck.save(f"model_{i:07d}", params, step=i)
    ck.wait()
    suffix = ".orbax" if backend == "orbax" else ".ckpt"
    ckpts = [f for f in os.listdir(tmp_path) if f.endswith(suffix)]
    assert len(ckpts) == 2


def test_event_storage_and_writers(tmp_path):
    from odise_tpu.utils.events import CommonMetricPrinter, EventStorage, JSONWriter, WriterStack

    storage = EventStorage()
    with WriterStack([JSONWriter(str(tmp_path / "metrics.json")),
                      CommonMetricPrinter(max_iter=10)]) as writers:
        for i in range(3):
            storage.put_scalars(loss=float(10 - i), lr=1e-4, time=0.1)
            for w in writers:
                w.write(storage)
            storage.step()
    import json

    lines = [json.loads(l) for l in open(tmp_path / "metrics.json")]
    assert len(lines) == 3
    assert lines[0]["loss"] == 10.0


def test_checkpointer_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from odise_tpu.engine.checkpoint import Checkpointer

    params = {"decoder": {"w": np.ones((2, 2), np.float32)},
              "backbone": {"unet": {"w": np.zeros((3,), np.float32)}}}
    ck = Checkpointer(str(tmp_path), backend="orbax")
    ck.save("model_0000001", params, opt_state={"m": np.ones((2,))}, step=1)
    assert ck.has_checkpoint()
    init = {"decoder": {"w": np.zeros((2, 2), np.float32)},
            "backbone": {"unet": {"w": np.full((3,), 5.0, np.float32)}}}
    loaded, opt, step, _ = ck.resume_or_load(
        None, init, resume=True, init_opt_state={"m": np.zeros((2,))})
    assert step == 1
    np.testing.assert_allclose(loaded["decoder"]["w"], 1.0)
    np.testing.assert_allclose(loaded["backbone"]["unet"]["w"], 5.0)
    np.testing.assert_allclose(opt["m"], 1.0)


def test_visualizer_overlay():
    from odise_tpu.utils.visualizer import Visualizer

    img = np.zeros((16, 16, 3), np.uint8)
    seg = np.zeros((16, 16), np.int32)
    seg[:8] = 1
    seg[8:] = 2
    vis = Visualizer(img, class_names=["cat", "grass"])
    out = vis.draw_panoptic_seg(seg, [0, 1], 2)
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8
    assert out.max() > 0  # something was drawn
