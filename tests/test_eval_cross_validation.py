"""Cross-validate the native evaluators against literal ports of the
canonical implementations.

panopticapi / pycocotools are not installable in this environment, so their
pure-python cores are ported here VERBATIM in structure (OFFSET-combined
unique counting for PQ; evaluateImg/accumulate with dtm/gtm matrices for
COCO mask AP) and used as independent oracles on randomized synthetic
fixtures. The production evaluators (odise_tpu/evaluation/) share no code
with these ports.

Reference chain: odise/evaluation/d2_evaluator.py defers to
COCOPanopticEvaluator -> panopticapi.evaluation and COCOEvaluator ->
pycocotools.cocoeval.COCOeval.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pytest

from odise_tpu.evaluation.instance_eval import (AREA_RNG, IOU_THRS, REC_THRS,
                                                InstanceSegEvaluator)
from odise_tpu.evaluation.panoptic_eval import PanopticEvaluator

# ---------------------------------------------------------------------------
# panopticapi port (evaluation.pq_compute_single_core structure)
# ---------------------------------------------------------------------------

OFFSET = 256 * 256 * 256
VOID = 0


def pq_oracle(images):
    """images: list of (gt_seg, gt_segments, pred_seg, pred_segments).
    Returns {cat: [iou_sum, tp, fp, fn]} accumulated across images."""
    stats = defaultdict(lambda: [0.0, 0, 0, 0])
    for pan_gt, gt_ann, pan_pred, pred_ann in images:
        gt_segms = {el["id"]: dict(el) for el in gt_ann}
        pred_segms = {el["id"]: dict(el) for el in pred_ann}
        labels, labels_cnt = np.unique(pan_pred, return_counts=True)
        for label, label_cnt in zip(labels, labels_cnt):
            if int(label) not in pred_segms:
                continue
            pred_segms[int(label)]["area"] = int(label_cnt)
        labels, labels_cnt = np.unique(pan_gt, return_counts=True)
        for label, label_cnt in zip(labels, labels_cnt):
            if int(label) not in gt_segms:
                continue
            gt_segms[int(label)]["area"] = int(label_cnt)

        pan_gt_pred = pan_gt.astype(np.uint64) * OFFSET + pan_pred.astype(np.uint64)
        gt_pred_map = {}
        labels, labels_cnt = np.unique(pan_gt_pred, return_counts=True)
        for label, intersection in zip(labels, labels_cnt):
            gt_id = int(label // OFFSET)
            pred_id = int(label % OFFSET)
            gt_pred_map[(gt_id, pred_id)] = int(intersection)

        gt_matched = set()
        pred_matched = set()
        for label_tuple, intersection in gt_pred_map.items():
            gt_label, pred_label = label_tuple
            if gt_label not in gt_segms or pred_label not in pred_segms:
                continue
            if gt_segms[gt_label].get("iscrowd", 0) == 1:
                continue
            if gt_segms[gt_label]["category_id"] != \
                    pred_segms[pred_label]["category_id"]:
                continue
            union = (pred_segms[pred_label]["area"]
                     + gt_segms[gt_label]["area"] - intersection
                     - gt_pred_map.get((VOID, pred_label), 0))
            iou = intersection / union
            if iou > 0.5:
                cat = gt_segms[gt_label]["category_id"]
                stats[cat][0] += iou
                stats[cat][1] += 1
                gt_matched.add(gt_label)
                pred_matched.add(pred_label)

        crowd_labels_dict = {}
        for gt_label, gt_info in gt_segms.items():
            if gt_label in gt_matched:
                continue
            if gt_info.get("iscrowd", 0) == 1:
                crowd_labels_dict[gt_info["category_id"]] = gt_label
                continue
            stats[gt_info["category_id"]][3] += 1  # FN

        for pred_label, pred_info in pred_segms.items():
            if pred_label in pred_matched:
                continue
            if "area" not in pred_info:  # empty prediction never painted
                continue
            intersection = gt_pred_map.get((VOID, pred_label), 0)
            if pred_info["category_id"] in crowd_labels_dict:
                intersection += gt_pred_map.get(
                    (crowd_labels_dict[pred_info["category_id"]], pred_label), 0)
            if intersection / pred_info["area"] > 0.5:
                continue
            stats[pred_info["category_id"]][2] += 1  # FP
    return stats


def pq_oracle_average(stats, categories):
    pq, sq, rq, n = 0.0, 0.0, 0.0, 0
    for c in categories:
        iou, tp, fp, fn = stats.get(c, [0.0, 0, 0, 0])
        if tp + fp + fn == 0:
            continue
        n += 1
        pq += iou / (tp + 0.5 * fp + 0.5 * fn)
        sq += iou / tp if tp else 0.0
        rq += tp / (tp + 0.5 * fp + 0.5 * fn)
    if n == 0:
        return dict(pq=0.0, sq=0.0, rq=0.0)
    return dict(pq=100 * pq / n, sq=100 * sq / n, rq=100 * rq / n)


def random_panoptic_fixture(rng, n_images=6, n_cats=5, hw=24):
    """Random id maps with void regions, crowd gts and imperfect preds."""
    images = []
    for _ in range(n_images):
        gt = np.zeros((hw, hw), np.uint32)
        gt_ann = []
        sid = 1
        for _ in range(rng.randint(2, 6)):
            y, x = rng.randint(0, hw - 6, 2)
            h, w = rng.randint(3, 8, 2)
            gt[y:y + h, x:x + w] = sid
            gt_ann.append({"id": sid, "category_id": int(rng.randint(n_cats)),
                           "iscrowd": int(rng.rand() < 0.2)})
            sid += 1
        gt_ann = [a for a in gt_ann if (gt == a["id"]).any()]
        pred = np.zeros((hw, hw), np.uint32)
        pred_ann = []
        pid = 1
        for a in gt_ann:  # shifted copies of gts, random drops
            if rng.rand() < 0.2:
                continue
            mask = gt == a["id"]
            dy, dx = rng.randint(-2, 3, 2)
            pred[np.clip(np.where(mask)[0] + dy, 0, hw - 1),
                 np.clip(np.where(mask)[1] + dx, 0, hw - 1)] = pid
            cat = a["category_id"] if rng.rand() < 0.8 else int(rng.randint(n_cats))
            pred_ann.append({"id": pid, "category_id": cat})
            pid += 1
        for _ in range(rng.randint(0, 3)):  # spurious predictions
            y, x = rng.randint(0, hw - 4, 2)
            h, w = rng.randint(2, 5, 2)
            pred[y:y + h, x:x + w] = pid
            pred_ann.append({"id": pid, "category_id": int(rng.randint(n_cats))})
            pid += 1
        pred_ann = [a for a in pred_ann if (pred == a["id"]).any()]
        images.append((gt, gt_ann, pred, pred_ann))
    return images


def test_panoptic_evaluator_matches_panopticapi_port():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n_cats = 5
        images = random_panoptic_fixture(rng, n_cats=n_cats)
        want = pq_oracle_average(pq_oracle(images), range(n_cats))
        ev = PanopticEvaluator(categories=list(range(n_cats)))
        for gt, gt_ann, pred, pred_ann in images:
            ev.process(gt, gt_ann, pred, pred_ann)
        got = ev.evaluate()
        np.testing.assert_allclose(got["PQ"], want["pq"], atol=1e-9, err_msg=str(trial))
        np.testing.assert_allclose(got["SQ"], want["sq"], atol=1e-9)
        np.testing.assert_allclose(got["RQ"], want["rq"], atol=1e-9)


# ---------------------------------------------------------------------------
# pycocotools COCOeval port (evaluateImg + accumulate structure)
# ---------------------------------------------------------------------------

def _coco_iou(dts, gts, iscrowd):
    D, G = len(dts), len(gts)
    ious = np.zeros((D, G))
    for d in range(D):
        for g in range(G):
            inter = np.logical_and(dts[d], gts[g]).sum()
            if iscrowd[g]:
                denom = dts[d].sum()
            else:
                denom = np.logical_or(dts[d], gts[g]).sum()
            ious[d, g] = inter / denom if denom else 0.0
    return ious


def coco_evaluate_img(dt_masks, dt_scores, gt_masks, gt_crowd, aRng, maxDet):
    """Port of COCOeval.evaluateImg for one image-category."""
    gt_areas = np.asarray([m.sum() for m in gt_masks], np.float64)
    dt_areas = np.asarray([m.sum() for m in dt_masks], np.float64)
    gtIg = np.asarray([bool(c) or a < aRng[0] or a > aRng[1]
                       for c, a in zip(gt_crowd, gt_areas)])
    gtind = np.argsort(gtIg.astype(np.int64), kind="mergesort")
    dtind = np.argsort(-np.asarray(dt_scores), kind="mergesort")[:maxDet]
    gt_masks = [gt_masks[i] for i in gtind]
    crowd = [gt_crowd[i] for i in gtind]
    gtIg = gtIg[gtind]
    dt_masks = [dt_masks[i] for i in dtind]
    dt_scores = np.asarray(dt_scores)[dtind]
    dt_areas = dt_areas[dtind]
    ious = _coco_iou(dt_masks, gt_masks, crowd)
    T, D, G = len(IOU_THRS), len(dt_masks), len(gt_masks)
    gtm = np.zeros((T, G)) - 1
    dtm = np.zeros((T, D)) - 1
    dtIg = np.zeros((T, D), bool)
    for tind, t in enumerate(IOU_THRS):
        for dind in range(D):
            iou = min([t, 1 - 1e-10])
            m = -1
            for gind in range(G):
                if gtm[tind, gind] > -1 and not crowd[gind]:
                    continue
                if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                    break
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dtIg[tind, dind] = gtIg[m]
            dtm[tind, dind] = m
            gtm[tind, m] = dind
    a = np.asarray([ar < aRng[0] or ar > aRng[1] for ar in dt_areas])
    dtIg = np.logical_or(dtIg, np.logical_and(dtm == -1, np.tile(a, (T, 1))))
    return dict(dtScores=dt_scores, dtMatches=dtm, dtIgnore=dtIg,
                gtIgnore=gtIg)


def coco_accumulate(per_img_results):
    """Port of COCOeval.accumulate for one category/areaRng: returns
    [T] AP vector or None if no non-ignored gt."""
    E = [e for e in per_img_results if e is not None]
    if not E:
        return None
    dtScores = np.concatenate([e["dtScores"] for e in E])
    inds = np.argsort(-dtScores, kind="mergesort")
    dtm = np.concatenate([e["dtMatches"] for e in E], axis=1)[:, inds]
    dtIg = np.concatenate([e["dtIgnore"] for e in E], axis=1)[:, inds]
    gtIg = np.concatenate([e["gtIgnore"] for e in E])
    npig = np.count_nonzero(gtIg == 0)
    if npig == 0:
        return None
    tps = np.logical_and(dtm > -1, np.logical_not(dtIg))
    fps = np.logical_and(dtm == -1, np.logical_not(dtIg))
    tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
    fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
    T = len(IOU_THRS)
    aps = np.zeros(T)
    for t in range(T):
        tp = np.array(tp_sum[t])
        fp = np.array(fp_sum[t])
        rc = tp / npig
        pr = tp / (fp + tp + np.spacing(1))
        q = np.zeros((len(REC_THRS),))
        for i in range(len(tp) - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        inds = np.searchsorted(rc, REC_THRS, side="left")
        try:
            for ri, pi in enumerate(inds):
                q[ri] = pr[pi]
        except IndexError:
            pass
        aps[t] = np.mean(q)
    return aps


def random_instance_fixture(rng, n_images=5, n_cats=3, hw=48):
    """Per image: (dt_masks, dt_classes, dt_scores, gt_masks, gt_classes,
    gt_crowd) with mixed mask sizes so the area splits are exercised."""
    out = []
    for _ in range(n_images):
        gts, gcls, gcrowd = [], [], []
        for _ in range(rng.randint(1, 5)):
            m = np.zeros((hw, hw), bool)
            y, x = rng.randint(0, hw - 8, 2)
            # mix small (<32^2 is the whole image here) and larger blobs
            h, w = rng.randint(2, 30, 2)
            m[y:y + h, x:x + w] = True
            gts.append(m)
            gcls.append(int(rng.randint(n_cats)))
            gcrowd.append(bool(rng.rand() < 0.2))
        dts, dcls, dsc = [], [], []
        for g, c in zip(gts, gcls):
            if rng.rand() < 0.25:
                continue
            m = np.roll(g, rng.randint(-3, 4), axis=rng.randint(2))
            dts.append(m)
            dcls.append(c if rng.rand() < 0.8 else int(rng.randint(n_cats)))
            dsc.append(float(rng.rand()))
        for _ in range(rng.randint(0, 4)):
            m = np.zeros((hw, hw), bool)
            y, x = rng.randint(0, hw - 6, 2)
            h, w = rng.randint(2, 12, 2)
            m[y:y + h, x:x + w] = True
            dts.append(m)
            dcls.append(int(rng.randint(n_cats)))
            dsc.append(float(rng.rand()))
        out.append((np.asarray(dts, bool).reshape(len(dts), hw, hw),
                    np.asarray(dcls), np.asarray(dsc),
                    np.asarray(gts, bool).reshape(len(gts), hw, hw),
                    np.asarray(gcls), np.asarray(gcrowd)))
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_instance_evaluator_matches_cocoeval_port(seed):
    rng = np.random.RandomState(seed)
    n_cats = 3
    images = random_instance_fixture(rng, n_cats=n_cats)

    ev = InstanceSegEvaluator(num_classes=n_cats)
    for dts, dcls, dsc, gts, gcls, gcrowd in images:
        ev.process(dts, dcls, dsc, gts, gcls, gcrowd)
    got = ev.evaluate()

    for rng_name, key in [("all", "AP"), ("small", "APs"),
                          ("medium", "APm"), ("large", "APl")]:
        aRng = AREA_RNG[rng_name]
        cat_aps = []
        for c in range(n_cats):
            per_img = []
            for dts, dcls, dsc, gts, gcls, gcrowd in images:
                dsel = dcls == c
                gsel = gcls == c
                if not dsel.any() and not gsel.any():
                    continue
                per_img.append(coco_evaluate_img(
                    list(dts[dsel]), list(dsc[dsel]), list(gts[gsel]),
                    list(gcrowd[gsel]), aRng, maxDet=100))
            ap = coco_accumulate(per_img)
            if ap is not None:
                cat_aps.append(ap)
        want = 100 * np.stack(cat_aps).mean() if cat_aps else 0.0
        np.testing.assert_allclose(got[key], want, atol=1e-9,
                                   err_msg=f"{key} seed={seed}")
        if rng_name == "all" and cat_aps:
            np.testing.assert_allclose(
                got["AP50"], 100 * np.stack(cat_aps)[:, 0].mean(), atol=1e-9)
            np.testing.assert_allclose(
                got["AP75"], 100 * np.stack(cat_aps)[:, 5].mean(), atol=1e-9)
