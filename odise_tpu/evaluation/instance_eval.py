"""Instance segmentation mask-AP evaluator, implemented natively.

Capability parity with the reference's ``InstanceSegEvaluator``
(reference odise/evaluation/d2_evaluator.py:117-181, which defers to
pycocotools' COCOeval): COCO-style mask AP averaged over IoU thresholds
0.50:0.95:0.05, with greedy score-ordered matching per category and the
standard 101-point interpolated precision.

This is a faithful re-implementation of the metric definition (not of
pycocotools internals): per-category, predictions across all images are
sorted by score; each is matched to the best unmatched GT with IoU >=
threshold; AP is the area under the interpolated P-R curve.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRS = np.arange(0.5, 1.0, 0.05)


def mask_iou(pred: np.ndarray, gt: np.ndarray) -> float:
    from ..native import mask_iou as _native_iou

    return _native_iou(pred, gt)


class InstanceSegEvaluator:
    def __init__(self, num_classes: int, max_dets: int = 100,
                 class_names: Optional[Sequence[str]] = None):
        self.num_classes = num_classes
        self.max_dets = max_dets
        self.class_names = class_names
        self.reset()

    def reset(self):
        # per category: list of (score, image_id, iou_vector vs each gt)
        self._preds = defaultdict(list)
        self._gt_count = defaultdict(int)
        self._img_counter = 0

    def process(self, pred_masks: np.ndarray, pred_classes: np.ndarray,
                pred_scores: np.ndarray, gt_masks: np.ndarray,
                gt_classes: np.ndarray):
        """One image. pred_masks [N,H,W] bool, gt_masks [M,H,W] bool."""
        img_id = self._img_counter
        self._img_counter += 1
        order = np.argsort(-np.asarray(pred_scores))[: self.max_dets]
        gt_by_cat = defaultdict(list)
        for gi, gc in enumerate(np.asarray(gt_classes)):
            gt_by_cat[int(gc)].append(gi)
            self._gt_count[int(gc)] += 1
        for pi in order:
            c = int(pred_classes[pi])
            s = float(pred_scores[pi])
            if s <= 0:
                continue
            gids = gt_by_cat.get(c, [])
            ious = np.asarray([mask_iou(pred_masks[pi], gt_masks[g]) for g in gids])
            self._preds[c].append((s, img_id, [(g, float(i)) for g, i in zip(gids, ious)]))

    def _ap_for_cat(self, cat: int) -> Optional[np.ndarray]:
        n_gt = self._gt_count.get(cat, 0)
        preds = sorted(self._preds.get(cat, []), key=lambda x: -x[0])
        if n_gt == 0:
            return None
        aps = np.zeros(len(IOU_THRS))
        for ti, thr in enumerate(IOU_THRS):
            matched = set()
            tp = np.zeros(len(preds))
            fp = np.zeros(len(preds))
            for i, (s, img, ious) in enumerate(preds):
                best, best_g = 0.0, None
                for g, iou in ious:
                    key = (img, g)
                    if iou >= thr and iou > best and key not in matched:
                        best, best_g = iou, key
                if best_g is not None:
                    matched.add(best_g)
                    tp[i] = 1
                else:
                    fp[i] = 1
            ctp, cfp = np.cumsum(tp), np.cumsum(fp)
            recall = ctp / n_gt
            precision = ctp / np.maximum(ctp + cfp, 1e-9)
            # 101-point interpolation
            rec_thrs = np.linspace(0, 1, 101)
            prec_interp = np.zeros(101)
            if len(precision):
                # make precision monotonically decreasing from the right
                for k in range(len(precision) - 2, -1, -1):
                    precision[k] = max(precision[k], precision[k + 1])
                inds = np.searchsorted(recall, rec_thrs, side="left")
                valid = inds < len(precision)
                prec_interp[valid] = precision[inds[valid]]
            aps[ti] = prec_interp.mean()
        return aps

    def evaluate(self) -> Dict[str, float]:
        per_cat = {}
        for c in range(self.num_classes):
            ap = self._ap_for_cat(c)
            if ap is not None:
                per_cat[c] = ap
        if not per_cat:
            return {"AP": 0.0, "AP50": 0.0, "AP75": 0.0}
        all_aps = np.stack(list(per_cat.values()))
        res = {
            "AP": 100 * all_aps.mean(),
            "AP50": 100 * all_aps[:, 0].mean(),
            "AP75": 100 * all_aps[:, 5].mean(),
        }
        if self.class_names is not None:
            for c, ap in per_cat.items():
                res[f"AP-{self.class_names[c]}"] = 100 * ap.mean()
        return res
