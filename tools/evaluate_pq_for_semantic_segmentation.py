#!/usr/bin/env python
"""Compute PQ from semantic segmentation outputs.

Capability parity with the reference tool of the same name (vendored
Mask2Former tools/evaluate_pq_for_semantic_segmentation.py:245): treats each
connected semantic class region as one segment and evaluates PQ against
panoptic ground truth converted to semantic segments.

Usage: --pred-dir with per-image class-id pngs, --gt-dir with semantic gt.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def seg_from_semantic(sem: np.ndarray, ignore_label: int):
    """Semantic map -> (id map, segments): one segment per present class."""
    ids = np.zeros(sem.shape, np.uint32)
    segments = []
    next_id = 1
    for cls in np.unique(sem):
        if cls == ignore_label:
            continue
        ids[sem == cls] = next_id
        segments.append({"id": next_id, "category_id": int(cls)})
        next_id += 1
    return ids, segments


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred-dir", required=True)
    ap.add_argument("--gt-dir", required=True)
    ap.add_argument("--num-classes", type=int, required=True)
    ap.add_argument("--ignore-label", type=int, default=255)
    args = ap.parse_args()

    from PIL import Image

    from odise_tpu.evaluation.panoptic_eval import PanopticEvaluator

    ev = PanopticEvaluator(categories=list(range(args.num_classes)))
    files = sorted(os.listdir(args.pred_dir))
    for f in files:
        pred = np.asarray(Image.open(os.path.join(args.pred_dir, f)))
        gt = np.asarray(Image.open(os.path.join(args.gt_dir, f)))
        pred_ids, pred_segs = seg_from_semantic(pred, args.ignore_label)
        gt_ids, gt_segs = seg_from_semantic(gt, args.ignore_label)
        ev.process(gt_ids, gt_segs, pred_ids, pred_segs)
    print(ev.evaluate())


if __name__ == "__main__":
    main()
