#!/usr/bin/env python
"""Generate semantic-seg pngs from COCO panoptic annotations.

Capability parity with the reference prep script of the same name: for each
panoptic png, write a single-channel png of contiguous category ids (255 =
void) into panoptic_semseg_{split}2017.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
from PIL import Image


def process_split(root: str, split: str):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from odise_tpu.data.datasets.register_coco import coco_meta
    from odise_tpu.data.transforms import rgb2id

    meta = coco_meta()
    id_map = {c["id"]: meta["stuff_dataset_id_to_contiguous_id"][c["id"]]
              for c in meta["categories"]}

    ann_file = os.path.join(root, "coco", "annotations",
                            f"panoptic_{split}2017.json")
    pan_dir = os.path.join(root, "coco", f"panoptic_{split}2017")
    out_dir = os.path.join(root, "coco", f"panoptic_semseg_{split}2017")
    os.makedirs(out_dir, exist_ok=True)
    with open(ann_file) as f:
        info = json.load(f)
    for i, ann in enumerate(info["annotations"]):
        pan = np.asarray(Image.open(os.path.join(pan_dir, ann["file_name"])))
        pan_ids = rgb2id(pan)
        sem = np.full(pan_ids.shape, 255, np.uint8)
        for seg in ann["segments_info"]:
            sem[pan_ids == seg["id"]] = id_map[seg["category_id"]]
        Image.fromarray(sem).save(os.path.join(out_dir, ann["file_name"]))
        if (i + 1) % 5000 == 0:
            print(f"{split}: {i + 1}/{len(info['annotations'])}")
    print("wrote", out_dir)


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "DETECTRON2_DATASETS", "datasets")
    for split in ("val", "train"):
        process_split(root, split)
