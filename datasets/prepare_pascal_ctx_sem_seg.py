#!/usr/bin/env python
"""Pascal Context 59 & 459 annotation conversion.

Capability parity with the reference's prepare_pascal_ctx_sem_seg.py /
prepare_pascal_ctx_full_sem_seg.py: converts the trainval_merged.json (full
459-way labeling) into per-image pngs — uint8 with 255=void for the 59-class
subset, 16-bit TIFF with 65535=void for the full 459 set (reference
register_pascal.py:666-684).

Requires the 'detail' API annotations (trainval_merged.json) and VOC2010.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
from PIL import Image

# the 59 most frequent context classes, by their 459-way ids (public split)
PC59_IDS = [2, 9, 18, 19, 22, 23, 25, 31, 33, 34, 44, 45, 46, 59, 65, 68, 72,
            80, 85, 98, 104, 105, 113, 115, 144, 158, 159, 162, 187, 189, 207,
            220, 232, 258, 259, 260, 284, 295, 296, 308, 324, 326, 347, 349,
            354, 355, 360, 366, 368, 397, 415, 416, 420, 424, 427, 440, 445,
            454, 458]


def main(root: str):
    try:
        from detail import Detail  # optional dependency
    except ImportError:
        print("the 'detail' package is required (pip install detail); "
              "alternatively convert with mmseg's tooling. Skipping.")
        return
    voc = os.path.join(root, "VOCdevkit", "VOC2010")
    details = Detail(os.path.join(voc, "trainval_merged.json"),
                     os.path.join(voc, "JPEGImages"), "trainval")
    out59 = os.path.join(voc, "annotations_detectron2", "pc59_val")
    out459 = os.path.join(voc, "annotations_detectron2", "pc459_val")
    os.makedirs(out59, exist_ok=True)
    os.makedirs(out459, exist_ok=True)
    id59 = {cid: i for i, cid in enumerate(PC59_IDS)}
    for img in details.getImgs(phase="val"):
        full = details.getMask(img)  # [H, W] 459-way ids
        # 459: 16-bit tiff, ignore 65535, ids shifted -1
        m459 = full.astype(np.int32) - 1
        m459[m459 < 0] = 65535
        Image.fromarray(m459.astype(np.uint16)).save(
            os.path.join(out459, img["file_name"].replace(".jpg", ".tif")))
        # 59: uint8 png, ignore 255
        m59 = np.full(full.shape, 255, np.uint8)
        for cid, ci in id59.items():
            m59[full == cid] = ci
        Image.fromarray(m59).save(
            os.path.join(out59, img["file_name"].replace(".jpg", ".png")))
    print("done")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.environ.get("DETECTRON2_DATASETS", "datasets"))
