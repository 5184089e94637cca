#!/usr/bin/env python
"""Pascal VOC 2012 semantic annotations (21 classes incl. background).

Capability parity with the reference's prepare_pascal_voc_sem_seg.py:
SegmentationClass pngs -> detectron2 layout with 255=void preserved.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
from PIL import Image


def main(root: str):
    voc = os.path.join(root, "VOCdevkit", "VOC2012")
    src = os.path.join(voc, "SegmentationClass")
    split_file = os.path.join(voc, "ImageSets", "Segmentation", "val.txt")
    dst = os.path.join(voc, "annotations_detectron2", "val")
    os.makedirs(dst, exist_ok=True)
    with open(split_file) as f:
        names = [l.strip() for l in f if l.strip()]
    for i, n in enumerate(names):
        lab = np.asarray(Image.open(os.path.join(src, n + ".png")))
        Image.fromarray(lab.astype(np.uint8)).save(os.path.join(dst, n + ".png"))
        if (i + 1) % 500 == 0:
            print(f"{i + 1}/{len(names)}")
    print("wrote", dst)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.environ.get("DETECTRON2_DATASETS", "datasets"))
