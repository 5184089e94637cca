#!/usr/bin/env python
"""Pascal Context FULL (459-class) ground-truth preparation.

Capability parity with the reference's prepare_pascal_ctx_full_sem_seg.py:
converts the per-image ``trainval/*.mat`` LabelMap annotations (uint16,
0 = unlabeled, 1..459 = classes) into 16-bit TIFF label maps with ids
shifted to 0..458 and 65535 = void, laid out next to the images prepared by
prepare_pascal_ctx_sem_seg.py.  The ctx459 eval task registered in
odise_tpu/data/datasets/register_pascal.py reads exactly this format
(16-bit tiff, ignore 65535).

Layout (DETECTRON2_DATASETS root):
  pascal_ctx_d2/images/{training,validation}/*.jpg   (inputs, already prepared)
  VOCdevkit/VOC2010/trainval/*.mat                   (inputs, official annos)
  pascal_ctx_d2/annotations_ctx459/{training,validation}/*.tif  (outputs)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np
from PIL import Image


def convert_label_map(label_map: np.ndarray) -> np.ndarray:
    """uint16 LabelMap (0=unlabeled, 1..459) -> 0..458 with 65535=void."""
    assert label_map.dtype == np.uint16, label_map.dtype
    out = label_map.astype(np.int64)
    out[out == 0] = 65536  # unlabeled -> void after the -1 shift
    out = out - 1
    out[out > 65535 - 1] = 65535
    return out.astype(np.uint16)


def generate_labels(mat_file: Path, out_dir: Path) -> None:
    import scipy.io as sio

    mat = sio.loadmat(str(mat_file))
    label_map = convert_label_map(mat["LabelMap"])
    out_file = out_dir / mat_file.with_suffix(".tif").name
    Image.fromarray(label_map).save(out_file)


def main(root: str) -> None:
    dataset_dir = Path(root) / "pascal_ctx_d2"
    mat_dir = Path(root) / "VOCdevkit" / "VOC2010" / "trainval"
    for split in ("training", "validation"):
        img_dir = dataset_dir / "images" / split
        out_dir = dataset_dir / "annotations_ctx459" / split
        out_dir.mkdir(parents=True, exist_ok=True)
        n = 0
        for img_file in sorted(img_dir.glob("*.jpg")):
            mat_file = mat_dir / f"{img_file.stem}.mat"
            if not mat_file.is_file():
                print(f"missing annotation {mat_file}, skipping")
                continue
            generate_labels(mat_file, out_dir)
            n += 1
        print(f"{split}: wrote {n} tiffs to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.environ.get("DETECTRON2_DATASETS", "datasets"))
