#!/usr/bin/env python
"""ADE20K panoptic annotation generation.

Capability parity with the reference's prepare_ade20k_pan_seg.py: combines the
semantic and instance annotations of ADEChallengeData2016 into panoptic pngs +
json (panopticapi format) for ``ade20k_panoptic_val``. Uses the category
metadata in odise_tpu/data/datasets/metadata/ade20k_150_categories.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from odise_tpu.data.datasets.register_ade20k import ade150_categories
from odise_tpu.data.transforms import id2rgb


def main(root: str):
    base = os.path.join(root, "ADEChallengeData2016")
    cats = ade150_categories()
    sem_dir = os.path.join(base, "annotations", "validation")
    inst_dir = os.path.join(base, "annotations_instance", "validation")
    out_dir = os.path.join(base, "ade20k_panoptic_val")
    os.makedirs(out_dir, exist_ok=True)
    if not os.path.isdir(inst_dir):
        print(f"missing {inst_dir}; download ADE instance annotations first")
        return

    images = []
    annotations = []
    for i, fname in enumerate(sorted(os.listdir(sem_dir))):
        sem = np.asarray(Image.open(os.path.join(sem_dir, fname)))  # 1-based ids
        inst = np.asarray(Image.open(os.path.join(inst_dir, fname)))
        # instance png: R = semantic (thing) class, G = instance id
        pan = np.zeros(sem.shape, np.uint32)
        segments_info = []
        next_id = 1
        # stuff from semantic map
        for cid in np.unique(sem):
            if cid == 0:
                continue
            cat = cats[cid - 1]
            if cat["isthing"]:
                continue
            mask = sem == cid
            pan[mask] = next_id
            segments_info.append({"id": next_id, "category_id": int(cid - 1),
                                  "iscrowd": 0, "area": int(mask.sum())})
            next_id += 1
        # things from instance map
        r, g = inst[..., 0], inst[..., 1]
        for (tc, ti) in {(int(a), int(b)) for a, b in
                         zip(r[g > 0].ravel(), g[g > 0].ravel())}:
            mask = (r == tc) & (g == ti)
            # instance R channel indexes the 100 thing classes
            thing_cats = [j for j, c in enumerate(cats) if c["isthing"]]
            if tc - 1 >= len(thing_cats):
                continue
            cat_idx = thing_cats[tc - 1]
            pan[mask] = next_id
            segments_info.append({"id": next_id, "category_id": cat_idx,
                                  "iscrowd": 0, "area": int(mask.sum())})
            next_id += 1
        out_name = fname.replace(".png", ".png")
        Image.fromarray(id2rgb(pan)).save(os.path.join(out_dir, out_name))
        images.append({"id": os.path.splitext(fname)[0],
                       "file_name": fname.replace(".png", ".jpg"),
                       "height": int(sem.shape[0]), "width": int(sem.shape[1])})
        annotations.append({"image_id": os.path.splitext(fname)[0],
                            "file_name": out_name,
                            "segments_info": segments_info})
        if (i + 1) % 500 == 0:
            print(f"{i + 1} images")
    with open(os.path.join(base, "ade20k_panoptic_val.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": j, "name": c["name"],
                                   "isthing": c["isthing"]}
                                  for j, c in enumerate(cats)]}, f)
    print("done")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.environ.get("DETECTRON2_DATASETS", "datasets"))
