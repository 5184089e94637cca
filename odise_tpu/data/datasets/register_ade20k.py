"""ADE20K dataset registration (panoptic A-150 and full A-847 semantic).

Capability parity with the reference's ADE registration (reference
third_party/Mask2Former/mask2former/data/datasets/register_ade20k_panoptic.py
and register_ade20k_full.py). Category metadata (names, isthing) lives in
``metadata/ade20k_150_categories.json``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

from ..catalog import DatasetCatalog, MetadataCatalog
from .register_coco import get_dataset_root, load_coco_instances_json

_METADATA_DIR = os.path.join(os.path.dirname(__file__), "metadata")


def ade150_categories() -> List[dict]:
    with open(os.path.join(_METADATA_DIR, "ade20k_150_categories.json")) as f:
        return json.load(f)


def ade150_meta() -> Dict:
    cats = ade150_categories()
    meta = {
        "thing_classes": [c["name"] for c in cats if c["isthing"]],
        "stuff_classes": [c["name"] for c in cats],
        "thing_dataset_id_to_contiguous_id": {},
        "stuff_dataset_id_to_contiguous_id": {},
        "categories": [
            {"id": c["id"], "isthing": c["isthing"], "name": c["name"]} for c in cats
        ],
    }
    for i, c in enumerate(cats):
        if c["isthing"]:
            meta["thing_dataset_id_to_contiguous_id"][c["id"]] = i
        meta["stuff_dataset_id_to_contiguous_id"][c["id"]] = i
    return meta


def ade_instance_meta() -> Dict:
    """100-thing-class instance metadata, derived from the A-150 categories.

    The reference hardcodes the 100 ADE thing categories (reference
    third_party/Mask2Former/mask2former/data/datasets/
    register_ade20k_instance.py:12-42); they are exactly the ``isthing``
    rows of the panoptic category table, so we derive them instead.
    """
    things = [c for c in ade150_categories() if c["isthing"]]
    return {
        "thing_classes": [c["name"] for c in things],
        "thing_dataset_id_to_contiguous_id": {
            c["id"]: i for i, c in enumerate(things)},
    }


def load_ade_panoptic_json(json_file: str, image_dir: str, gt_dir: str,
                           semseg_dir: str, meta: Dict) -> List[dict]:
    with open(json_file) as f:
        info = json.load(f)
    id_map = meta["stuff_dataset_id_to_contiguous_id"]
    ret = []
    for ann in info["annotations"]:
        image_file = os.path.join(
            image_dir, os.path.splitext(ann["file_name"])[0] + ".jpg")
        segments_info = []
        for seg in ann["segments_info"]:
            seg = dict(seg)
            seg["category_id"] = id_map[seg["category_id"]]
            segments_info.append(seg)
        ret.append({
            "file_name": image_file,
            "image_id": ann["image_id"],
            "pan_seg_file_name": os.path.join(gt_dir, ann["file_name"]),
            "sem_seg_file_name": os.path.join(
                semseg_dir, os.path.splitext(ann["file_name"])[0] + ".png"),
            "segments_info": segments_info,
        })
    return ret


def load_sem_seg(image_dir: str, gt_dir: str, image_ext: str = "jpg",
                 gt_ext: str = "png") -> List[dict]:
    """Pairs of (image, semantic gt) by shared basename (d2 load_sem_seg)."""
    if not os.path.isdir(gt_dir):
        return []
    gt_files = sorted(f for f in os.listdir(gt_dir) if f.endswith(gt_ext))
    ret = []
    for g in gt_files:
        base = os.path.splitext(g)[0]
        ret.append({
            "file_name": os.path.join(image_dir, base + "." + image_ext),
            "sem_seg_file_name": os.path.join(gt_dir, g),
        })
    return ret


def register_ade20k(root: str | None = None) -> None:
    root = root or get_dataset_root()
    meta = ade150_meta()

    name = "ade20k_panoptic_val"
    image_dir = os.path.join(root, "ADEChallengeData2016", "images", "validation")
    gt_dir = os.path.join(root, "ADEChallengeData2016", "ade20k_panoptic_val")
    json_file = os.path.join(root, "ADEChallengeData2016",
                             "ade20k_panoptic_val.json")
    semseg_dir = os.path.join(root, "ADEChallengeData2016",
                              "annotations_detectron2", "validation")
    if name not in DatasetCatalog:
        DatasetCatalog.register(
            name, lambda: load_ade_panoptic_json(
                json_file, image_dir, gt_dir, semseg_dir, meta))
    # the instance json backs open-vocab instance AP on the panoptic split
    # (the reference attaches it as json_file via instances_json, reference
    # register_ade20k_panoptic.py:272-300)
    instances_json = os.path.join(root, "ADEChallengeData2016",
                                  "ade20k_instance_val.json")
    MetadataCatalog.get(name).set(
        panoptic_root=gt_dir, image_root=image_dir, panoptic_json=json_file,
        sem_seg_root=semseg_dir, ignore_label=255, label_divisor=1000,
        json_file=instances_json,
        evaluator_type="ade20k_panoptic_seg", **meta)

    # A-150 pure semantic val
    name = "ade20k_sem_seg_val"
    if name not in DatasetCatalog:
        DatasetCatalog.register(
            name, lambda: load_sem_seg(image_dir, semseg_dir))
    MetadataCatalog.get(name).set(
        stuff_classes=[c["name"] for c in ade150_categories()],
        image_root=image_dir, sem_seg_root=semseg_dir, ignore_label=255,
        evaluator_type="sem_seg")

    # ADE20K 100-thing-class instance splits (reference
    # register_ade20k_instance.py:45-60)
    inst_meta = ade_instance_meta()
    for split, img_sub in (("train", "training"), ("val", "validation")):
        name = f"ade20k_instance_{split}"
        inst_json = os.path.join(root, "ADEChallengeData2016",
                                 f"ade20k_instance_{split}.json")
        inst_img_dir = os.path.join(root, "ADEChallengeData2016",
                                    "images", img_sub)
        if name not in DatasetCatalog:
            DatasetCatalog.register(
                name, (lambda jf=inst_json, im=inst_img_dir:
                       load_coco_instances_json(
                           jf, im,
                           inst_meta["thing_dataset_id_to_contiguous_id"])))
        MetadataCatalog.get(name).set(
            image_root=inst_img_dir, json_file=inst_json, ignore_label=255,
            evaluator_type="coco_instance_seg", **inst_meta)

    # A-847 full vocabulary semantic val
    name = "ade20k_full_sem_seg_val"
    img847 = os.path.join(root, "ADE20K_2021_17_01", "images_detectron2", "val")
    gt847 = os.path.join(root, "ADE20K_2021_17_01", "annotations_detectron2", "val")
    if name not in DatasetCatalog:
        DatasetCatalog.register(
            name, lambda: load_sem_seg(img847, gt847, gt_ext="tif"))
    MetadataCatalog.get(name).set(
        image_root=img847, sem_seg_root=gt847, ignore_label=65535,
        evaluator_type="sem_seg")


register_ade20k()
