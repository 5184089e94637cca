"""COCO panoptic (+captions) dataset registration.

Capability parity with the reference's dataset registration surface
(reference third_party/Mask2Former/mask2former/data/datasets/
register_coco_panoptic_annos_semseg.py and odise/data/datasets/
register_coco_caption.py:18-67): registers
``coco_2017_{train,val}_panoptic_with_sem_seg`` and the caption-augmented
train split, with thing/stuff metadata and contiguous-id maps.

Dataset root: $DETECTRON2_DATASETS or $ODISE_TPU_DATASETS (default
``datasets/``). Registration is lazy: records load on first access.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

from ..catalog import DatasetCatalog, MetadataCatalog

_METADATA_DIR = os.path.join(os.path.dirname(__file__), "metadata")


def get_dataset_root() -> str:
    return os.environ.get(
        "DETECTRON2_DATASETS", os.environ.get("ODISE_TPU_DATASETS", "datasets"))


def coco_panoptic_categories() -> List[dict]:
    with open(os.path.join(_METADATA_DIR, "coco_panoptic_categories.json")) as f:
        return json.load(f)


def coco_meta() -> Dict:
    cats = coco_panoptic_categories()
    thing_classes = [c["name"] for c in cats if c["isthing"]]
    stuff_classes = [c["name"] for c in cats]  # stuff metadata includes things
    thing_ids = [c["id"] for c in cats if c["isthing"]]
    meta = {
        "thing_classes": thing_classes,
        "stuff_classes": stuff_classes,
        "thing_dataset_id_to_contiguous_id": {},
        "stuff_dataset_id_to_contiguous_id": {},
        "categories": cats,
    }
    for i, cat in enumerate(cats):
        if cat["isthing"]:
            meta["thing_dataset_id_to_contiguous_id"][cat["id"]] = i
        meta["stuff_dataset_id_to_contiguous_id"][cat["id"]] = i
    return meta


def load_coco_panoptic_json(json_file: str, image_dir: str, gt_dir: str,
                            semseg_dir: str, meta: Dict,
                            caption_json: str | None = None) -> List[dict]:
    """Panoptic json -> d2-style records with contiguous category ids."""
    with open(json_file) as f:
        info = json.load(f)

    id_map = {}
    for cat in meta["categories"]:
        id_map[cat["id"]] = meta["stuff_dataset_id_to_contiguous_id"][cat["id"]]

    captions_by_image: Dict[int, List[str]] = {}
    if caption_json and os.path.isfile(caption_json):
        with open(caption_json) as f:
            cap = json.load(f)
        for ann in cap["annotations"]:
            captions_by_image.setdefault(ann["image_id"], []).append(ann["caption"])

    ret = []
    for ann in info["annotations"]:
        image_id = int(ann["image_id"])
        image_file = os.path.join(
            image_dir, os.path.splitext(ann["file_name"])[0] + ".jpg")
        label_file = os.path.join(gt_dir, ann["file_name"])
        sem_label_file = os.path.join(
            semseg_dir, os.path.splitext(ann["file_name"])[0] + ".png")
        segments_info = []
        for seg in ann["segments_info"]:
            seg = dict(seg)
            seg["category_id"] = id_map[seg["category_id"]]
            segments_info.append(seg)
        rec = {
            "file_name": image_file,
            "image_id": image_id,
            "pan_seg_file_name": label_file,
            "sem_seg_file_name": sem_label_file,
            "segments_info": segments_info,
        }
        if image_id in captions_by_image:
            rec["captions"] = captions_by_image[image_id]
        ret.append(rec)
    return ret


def load_coco_instances_json(json_file: str, image_dir: str,
                             id_map: Dict[int, int]) -> List[dict]:
    """COCO-format instance json -> d2-style records with ``annotations``.

    Capability parity with detectron2's ``load_coco_json`` as used by the
    reference's instance registrations (reference third_party/Mask2Former/
    mask2former/data/datasets/register_ade20k_instance.py:53-60).  Category
    ids are remapped through ``id_map`` (dataset id -> contiguous id);
    ``segmentation`` payloads stay in COCO encoding and are rasterized
    lazily by :mod:`odise_tpu.data.coco_mask`.
    """
    with open(json_file) as f:
        info = json.load(f)
    images = {im["id"]: im for im in info["images"]}
    anns_by_image: Dict[int, List[dict]] = {}
    for ann in info.get("annotations", []):
        if ann.get("category_id") not in id_map:
            continue
        a = {
            "category_id": id_map[ann["category_id"]],
            "segmentation": ann.get("segmentation"),
            "bbox": ann.get("bbox"),
            "iscrowd": int(ann.get("iscrowd", 0)),
            "area": ann.get("area"),
        }
        anns_by_image.setdefault(int(ann["image_id"]), []).append(a)
    ret = []
    for image_id, im in sorted(images.items()):
        ret.append({
            "file_name": os.path.join(image_dir, im["file_name"]),
            "image_id": int(image_id),
            "height": int(im["height"]),
            "width": int(im["width"]),
            "annotations": anns_by_image.get(int(image_id), []),
        })
    return ret


def load_instance_gt_index(json_file: str,
                           id_map: Dict[int, int]) -> Dict[int, List[dict]]:
    """image_id -> [annotation] index for evaluator-side GT lookup."""
    with open(json_file) as f:
        info = json.load(f)
    out: Dict[int, List[dict]] = {}
    for ann in info.get("annotations", []):
        if ann.get("category_id") not in id_map:
            continue
        out.setdefault(int(ann["image_id"]), []).append({
            "category_id": id_map[ann["category_id"]],
            "segmentation": ann.get("segmentation"),
            "iscrowd": int(ann.get("iscrowd", 0)),
        })
    return out


def register_coco_panoptic(root: str | None = None) -> None:
    root = root or get_dataset_root()
    meta = coco_meta()
    for split in ("train", "val"):
        name = f"coco_2017_{split}_panoptic_with_sem_seg"
        json_file = os.path.join(root, "coco", "annotations",
                                 f"panoptic_{split}2017.json")
        image_dir = os.path.join(root, "coco", f"{split}2017")
        gt_dir = os.path.join(root, "coco", f"panoptic_{split}2017")
        semseg_dir = os.path.join(root, "coco", f"panoptic_semseg_{split}2017")
        if name not in DatasetCatalog:
            DatasetCatalog.register(
                name,
                (lambda jf=json_file, im=image_dir, gt=gt_dir, ss=semseg_dir:
                 load_coco_panoptic_json(jf, im, gt, ss, meta)))
        # instances json backs the COCOEvaluator segm task (the reference's
        # coco_2017_val_panoptic_with_sem_seg inherits json_file from the
        # base coco_2017_val registration)
        instances_json = os.path.join(root, "coco", "annotations",
                                      f"instances_{split}2017.json")
        MetadataCatalog.get(name).set(
            panoptic_root=gt_dir, image_root=image_dir, panoptic_json=json_file,
            sem_seg_root=semseg_dir, ignore_label=255, label_divisor=1000,
            json_file=instances_json,
            evaluator_type="coco_panoptic_seg", **meta)

    # caption-augmented train split (reference register_coco_caption.py:44-67)
    name = "coco_2017_train_panoptic_caption_with_sem_seg"
    json_file = os.path.join(root, "coco", "annotations", "panoptic_train2017.json")
    caption_json = os.path.join(root, "coco", "annotations",
                                "captions_train2017.json")
    image_dir = os.path.join(root, "coco", "train2017")
    gt_dir = os.path.join(root, "coco", "panoptic_train2017")
    semseg_dir = os.path.join(root, "coco", "panoptic_semseg_train2017")
    if name not in DatasetCatalog:
        DatasetCatalog.register(
            name,
            (lambda jf=json_file, im=image_dir, gt=gt_dir, ss=semseg_dir,
             cj=caption_json:
             load_coco_panoptic_json(jf, im, gt, ss, meta, caption_json=cj)))
    MetadataCatalog.get(name).set(
        panoptic_root=gt_dir, image_root=image_dir, panoptic_json=json_file,
        sem_seg_root=semseg_dir, ignore_label=255, label_divisor=1000,
        evaluator_type="coco_panoptic_seg", **meta)


register_coco_panoptic()
