"""Pascal VOC-21 / Context-59 / Context-459 semantic-seg registration.

Capability parity with reference odise/data/datasets/register_pascal.py:
582-687 (registration of pascal_context_59_sem_seg_val,
pascal_context_459_sem_seg_val — 16-bit TIFF gt with ignore=65535 — and
pascal_voc_21_sem_seg_val). Category names come from the openseg label files
(first synonym per category), matching the reference's tables.

Layouts: the reference's prepared layout (``pascal_ctx_d2/images/validation``
+ ``annotations_ctx59|annotations_ctx459``, ``pascal_voc_d2`` — reference
register_pascal.py:582-687) is preferred; the raw-VOCdevkit layout written by
this repo's combined ``datasets/prepare_pascal_ctx_sem_seg.py`` is the
fallback, so datasets prepared for either codebase register unchanged.
"""

from __future__ import annotations

import os

from ..build import get_openseg_labels
from ..catalog import DatasetCatalog, MetadataCatalog
from .register_ade20k import load_sem_seg
from .register_coco import get_dataset_root


def _first_existing(*candidates: str) -> str:
    for c in candidates:
        if os.path.isdir(c):
            return c
    return candidates[0]


def register_pascal(root: str | None = None) -> None:
    root = root or get_dataset_root()
    voc = os.path.join(root, "VOCdevkit")
    ctx_d2 = os.path.join(root, "pascal_ctx_d2")
    voc_d2 = os.path.join(root, "pascal_voc_d2")

    # Pascal Context 59
    name = "ctx59_sem_seg_val"
    img_dir = _first_existing(
        os.path.join(ctx_d2, "images", "validation"),
        os.path.join(voc, "VOC2010", "JPEGImages"))
    gt_dir = _first_existing(
        os.path.join(ctx_d2, "annotations_ctx59", "validation"),
        os.path.join(voc, "VOC2010", "annotations_detectron2", "pc59_val"))
    if name not in DatasetCatalog:
        DatasetCatalog.register(
            name, lambda x=img_dir, y=gt_dir: load_sem_seg(x, y))
    MetadataCatalog.get(name).set(
        stuff_classes=[l[0] for l in get_openseg_labels("pascal_context_59")],
        image_root=img_dir, sem_seg_root=gt_dir, ignore_label=255,
        evaluator_type="sem_seg")

    # Pascal Context 459 (16-bit tiff gt, ignore 65535)
    name = "ctx459_sem_seg_val"
    img459 = _first_existing(
        os.path.join(ctx_d2, "images", "validation"),
        os.path.join(voc, "VOC2010", "JPEGImages"))
    gt459 = _first_existing(
        os.path.join(ctx_d2, "annotations_ctx459", "validation"),
        os.path.join(voc, "VOC2010", "annotations_detectron2", "pc459_val"))
    if name not in DatasetCatalog:
        DatasetCatalog.register(
            name, lambda x=img459, y=gt459: load_sem_seg(x, y, gt_ext="tif"))
    MetadataCatalog.get(name).set(
        stuff_classes=[l[0] for l in get_openseg_labels("pascal_context_459")],
        image_root=img459, sem_seg_root=gt459, ignore_label=65535,
        evaluator_type="sem_seg")

    # Pascal VOC 21 (20 + background)
    name = "pascal21_sem_seg_val"
    img12 = _first_existing(
        os.path.join(voc_d2, "images", "val"),
        os.path.join(voc, "VOC2012", "JPEGImages"))
    gt21 = _first_existing(
        os.path.join(voc_d2, "annotations_pascal21", "val"),
        os.path.join(voc, "VOC2012", "annotations_detectron2", "val"))
    if name not in DatasetCatalog:
        DatasetCatalog.register(
            name, lambda x=img12, y=gt21: load_sem_seg(x, y))
    MetadataCatalog.get(name).set(
        stuff_classes=[l[0] for l in get_openseg_labels("pascal_voc_21")],
        image_root=img12, sem_seg_root=gt21, ignore_label=255,
        evaluator_type="sem_seg")


register_pascal()
