"""Data pipeline tests: transforms, rgb2id, mapper, loader, prompts."""

import os

import numpy as np

from odise_tpu.data.build import get_openseg_labels, prompt_labels
from odise_tpu.data.dataset_mapper import COCOPanopticDatasetMapper, collate
from odise_tpu.data.loader import build_test_loader, build_train_loader
from odise_tpu.data.transforms import (
    AugInput,
    FixedSizeCrop,
    RandomFlip,
    ResizeScale,
    ResizeShortestEdge,
    id2rgb,
    rgb2id,
)


def test_openseg_labels_counts():
    assert len(get_openseg_labels("coco_panoptic")) == 133
    assert len(get_openseg_labels("ade20k_150")) == 150
    assert len(get_openseg_labels("ade20k_847")) == 847
    assert len(get_openseg_labels("pascal_context_59")) == 59
    assert len(get_openseg_labels("pascal_context_459")) == 459
    assert len(get_openseg_labels("pascal_voc_21")) == 21
    assert len(get_openseg_labels("lvis_1203")) == 1203
    # prompt-engineered coco has synonym lists
    pe = get_openseg_labels("coco_panoptic", True)
    assert any(len(l) > 1 for l in pe)


def test_prompt_labels():
    out = prompt_labels([["cat", "kitty"], ["sky"]], "photo")
    assert out == [["a photo of a cat.", "a photo of a kitty."],
                   ["a photo of a sky."]]
    assert prompt_labels([["x"]], None) == [["x"]]


def test_rgb2id_roundtrip():
    ids = np.array([[0, 1], [256, 70000]], np.uint32)
    rgb = id2rgb(ids)
    np.testing.assert_array_equal(rgb2id(rgb), ids)


def test_transforms_shapes():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (60, 80, 3), np.uint8)
    seg = rng.randint(0, 10, (60, 80), np.int32)
    ai = AugInput(image=img, pan_seg=seg)
    ai = RandomFlip(prob=1.0)(ai, rng)
    np.testing.assert_array_equal(ai.image, img[:, ::-1])
    ai = ResizeScale(0.5, 0.5, 64, 64)(ai, rng)
    assert min(ai.image.shape[:2]) <= 32
    ai = FixedSizeCrop((64, 64))(ai, rng)
    assert ai.image.shape == (64, 64, 3)
    assert ai.pan_seg.shape == (64, 64)


def test_resize_shortest_edge_max_cap():
    ai = AugInput(image=np.zeros((100, 400, 3), np.uint8))
    ai = ResizeShortestEdge(64, max_size=128)(ai)
    assert max(ai.image.shape[:2]) <= 128


def _synthetic_record(seed=0, size=96):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (size, size, 3), np.uint8)
    pan = np.zeros((size, size), np.uint32)
    pan[: size // 2] = 1
    pan[size // 2:] = 2
    return {
        "image": img,
        "pan_seg": pan,
        "segments_info": [
            {"id": 1, "category_id": 3, "iscrowd": 0},
            {"id": 2, "category_id": 7, "iscrowd": 0},
        ],
        "captions": ["a cat sitting on grass"],
    }


def test_mapper_fixed_shapes():
    mapper = COCOPanopticDatasetMapper(is_train=True, image_size=64,
                                       max_instances=5)
    out = mapper(_synthetic_record(), rng=np.random.RandomState(1))
    assert out["image"].shape == (64, 64, 3)
    assert out["image"].dtype == np.float32 and out["image"].max() <= 1.0
    assert out["gt_masks"].shape == (5, 64, 64)
    assert out["gt_valid"].sum() <= 2
    # valid targets have non-empty masks and correct labels
    for i in range(5):
        if out["gt_valid"][i]:
            assert out["gt_masks"][i].any()
            assert out["gt_labels"][i] in (3, 7)


def test_mapper_caption_words():
    mapper = COCOPanopticDatasetMapper(is_train=True, image_size=64,
                                       max_instances=5, with_captions=True,
                                       num_words=4)
    out = mapper(_synthetic_record(), rng=np.random.RandomState(1))
    assert out["word_tokens"].shape == (4, 77)
    assert out["word_valid"].shape == (4,)
    assert out["word_valid"].any()


def test_train_loader_batches():
    records = [_synthetic_record(i) for i in range(6)]
    mapper = COCOPanopticDatasetMapper(is_train=True, image_size=32,
                                       max_instances=3)
    it = build_train_loader(records, mapper, total_batch_size=4)
    batch = next(it)
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["gt_masks"].shape == (4, 3, 32, 32)
    batch2 = next(it)  # infinite
    assert batch2["image"].shape == (4, 32, 32, 3)


def test_train_loader_host_sharding():
    records = [_synthetic_record(i) for i in range(8)]
    mapper = COCOPanopticDatasetMapper(is_train=True, image_size=32,
                                       max_instances=2, seed=0)
    b0 = next(build_train_loader(records, mapper, 4, num_hosts=2, host_id=0))
    b1 = next(build_train_loader(records, mapper, 4, num_hosts=2, host_id=1))
    assert b0["image"].shape == (2, 32, 32, 3)
    assert not np.array_equal(b0["image"], b1["image"])


def test_test_loader():
    records = [_synthetic_record(i) for i in range(3)]
    batches = list(build_test_loader(records, limit=2))
    assert len(batches) == 2 and len(batches[0]) == 1


def test_ctx459_synthetic_end_to_end(tmp_path):
    """ctx459 provisioning smoke: the prep script converts synthetic .mat
    LabelMaps to 16-bit TIFFs (reference layout), registration finds them,
    and the sem-seg evaluator consumes the ignore-65535 gt."""
    import sys

    import scipy.io as sio
    from PIL import Image

    sys.path.insert(0, "datasets")
    from prepare_pascal_ctx_full_sem_seg import convert_label_map, main

    rng = np.random.RandomState(0)
    # official raw layout: images + trainval .mat annotations
    img_dir = tmp_path / "pascal_ctx_d2" / "images" / "validation"
    mat_dir = tmp_path / "VOCdevkit" / "VOC2010" / "trainval"
    img_dir.mkdir(parents=True)
    mat_dir.mkdir(parents=True)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(
            img_dir / f"2008_{i:06d}.jpg")
        label_map = rng.randint(0, 460, (16, 16)).astype(np.uint16)
        label_map[0, :4] = 0  # unlabeled -> void
        sio.savemat(mat_dir / f"2008_{i:06d}.mat", {"LabelMap": label_map})
    (tmp_path / "pascal_ctx_d2" / "images" / "training").mkdir()

    main(str(tmp_path))
    out_dir = tmp_path / "pascal_ctx_d2" / "annotations_ctx459" / "validation"
    tifs = sorted(out_dir.glob("*.tif"))
    assert len(tifs) == 2
    gt = np.asarray(Image.open(tifs[0]))
    assert gt.dtype == np.uint16
    assert (gt[0, :4] == 65535).all()        # unlabeled became void
    assert gt[gt != 65535].max() <= 458      # ids shifted to 0..458

    # conversion semantics pinned directly too
    lm = np.array([[0, 1, 459]], np.uint16)
    np.testing.assert_array_equal(convert_label_map(lm), [[65535, 0, 458]])

    # registration resolves the reference layout and records pair up
    from odise_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from odise_tpu.data.datasets.register_pascal import register_pascal

    DatasetCatalog.remove("ctx459_sem_seg_val")
    register_pascal(str(tmp_path))
    records = DatasetCatalog.get("ctx459_sem_seg_val")
    assert len(records) == 2
    assert all(os.path.isfile(r["file_name"]) for r in records)
    meta = MetadataCatalog.get("ctx459_sem_seg_val")
    assert meta.get("ignore_label") == 65535
    assert len(meta.get("stuff_classes")) == 459

    # evaluator consumes the tiff gt with 65535 ignored
    from odise_tpu.evaluation.sem_seg_eval import SemSegEvaluator

    ev = SemSegEvaluator(num_classes=459, ignore_label=65535)
    for r in records:
        gt = np.asarray(Image.open(r["sem_seg_file_name"]))
        pred = gt.copy().astype(np.int64)
        pred[gt == 65535] = 0
        ev.process(pred, gt)
    res = ev.evaluate()
    assert res["mIoU"] == 100.0  # perfect predictions on non-ignored pixels
    # restore global registration for other tests
    DatasetCatalog.remove("ctx459_sem_seg_val")
    register_pascal()


# ---------------------------------------------------------------------------
# COCO mask encoding (coco_mask.py) and instance-json registration


def test_rle_compressed_known_values():
    from odise_tpu.data.coco_mask import (decode_compressed_counts,
                                          encode_compressed_counts)
    # hand-derived from the COCO spec encoding (6-bit chunks, offset 48,
    # bit 5 = continuation, delta vs counts[-2] from the 4th count on)
    assert decode_compressed_counts("6") == [6]
    assert encode_compressed_counts([6]) == "6"
    assert decode_compressed_counts("X1") == [40]
    assert encode_compressed_counts([40]) == "X1"
    # negative delta: counts [10, 5, 12, 4] stores 4 as delta -1 = chr(79)
    s = encode_compressed_counts([10, 5, 12, 4])
    assert s.endswith("O")
    assert decode_compressed_counts(s) == [10, 5, 12, 4]


def test_rle_roundtrip_random():
    from odise_tpu.data.coco_mask import mask_to_rle, rle_to_mask
    rng = np.random.RandomState(0)
    for _ in range(5):
        m = rng.rand(23, 17) > 0.5
        for compress in (True, False):
            r = mask_to_rle(m, compress=compress)
            np.testing.assert_array_equal(rle_to_mask(r), m)
    # degenerate: empty and full masks
    for m in (np.zeros((7, 5), bool), np.ones((7, 5), bool)):
        np.testing.assert_array_equal(rle_to_mask(mask_to_rle(m)), m)


def test_rle_column_major():
    from odise_tpu.data.coco_mask import rle_to_mask
    # 2x2: counts [1, 2, 1] column-major -> pixels (1,0) and (0,1) set
    m = rle_to_mask({"size": [2, 2], "counts": [1, 2, 1]})
    np.testing.assert_array_equal(m, np.array([[0, 1], [1, 0]], bool))


def test_polygons_and_annotations_to_masks():
    from odise_tpu.data.coco_mask import (annotations_to_masks,
                                          segmentation_to_mask)
    # axis-aligned square [2,2]..[6,6] inclusive of boundary pixels
    poly = [[2.0, 2.0, 6.0, 2.0, 6.0, 6.0, 2.0, 6.0]]
    m = segmentation_to_mask(poly, 10, 10)
    assert m[4, 4] and m[2, 2] and not m[0, 0] and not m[8, 8]
    anns = [{"segmentation": poly},
            {"segmentation": {"size": [10, 10],
                              "counts": [0, 1] + [99]}}]
    ms = annotations_to_masks(anns, 10, 10)
    assert ms.shape == (2, 10, 10)
    assert ms[1, 0, 0] and not ms[1, 5, 5]
    assert annotations_to_masks([], 4, 4).shape == (0, 4, 4)


def test_ade_instance_meta_and_loader(tmp_path):
    from odise_tpu.data.datasets.register_ade20k import ade_instance_meta
    from odise_tpu.data.datasets.register_coco import (
        load_coco_instances_json, load_instance_gt_index)

    meta = ade_instance_meta()
    assert len(meta["thing_classes"]) == 100
    cmap = meta["thing_dataset_id_to_contiguous_id"]
    assert sorted(cmap.values()) == list(range(100))

    some_id = sorted(cmap)[0]
    info = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 8, "width": 8},
                   {"id": 2, "file_name": "b.jpg", "height": 8, "width": 8}],
        "annotations": [
            {"image_id": 1, "category_id": some_id, "iscrowd": 0,
             "segmentation": [[1.0, 1.0, 5.0, 1.0, 5.0, 5.0, 1.0, 5.0]],
             "bbox": [1, 1, 4, 4], "area": 16},
            # unmapped category ids are dropped
            {"image_id": 1, "category_id": 99999, "iscrowd": 0,
             "segmentation": [[0.0, 0.0, 2.0, 0.0, 2.0, 2.0]],
             "bbox": [0, 0, 2, 2], "area": 2},
        ],
    }
    import json as _json
    jf = tmp_path / "inst.json"
    jf.write_text(_json.dumps(info))
    recs = load_coco_instances_json(str(jf), "/img", cmap)
    assert len(recs) == 2
    assert len(recs[0]["annotations"]) == 1
    assert recs[0]["annotations"][0]["category_id"] == cmap[some_id]
    assert recs[1]["annotations"] == []  # image without anns still listed
    idx = load_instance_gt_index(str(jf), cmap)
    assert list(idx) == [1] and len(idx[1]) == 1


def test_ade_instance_registration_present():
    from odise_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    import odise_tpu.data.datasets.register_ade20k  # noqa: F401

    assert "ade20k_instance_val" in DatasetCatalog
    md = MetadataCatalog.get("ade20k_instance_val")
    assert len(md.get("thing_classes")) == 100
    # the panoptic split carries the instance json for instance AP
    md_pan = MetadataCatalog.get("ade20k_panoptic_val")
    assert md_pan.get("json_file", "").endswith("ade20k_instance_val.json")


def test_mapillary_and_coco_stuff_registration():
    from odise_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    import odise_tpu.data.datasets.register_mapillary  # noqa: F401
    import odise_tpu.data.datasets.register_coco_stuff  # noqa: F401

    for name in ("mapillary_vistas_sem_seg_val", "mapillary_vistas_panoptic_val",
                 "coco_2017_test_stuff_10k_sem_seg"):
        assert name in DatasetCatalog, name

    md = MetadataCatalog.get("mapillary_vistas_sem_seg_val")
    assert len(md.get("stuff_classes")) == 65
    assert md.get("ignore_label") == 65

    mdp = MetadataCatalog.get("mapillary_vistas_panoptic_val")
    tmap = mdp.get("thing_dataset_id_to_contiguous_id")
    smap = mdp.get("stuff_dataset_id_to_contiguous_id")
    assert len(smap) == 65 and len(tmap) < 65
    assert mdp.get("label_divisor") == 1000

    mds = MetadataCatalog.get("coco_2017_test_stuff_10k_sem_seg")
    assert len(mds.get("stuff_classes")) == 171
    assert sorted(mds.get("stuff_dataset_id_to_contiguous_id").values()) == \
        list(range(171))


def test_prefetch_iter_order_and_exceptions():
    from odise_tpu.utils.prefetch import prefetch_iter

    out = list(prefetch_iter(range(7), lambda x: x * x, depth=2))
    assert out == [0, 1, 4, 9, 16, 25, 36]
    assert list(prefetch_iter([], lambda x: x, depth=2)) == []
    assert list(prefetch_iter([1], lambda x: -x, depth=0)) == [-1]

    def boom(x):
        if x == 2:
            raise ValueError("boom")
        return x

    import pytest as _pytest
    with _pytest.raises(ValueError):
        list(prefetch_iter(range(4), boom, depth=2))
