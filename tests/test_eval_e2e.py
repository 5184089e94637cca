"""End-to-end eval pipeline test: synthetic dataset on disk -> do_test ->
PQ/mIoU/AP numbers. Exercises registration, vocabulary building, jitted
open-vocab inference, on-device fusion, and all three native evaluators."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from odise_tpu.config import ConfigDict, L
from odise_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from odise_tpu.data.transforms import id2rgb


LABELS = (("cat",), ("dog",), ("grass",))


def _make_dataset(tmp_path, n=2, size=64):
    from PIL import Image

    records = []
    rng = np.random.RandomState(0)
    for i in range(n):
        img = rng.randint(0, 255, (size, size, 3), np.uint8)
        img_path = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(img).save(img_path)
        # panoptic gt: two segments
        ids = np.zeros((size, size), np.uint32)
        ids[: size // 2] = 1
        ids[size // 2:] = 2
        pan_path = str(tmp_path / f"pan{i}.png")
        Image.fromarray(id2rgb(ids)).save(pan_path)
        # semantic gt
        sem = np.zeros((size, size), np.uint8)
        sem[: size // 2] = 0
        sem[size // 2:] = 2
        sem_path = str(tmp_path / f"sem{i}.png")
        Image.fromarray(sem).save(sem_path)
        records.append({
            "file_name": img_path,
            "image_id": i,
            "pan_seg_file_name": pan_path,
            "sem_seg_file_name": sem_path,
            "segments_info": [
                {"id": 1, "category_id": 0, "iscrowd": 0},
                {"id": 2, "category_id": 2, "iscrowd": 0},
            ],
        })
    return records


def test_do_test_end_to_end(tmp_path):
    import jax
    import jax.numpy as jnp

    import train_net

    from odise_tpu.model_zoo.factory import build_category_odise

    name = "_e2e_synth"
    DatasetCatalog.remove(name)
    records = _make_dataset(tmp_path)
    DatasetCatalog.register(name, lambda: records)
    MetadataCatalog.get(name).set(
        ignore_label=255,
        categories=[{"id": i, "isthing": int(i < 2), "name": l[0]}
                    for i, l in enumerate(LABELS)])

    model = build_category_odise("tiny", train_labels=LABELS,
                                 with_clip_head=False, use_checkpoint=False,
                                 slide_training=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((3, 16)), method=type(model).init_full)

    cfg = ConfigDict(
        dataloader=ConfigDict(
            wrapper=ConfigDict(
                labels=[list(l) for l in LABELS],
                dataset_name=name,
                semantic_on=True,
                panoptic_on=True,
                instance_on=True,
            ),
            eval_short_side=64,
            eval_max_size=128,
        ),
    )
    results = train_net.do_test(cfg, model, variables)
    assert "main" in results
    r = results["main"]
    assert r["images"] == 2
    # random weights: metrics exist and are finite, not necessarily good
    for key in ("mIoU", "PQ", "AP"):
        assert key in r and np.isfinite(r[key]), (key, r)

    # host postprocessing fallback path (eval_device_stats=False) must
    # produce the same metric surface
    cfg.dataloader.eval_device_stats = False
    results_host = train_net.do_test(cfg, model, variables)
    rh = results_host["main"]
    assert rh["images"] == 2
    for key in ("mIoU", "PQ", "AP"):
        assert key in rh and np.isfinite(rh[key]), (key, rh)
    DatasetCatalog.remove(name)


def test_do_test_zero_recompiles_across_ticks(tmp_path):
    """Periodic in-training eval must not re-pay the model-forward compile:
    tick 2 with updated params reuses every compiled graph (VERDICT r2 #2)."""
    import jax
    import jax.numpy as jnp

    import train_net

    from odise_tpu.model_zoo.factory import build_category_odise

    name = "_e2e_ticks"
    DatasetCatalog.remove(name)
    records = _make_dataset(tmp_path)
    DatasetCatalog.register(name, lambda: records)
    MetadataCatalog.get(name).set(
        ignore_label=255,
        categories=[{"id": i, "isthing": int(i < 2), "name": l[0]}
                    for i, l in enumerate(LABELS)])

    model = build_category_odise("tiny", train_labels=LABELS,
                                 with_clip_head=False, use_checkpoint=False,
                                 slide_training=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((3, 16)), method=type(model).init_full)

    cfg = ConfigDict(
        dataloader=ConfigDict(
            wrapper=ConfigDict(
                labels=[list(l) for l in LABELS],
                dataset_name=name,
                semantic_on=True, panoptic_on=True, instance_on=True,
            ),
            eval_short_side=64,
            eval_max_size=128,
        ),
    )
    # fresh caches for this test
    train_net.do_test._vocab_cache = {}
    train_net.do_test._infer_cache = {}

    train_net.do_test(cfg, model, variables)
    (ikey, infer), = train_net.do_test._infer_cache.items()
    assert ikey[0] == name
    n_trunk_1 = infer._trunk._cache_size()
    n_head_1 = infer._head._cache_size()
    assert n_trunk_1 >= 1 and n_head_1 >= 1

    # tick 2: same shapes, different (updated) parameter values
    variables2 = jax.tree_util.tree_map(lambda x: x + 0.01, variables)
    r2 = train_net.do_test(cfg, model, variables2)
    assert train_net.do_test._infer_cache[ikey] is infer  # object reused
    # zero new compiles on either graph
    assert infer._trunk._cache_size() == n_trunk_1
    assert infer._head._cache_size() == n_head_1
    assert infer.variables is variables2  # updated params actually used
    assert r2["main"]["images"] == 2
    DatasetCatalog.remove(name)
