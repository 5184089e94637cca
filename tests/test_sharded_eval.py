"""Data-parallel (mesh-sharded) eval == single-device eval.

The reference distributes evaluation by DDP-wrapping the inference model and
sharding the val set across ranks (reference tools/train_net.py:126-135, rank
sync inside the d2 evaluators). The TPU-native counterpart batches same-bucket
images and shards the batch dim over the mesh's data axis
(ShardedOpenPanopticInference). This test proves metric equality on the
8-device CPU mesh, including a remainder group that needs padding and images
spread over two shape buckets.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from odise_tpu.config import ConfigDict
from odise_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from odise_tpu.data.transforms import id2rgb

LABELS = (("cat",), ("dog",), ("grass",))


def _make_dataset(tmp_path, sizes):
    from PIL import Image

    records = []
    rng = np.random.RandomState(0)
    for i, (sh, sw) in enumerate(sizes):
        img = rng.randint(0, 255, (sh, sw, 3), np.uint8)
        img_path = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(img).save(img_path)
        ids = np.zeros((sh, sw), np.uint32)
        ids[: sh // 2] = 1
        ids[sh // 2:] = 2
        pan_path = str(tmp_path / f"pan{i}.png")
        Image.fromarray(id2rgb(ids)).save(pan_path)
        sem = np.zeros((sh, sw), np.uint8)
        sem[: sh // 2] = int(i % 2)
        sem[sh // 2:] = 2
        sem_path = str(tmp_path / f"sem{i}.png")
        Image.fromarray(sem).save(sem_path)
        records.append({
            "file_name": img_path,
            "image_id": i,
            "pan_seg_file_name": pan_path,
            "sem_seg_file_name": sem_path,
            "segments_info": [
                {"id": 1, "category_id": int(i % 2), "iscrowd": 0},
                {"id": 2, "category_id": 2, "iscrowd": 0},
            ],
        })
    return records


def test_sharded_eval_matches_single_device(tmp_path):
    import jax
    import jax.numpy as jnp

    import train_net

    from odise_tpu.model_zoo.factory import build_category_odise

    assert len(jax.devices()) >= 8, "conftest must provide the 8-CPU mesh"

    name = "_sharded_eq"
    DatasetCatalog.remove(name)
    # 5 images over two aspect buckets: 8-way groups stay partially filled,
    # exercising the remainder-padding path in both buckets
    records = _make_dataset(
        tmp_path, [(64, 64), (64, 96), (64, 64), (64, 96), (64, 64)])
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

    def make_cfg(parallel):
        return ConfigDict(
            dataloader=ConfigDict(
                wrapper=ConfigDict(
                    labels=[list(l) for l in LABELS],
                    dataset_name=name,
                    semantic_on=True, panoptic_on=True, instance_on=True,
                ),
                eval_short_side=64,
                eval_max_size=128,
                eval_data_parallel=parallel,
            ),
        )

    train_net.do_test._vocab_cache = {}
    train_net.do_test._infer_cache = {}
    single = train_net.do_test(make_cfg(False), model, variables)["main"]
    sharded = train_net.do_test(make_cfg(True), model, variables)["main"]

    assert single["images"] == sharded["images"] == 5
    keys = {k for k, v in single.items() if isinstance(v, float)} - {"s_per_img"}
    assert {"mIoU", "PQ", "AP"} <= keys
    for k in keys:
        np.testing.assert_allclose(
            sharded[k], single[k], rtol=1e-5, atol=1e-6,
            err_msg=f"metric {k} diverges between sharded and single-device")
    DatasetCatalog.remove(name)
