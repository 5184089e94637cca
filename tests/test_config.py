"""Unit tests for the lazy config system (capability parity with d2 LazyConfig)."""

import os
import textwrap

import pytest

from odise_tpu.config import (
    L,
    ConfigDict,
    apply_overrides,
    instantiate,
    load_config,
    resolve,
    auto_scale_workers,
)


def _dataclass_like(a, b=2, c=None):
    return {"a": a, "b": b, "c": c}


class _Model:
    def __init__(self, dim, sub=None, name="m"):
        self.dim = dim
        self.sub = sub
        self.name = name


def test_lazy_call_builds_tree():
    cfg = L(_Model)(dim=4, sub=L(_Model)(dim=8))
    assert cfg.dim == 4
    assert cfg.sub.dim == 8
    obj = instantiate(cfg)
    assert isinstance(obj, _Model) and obj.dim == 4
    assert isinstance(obj.sub, _Model) and obj.sub.dim == 8


def test_interpolation_absolute_and_relative():
    cfg = ConfigDict(
        model=L(_Model)(
            dim=256,
            sub=L(_Model)(dim="${..dim}", name="${root_name}"),
        ),
        root_name="hello",
    )
    r = resolve(cfg)
    assert r.model.sub.dim == 256
    assert r.model.sub.name == "hello"
    obj = instantiate(cfg)
    assert obj["model"].sub.dim == 256


def test_string_embedding_interpolation():
    cfg = ConfigDict(run="exp1", out="output/${run}/ckpt")
    assert resolve(cfg).out == "output/exp1/ckpt"


def test_apply_overrides():
    cfg = ConfigDict(train=ConfigDict(max_iter=100, amp=ConfigDict(enabled=True)),
                     lst=[1, 2, 3])
    apply_overrides(cfg, ["train.max_iter=5", "train.amp.enabled=False",
                          "lst.1=99", "train.new_key='x'"])
    assert cfg.train.max_iter == 5
    assert cfg.train.amp.enabled is False
    assert cfg.lst[1] == 99
    assert cfg.train.new_key == "x"


def test_load_config_file(tmp_path):
    p = tmp_path / "cfg.py"
    p.write_text(textwrap.dedent("""
        from odise_tpu.config import L, ConfigDict
        def _helper(x): return x * 2
        train = dict(max_iter=10, lr="${optimizer.lr}")
        optimizer = dict(lr=1e-4)
    """))
    cfg = load_config(str(p))
    assert cfg.train.max_iter == 10
    assert resolve(cfg).train.lr == 1e-4
    assert "_helper" not in cfg


def test_instantiate_plain_tree_passthrough():
    out = instantiate({"a": [1, 2, {"b": L(_dataclass_like)(a=1)}]})
    assert out["a"][2]["b"] == {"a": 1, "b": 2, "c": None}


def test_auto_scale_workers():
    cfg = ConfigDict(
        train=ConfigDict(reference_world_size=8, max_iter=800, eval_period=80,
                         checkpointer=ConfigDict(period=40)),
        dataloader=ConfigDict(train=ConfigDict(total_batch_size=64)),
        optimizer=ConfigDict(lr=1e-4),
        lr_multiplier=ConfigDict(milestones=[400, 600]),
    )
    scaled = auto_scale_workers(cfg, 4)
    assert scaled.dataloader.train.total_batch_size == 32
    assert scaled.optimizer.lr == pytest.approx(5e-5)
    assert scaled.train.max_iter == 1600
    assert scaled.lr_multiplier.milestones == [800, 1200]
    # no-op when equal
    assert auto_scale_workers(cfg, 8) is cfg


def test_catalog():
    from odise_tpu.data.catalog import DatasetCatalog, MetadataCatalog

    DatasetCatalog.remove("_test_ds")
    DatasetCatalog.register("_test_ds", lambda: [{"file_name": "x.jpg"}])
    assert DatasetCatalog.get("_test_ds")[0]["file_name"] == "x.jpg"
    with pytest.raises(ValueError):
        DatasetCatalog.register("_test_ds", lambda: [])
    meta = MetadataCatalog.get("_test_meta")
    meta.set(thing_classes=["a", "b"])
    assert MetadataCatalog.get("_test_meta").thing_classes == ["a", "b"]
    with pytest.raises(AttributeError):
        _ = meta.missing_key
    DatasetCatalog.remove("_test_ds")


def test_save_config_roundtrip_readable(tmp_path):
    from odise_tpu.config import save_config

    cfg = ConfigDict(
        model=L(_Model)(dim=4, sub=L(_Model)(dim=8)),
        train=ConfigDict(max_iter=10),
    )
    path = str(tmp_path / "config.yaml")
    save_config(cfg, path)
    text = open(path).read()
    assert "_target_" in text and "max_iter: 10" in text


def test_get_config_loads_shipped_configs():
    from odise_tpu.config import get_config

    cfg = get_config("common/train.py")
    assert cfg.train.seed == 42
    full = get_config("Panoptic/odise_label_coco_50e.py")
    assert full.train.max_iter == 92188
    assert full.train.reference_world_size == 32
