"""Model zoo: config-path -> checkpoint-url map and ``get()``.

Capability parity with reference odise/model_zoo/model_zoo.py:36-152:
``get_config_file``/``get_config`` resolve packaged configs;
``get_checkpoint_url`` maps config paths to released weights; ``get()``
instantiates and loads. Released reference weights (.pth) are converted on
the fly by ``convert.py``.
"""

from __future__ import annotations

import os
from typing import Optional

from ..config import get_config as _load_config, instantiate_odise, resolve
from ..utils.file_io import get_local_path

_ModelZooUrls = {
    "Panoptic/odise_label_coco_50e.py": "odise://Panoptic/odise_label_coco_50e",
    "Panoptic/odise_caption_coco_50e.py": "odise://Panoptic/odise_caption_coco_50e",
}


def get_checkpoint_url(config_path: str) -> str:
    if config_path not in _ModelZooUrls:
        raise RuntimeError(f"{config_path} not available in Model Zoo!")
    return _ModelZooUrls[config_path]


def get_config_file(config_path: str) -> str:
    path = os.path.join(os.path.dirname(__file__), "..", "..", "configs", config_path)
    if not os.path.isfile(path):
        raise RuntimeError(f"{config_path} not available in Model Zoo!")
    return os.path.normpath(path)


def get_config(config_path: str, trained: bool = False):
    cfg = _load_config(config_path)
    if trained:
        cfg.train.init_checkpoint = get_checkpoint_url(config_path)
    return cfg


def get(config_path: str, trained: bool = False, init_rng_seed: int = 0):
    """Build the model (and load released weights when trained=True).

    Returns (model, variables).
    """
    import jax
    import jax.numpy as jnp

    cfg = get_config(config_path, trained)
    cfg = resolve(cfg)
    model = instantiate_odise(cfg.model)

    labels = model.train_labels
    flat = [t for g in labels for t in g]
    init_img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    clip_dim = getattr(getattr(model, "category_head", None), "clip_dim", 768)
    if hasattr(model, "category_head") and model.category_head is not None:
        variables = model.init(
            jax.random.PRNGKey(init_rng_seed), init_img,
            jnp.zeros((len(flat), clip_dim)),
            method=type(model).init_full)
    else:
        variables = model.init(
            jax.random.PRNGKey(init_rng_seed), init_img,
            jnp.zeros((1, 1, 77), jnp.int32),
            method=type(model).init_full)

    if trained:
        from .convert import load_torch_state_dict
        from ..engine.checkpoint import merge_params

        ckpt_path = get_local_path(cfg.train.init_checkpoint)
        state = load_torch_state_dict(ckpt_path)
        from .convert import convert_odise_trainable

        params = merge_params(variables["params"],
                              convert_odise_trainable(state))
        variables = {"params": params}
    return model, variables
