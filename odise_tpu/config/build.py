"""Two-phase model instantiation.

Rebuilds ``instantiate_odise`` (reference odise/config/instantiate.py:14-21):
the backbone must be built first so its ``output_shape()`` can be fed into the
segmentation head / pixel decoder configs before the rest of the model graph is
instantiated.
"""

from __future__ import annotations

from .lazy import instantiate, resolve


def instantiate_odise(cfg):
    """Instantiate an ODISE model config with backbone-shape plumbing."""
    cfg = resolve(cfg)
    if "backbone" not in cfg:
        # factory-style config (single callable builds the whole model):
        # no shape plumbing needed
        return instantiate(cfg, _resolved=True)
    backbone = instantiate(cfg.backbone, _resolved=True)
    cfg.sem_seg_head.input_shape = dict(backbone.output_shape())
    cfg.sem_seg_head.pixel_decoder.input_shape = dict(backbone.output_shape())
    cfg.backbone = backbone
    model = instantiate(cfg, _resolved=True)
    return model
