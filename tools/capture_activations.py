#!/usr/bin/env python
"""Capture per-block activations for weight-parity debugging.

SURVEY.md hard part #1: the SD/CLIP ports are the largest surface for silent
numeric drift; the mitigation is per-block activation diffs against captured
reference activations. This tool produces our side of that diff: given a
(converted) checkpoint and a fixed input, it saves the backbone taps, pixel
decoder outputs, decoder predictions and final logits to an .npz for
comparison with a reference-side capture of the same input
(tools/verify_parity.py performs the diff and documents the workflow).

Usage:
  python tools/capture_activations.py --out acts.npz \
      [--sd-ckpt sd-v1-3.ckpt --clip-ckpt clip.pth --odise-ckpt odise.pth] \
      [--image img.jpg] [--scale tiny|full]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def ramp_image(S: int) -> np.ndarray:
    """Deterministic ramp input (reproducible on the reference side)."""
    yy, xx = np.mgrid[0:S, 0:S]
    return np.stack([yy / S, xx / S, (yy + xx) / (2 * S)], -1).astype(np.float32)


def build_with_weights(scale: str, *, sd_ckpt: str = "", clip_ckpt: str = "",
                       odise_ckpt: str = "", with_clip_head: bool = False,
                       num_labels: int = 16, seed: int = 0):
    """(model, variables) at the given scale, with converted weights merged
    over a deterministic random init."""
    import jax
    import jax.numpy as jnp

    from odise_tpu.model_zoo.factory import build_category_odise

    labels = tuple((f"c{i}",) for i in range(num_labels))
    model = build_category_odise(scale, train_labels=labels,
                                 with_clip_head=with_clip_head,
                                 use_checkpoint=False, slide_training=False)
    clip_dim = model.category_head.clip_dim
    S = 64 if scale == "tiny" else 512
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, S, S, 3), jnp.float32),
                           jnp.zeros((num_labels, clip_dim)),
                           method=type(model).init_full)
    params = variables["params"]

    from odise_tpu.engine.checkpoint import merge_params
    from odise_tpu.model_zoo.convert import (
        convert_odise_trainable, install_clip_weights, install_sd_weights,
        load_torch_state_dict)

    if sd_ckpt:
        params = install_sd_weights(params, load_torch_state_dict(sd_ckpt))
    if clip_ckpt:
        params = install_clip_weights(params, load_torch_state_dict(clip_ckpt))
    if odise_ckpt:
        params = merge_params(params, convert_odise_trainable(
            load_torch_state_dict(odise_ckpt)))
    return model, {"params": params}


def capture_activations(model, variables, img: np.ndarray) -> dict:
    """Per-stage activations on one [H, W, 3] float image in [0, 1]."""
    import jax.numpy as jnp

    img = jnp.asarray(np.asarray(img, np.float32)[None])
    captures = {}

    # backbone taps (pre-projection SD activations)
    taps = model.apply(
        variables, img,
        method=lambda m, x: m.backbone.feature_extractor(x))
    for i, t in enumerate(taps):
        captures[f"tap_{i}"] = np.asarray(t, np.float32)

    # pyramid features after projection/grouping
    feats = model.apply(variables, img, training=False,
                        method=lambda m, x, training: m.backbone(x, training))
    for k, v in feats.items():
        captures[f"backbone_{k}"] = np.asarray(v, np.float32)

    # head outputs
    out = model.apply(variables, img, False, method=type(model).forward_features)
    for k in ("pred_logits", "pred_masks", "mask_embed", "logit_scale"):
        captures[f"head_{k}"] = np.asarray(out[k], np.float32)

    # CLIP-head ensembled open logits on a deterministic synthetic
    # vocabulary (reference odise.py:1422-1542; torch side: run
    # PoolingCLIPHead with the same text matrix and save as clip_mask_cls)
    if getattr(model, "clip_head", None) is not None:
        K = 4
        labels = tuple((f"v{i}",) for i in range(K))
        clip_dim = model.category_head.clip_dim
        text_raw = np.linspace(-1.0, 1.0, K * clip_dim,
                               dtype=np.float32).reshape(K, clip_dim)
        clip_text = np.cos(text_raw).astype(np.float32)
        overlap = jnp.asarray([1, 0] * (K // 2), jnp.int32)
        mask_cls, _ = model.apply(
            variables, img, jnp.asarray(text_raw), labels,
            jnp.asarray(clip_text), labels, overlap,
            method=type(model).forward_eval)
        captures["clip_mask_cls"] = np.asarray(mask_cls, np.float32)
    return captures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="activations.npz")
    ap.add_argument("--scale", default="full", choices=["tiny", "full"])
    ap.add_argument("--image", default="", help="input image (else fixed ramp)")
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--sd-ckpt", default="")
    ap.add_argument("--clip-ckpt", default="")
    ap.add_argument("--odise-ckpt", default="")
    args = ap.parse_args()

    S = args.image_size if args.scale == "full" else 64
    if args.image:
        import cv2
        from PIL import Image

        img = np.asarray(Image.open(args.image).convert("RGB"))
        img = cv2.resize(img, (S, S)).astype(np.float32) / 255.0
    else:
        img = ramp_image(S)

    model, variables = build_with_weights(
        args.scale, sd_ckpt=args.sd_ckpt, clip_ckpt=args.clip_ckpt,
        odise_ckpt=args.odise_ckpt)
    captures = capture_activations(model, variables, img)

    np.savez_compressed(args.out, **captures)
    print(f"wrote {args.out}: " + ", ".join(
        f"{k}{list(v.shape)}" for k, v in list(captures.items())[:8]) + ", ...")


if __name__ == "__main__":
    main()
