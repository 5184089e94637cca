#!/usr/bin/env python
"""Per-component timing at eval resolution (backbone / head / clip / fusion)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, args, iters=5, warmup=2, name=""):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt * 1000:8.1f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from odise_tpu.model_zoo.factory import build_category_odise
    from odise_tpu.models.inference import panoptic_inference, semantic_inference

    K = 133
    labels = tuple((f"c{i}",) for i in range(K))
    model = build_category_odise("full", train_labels=labels,
                                 with_clip_head=True, use_checkpoint=False,
                                 slide_training=False, dtype=jnp.bfloat16)
    S, B = args.image_size, args.batch
    img = jnp.zeros((B, S, S, 3), jnp.float32)
    text_raw = jnp.zeros((K, 768), jnp.float32)
    clip_text = jnp.zeros((K, 768), jnp.float32)
    overlap = jnp.zeros((K,), jnp.int32)
    thing_mask = jnp.asarray([True] * 80 + [False] * (K - 80))

    def init_fn():
        return model.init(jax.random.PRNGKey(0), img, text_raw, labels,
                          clip_text, labels, overlap,
                          method=type(model).forward_eval)

    shapes = jax.eval_shape(init_fn)
    variables = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    # 1. backbone
    backbone_fn = jax.jit(lambda v, x: model.apply(
        v, x, training=False,
        method=lambda m, xx, training: m.backbone(xx, training=training)))
    t_bb = timed(backbone_fn, (variables, img), name="backbone (SD features)")

    # 2. backbone + sem_seg_head
    feat_fn = jax.jit(lambda v, x: model.apply(
        v, x, False, method=type(model).forward_features))
    t_head = timed(feat_fn, (variables, img), name="backbone+head")

    # 3. full eval without clip ensembling
    eval_noclip = jax.jit(lambda v, x, t: model.apply(
        v, x, t, labels, method=type(model).forward_eval))
    t_noclip = timed(eval_noclip, (variables, img, text_raw),
                     name="eval fwd (no clip head)")

    # 4. full eval with clip head
    eval_full = jax.jit(lambda v, x, t, ct, ov: model.apply(
        v, x, t, labels, ct, labels, ov, method=type(model).forward_eval))
    t_full = timed(eval_full, (variables, img, text_raw, clip_text, overlap),
                   name="eval fwd (with clip head)")

    # 5. fusion
    mask_cls, mask_pred = eval_full(variables, img, text_raw, clip_text, overlap)

    fusion = jax.jit(lambda c, m: (
        jax.vmap(semantic_inference)(c, m),
        jax.vmap(lambda cc, mm: panoptic_inference(cc, mm, thing_mask, 0.0, 0.8)
                 )(c, m).panoptic_seg))
    t_fus = timed(fusion, (mask_cls, mask_pred), name="fusion (sem+panoptic)")

    print(json.dumps({
        "backbone_ms": round(t_bb * 1000, 1),
        "head_ms": round((t_head - t_bb) * 1000, 1),
        "category+upsample_ms": round((t_noclip - t_head) * 1000, 1),
        "clip_head_ms": round((t_full - t_noclip) * 1000, 1),
        "fusion_ms": round(t_fus * 1000, 1),
        "total_ms": round((t_full + t_fus) * 1000, 1),
    }))


if __name__ == "__main__":
    main()
