#!/usr/bin/env python
"""Per-component timing at eval resolution (backbone / head / clip / fusion).

Timing method: every jitted function returns a scalar checksum and the loop
fetches it to the host each iteration — ``block_until_ready`` alone is not a
reliable barrier through the axon TPU relay. The measured relay round-trip
(~tiny-op time) is reported so it can be subtracted.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, args, iters=5, warmup=1, name=""):
    _ = float(fn(*args))
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt * 1000:8.1f} ms")
    return dt


def tree_sum(x):
    import jax
    import jax.numpy as jnp

    leaves = [jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(x)]
    return sum(leaves)


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
    img = jnp.ones((B, S, S, 3), jnp.float32) * 0.5
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

    @jax.jit
    def rtt_fn(x):
        return jnp.sum(x[:, 0, 0, 0])

    t_rtt = timed(rtt_fn, (img,), name="relay round-trip (tiny op)")

    bb = jax.jit(lambda v, x: tree_sum(model.apply(
        v, x, training=False,
        method=lambda m, xx, training: m.backbone(xx, training=training))))
    t_bb = timed(bb, (variables, img), name="backbone (SD features)")

    head = jax.jit(lambda v, x: tree_sum({
        k: val for k, val in model.apply(
            v, x, False, method=type(model).forward_features).items()
        if k in ("pred_masks", "pred_logits", "mask_embed")}))
    t_head = timed(head, (variables, img), name="backbone+head")

    noclip = jax.jit(lambda v, x, t: tree_sum(model.apply(
        v, x, t, labels, method=type(model).forward_eval)))
    t_noclip = timed(noclip, (variables, img, text_raw),
                     name="eval fwd+upsample (no clip head)")

    full = jax.jit(lambda v, x, t, ct, ov: tree_sum(model.apply(
        v, x, t, labels, ct, labels, ov, method=type(model).forward_eval)))
    t_full = timed(full, (variables, img, text_raw, clip_text, overlap),
                   name="eval fwd+upsample (clip head)")

    @jax.jit
    def fused(v, x, t, ct, ov):
        mask_cls, mask_pred = model.apply(
            v, x, t, labels, ct, labels, ov, method=type(model).forward_eval)
        sem = jax.vmap(semantic_inference)(mask_cls, mask_pred)
        pan = jax.vmap(lambda c, m: panoptic_inference(c, m, thing_mask, 0.0, 0.8)
                       )(mask_cls, mask_pred)
        return jnp.sum(sem) + jnp.sum(pan.panoptic_seg)

    t_all = timed(fused, (variables, img, text_raw, clip_text, overlap),
                  name="eval + fusion (end to end)")

    r = 1000
    print(json.dumps({
        "rtt_ms": round(t_rtt * r, 1),
        "backbone_ms": round((t_bb - t_rtt) * r, 1),
        "head_ms": round((t_head - t_bb) * r, 1),
        "upsample_category_ms": round((t_noclip - t_head) * r, 1),
        "clip_head_ms": round((t_full - t_noclip) * r, 1),
        "fusion_ms": round((t_all - t_full) * r, 1),
        "end_to_end_ms": round((t_all - t_rtt) * r, 1),
    }))


if __name__ == "__main__":
    main()
