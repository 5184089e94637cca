"""Benchmark: open-vocabulary panoptic inference throughput at 1024 px.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): >= 4 img/sec/chip at 1024-px panoptic inference.

The benchmark path is the reference's eval configuration (1024^2 input,
sliding-window 512-crop SD feature extraction, 9-layer masked decoder,
CLIP-head ensembling over a 133-category COCO vocabulary, on-device panoptic
fusion) with bf16 compute.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--image-size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--no-clip-head", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from odise_tpu.model_zoo.factory import build_category_odise
    from odise_tpu.models.inference import panoptic_inference, semantic_inference

    K = 133
    labels = tuple((f"category {i}",) for i in range(K))
    model = build_category_odise(
        "full", train_labels=labels, with_clip_head=not args.no_clip_head,
        use_checkpoint=False, slide_training=False, dtype=jnp.bfloat16)

    S = args.image_size
    B = args.batch
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
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    @jax.jit
    def eval_step(variables, img, text_raw, clip_text, overlap):
        mask_cls, mask_pred = model.apply(
            variables, img, text_raw, labels, clip_text, labels, overlap,
            method=type(model).forward_eval)
        sem = jax.vmap(semantic_inference)(mask_cls, mask_pred)
        pan = jax.vmap(lambda c, m: panoptic_inference(
            c, m, thing_mask, object_mask_threshold=0.0, overlap_threshold=0.8)
        )(mask_cls, mask_pred)
        # scalar checksum: forces real execution each iteration when fetched
        # (block_until_ready alone is not a reliable barrier through the axon
        # TPU relay); panoptic map stays on device otherwise.
        return (jnp.sum(sem.astype(jnp.float32))
                + jnp.sum(pan.panoptic_seg) + jnp.sum(pan.num_segments))

    # relay round-trip floor (subtracted: a tunnel artifact, not device time)
    @jax.jit
    def tiny(x):
        return jnp.sum(x[:, 0, 0, 0])

    float(tiny(img))
    t0 = time.perf_counter()
    for _ in range(6):
        float(tiny(img))
    rtt = (time.perf_counter() - t0) / 6

    t_compile0 = time.perf_counter()
    float(eval_step(variables, img, text_raw, clip_text, overlap))
    compile_s = time.perf_counter() - t_compile0

    for _ in range(args.warmup):
        float(eval_step(variables, img, text_raw, clip_text, overlap))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        float(eval_step(variables, img, text_raw, clip_text, overlap))
    dt = time.perf_counter() - t0
    per_iter = max(dt / args.iters - rtt, 1e-6)

    imgs_per_sec = B / per_iter
    print(json.dumps({
        "metric": "img_per_sec_per_chip_1024px_open_vocab_panoptic_inference",
        "value": round(imgs_per_sec, 4),
        "unit": "img/s/chip",
        "vs_baseline": round(imgs_per_sec / 4.0, 4),
        "detail": {
            "image_size": S,
            "batch": B,
            "clip_head": not args.no_clip_head,
            "compile_s": round(compile_s, 1),
            "relay_rtt_ms": round(rtt * 1000, 1),
            "step_ms": round(per_iter * 1000, 1),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
