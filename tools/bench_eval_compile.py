"""Measure the full-eval-suite compile budget under the trunk/head split.

The reference evaluates 6 open-vocab tasks (coco133 / ade150 / ade847 /
ctx59 / ctx459 / pas21 — configs/common/data/pano_open_d2_eval.py in the
reference) at arbitrary image shapes with zero compile cost. The TPU-native
design buckets image shapes and, as of round 3, splits the eval graph into a
vocabulary-INDEPENDENT trunk (SD backbone + mask decoder + CLIP visual
tower; all the FLOPs; one compile per bucket, shared by every task) and a
per-task vocabulary head (tiny [B,Q,C]x[K,C] matmuls).

This tool measures, on the real chip:
  * trunk compile time for one 1024px bucket;
  * head compile time for each of the 6 task vocabulary sizes;
  * the implied full-suite budget for N buckets, vs the old
    one-fused-graph-per-(task, bucket) scheme (~trunk time each).

Run: python tools/bench_eval_compile.py [--buckets 10] [--skip-heads]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_T0 = time.perf_counter()

# (task, K categories, K_flat synonyms): flat counts measured from the
# openseg label files (prompt_engineered variants used at eval time)
TASKS = [
    ("coco_panoptic", 133, 227),
    ("ade20k_150", 150, 271),
    ("ade20k_847", 847, 1260),
    ("pascal_context_59", 59, 103),
    ("pascal_context_459", 459, 649),
    ("pascal_voc_21", 21, 48),
]


def log(msg):
    print(f"[evalcompile t={time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", type=int, default=10,
                    help="bucket count for the full-suite extrapolation")
    ap.add_argument("--image-size", type=int, default=1024)
    ap.add_argument("--skip-heads", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import load_manifest_flat
    from odise_tpu.model_zoo.factory import build_category_odise

    log(f"jax ready, device={jax.devices()[0]}")

    # the trunk is vocabulary-independent: train_labels only shape the
    # (unused-at-eval) classifier config, so any K works here
    labels133 = tuple((f"category {i}",) for i in range(133))
    model = build_category_odise(
        "full", train_labels=labels133, with_clip_head=True,
        use_checkpoint=False, slide_training=False, dtype=jnp.bfloat16)

    manifest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            os.pardir, "odise_tpu", "model_zoo",
                            "bench_manifest.json.gz")
    flats, unflatten = load_manifest_flat(os.path.normpath(manifest),
                                          storage="bf16")
    log("params = flat zero buffers (bf16)")

    S = args.image_size
    img = jnp.zeros((1, S, S, 3), jnp.float32)

    @jax.jit
    def trunk_fn(flats, img):
        return model.apply(unflatten(flats), img,
                           method=type(model).forward_eval_trunk)

    t0 = time.perf_counter()
    trunk = trunk_fn(flats, img)
    jax.block_until_ready(trunk["mask_embed"])
    t_trunk = time.perf_counter() - t0
    log(f"trunk compile+first-run: {t_trunk:.1f}s")

    head_times = {}
    if not args.skip_heads:
        head_in = {k: v for k, v in trunk.items() if k != "mask_pred"}
        for task, k, k_flat in TASKS:
            # distribute the k_flat synonyms over k categories (extra may
            # exceed k, e.g. pas21: 48 synonyms over 21 categories)
            extra = k_flat - k
            counts = [1 + extra // k + (1 if i < extra % k else 0)
                      for i in range(k)]
            assert sum(counts) == k_flat
            labels = tuple(
                tuple(f"c{i}s{j}" for j in range(counts[i])) for i in range(k))
            text_raw = jnp.zeros((k_flat, 768), jnp.float32)
            clip_text = jnp.zeros((k_flat, 768), jnp.float32)
            overlap = jnp.zeros((k,), jnp.int32)

            def head_fn(flats, head_in, text_raw, clip_text, overlap,
                        labels=labels):
                return model.apply(
                    unflatten(flats), head_in, text_raw, labels, clip_text,
                    labels, overlap, method=type(model).forward_eval_head)

            jitted = jax.jit(head_fn)
            t0 = time.perf_counter()
            out = jitted(flats, head_in, text_raw, clip_text, overlap)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            head_times[task] = round(dt, 1)
            log(f"head[{task}] K={k} K_flat={k_flat}: {dt:.1f}s")

    n_b = args.buckets
    sum_heads = sum(head_times.values())
    new_total = n_b * t_trunk + n_b * sum_heads
    old_total = n_b * len(TASKS) * t_trunk
    result = {
        "trunk_compile_s": round(t_trunk, 1),
        "head_compile_s": head_times,
        "buckets": n_b,
        "full_suite_new_min": round(new_total / 60, 1),
        "full_suite_old_min": round(old_total / 60, 1),
        "speedup": round(old_total / max(new_total, 1e-9), 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
