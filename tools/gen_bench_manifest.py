"""Generate the static parameter-shape manifest used by bench.py.

Runs the full-model `jax.eval_shape` init trace ONCE (on CPU — no TPU
needed) and writes odise_tpu/model_zoo/bench_manifest.json.gz mapping
"collection/module/.../param" -> [shape, dtype]. bench.py zero-fills this
tree with a single jitted call instead of re-paying the minutes-long trace
on every benchmark run.

Re-run (and commit the result) whenever the "full" model architecture
changes: python tools/gen_bench_manifest.py
"""

from __future__ import annotations

import gzip
import json
import os
import sys

os.environ.setdefault("ODISE_TPU_FORCE_CPU", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_manifest():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from odise_tpu.model_zoo.factory import build_category_odise

    K = 133
    labels = tuple((f"category {i}",) for i in range(K))
    model = build_category_odise(
        "full", train_labels=labels, with_clip_head=True,
        use_checkpoint=False, slide_training=False, dtype=jnp.bfloat16)

    img = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    text_raw = jnp.zeros((K, 768), jnp.float32)
    clip_text = jnp.zeros((K, 768), jnp.float32)
    overlap = jnp.zeros((K,), jnp.int32)

    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), img, text_raw, labels, clip_text, labels,
        overlap, method=type(model).forward_eval))

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(shapes)[0]:
        key = "/".join(p.key for p in path)
        flat[key] = [list(leaf.shape), str(leaf.dtype)]
    return flat


def main():
    flat = build_manifest()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                       "odise_tpu", "model_zoo", "bench_manifest.json.gz")
    out = os.path.normpath(out)
    with gzip.open(out, "wt") as f:
        json.dump(flat, f)
    n_params = sum(1 for _ in flat)
    print(f"wrote {out}: {n_params} arrays", file=sys.stderr)


if __name__ == "__main__":
    main()
