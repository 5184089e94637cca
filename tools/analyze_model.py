#!/usr/bin/env python
"""Model analysis CLI: parameter tables and activation shapes.

Capability parity with the reference's tools/analyze_model.py (vendored
Mask2Former tools): prints total/trainable parameter tables (verifying the
28.1M trainable count, reference README.md:89).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", default="configs/Panoptic/odise_label_coco_50e.py")
    ap.add_argument("--scale", default="full", choices=["full", "tiny"])
    ap.add_argument("--max-depth", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from odise_tpu.model_zoo.factory import build_category_odise
    from odise_tpu.utils.parameter_count import parameter_count, parameter_count_table

    K = 133
    labels = tuple((f"c{i}",) for i in range(K))
    model = build_category_odise(args.scale, train_labels=labels,
                                 with_clip_head=True, use_checkpoint=False,
                                 slide_training=False)
    clip_dim = model.category_head.clip_dim
    S = 512 if args.scale == "full" else 64
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)),
        jnp.zeros((K, clip_dim)), labels, jnp.zeros((K, clip_dim)), labels,
        jnp.zeros((K,), jnp.int32), method=type(model).forward_eval))

    print("=== all parameters ===")
    print(parameter_count_table(shapes["params"], max_depth=args.max_depth))
    print("\n=== trainable parameters ===")
    print(parameter_count_table(shapes["params"], max_depth=args.max_depth,
                                trainable_only=True))
    total = parameter_count(shapes["params"])[""]
    trainable = parameter_count(shapes["params"], trainable_only=True)[""]
    print(f"\ntotal: {total / 1e6:.1f}M  trainable: {trainable / 1e6:.1f}M "
          f"(reference: 28.1M trainable)")


if __name__ == "__main__":
    main()
