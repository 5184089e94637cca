#!/usr/bin/env python
"""Per-component timing at eval resolution (backbone / pixel-decoder /
transformer-decoder / clip / fusion).

Timing method: every jitted function returns a scalar checksum and the loop
fetches it to the host each iteration — ``block_until_ready`` alone is not a
reliable barrier through the axon TPU relay. The measured relay round-trip
(~tiny-op time) is reported so it can be subtracted.

Parameters come from the committed static shape manifest (same design as
bench.py: flat zero buffers carved by static slices inside each jit), so the
pre-compile phase is seconds, not minutes.

CAVEAT (measured, round 5): per-component DELTAS between separately-jitted
nested graphs are noisy — XLA optimizes each graph differently and the
tree_sum output reductions differ, so a stage can show a negative delta
(e.g. the r5 run showed clip_head at -74 ms). Trust this tool for the
FLOPs/bytes accounting and the end-to-end number; for trustworthy TIME
attribution of one component, ablate it inside the FULL graph instead
(e.g. ODISE_TPU_DEFORM_IMPL=skip pinned deform attn at 72 ms of the 155 ms
step — bench.py --impl skip vs --impl hybrid, same protocol).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def cost_of(fn, args):
    """AOT-compile and return (compiled, flops, bytes_accessed)."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    flops = bytes_acc = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0)) or None
        bytes_acc = float(ca.get("bytes accessed", 0.0)) or None
    except Exception:
        pass
    return compiled, flops, bytes_acc


def timed(fn, args, iters=5, warmup=1, name="", stats=None):
    t_c0 = time.perf_counter()
    compiled, flops, bytes_acc = cost_of(fn, args)
    _ = float(compiled(*args))
    compile_s = time.perf_counter() - t_c0
    for _ in range(warmup):
        float(compiled(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(compiled(*args))
    dt = (time.perf_counter() - t0) / iters
    tf = f"{flops / 1e12:6.2f} TF" if flops else "    n/a  "
    gb = f"{bytes_acc / 1e9:6.2f} GB" if bytes_acc else "    n/a  "
    print(f"{name:40s} {dt * 1000:8.1f} ms  {tf}  {gb}  "
          f"(compile {compile_s:.0f}s)", flush=True)
    if stats is not None:
        stats[name] = {"ms": round(dt * 1000, 1), "flops": flops,
                       "bytes": bytes_acc}
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
    ap.add_argument("--impl", default=os.environ.get(
        "ODISE_TPU_DEFORM_IMPL", "hybrid"))
    ap.add_argument("--param-storage", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--no-manifest", action="store_true")
    args = ap.parse_args()
    os.environ["ODISE_TPU_DEFORM_IMPL"] = args.impl

    import jax
    import jax.numpy as jnp

    from bench import load_manifest_flat
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

    manifest_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "odise_tpu", "model_zoo", "bench_manifest.json.gz")
    if args.no_manifest:
        def init_fn():
            return model.init(jax.random.PRNGKey(0), img, text_raw, labels,
                              clip_text, labels, overlap,
                              method=type(model).forward_eval)

        shapes = jax.eval_shape(init_fn)
        flats = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        unflatten = lambda v: v  # noqa: E731
    else:
        flats, unflatten = load_manifest_flat(
            manifest_path, storage=args.param_storage)

    stats = {}

    def rtt_fn(x):
        return jnp.sum(x[:, 0, 0, 0])

    t_rtt = timed(rtt_fn, (img,), name="rtt", stats=stats)

    bb = lambda v, x: tree_sum(model.apply(  # noqa: E731
        unflatten(v), x, training=False,
        method=lambda m, xx, training: m.backbone(xx, training=training)))
    t_bb = timed(bb, (flats, img), name="backbone", stats=stats)

    pixdec = lambda v, x: tree_sum(model.apply(  # noqa: E731
        unflatten(v), x,
        method=lambda m, xx: m.sem_seg_head.pixel_decoder(
            m.backbone(xx, training=False))))
    t_pix = timed(pixdec, (flats, img), name="pixel_decoder", stats=stats)

    head = lambda v, x: tree_sum({  # noqa: E731
        k: val for k, val in model.apply(
            unflatten(v), x, False, method=type(model).forward_features).items()
        if k in ("pred_masks", "pred_logits", "mask_embed")})
    t_head = timed(head, (flats, img), name="transformer_decoder",
                   stats=stats)

    noclip = lambda v, x, t: tree_sum(model.apply(  # noqa: E731
        unflatten(v), x, t, labels, method=type(model).forward_eval))
    t_noclip = timed(noclip, (flats, img, text_raw),
                     name="upsample_category", stats=stats)

    full = lambda v, x, t, ct, ov: tree_sum(model.apply(  # noqa: E731
        unflatten(v), x, t, labels, ct, labels, ov,
        method=type(model).forward_eval))
    t_full = timed(full, (flats, img, text_raw, clip_text, overlap),
                   name="clip_head", stats=stats)

    def fused(v, x, t, ct, ov):
        mask_cls, mask_pred = model.apply(
            unflatten(v), x, t, labels, ct, labels, ov,
            method=type(model).forward_eval)
        sem = jax.vmap(semantic_inference)(mask_cls, mask_pred)
        pan = jax.vmap(lambda c, m: panoptic_inference(c, m, thing_mask, 0.0, 0.8)
                       )(mask_cls, mask_pred)
        return jnp.sum(sem) + jnp.sum(pan.panoptic_seg)

    t_all = timed(fused, (flats, img, text_raw, clip_text, overlap),
                  name="fusion", stats=stats)

    # each graph nests the previous stages, so per-component cost = delta.
    # per-component MFU/bandwidth says WHICH resource each stage saturates
    # (MXU vs HBM) — the round-5 kernel-effort map (VERDICT r4 #3).
    chain = ["rtt", "backbone", "pixel_decoder", "transformer_decoder",
             "upsample_category", "clip_head", "fusion"]
    peak_tf, peak_gbps = 197e12, 819e9  # v5e bf16 peak, HBM BW
    out = {"impl": args.impl, "image_size": S,
           "rtt_ms": stats["rtt"]["ms"],
           "end_to_end_ms": round((t_all - t_rtt) * 1000, 1),
           "components": {}}
    for prev, cur in zip(chain, chain[1:]):
        d_ms = stats[cur]["ms"] - stats[prev]["ms"]
        comp = {"ms": round(d_ms, 1)}
        if stats[cur]["flops"] and stats[prev]["flops"] is not None:
            d_fl = stats[cur]["flops"] - (stats[prev]["flops"] or 0.0)
            comp["gflops"] = round(d_fl / 1e9, 1)
            if d_ms > 0.05:
                comp["mfu_pct"] = round(100 * d_fl / (d_ms / 1e3) / peak_tf, 1)
        if stats[cur]["bytes"] and stats[prev]["bytes"] is not None:
            d_b = stats[cur]["bytes"] - (stats[prev]["bytes"] or 0.0)
            comp["gbytes"] = round(d_b / 1e9, 2)
            if d_ms > 0.05:
                comp["hbm_pct"] = round(100 * d_b / (d_ms / 1e3) / peak_gbps, 1)
        out["components"][cur] = comp
    print(json.dumps(out))


if __name__ == "__main__":
    main()
