#!/usr/bin/env python
"""Micro-benchmark of ms_deform_attn implementations at the production
encoder shapes (1024px eval: levels 128/64/32, 21504 tokens, 8 heads x 32).

Honest timing through the axon relay: each jitted call returns a scalar
checksum fetched to the host per iteration; the relay RTT is measured and
reported separately.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024, help="input image size")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--impls", default="fused,quad")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from odise_tpu.ops.ms_deform_attn import ms_deform_attn

    s = args.size
    shapes = [(s // 8, s // 8), (s // 16, s // 16), (s // 32, s // 32)]
    Lv = sum(h * w for h, w in shapes)
    B, H, hd, P = 1, 8, 32, 4
    Lq = Lv
    dtype = jnp.dtype(args.dtype)

    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, Lv, H, hd), dtype)
    # production keeps sampling locations f32 (pixel_decoder.py; bf16 locs
    # cost ~0.25px at the 128px level — measured ablation in NOTES.md)
    loc = jnp.asarray(rng.rand(B, Lq, H, len(shapes), P, 2), jnp.float32)
    w = jnp.asarray(rng.rand(B, Lq, H, len(shapes), P), dtype)

    rtt_fn = jax.jit(lambda x: jnp.sum(x))
    _ = float(rtt_fn(jnp.ones((8,))))
    t0 = time.perf_counter()
    for _ in range(10):
        float(rtt_fn(jnp.ones((8,))))
    rtt = (time.perf_counter() - t0) / 10
    print(f"relay rtt                     {rtt*1000:8.1f} ms")

    def bench(name, raw_fn):
        fn = jax.jit(lambda v, l, a: jnp.sum(
            raw_fn(v, l, a).astype(jnp.float32)))
        t_c0 = time.perf_counter()
        _ = float(fn(value, loc, w))
        compile_s = time.perf_counter() - t_c0
        for _ in range(2):
            float(fn(value, loc, w))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(fn(value, loc, w))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:24s} net {max(dt - rtt, 0)*1000:8.1f} ms"
              f"  (raw {dt*1000:.1f}, compile {compile_s:.1f}s)", flush=True)

    for impl in args.impls.split(","):
        if impl.startswith("pallas:"):  # pallas:<q_tile>:<unroll>[:<mmr>]
            from odise_tpu.ops.pallas.ms_deform_attn_kernel import \
                _pallas_forward

            parts = impl.split(":")
            qt, un = int(parts[1]), int(parts[2])
            mmr = int(parts[3]) if len(parts) > 3 else 1024
            bench(impl, lambda v, l, a, qt=qt, un=un, mmr=mmr:
                  _pallas_forward(v, tuple(shapes), l, a, q_tile=qt,
                                  unroll=un, matmul_max_rows=mmr))
        else:
            bench(impl, lambda v, l, a, impl=impl:
                  ms_deform_attn(v, shapes, l, a, impl=impl))


if __name__ == "__main__":
    main()
