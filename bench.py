"""Benchmark: open-vocabulary panoptic inference throughput at 1024 px.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): >= 4 img/sec/chip at 1024-px panoptic inference.

The benchmark path is the reference's eval configuration (1024^2 input,
sliding-window 512-crop SD feature extraction, 9-layer masked decoder,
CLIP-head ensembling over a 133-category COCO vocabulary, on-device panoptic
fusion) with bf16 compute; cf. the reference's runtime log surface
(/root/reference/odise/evaluation/evaluator.py:131-142).

Wall-clock budget design (round-3 fix for the r2 driver timeout):
  * every phase logs elapsed time to STDERR as it happens, so a timeout is
    diagnosable from the captured tail;
  * zero parameters come from a committed static shape manifest
    (odise_tpu/model_zoo/bench_manifest.json.gz): ONE eager flat zero
    buffer per dtype lives on device (no host->device upload at all), and
    the parameter tree is carved out of it by static slices INSIDE the
    jitted step (~ms of HBM copies per call) — no full-model
    `jax.eval_shape` trace (~minutes on this 1-core host), no GB-sized
    host buffers (~14 MB/s upload), no GB-sized jit outputs (~8 MB/s
    stream-back). Measured end-to-end: ~240 s total wall uncontended
    (pre-compile ~30 s, compile ~125-205 s, timed loop ~2 s);
  * the deformable-attention impl is selectable (--impl); the default is
    chosen for best (compile + run) under the driver budget.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_T0 = time.perf_counter()


def log(msg: str) -> None:
    print(f"[bench t={time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def load_manifest_flat(path, storage="f32"):
    """Static shape manifest -> (flat zero buffers per dtype, unflatten fn).

    Two relay pathologies shape this design (measured, NOTES.md): jitted
    fns whose outputs total GBs stream back to host at ~8 MB/s (so params
    must not be jit outputs), and every eager op pays a ~25-85 ms relay
    round-trip (so 2146 per-leaf `jnp.zeros` cost ~3 min). Instead: ONE
    eager flat zero buffer per dtype (a handful of relay ops, device-side
    constant fill, nothing uploaded), and the parameter tree is carved out
    of it by static `lax.slice` INSIDE the jitted step — ~ms of HBM copies
    per call on v5e, nothing on the host.
    """
    import gzip

    import jax
    import jax.numpy as jnp

    with gzip.open(path, "rt") as f:
        manifest = json.load(f)

    offsets = {}
    spec = []  # (path_parts, dtype_str, offset, size, shape)
    for path_str, (shape, dtype) in manifest.items():
        if storage == "bf16" and dtype == "float32":
            # bf16 storage for the frozen towers: half the param HBM
            # traffic per step, and flax casts to the bf16 compute dtype
            # regardless, so the math is unchanged
            dtype = "bfloat16"
        size = 1
        for d in shape:
            size *= d
        off = offsets.get(dtype, 0)
        spec.append((path_str.split("/"), dtype, off, size, tuple(shape)))
        offsets[dtype] = off + size

    flats = {dt: jnp.zeros((n,), jnp.dtype(dt)) for dt, n in offsets.items()}

    def unflatten(flats):
        tree = {}
        for parts, dt, off, size, shape in spec:
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jax.lax.slice(
                flats[dt], (off,), (off + size,)).reshape(shape)
        return tree

    return flats, unflatten


def run_with_fallback(cmds, budget_s: float, reserve_s: float, log=log):
    """Run candidate bench subprocesses in order; return the first JSON line.

    ``cmds`` is a list of ``(name, argv)``. Every attempt except the last
    runs under a timeout of (remaining budget - reserve), so a hung or
    degraded compile (the 2026-08-18 incident: remote compile service at
    ~3x latency pushed a 180 s compile past the driver budget) is killed
    with enough budget left for the robust fallback to produce a recorded
    number. The last attempt runs without a timeout — a late number beats
    none. Pure orchestration; tested with stub commands in
    tests/test_bench_fallback.py.
    """
    import subprocess

    t_start = time.perf_counter()
    for i, (name, argv) in enumerate(cmds):
        remaining = budget_s - (time.perf_counter() - t_start)
        last = i == len(cmds) - 1
        timeout = None if last else max(remaining - reserve_s, 30.0)
        log(f"attempt [{name}] timeout="
            f"{'none' if timeout is None else f'{timeout:.0f}s'}")
        try:
            proc = subprocess.run(argv, stdout=subprocess.PIPE,
                                  timeout=timeout)
        except subprocess.TimeoutExpired:
            log(f"[{name}] exceeded its budget slice; falling back")
            continue
        line = next((ln for ln in proc.stdout.decode().splitlines()
                     if ln.startswith("{")), None)
        if proc.returncode == 0 and line:
            return line
        log(f"[{name}] failed rc={proc.returncode}; falling back")
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--image-size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--no-clip-head", action="store_true")
    ap.add_argument("--impl", default=os.environ.get(
        "ODISE_TPU_DEFORM_IMPL", "auto"),
        help="deformable-attention impl: auto|quad|hybrid|fused|pallas|"
        "reference. 'auto' (default) orchestrates subprocesses: hybrid "
        "(fastest measured step) under a timeout, then quad (most robust "
        "compile) as fallback — with the default-on persistent compile "
        "cache, warm reruns of either finish in well under a minute.")
    ap.add_argument("--budget", type=float, default=560.0,
                    help="auto mode: total wall budget (s) to split across "
                    "attempts (driver budget minus margin)")
    ap.add_argument("--reserve", type=float, default=230.0,
                    help="auto mode: seconds reserved for the fallback "
                    "attempt when timing out an earlier one")
    ap.add_argument("--batched", type=int, default=4,
                    help="additionally measure batch-N throughput after the "
                    "B=1 loop (reported in detail.batched; 0 disables; "
                    "skipped automatically if the remaining budget looks "
                    "too thin for another shape's compile)")
    ap.add_argument("--no-manifest", action="store_true",
                    help="force the slow eval_shape param path")
    ap.add_argument("--param-storage", default="bf16", choices=["f32", "bf16"],
                    help="on-device storage dtype for the (frozen) params")
    ap.add_argument("--fill", default="zeros", choices=["zeros", "pattern"],
                    help="param/image fill. 'pattern' = deterministic sin "
                    "fill (device-side, nothing uploaded) so the checksum is "
                    "a real cross-impl numerics gate (used to validate the "
                    "pallas kernel inside the full graph against quad)")
    args = ap.parse_args()

    if args.impl == "auto":
        passthrough = []
        skip_next = False
        for a in sys.argv[1:]:
            if skip_next:
                skip_next = False
                continue
            if a == "--impl":
                skip_next = True
                continue
            if a.startswith("--impl="):
                continue
            passthrough.append(a)
        cmds = [(impl, [sys.executable, os.path.abspath(__file__),
                        "--impl", impl] + passthrough)
                for impl in ("hybrid", "quad")]
        line = run_with_fallback(cmds, args.budget, args.reserve)
        if line is None:
            log("every impl attempt failed")
            sys.exit(1)
        print(line)
        return
    os.environ["ODISE_TPU_DEFORM_IMPL"] = args.impl

    log(f"importing jax (impl={args.impl})")
    import jax
    import jax.numpy as jnp

    from odise_tpu.engine.defaults import enable_compilation_cache
    from odise_tpu.model_zoo.factory import build_category_odise
    from odise_tpu.models.inference import panoptic_inference, semantic_inference

    # warm reruns skip the 2-3 min eval-graph compile entirely (the cache
    # round-trips serialized TPU executables even through the axon relay)
    cache_dir = enable_compilation_cache()
    log(f"jax ready, device={jax.devices()[0]}, compile cache={cache_dir}")

    K = 133
    labels = tuple((f"category {i}",) for i in range(K))
    model = build_category_odise(
        "full", train_labels=labels, with_clip_head=not args.no_clip_head,
        use_checkpoint=False, slide_training=False, dtype=jnp.bfloat16)
    log("model built")

    S = args.image_size
    B = args.batch
    if args.fill == "pattern":
        # deterministic, device-generated (one eager op): non-trivial
        # activations everywhere so cross-impl checksums actually test the
        # numerics, at zero upload cost
        img = 0.5 + 0.5 * jnp.sin(
            jnp.arange(B * S * S * 3, dtype=jnp.float32) * 0.37
        ).reshape(B, S, S, 3)
    else:
        img = jnp.zeros((B, S, S, 3), jnp.float32)
    text_raw = jnp.zeros((K, 768), jnp.float32)
    clip_text = jnp.zeros((K, 768), jnp.float32)
    overlap = jnp.zeros((K,), jnp.int32)
    thing_mask = jnp.asarray([True] * 80 + [False] * (K - 80))

    manifest_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "odise_tpu", "model_zoo", "bench_manifest.json.gz")
    param_arg = None
    unflatten = None
    if not args.no_manifest and not args.no_clip_head:
        try:
            param_arg, unflatten = load_manifest_flat(
                manifest_path, storage=args.param_storage)
            if args.fill == "pattern":
                # small deterministic weights, fused device-side fill: the
                # jit fuses arange+sin+cast into the single output buffer
                # (an eager chain materializes multi-GB f32 intermediates
                # and OOMs the 16GB HBM). LayerNorms keep activations sane
                # through the towers.
                import functools

                @functools.partial(jax.jit, static_argnums=(0, 1))
                def _fill(n, dt):
                    x = jnp.arange(n, dtype=jnp.float32)
                    return (0.02 * jnp.sin(x * 0.001)).astype(dt)

                filled = {}
                for dt, v in param_arg.items():
                    n, vdt = v.shape[0], v.dtype
                    del v
                    param_arg[dt] = None  # free the zeros before the fill
                    filled[dt] = _fill(n, vdt)
                param_arg = filled
            log(f"params = flat {args.fill} buffers from static manifest "
                f"({args.param_storage} storage)")
        except Exception as e:  # stale/missing manifest: fall through
            log(f"manifest unavailable ({e!r}); falling back to eval_shape")
    if param_arg is None:
        def init_fn():
            return model.init(jax.random.PRNGKey(0), img, text_raw, labels,
                              clip_text, labels, overlap,
                              method=type(model).forward_eval)

        shapes = jax.eval_shape(init_fn)
        log("eval_shape trace done")
        param_arg = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        unflatten = lambda v: v  # noqa: E731
        log("zero params materialized")

    # relay round-trip floor (scalar fetch); subtracted from per-iter time
    @jax.jit
    def tiny(x):
        return jnp.sum(x[:, 0, 0, 0])

    float(tiny(img))
    t0 = time.perf_counter()
    for _ in range(6):
        float(tiny(img))
    rtt = (time.perf_counter() - t0) / 6
    log(f"relay rtt = {rtt * 1000:.1f} ms")

    @jax.jit
    def eval_step(param_arg, img, text_raw, clip_text, overlap):
        variables = unflatten(param_arg)
        mask_cls, mask_pred = model.apply(
            variables, img, text_raw, labels, clip_text, labels, overlap,
            method=type(model).forward_eval)
        sem = jax.vmap(semantic_inference)(mask_cls, mask_pred)
        pan = jax.vmap(lambda c, m: panoptic_inference(
            c, m, thing_mask, object_mask_threshold=0.0, overlap_threshold=0.8)
        )(mask_cls, mask_pred)
        # scalar checksums: force real execution each iteration when fetched
        # (block_until_ready alone is not a reliable barrier through the axon
        # TPU relay); panoptic map stays on device otherwise. sem_sum is a
        # CONTINUOUS function of the logits, so with --fill pattern it is a
        # cross-impl numerics gate (pan sums go through argmaxes and may
        # legitimately flip on fp-reassociation-level diffs).
        return (jnp.sum(sem.astype(jnp.float32)),
                jnp.sum(pan.panoptic_seg) + jnp.sum(pan.num_segments))

    def fetch():
        sem_sum, pan_sum = eval_step(param_arg, img, text_raw, clip_text,
                                     overlap)
        return float(sem_sum), float(pan_sum)

    log("compiling eval graph")
    t_compile0 = time.perf_counter()
    sem_sum, pan_sum = fetch()
    compile_s = time.perf_counter() - t_compile0
    log(f"eval graph compiled+first-run in {compile_s:.1f}s; "
        f"checksums sem={sem_sum!r} pan={pan_sum!r}")

    for i in range(args.warmup):
        fetch()
        log(f"warmup {i + 1}/{args.warmup}")

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        fetch()
        times.append(time.perf_counter() - t0)
    # median, not mean: the shared chip + relay produce occasional multi-x
    # outlier iterations (queue drains, host hiccups) that say nothing about
    # the steady-state step time
    times.sort()
    med = times[len(times) // 2]
    per_iter = max(med - rtt, 1e-6)
    log(f"{args.iters} timed iters: median {med * 1000:.1f} ms "
        f"(min {times[0] * 1000:.1f}, max {times[-1] * 1000:.1f}) "
        f"-> {per_iter * 1000:.1f} ms/img")

    batched = None
    if args.batched > 1:
        # realistic serving/eval configuration: bucketed same-shape batches
        # (tools/train_net.py groups eval images the same way); measured in
        # the same process so it shares the warm trunk weights
        # only attempt when the remaining slice leaves room for the extra
        # shape's compile: in auto mode this child may be running under a
        # (budget - reserve) timeout, and losing the B=1 number to a slow
        # batched compile would be strictly worse than skipping
        elapsed = time.perf_counter() - _T0
        if elapsed > args.budget - args.reserve - 150:
            log(f"skipping batch-{args.batched} measurement "
                f"(elapsed {elapsed:.0f}s too close to budget)")
            batched = {"batch": args.batched, "skipped": True}
        else:
            try:
                Bb = args.batched
                if args.fill == "pattern":
                    img_b = 0.5 + 0.5 * jnp.sin(
                        jnp.arange(Bb * S * S * 3, dtype=jnp.float32) * 0.37
                    ).reshape(Bb, S, S, 3)
                else:
                    img_b = jnp.zeros((Bb, S, S, 3), jnp.float32)

                def fetch_b():
                    a, b = eval_step(param_arg, img_b, text_raw, clip_text,
                                     overlap)
                    return float(a), float(b)

                log(f"compiling batch-{Bb} eval graph")
                t0 = time.perf_counter()
                fetch_b()
                compile_b = time.perf_counter() - t0
                log(f"batch-{Bb} graph compiled+first-run in {compile_b:.1f}s")
                fetch_b()  # warmup
                tb = []
                for _ in range(max(args.iters // 2, 3)):
                    t0 = time.perf_counter()
                    fetch_b()
                    tb.append(time.perf_counter() - t0)
                tb.sort()
                med_b = max(tb[len(tb) // 2] - rtt, 1e-6)
                batched = {"batch": Bb, "step_ms": round(med_b * 1000, 1),
                           "img_per_sec": round(Bb / med_b, 4),
                           "compile_s": round(compile_b, 1)}
                log(f"batch-{Bb}: {med_b * 1000:.1f} ms/step -> "
                    f"{Bb / med_b:.2f} img/s")
            except Exception as e:  # e.g. HBM OOM at large batch
                log(f"batch-{args.batched} measurement failed: {e!r}")
                batched = {"batch": args.batched, "error": repr(e)[:200]}

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
            "deform_impl": args.impl,
            "param_storage": args.param_storage,
            "compile_s": round(compile_s, 1),
            "relay_rtt_ms": round(rtt * 1000, 1),
            "step_ms": round(per_iter * 1000, 1),
            "total_wall_s": round(time.perf_counter() - _T0, 1),
            "fill": args.fill,
            "checksum_sem": sem_sum,
            "checksum_pan": pan_sum,
            "batched": batched,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
