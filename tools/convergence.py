#!/usr/bin/env python
"""Synthetic train->eval convergence proof (the in-image quality loop).

Weight-exact parity with the reference needs released SD/CLIP/ODISE
checkpoints and COCO — none of which exist in this image — so this harness
proves the next-strongest property end-to-end: the full training recipe
(LSJ mapper, on-device Hungarian matcher, aux losses, point-sampled
mask/dice losses, AdamW + grad clip + multistep LR, optional accumulation)
actually LEARNS segmentation, measured through the full bucketed device-stat
eval stack (train_net.do_test -> DeviceEvalRunner -> native PQ/mIoU/AP
evaluators).

A sign error in a matcher cost, a mis-matched assignment, a wrong loss
weight, or a broken gradient path cannot pass this: synthetic PQ must rise
from ~chance to a high value and total_loss must drop.

Reference dynamics mirrored: criterion
third_party/Mask2Former/mask2former/modeling/criterion.py:147-252, matcher
matcher.py:96-156, recipe configs/Panoptic/odise_label_coco_50e.py:27-46.

Usage:
  python tools/convergence.py --steps 300 --out /tmp/conv
Prints one JSON line with the loss curve endpoints and before/after metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_T0 = time.perf_counter()


def log(msg: str) -> None:
    print(f"[conv t={time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def run_convergence(
    out_dir: str,
    *,
    variant: str = "category",
    steps: int = 300,
    batch: int = 4,
    accum_steps: int = 1,
    lr: float = 1e-3,
    grad_clip: float = 0.01,
    weight_decay: float = 0.05,
    size: int = 64,
    n_train: int = 64,
    n_val: int = 8,
    max_instances: int = 8,
    num_points: int = 256,
    seed: int = 0,
    eval_before: bool = True,
    log_every: int = 25,
    dataset_name: str = "_synth_convergence_val",
    use_checkpoint: bool = False,
    slide_training: bool = False,
    backbone_in_size=None,
    collect_mode=None,
    data_mesh: bool = False,
) -> dict:
    """``use_checkpoint``/``slide_training``/``backbone_in_size`` turn on the
    SHIPPED category train features (serial-remat slide over a crop grid,
    configs/common/models/odise_with_label.py slide_training=True +
    use_checkpoint); ``collect_mode``/``data_mesh`` turn on the shipped
    caption features (grounding negatives spanning a data-sharded global
    batch under GSPMD — the jit counterpart of the reference's diffdist
    all_gather, mask_generator_with_caption.py collect_mode="diff"). A
    gradient bug specific to those paths fails convergence here."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import train_net

    from odise_tpu.config import ConfigDict
    from odise_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from odise_tpu.data.dataset_mapper import COCOPanopticDatasetMapper
    from odise_tpu.data.loader import build_train_loader
    from odise_tpu.data.synthetic import (
        SYNTH_LABELS, make_shapes_records, synth_categories)
    from odise_tpu.engine.optimizer import make_optimizer
    from odise_tpu.engine.train_loop import (
        TrainState, check_finite, make_category_train_step,
        merge_param_trees, partition_params)
    from odise_tpu.losses import CriterionConfig, GroundingConfig
    from odise_tpu.model_zoo.factory import (build_caption_odise,
                                             build_category_odise)
    from odise_tpu.models.clip.tokenizer import tokenize

    assert variant in ("category", "caption"), variant
    caption = variant == "caption"
    log(f"dataset: {n_train} train / {n_val} val shapes images @ {size}px"
        f" (variant={variant})")
    # the caption variant needs VARIED content: the grounding InfoNCE
    # contrasts images through their word sets (odise.py:815-907), so
    # identical captions across the batch would be degenerate
    train_records = make_shapes_records(
        os.path.join(out_dir, "train"), n_train, size=size, seed=seed + 1,
        with_captions=caption, vary=caption)
    val_records = make_shapes_records(
        os.path.join(out_dir, "val"), n_val, size=size, seed=seed + 2,
        vary=caption)
    DatasetCatalog.remove(dataset_name)
    DatasetCatalog.register(dataset_name, lambda: val_records)
    MetadataCatalog.get(dataset_name).set(
        ignore_label=255, categories=synth_categories())

    build_kw = dict(train_labels=SYNTH_LABELS, with_clip_head=False,
                    use_checkpoint=use_checkpoint,
                    slide_training=slide_training,
                    backbone_in_size=backbone_in_size)
    if caption:
        num_words = 4
        model = build_caption_odise("tiny", **build_kw)
        variables = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, size, size, 3)),
            jnp.zeros((1, num_words, 77), jnp.int32),
            method=type(model).init_full)
    else:
        model = build_category_odise("tiny", **build_kw)
        variables = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, size, size, 3)),
            jnp.zeros((len(SYNTH_LABELS), 16)), method=type(model).init_full)

    # the SAME raw text embeddings the eval wrapper computes
    # (models/wrapper.py build_open_vocabulary): tokenize the flat synonym
    # list through the frozen text tower
    flat = [t for group in SYNTH_LABELS for t in group]
    text_raw = model.apply(variables, jnp.asarray(tokenize(flat)),
                           method=type(model).encode_vocab)

    mesh = None
    if data_mesh:
        # shipped scale-out shape: batch sharded over a data mesh, params
        # replicated; XLA inserts the grad psum and — for the caption
        # grounding — the collectives that make negatives span the GLOBAL
        # batch (the reference's diffdist all_gather, odise.py:93-118)
        from odise_tpu.parallel.mesh import batch_sharding, create_mesh, shard_params

        devices = jax.devices()
        n_data = min(batch, len(devices))
        assert batch % n_data == 0, (batch, n_data)
        mesh = create_mesh(data=n_data, model=1, devices=devices[:n_data])
        variables = dict(variables)
        variables["params"] = shard_params(variables["params"], mesh)
        batch_shard = batch_sharding(mesh)
        log(f"data mesh: {n_data} devices, batch {batch} sharded")

    trainable, frozen = partition_params(variables["params"])
    n_trainable = sum(int(np.prod(l.shape))
                      for l in jax.tree_util.tree_leaves(trainable))
    log(f"model built: {n_trainable} trainable params")

    tx = make_optimizer(
        trainable, lr=lr, weight_decay=weight_decay, grad_clip=grad_clip,
        milestones=(int(steps * 8 / 9), int(steps * 17 / 18)),
        warmup_steps=min(10, steps // 10))
    if caption:
        from odise_tpu.engine.train_loop import make_caption_train_step

        cfg = CriterionConfig(num_classes=1, num_points=num_points)
        step = make_caption_train_step(
            model, tx, cfg, GroundingConfig(collect_mode=collect_mode),
            mesh=mesh, frozen_params=frozen, grad_clip=grad_clip,
            accum_steps=accum_steps)
    else:
        cfg = CriterionConfig(num_classes=len(SYNTH_LABELS),
                              num_points=num_points)
        step = make_category_train_step(
            model, tx, cfg, text_embed_raw=text_raw, labels=SYNTH_LABELS,
            mesh=mesh, frozen_params=frozen, grad_clip=grad_clip,
            accum_steps=accum_steps)

    mapper = COCOPanopticDatasetMapper(
        is_train=True, image_size=size, max_instances=max_instances,
        with_captions=caption, num_words=4 if caption else 8)
    loader = build_train_loader(train_records, mapper, batch, seed=seed)

    eval_cfg = ConfigDict(
        dataloader=ConfigDict(
            wrapper=ConfigDict(
                labels=[list(l) for l in SYNTH_LABELS],
                dataset_name=dataset_name,
                semantic_on=True, panoptic_on=True, instance_on=True,
            ),
            eval_short_side=size,
            eval_max_size=2 * size,
        ),
    )

    def evaluate(vars_):
        r = train_net.do_test(eval_cfg, model, vars_)["main"]
        return {k: float(v) for k, v in r.items()
                if isinstance(v, (int, float))}

    before = None
    if eval_before:
        log("eval (untrained baseline)")
        # eval builds its own device placement (it may use a different
        # device subset than the train mesh) — feed it host arrays
        before = evaluate(jax.device_get(variables) if mesh is not None
                          else variables)
        log(f"untrained: PQ={before.get('PQ'):.2f} "
            f"mIoU={before.get('mIoU'):.2f} AP={before.get('AP'):.2f}")

    state = TrainState(0, trainable, tx.init(trainable))
    rng = jax.random.PRNGKey(seed + 100)
    losses = []
    t_train0 = time.perf_counter()
    for it in range(steps):
        bt = next(loader)
        if mesh is not None:
            bt = {k: jax.device_put(np.asarray(v), batch_shard)
                  for k, v in bt.items()}
        else:
            bt = {k: jnp.asarray(v) for k, v in bt.items()}
        rng, step_rng = jax.random.split(rng)
        state, metrics = step(state, bt, step_rng)
        total = float(metrics["total_loss"])
        check_finite({"total_loss": metrics["total_loss"]}, it)
        losses.append(total)
        if it % log_every == 0 or it == steps - 1:
            log(f"step {it:4d} total_loss={total:8.3f} "
                f"grad_norm={float(metrics['grad_norm']):9.3f}")
    train_s = time.perf_counter() - t_train0

    trained = state.params
    if mesh is not None:
        # eval runs its own device placement; pull everything (trained,
        # frozen, and any non-param collections) off the train mesh first
        trained = jax.device_get(trained)
        frozen = jax.device_get(frozen)
        trained_vars = dict(jax.device_get(variables))
    else:
        trained_vars = dict(variables)
    trained_vars["params"] = merge_param_trees(frozen, trained)
    log("eval (trained)")
    after = evaluate(trained_vars)
    log(f"trained: PQ={after.get('PQ'):.2f} mIoU={after.get('mIoU'):.2f} "
        f"AP={after.get('AP'):.2f}")

    k = max(len(losses) // 10, 1)
    result = {
        "variant": variant,
        "steps": steps,
        "batch": batch,
        "accum_steps": accum_steps,
        "lr": lr,
        "loss_first10_mean": float(np.mean(losses[:k])),
        "loss_last10_mean": float(np.mean(losses[-k:])),
        "loss_drop_pct": float(
            100.0 * (1.0 - np.mean(losses[-k:]) / np.mean(losses[:k]))),
        "metrics_before": before,
        "metrics_after": after,
        "train_seconds": round(train_s, 1),
        "sec_per_step": round(train_s / steps, 3),
    }
    DatasetCatalog.remove(dataset_name)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/odise_tpu_convergence")
    ap.add_argument("--variant", default="category",
                    choices=["category", "caption"])
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--accum-steps", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--grad-clip", type=float, default=0.01)
    ap.add_argument("--n-train", type=int, default=64)
    ap.add_argument("--n-val", type=int, default=8)
    ap.add_argument("--num-points", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-eval-before", action="store_true")
    ap.add_argument("--shipped-category", action="store_true",
                    help="shipped-config category features: serial-remat "
                    "slide over a 2x2 crop grid (use_checkpoint=True, "
                    "slide_training=True, 128px images over the tiny "
                    "model's 64px backbone window)")
    ap.add_argument("--collect-mode", default=None,
                    choices=["diff", "concat"],
                    help="caption grounding collect mode (shipped configs "
                    "use 'diff')")
    ap.add_argument("--data-mesh", action="store_true",
                    help="shard the batch over a data mesh of local devices")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (tiny model; avoids paying "
                    "TPU relay latency per step)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    shipped = {}
    if args.shipped_category:
        # image (128px) larger than the backbone window (the tiny scale's
        # native 64px — smaller windows underflow the tiny UNet's
        # down-stack) -> a REAL 2x2 slide grid through the serial-remat
        # train path, like the shipped 1024px-over-512px-window configs
        shipped = dict(use_checkpoint=True, slide_training=True,
                       backbone_in_size=(64, 64), size=128)
    result = run_convergence(
        args.out, variant=args.variant, steps=args.steps, batch=args.batch,
        accum_steps=args.accum_steps, lr=args.lr, grad_clip=args.grad_clip,
        n_train=args.n_train, n_val=args.n_val, num_points=args.num_points,
        seed=args.seed, eval_before=not args.no_eval_before,
        collect_mode=args.collect_mode, data_mesh=args.data_mesh, **shipped)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
