"""Jitted train/eval step builders and the training loop.

Capability parity with the reference trainers (reference
odise/engine/train_loop.py:70-323): per-step loss dict, grad-norm /
clipped-grad-norm logging, NaN detection raising FloatingPointError, periodic
checkpoint/eval hooks. The reference's AMP GradScaler machinery is unnecessary
on TPU — compute is bf16 with fp32 params/optimizer by construction, so
``loss_scale`` is identically 1.

The step is a single jitted function over a (data, model) mesh: batch sharded
over ``data``, params replicated (or frozen towers sharded over ``model``),
gradient psum inserted by XLA.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..losses import CriterionConfig, set_criterion


import flax.struct


@flax.struct.dataclass
class TrainState:
    step: Any
    params: Any
    opt_state: Any


def global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))



def partition_params(params):
    """Split a param tree into (trainable, frozen) nested dicts (no copies).

    Differentiating only the trainable subtree keeps the optimizer and grads
    at ~28M params instead of materializing zero-gradients for the ~1.7B
    frozen SD/CLIP weights (the reference never builds those grads either —
    requires_grad=False).
    """
    from ..parallel.mesh import is_frozen_path

    trainable: dict = {}
    frozen: dict = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        target = frozen if is_frozen_path(keys) else trainable
        node = target
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = leaf
    return trainable, frozen


def merge_param_trees(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_param_trees(out[k], v)
        else:
            out[k] = v
    return out


def _make_grads_and_losses(loss_fn, accum_steps: int):
    """Wrap ``loss_fn(params, frozen, batch, rng, num_masks_override)`` into
    a gradient function with optional k-way accumulation.

    ``accum_steps=k`` reproduces k-way DDP dynamics (reference
    auto_scale_workers + DDP grad averaging): the batch splits into k equal
    micro-batches scanned sequentially; per-micro losses use the
    DDP-equivalent num_masks (mean over micro-batches, mirroring the
    reference criterion.py:231-238 all_reduce), grads are averaged, and the
    caller applies ONE optimizer update. Micro-step i folds the step rng as
    a DDP rank would draw its own. Equivalence tested in tests/test_accum.py.
    """

    def grads_and_losses(params, frozen, batch, rng):
        if accum_steps == 1:
            return jax.value_and_grad(loss_fn, has_aux=True)(
                params, frozen, batch, rng)
        k = accum_steps
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((k, x.shape[0] // k) + x.shape[1:]), batch)
        # DDP num_masks sync: mean of per-micro (clamped) target counts
        per_micro_nm = jnp.maximum(
            jnp.sum(micro["gt_valid"].astype(jnp.float32), axis=tuple(
                range(1, micro["gt_valid"].ndim))), 1.0)
        nm = jnp.mean(per_micro_nm)
        rngs = jax.random.split(rng, k)

        def body(carry, xs):
            g_acc, loss_acc = carry
            mb, r = xs
            (total, losses), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, frozen, mb, r, nm)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
            loss_acc = jax.tree_util.tree_map(jnp.add, loss_acc, (total, losses))
            return (g_acc, loss_acc), None

        g0 = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)
        l0 = jax.eval_shape(lambda: loss_fn(params, frozen,
                                            jax.tree_util.tree_map(lambda x: x[0], micro),
                                            rngs[0], nm))
        l0 = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), l0)
        (g_sum, (total, losses)), _ = jax.lax.scan(
            body, (g0, l0), (micro, rngs))
        inv_k = 1.0 / k
        grads = jax.tree_util.tree_map(lambda g: g * inv_k, g_sum)
        total = total * inv_k
        losses = jax.tree_util.tree_map(lambda v: v * inv_k, losses)
        return (total, losses), grads

    return grads_and_losses


def make_category_train_step(
    model,
    tx: optax.GradientTransformation,
    criterion_cfg: CriterionConfig,
    text_embed_raw,
    labels: tuple,
    mesh=None,
    axis_name: Optional[str] = None,
    donate: bool = True,
    frozen_params=None,
    grad_clip: float = 0.01,
    accum_steps: int = 1,
) -> Callable:
    """Build the jitted CategoryODISE train step.

    step(state, batch, rng) -> (state, metrics). batch keys: image [B,S,S,3],
    gt_labels [B,T], gt_masks [B,T,S,S], gt_valid [B,T].

    When ``frozen_params`` is given, ``state.params`` holds ONLY the trainable
    subtree (see ``partition_params``); the frozen towers are closed over and
    excluded from differentiation entirely.

    ``accum_steps=k`` reproduces the reference's global-batch-64 dynamics on
    few chips (reference auto_scale_workers, odise/config/utils.py:20-82, and
    DDP grad averaging): the batch splits into k equal micro-batches scanned
    sequentially; per-micro losses use the DDP-equivalent num_masks (the mean
    over micro-batches, mirroring criterion.py:231-238's all_reduce), grads
    are averaged, and ONE optimizer update is applied. Micro-step i folds the
    step rng as a DDP rank would draw its own — semantics equal to k-way data
    parallelism, tested in tests/test_engine.py.
    """

    def loss_fn(params, frozen, batch, rng, num_masks_override=None):
        if frozen is not None:
            params = merge_param_trees(frozen, params)
        outputs = model.apply({"params": params}, batch["image"], text_embed_raw,
                              labels, method=type(model).forward_train)
        targets = {"labels": batch["gt_labels"], "masks": batch["gt_masks"],
                   "valid": batch["gt_valid"]}
        losses = set_criterion(outputs, targets, rng, criterion_cfg,
                               axis_name=axis_name,
                               num_masks_override=num_masks_override)
        total = sum(losses.values())
        return total, losses

    grads_and_losses = _make_grads_and_losses(loss_fn, accum_steps)

    def step_fn(state: TrainState, frozen, batch, rng):
        (total, losses), grads = grads_and_losses(
            state.params, frozen, batch, rng)
        gnorm = global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = gnorm
        # parity with the reference's AMPTrainer logging
        # (train_loop.py:306-312): on TPU bf16 there is no GradScaler, so
        # loss_scale is identically 1; clipped norm reflects the clip cap.
        metrics["clipped_grad_norm"] = jnp.minimum(gnorm, grad_clip)
        metrics["loss_scale"] = jnp.ones(())
        return TrainState(state.step + 1, params, opt_state), metrics

    # Sharding is carried by the input placements: callers place the batch
    # with ``batch_sharding(mesh)`` and params via ``shard_params`` /
    # replication; jit propagates them and XLA inserts the collectives.
    # The frozen towers are a jit ARGUMENT, not a closure: closed-over
    # concrete arrays become constants baked into the HLO (~5.4GB at full
    # scale), which blows up compile memory — the round-1 1024px
    # compile failure.
    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    def step(state: TrainState, batch, rng):
        return jitted(state, frozen_params, batch, rng)

    return step


def make_caption_train_step(
    model,
    tx: optax.GradientTransformation,
    criterion_cfg: CriterionConfig,
    grounding_cfg,
    mesh=None,
    axis_name: Optional[str] = None,
    frozen_params=None,
    grad_clip: float = 0.01,
    accum_steps: int = 1,
    donate: bool = True,
) -> Callable:
    """CaptionODISE train step: binary mask losses + grounding InfoNCE
    (reference odise.py:431-537).

    ``accum_steps`` mirrors the category step's k-way-DDP accumulation for
    the mask losses (shared ``_make_grads_and_losses``). The grounding
    InfoNCE sees each micro-batch's images as its negative pool — the same
    pool a k-times-smaller-world DDP run has locally; cross-device negatives
    (``axis_name``) still apply within every micro-step.
    """
    from ..losses import mask_grounding_criterion

    def loss_fn(params, frozen, batch, rng, num_masks_override=None):
        if frozen is not None:
            params = merge_param_trees(frozen, params)
        outputs = model.apply({"params": params}, batch["image"],
                              batch["word_tokens"],
                              method=type(model).forward_train)
        targets = {
            # binary supervision: every valid gt mask is class 0 (foreground)
            "labels": jnp.zeros_like(batch["gt_labels"]),
            "masks": batch["gt_masks"],
            "valid": batch["gt_valid"],
        }
        losses = set_criterion(outputs, targets, rng, criterion_cfg,
                               axis_name=axis_name,
                               num_masks_override=num_masks_override)
        g = mask_grounding_criterion(outputs, batch["word_valid"],
                                     grounding_cfg, axis_name=axis_name)
        losses.update(g)
        total = sum(losses.values())
        return total, losses

    grads_and_losses = _make_grads_and_losses(loss_fn, accum_steps)

    def step_fn(state: TrainState, frozen, batch, rng):
        (total, losses), grads = grads_and_losses(
            state.params, frozen, batch, rng)
        gnorm = global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = gnorm
        # reference AMPTrainer logging parity (train_loop.py:306-312); no
        # GradScaler on TPU bf16 so loss_scale is identically 1
        metrics["clipped_grad_norm"] = jnp.minimum(gnorm, grad_clip)
        metrics["loss_scale"] = jnp.ones(())
        return TrainState(state.step + 1, params, opt_state), metrics

    # frozen towers as a jit argument, not a closure (see category step)
    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    def step(state: TrainState, batch, rng):
        return jitted(state, frozen_params, batch, rng)

    return step


def check_finite(metrics: Dict[str, jnp.ndarray], step: int) -> None:
    """NaN/Inf detection (reference train_loop.py:181-185)."""
    import math

    bad = {k: float(v) for k, v in metrics.items()
           if not math.isfinite(float(v))}
    if bad:
        raise FloatingPointError(
            f"Loss became infinite or NaN at iteration={step}! metrics={bad}")


class Trainer:
    """Minimal host-side training loop with hooks (reference SimpleTrainer).

    ``log_period > 1`` defers the metric fetch (the only host<->device sync
    in the loop) to every log_period-th step, so step dispatch stays ahead
    of the device and the pipeline never drains between steps — the JAX
    counterpart of d2 keeping the GPU queue full while logging smoothed
    metrics every 20 iters. ``check_finite`` runs on every step's metrics,
    just fetched in windows. Hooks fire per step at flush time (with the
    then-current state); hook cadences should be multiples of log_period.
    """

    def __init__(self, step_fn, state: TrainState, data_iter, rng,
                 hooks: Optional[list] = None, log_period: int = 1):
        self.step_fn = step_fn
        self.state = state
        self.data_iter = data_iter
        self.rng = rng
        self.hooks = hooks or []
        self.log_period = max(int(log_period), 1)
        self.metrics_history: list = []

    def train(self, start_iter: int, max_iter: int):
        pending: list = []  # (it, data_time, device-side metrics)
        for it in range(start_iter, max_iter):
            t0 = time.perf_counter()
            batch = next(self.data_iter)
            data_time = time.perf_counter() - t0
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, metrics = self.step_fn(self.state, batch, step_rng)
            pending.append((it, data_time, metrics))
            if len(pending) >= self.log_period or it == max_iter - 1:
                self._flush(pending)
        return self.state

    def _flush(self, pending: list) -> None:
        # fetching the newest step's scalars waits for every earlier one
        # (program order), so this is ONE device sync per window
        for pit, data_time, dm in pending:
            m = {k: float(v) for k, v in dm.items()}
            m["data_time"] = data_time
            check_finite(
                {k: v for k, v in m.items() if k != "data_time"}, pit)
            self.metrics_history.append(m)
            for h in self.hooks:
                h(pit, self.state, m)
        pending.clear()
