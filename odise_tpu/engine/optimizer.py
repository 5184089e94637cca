"""Optimizer construction: AdamW with zero weight-decay on norms/biases and
frozen-tower masking.

Capability parity with the reference optimizer config (reference
configs/common/optim.py:23-32: AdamW, weight-decay exemptions for norm/bias
params) and the 3-step LR schedule with the reference's milestone semantics
(configs/Panoptic/odise_label_coco_50e.py:31-46). Freezing is an optimizer
mask over param paths (the reference freezes via requires_grad=False).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import optax

from ..parallel.mesh import is_frozen_path


def _path_keys(path) -> Tuple[str, ...]:
    return tuple(getattr(k, "key", str(k)) for k in path)


def make_trainable_mask(params) -> dict:
    """Pytree of bools: True where the param is trainable."""
    return jax.tree_util.tree_map_with_path(
        lambda p, _: not is_frozen_path(_path_keys(p)), params)


def _no_weight_decay_mask(params) -> dict:
    """True where weight decay applies: 2D+ kernels only (not norms/biases)."""
    def rule(path, leaf):
        keys = _path_keys(path)
        name = keys[-1] if keys else ""
        if leaf.ndim < 2:
            return False
        if any(s in name for s in ("bias", "scale", "embedding")):
            return False
        return True

    return jax.tree_util.tree_map_with_path(rule, params)


def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float = 0.1,
                 warmup_steps: int = 0, warmup_factor: float = 1e-3) -> Callable:
    """Step schedule: lr * gamma^(#milestones passed), with linear warmup."""
    import jax.numpy as jnp

    def schedule(step):
        lr = base_lr
        mult = jnp.ones((), jnp.float32)
        for m in milestones:
            mult = mult * jnp.where(step >= m, gamma, 1.0)
        if warmup_steps > 0:
            alpha = jnp.clip(step / warmup_steps, 0.0, 1.0)
            warm = warmup_factor * (1 - alpha) + alpha
        else:
            warm = 1.0
        return lr * mult * warm

    return schedule


def make_optimizer(params, *, lr=1e-4, weight_decay: float = 0.05,
                   milestones: Sequence[int] = (), gamma: float = 0.1,
                   grad_clip: float = 0.01, betas=(0.9, 0.999),
                   warmup_steps: int = 0,
                   warmup_factor: float = 1e-3) -> optax.GradientTransformation:
    """AdamW + global-norm clip + frozen masking + multistep LR."""
    schedule = (multistep_lr(lr, milestones, gamma, warmup_steps, warmup_factor)
                if (milestones or warmup_steps) else lr)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip) if grad_clip else optax.identity(),
        optax.adamw(
            learning_rate=schedule,
            b1=betas[0], b2=betas[1],
            weight_decay=weight_decay,
            mask=_no_weight_decay_mask(params),
        ),
    )
    trainable = make_trainable_mask(params)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(lambda t: "train" if t else "freeze", trainable),
    )
