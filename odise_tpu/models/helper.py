"""Shared model helpers.

Capability parity with reference odise/modeling/meta_arch/helper.py
(ensemble_logits_with_labels at helper.py:79-109) plus small utilities.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def ensemble_logits_with_labels(
    logits: jnp.ndarray, labels: Sequence[Sequence[str]], ensemble_method: str = "max"
) -> jnp.ndarray:
    """Reduce per-synonym logits to per-category logits.

    Args:
      logits: [..., K_flat] where K_flat = sum(len(syns) for each category).
      labels: static list of synonym lists (defines the grouping).
      ensemble_method: "max" or "mean" over each synonym group.

    Returns: [..., K] with K = len(labels).
    """
    assert ensemble_method in ("max", "mean")
    sizes = [len(l) for l in labels]
    assert sum(sizes) == logits.shape[-1], (sum(sizes), logits.shape)
    if all(s == 1 for s in sizes):
        return logits
    seg_ids = jnp.asarray(np.repeat(np.arange(len(sizes)), sizes))
    moved = jnp.moveaxis(logits, -1, 0)  # [K_flat, ...]
    if ensemble_method == "max":
        out = jax.ops.segment_max(moved, seg_ids, num_segments=len(sizes))
    else:
        out = jax.ops.segment_sum(moved, seg_ids, num_segments=len(sizes))
        out = out / jnp.asarray(sizes, out.dtype).reshape((-1,) + (1,) * (out.ndim - 1))
    return jnp.moveaxis(out, 0, -1)


def mask_pooling(x: jnp.ndarray, mask: jnp.ndarray, hard: bool = True,
                 threshold: float = 0.5) -> jnp.ndarray:
    """Average-pool features inside each (detached) predicted mask.

    Reference MaskPooling (odise.py:923-963). x: [B, H, W, C] (NHWC),
    mask: [B, Q, H, W] logits. Returns [B, Q, C].
    """
    mask = jax.lax.stop_gradient(mask)
    mask = jax.nn.sigmoid(mask)
    if hard:
        mask = (mask > threshold).astype(x.dtype)
    denorm = jnp.sum(mask, axis=(-1, -2), keepdims=True) + 1e-8
    mask = mask / denorm
    return jnp.einsum("bhwc,bqhw->bqc", x, mask.astype(x.dtype))


def resize_bilinear(x: jnp.ndarray, size, *, method: str = "bilinear") -> jnp.ndarray:
    """Resize [B, H, W, C] (or [B, Q, H, W] with channel_axis trickery handled
    by callers) to spatial ``size`` (h, w)."""
    B = x.shape[0]
    C = x.shape[-1]
    return jax.image.resize(x, (B, size[0], size[1], C), method=method)


def resize_mask(masks: jnp.ndarray, size, *, method: str = "bilinear") -> jnp.ndarray:
    """Resize [B, Q, H, W] masks to [B, Q, h, w]."""
    B, Q = masks.shape[:2]
    return jax.image.resize(masks, (B, Q, size[0], size[1]), method=method)


def l2_normalize(x, axis: int = -1, eps: float = 1e-12):
    """NaN-safe L2 normalization: finite gradient even at exactly-zero input
    (x / ||x|| has a NaN gradient at 0; rsqrt(sum(x^2)+eps) does not)."""
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)


class LayerNorm2d:
    """Channel-wise LayerNorm over NHWC maps (reference helper.py LayerNorm2d,
    which normalizes the channel dim of NCHW maps). Functional: call with
    (x, scale, bias)."""

    @staticmethod
    def apply(x, scale, bias, eps: float = 1e-6):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias
