"""CaptionODISE end-to-end smoke: train forward + grounding loss + eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odise_tpu.losses import (
    CriterionConfig,
    GroundingConfig,
    mask_grounding_criterion,
    set_criterion,
)
from odise_tpu.model_zoo.factory import build_caption_odise

LABELS = (("cat",), ("dog",), ("grass",))


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_caption_odise("tiny", train_labels=LABELS,
                                with_clip_head=False, use_checkpoint=False,
                                slide_training=True)
    img = jnp.zeros((1, 64, 64, 3))
    word_tokens = jnp.zeros((1, 4, 77), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, word_tokens,
                           method=type(model).forward_train)
    return model, variables


def test_caption_forward_train_and_losses(model_and_vars):
    model, variables = model_and_vars
    B, K, T, S = 2, 4, 3, 64
    img = jnp.full((B, S, S, 3), 0.4)
    word_tokens = jnp.ones((B, K, 77), jnp.int32)
    out = model.apply(variables, img, word_tokens,
                      method=type(model).forward_train)
    # binary classification head: fg/bg
    assert out["pred_logits"].shape[-1] == 2
    assert out["word_embed"].shape[:2] == (B, K)

    masks = np.zeros((B, T, S, S), np.float32)
    masks[:, 0, :32] = 1
    targets = {"labels": jnp.zeros((B, T), jnp.int32),
               "masks": jnp.asarray(masks),
               "valid": jnp.asarray([[True, False, False]] * B)}
    losses = set_criterion(out, targets, jax.random.PRNGKey(1),
                           CriterionConfig(num_classes=1, num_points=64,
                                           deep_supervision=False))
    g = mask_grounding_criterion(out, jnp.ones((B, K), bool),
                                 GroundingConfig(collect_mode=None,
                                                 deep_supervision=False))
    losses.update(g)
    assert all(bool(jnp.isfinite(v)) for v in losses.values()), losses
    assert "loss_mask_word" in losses


def test_caption_forward_eval(model_and_vars):
    model, variables = model_and_vars
    img = jnp.full((1, 64, 64, 3), 0.4)
    text_raw = jax.random.normal(jax.random.PRNGKey(3), (4, 16))
    labels = (("cat", "feline"), ("dog",), ("grass",))
    mask_cls, mask_pred = model.apply(variables, img, text_raw, labels,
                                      method=type(model).forward_eval)
    assert mask_cls.shape == (1, model.num_queries, len(labels) + 1)
    assert mask_pred.shape == (1, model.num_queries, 64, 64)
    assert bool(jnp.isfinite(mask_cls).all())
