"""Golden-value regression tests with fixed seeds (SURVEY.md section 4 item 4).

These pin the numerical behavior of pure subsystems so refactors that change
semantics (not just implementation) are caught. Golden values were computed
with this framework at commit time — they are regression anchors, not
reference-parity checks (which require released weights).
"""

import jax
import jax.numpy as jnp
import numpy as np

from odise_tpu.diffusion import GaussianDiffusion, get_named_beta_schedule
from odise_tpu.models.decoder.layers import position_embedding_sine
from odise_tpu.models.helper import ensemble_logits_with_labels, mask_pooling
from odise_tpu.ops.grid_sample import grid_sample


def test_golden_ldm_alphas():
    d = GaussianDiffusion(betas=get_named_beta_schedule("ldm_linear", 1000))
    np.testing.assert_allclose(float(d.alphas_cumprod[0]), 0.99915, atol=1e-5)
    np.testing.assert_allclose(float(d.alphas_cumprod[500]), 0.2763327,
                               rtol=1e-4)
    np.testing.assert_allclose(float(d.alphas_cumprod[999]), 0.0046601,
                               rtol=1e-4)


def test_golden_position_embedding():
    pos = position_embedding_sine(4, 4, num_pos_feats=4)
    assert pos.shape == (4, 4, 8)
    # y-sin channel at (0,0): sin(1/4 * 2*pi / 1) with normalize
    expected = np.sin((1 / (4 + 1e-6)) * 2 * np.pi)
    np.testing.assert_allclose(float(pos[0, 0, 0]), expected, rtol=1e-5)


def test_golden_grid_sample_exact_center():
    im = jnp.arange(4.0).reshape(1, 2, 2, 1)
    # grid (0,0) = center of image = average of 4 pixels
    out = grid_sample(im, jnp.zeros((1, 1, 2)))
    np.testing.assert_allclose(float(out[0, 0, 0]), 1.5, atol=1e-6)


def test_golden_ensemble():
    logits = jnp.asarray([[1.0, 5.0, 2.0, 7.0, 3.0]])
    labels = [["a", "b"], ["c"], ["d", "e"]]
    out_max = ensemble_logits_with_labels(logits, labels, "max")
    np.testing.assert_allclose(np.asarray(out_max)[0], [5.0, 2.0, 7.0])
    out_mean = ensemble_logits_with_labels(logits, labels, "mean")
    np.testing.assert_allclose(np.asarray(out_mean)[0], [3.0, 2.0, 5.0])


def test_golden_mask_pooling():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    mask = jnp.full((1, 1, 4, 4), -10.0)
    mask = mask.at[0, 0, :2].set(10.0)  # top half
    out = mask_pooling(x, mask)
    np.testing.assert_allclose(float(out[0, 0, 0]), np.arange(8).mean(), rtol=1e-5)


def test_golden_tokenizer_fallback_stability():
    """Token ids must be stable across runs (byte-level fallback vocab)."""
    from odise_tpu.models.clip.tokenizer import tokenize

    toks = tokenize(["hello"])
    assert toks[0, 0] == 49406  # sot in fallback == VOCAB_SIZE - 2
    np.testing.assert_array_equal(toks, tokenize(["hello"]))
