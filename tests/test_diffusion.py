"""Diffusion math unit tests: schedules, q_sample, DDIM round trips, respacing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odise_tpu.diffusion import (
    GaussianDiffusion,
    SpacedDiffusion,
    create_gaussian_diffusion,
    get_named_beta_schedule,
    space_timesteps,
)


def test_ldm_linear_schedule_values():
    betas = get_named_beta_schedule("ldm_linear", 1000)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-6)
    # sqrt-space linearity
    s = np.sqrt(betas)
    np.testing.assert_allclose(np.diff(s), np.diff(s)[0], rtol=1e-6)


def test_linear_and_cosine_schedules_monotone_alphabar():
    for name in ("linear", "cosine"):
        betas = get_named_beta_schedule(name, 100)
        acp = np.cumprod(1 - betas)
        assert (np.diff(acp) < 0).all()
        assert 0 < acp[-1] < acp[0] <= 1


def test_q_sample_identity_at_t0_with_zero_noise():
    d = GaussianDiffusion(betas=get_named_beta_schedule("ldm_linear", 1000))
    x = jnp.ones((2, 4, 8, 8))
    t = jnp.zeros((2,), jnp.int32)
    out = d.q_sample(x, t, jnp.zeros_like(x))
    # at t=0, sqrt(alpha_bar_0) = sqrt(1 - 0.00085)
    np.testing.assert_allclose(out[0, 0, 0, 0], np.sqrt(1 - 0.00085), rtol=1e-5)


def test_q_sample_matches_hand_formula():
    d = GaussianDiffusion(betas=get_named_beta_schedule("linear", 50))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (3, 2, 4, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    t = jnp.array([0, 10, 49])
    out = d.q_sample(x, t, noise)
    for i, ti in enumerate([0, 10, 49]):
        acp = np.cumprod(1 - d.betas)[ti]
        expected = np.sqrt(acp) * np.asarray(x[i]) + np.sqrt(1 - acp) * np.asarray(noise[i])
        np.testing.assert_allclose(np.asarray(out[i]), expected, rtol=1e-4, atol=1e-5)


def test_posterior_mean_variance_consistency():
    d = GaussianDiffusion(betas=get_named_beta_schedule("linear", 50))
    x0 = jnp.full((1, 1, 2, 2), 0.5)
    xt = jnp.full((1, 1, 2, 2), 0.7)
    t = jnp.array([10])
    mean, var, logvar = d.q_posterior_mean_variance(x0, xt, t)
    np.testing.assert_allclose(np.asarray(jnp.exp(logvar)), np.asarray(var), rtol=1e-5)


def test_eps_xstart_roundtrip():
    d = GaussianDiffusion(betas=get_named_beta_schedule("linear", 50))
    x_t = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(3), x_t.shape)
    t = jnp.array([5, 30])
    x0 = d._predict_xstart_from_eps(x_t, t, eps)
    eps2 = d._predict_eps_from_xstart(x_t, t, x0)
    np.testing.assert_allclose(np.asarray(eps2), np.asarray(eps), rtol=1e-3, atol=1e-4)


def test_ddim_deterministic_sampling_runs_and_is_finite():
    d = create_gaussian_diffusion(steps=20, noise_schedule="linear",
                                  timestep_respacing="ddim5")
    assert d.num_timesteps == 5

    def model(x, t, **kw):
        return 0.1 * x  # fake eps prediction

    img = d.ddim_sample_loop(model, (1, 2, 4, 4), jax.random.PRNGKey(0))
    assert img.shape == (1, 2, 4, 4)
    assert bool(jnp.isfinite(img).all())


def test_space_timesteps_ddim_and_ldm_offset():
    s = space_timesteps(1000, "ddim50")
    assert len(s) == 50 and 0 in s
    s_ldm = space_timesteps(1000, "ldm_ddim50")
    assert len(s_ldm) == 50 and 1 in s_ldm and 0 not in s_ldm
    assert sorted(x - 1 for x in s_ldm) == sorted(s)


def test_spaced_diffusion_alphas_match_base():
    betas = get_named_beta_schedule("linear", 100)
    base = GaussianDiffusion(betas=betas)
    sp = SpacedDiffusion(use_timesteps=space_timesteps(100, "ddim10"), betas=betas)
    kept = sorted(space_timesteps(100, "ddim10"))
    np.testing.assert_allclose(
        sp.alphas_cumprod, base.alphas_cumprod[kept], rtol=1e-10
    )


def test_spaced_diffusion_remaps_model_timesteps():
    betas = get_named_beta_schedule("linear", 100)
    sp = SpacedDiffusion(use_timesteps=space_timesteps(100, "ddim10"), betas=betas)
    seen = []

    def model(x, t, **kw):
        seen.append(np.asarray(t))
        return jnp.zeros_like(x)

    x = jnp.ones((1, 2, 2, 2))
    sp.p_mean_variance(model, x, jnp.array([9]))
    assert seen[0][0] == sorted(space_timesteps(100, "ddim10"))[9]


def test_training_losses_mse():
    d = GaussianDiffusion(betas=get_named_beta_schedule("linear", 100))
    x = jnp.ones((2, 1, 4, 4))

    def perfect_model(x_t, t, **kw):
        return jnp.zeros_like(x_t)  # predicts eps=0

    t = jnp.array([0, 50])
    out = d.training_losses(perfect_model, x, t, jax.random.PRNGKey(0),
                            noise=jnp.zeros_like(x))
    np.testing.assert_allclose(np.asarray(out["loss"]), 0.0, atol=1e-6)


def test_loss_second_moment_resampler_state():
    from odise_tpu.diffusion import LossSecondMomentResampler

    d = GaussianDiffusion(betas=get_named_beta_schedule("cosine", 4))
    s = LossSecondMomentResampler(d, history_per_term=2)
    state = s.init_state()
    # before warmup: uniform
    w = s.weights(state)
    np.testing.assert_allclose(np.asarray(w), 0.25)
    for _ in range(2):
        state = s.update_state(state, jnp.array([0, 1, 2, 3]),
                               jnp.array([1.0, 2.0, 3.0, 4.0]))
    w = np.asarray(s.weights(state))
    assert w[3] > w[0]  # higher loss => higher weight
    ts, weights = s.sample(jax.random.PRNGKey(0), 16, state)
    assert ts.shape == (16,) and weights.shape == (16,)
