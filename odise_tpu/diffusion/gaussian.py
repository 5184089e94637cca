"""Gaussian diffusion math in functional JAX.

Capability parity with the reference's GaussianDiffusion / SpacedDiffusion
(reference odise/modeling/diffusion/gaussian_diffusion.py:194-1051 and
respace.py:62-150), re-derived from the standard DDPM (Ho et al. 2020) and
DDIM (Song et al. 2021) equations rather than translated.

Design notes (TPU-first):
  * All schedule constants are precomputed NumPy float64 and baked into the
    jitted computation as literals — no device gathers of schedule tables at
    trace time beyond a single ``jnp.take`` per call.
  * Sampling loops are ``lax.scan`` over the (static) respaced timestep
    sequence so the whole sampler is one XLA computation.
  * The hot path for ODISE feature extraction is ``q_sample`` at t=0 — a
    single fused multiply-add.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import get_named_beta_schedule, space_timesteps

__all__ = ["GaussianDiffusion", "SpacedDiffusion", "create_gaussian_diffusion"]


def _extract(arr: np.ndarray, t: jnp.ndarray, broadcast_shape) -> jnp.ndarray:
    """Gather arr[t] (float32) and reshape to broadcast against x of given shape."""
    out = jnp.take(jnp.asarray(arr, dtype=jnp.float32), t)
    return out.reshape(t.shape + (1,) * (len(broadcast_shape) - t.ndim))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL divergence between two diagonal Gaussians (nats per element)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of images discretized to 256 bins, as in DDPM."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, min=1e-12))),
    )
    return log_probs


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Immutable diffusion process defined by a beta schedule.

    ``mean_type`` in {"eps", "xstart", "prev_x"}; ``var_type`` in
    {"fixed_small", "fixed_large", "learned", "learned_range"};
    ``loss_type`` in {"mse", "rescaled_mse", "kl", "rescaled_kl"}.
    """

    betas: np.ndarray
    mean_type: str = "eps"
    var_type: str = "fixed_small"
    loss_type: str = "mse"

    # -- derived schedule constants (filled in __post_init__) --
    num_timesteps: int = dataclasses.field(init=False, default=0)

    def __post_init__(self):
        betas = np.asarray(self.betas, dtype=np.float64)
        assert betas.ndim == 1 and (0 < betas).all() and (betas <= 1).all()
        object.__setattr__(self, "betas", betas)
        object.__setattr__(self, "num_timesteps", int(betas.shape[0]))

        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        acp_next = np.append(acp[1:], 0.0)
        d = {
            "alphas_cumprod": acp,
            "alphas_cumprod_prev": acp_prev,
            "alphas_cumprod_next": acp_next,
            "sqrt_alphas_cumprod": np.sqrt(acp),
            "sqrt_one_minus_alphas_cumprod": np.sqrt(1.0 - acp),
            "log_one_minus_alphas_cumprod": np.log(1.0 - acp),
            "sqrt_recip_alphas_cumprod": np.sqrt(1.0 / acp),
            "sqrt_recipm1_alphas_cumprod": np.sqrt(1.0 / acp - 1.0),
        }
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        d["posterior_variance"] = post_var
        d["posterior_log_variance_clipped"] = np.log(
            np.append(post_var[1], post_var[1:])
        )
        d["posterior_mean_coef1"] = betas * np.sqrt(acp_prev) / (1.0 - acp)
        d["posterior_mean_coef2"] = (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)
        for k, v in d.items():
            object.__setattr__(self, k, v)

    # ------------------------------------------------------------------ q(x_t | x_0)

    def q_mean_variance(self, x_start, t):
        mean = _extract(self.sqrt_alphas_cumprod, t, x_start.shape) * x_start
        variance = _extract(1.0 - self.alphas_cumprod, t, x_start.shape)
        log_variance = _extract(self.log_one_minus_alphas_cumprod, t, x_start.shape)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        """Diffuse x_start to timestep t. (Hot path for ODISE at t=0.)"""
        return (
            _extract(self.sqrt_alphas_cumprod, t, x_start.shape) * x_start
            + _extract(self.sqrt_one_minus_alphas_cumprod, t, x_start.shape) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        mean = (
            _extract(self.posterior_mean_coef1, t, x_t.shape) * x_start
            + _extract(self.posterior_mean_coef2, t, x_t.shape) * x_t
        )
        var = _extract(self.posterior_variance, t, x_t.shape)
        log_var = _extract(self.posterior_log_variance_clipped, t, x_t.shape)
        return mean, var, log_var

    # ------------------------------------------------------------------ conversions

    def _predict_xstart_from_eps(self, x_t, t, eps):
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, x_t.shape) * x_t
            - _extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.shape) * eps
        )

    def _predict_eps_from_xstart(self, x_t, t, xstart):
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, x_t.shape) * x_t - xstart
        ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.shape)

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        c1 = _extract(1.0 / self.posterior_mean_coef1, t, x_t.shape)
        c2 = _extract(
            self.posterior_mean_coef2 / self.posterior_mean_coef1, t, x_t.shape
        )
        return c1 * xprev - c2 * x_t

    # ------------------------------------------------------------------ p(x_{t-1} | x_t)

    def p_mean_variance(
        self,
        model: Callable,
        x,
        t,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
        model_kwargs: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, jnp.ndarray]:
        model_kwargs = model_kwargs or {}
        B, C = x.shape[0], x.shape[1]
        model_output = model(x, t, **model_kwargs)

        if self.var_type in ("learned", "learned_range"):
            model_output, model_var_values = jnp.split(model_output, 2, axis=1)
            if self.var_type == "learned":
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _extract(self.posterior_log_variance_clipped, t, x.shape)
                max_log = _extract(np.log(self.betas), t, x.shape)
                frac = (model_var_values + 1.0) / 2.0
                model_log_variance = frac * max_log + (1.0 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        else:
            if self.var_type == "fixed_large":
                var = np.append(self.posterior_variance[1], self.betas[1:])
                logvar = np.log(var)
            else:  # fixed_small
                var = self.posterior_variance
                logvar = self.posterior_log_variance_clipped
            model_variance = _extract(var, t, x.shape)
            model_log_variance = _extract(logvar, t, x.shape)

        def process_xstart(xs):
            if denoised_fn is not None:
                xs = denoised_fn(xs)
            if clip_denoised:
                xs = jnp.clip(xs, -1.0, 1.0)
            return xs

        if self.mean_type == "prev_x":
            pred_xstart = process_xstart(
                self._predict_xstart_from_xprev(x, t, model_output)
            )
            model_mean = model_output
        else:
            if self.mean_type == "xstart":
                pred_xstart = process_xstart(model_output)
            else:  # eps
                pred_xstart = process_xstart(
                    self._predict_xstart_from_eps(x, t, model_output)
                )
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    def p_sample(self, model, x, t, rng, clip_denoised=True, denoised_fn=None,
                 model_kwargs=None):
        out = self.p_mean_variance(model, x, t, clip_denoised, denoised_fn, model_kwargs)
        noise = jax.random.normal(rng, x.shape, x.dtype)
        nonzero_mask = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        sample = out["mean"] + nonzero_mask * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def p_sample_loop(self, model, shape, rng, noise=None, clip_denoised=True,
                      denoised_fn=None, model_kwargs=None):
        """Ancestral sampling as a lax.scan over all timesteps."""
        rng, init_rng = jax.random.split(rng)
        img = noise if noise is not None else jax.random.normal(init_rng, shape)
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        rngs = jax.random.split(rng, self.num_timesteps)

        def body(img, inp):
            t_scalar, step_rng = inp
            t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
            out = self.p_sample(model, img, t, step_rng, clip_denoised, denoised_fn,
                                model_kwargs)
            return out["sample"], None

        img, _ = jax.lax.scan(body, img, (ts, rngs))
        return img

    # ------------------------------------------------------------------ DDIM

    def ddim_sample(self, model, x, t, rng=None, clip_denoised=True, denoised_fn=None,
                    model_kwargs=None, eta: float = 0.0):
        out = self.p_mean_variance(model, x, t, clip_denoised, denoised_fn, model_kwargs)
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar = _extract(self.alphas_cumprod, t, x.shape)
        alpha_bar_prev = _extract(self.alphas_cumprod_prev, t, x.shape)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
        )
        nonzero_mask = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        if eta > 0:
            assert rng is not None
            noise = jax.random.normal(rng, x.shape, x.dtype)
            sample = mean_pred + nonzero_mask * sigma * noise
        else:
            sample = mean_pred
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(self, model, x, t, clip_denoised=True, denoised_fn=None,
                            model_kwargs=None):
        """Deterministic encoding x_t -> x_{t+1} (ODE forward)."""
        out = self.p_mean_variance(model, x, t, clip_denoised, denoised_fn, model_kwargs)
        eps = (
            _extract(self.sqrt_recip_alphas_cumprod, t, x.shape) * x
            - out["pred_xstart"]
        ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, x.shape)
        alpha_bar_next = _extract(self.alphas_cumprod_next, t, x.shape)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
            + jnp.sqrt(1 - alpha_bar_next) * eps
        )
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    def ddim_sample_loop(self, model, shape, rng, noise=None, clip_denoised=True,
                         denoised_fn=None, model_kwargs=None, eta: float = 0.0):
        rng, init_rng = jax.random.split(rng)
        img = noise if noise is not None else jax.random.normal(init_rng, shape)
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        rngs = jax.random.split(rng, self.num_timesteps)

        def body(img, inp):
            t_scalar, step_rng = inp
            t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
            out = self.ddim_sample(model, img, t, step_rng, clip_denoised, denoised_fn,
                                   model_kwargs, eta)
            return out["sample"], None

        img, _ = jax.lax.scan(body, img, (ts, rngs))
        return img

    # ------------------------------------------------------------------ losses

    def _vb_terms_bpd(self, model, x_start, x_t, t, clip_denoised=True, model_kwargs=None):
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(model, x_t, t, clip_denoised, None, model_kwargs)
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = kl.reshape(kl.shape[0], -1).mean(axis=1) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = decoder_nll.reshape(decoder_nll.shape[0], -1).mean(axis=1) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def training_losses(self, model, x_start, t, rng, model_kwargs=None, noise=None):
        model_kwargs = model_kwargs or {}
        if noise is None:
            noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)
        terms: Dict[str, jnp.ndarray] = {}

        if self.loss_type in ("kl", "rescaled_kl"):
            terms["loss"] = self._vb_terms_bpd(model, x_start, x_t, t, False, model_kwargs)["output"]
            if self.loss_type == "rescaled_kl":
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms

        model_output = model(x_t, t, **model_kwargs)
        if self.var_type in ("learned", "learned_range"):
            B, C = x_t.shape[0], x_t.shape[1]
            model_output, model_var_values = jnp.split(model_output, 2, axis=1)
            # vb loss on variance with frozen mean prediction
            frozen_out = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), model_var_values], axis=1
            )
            terms["vb"] = self._vb_terms_bpd(
                lambda *_a, **_k: frozen_out, x_start, x_t, t, False, model_kwargs
            )["output"]
            if self.loss_type == "rescaled_mse":
                terms["vb"] = terms["vb"] * self.num_timesteps / 1000.0

        target = {
            "prev_x": self.q_posterior_mean_variance(x_start, x_t, t)[0],
            "xstart": x_start,
            "eps": noise,
        }[self.mean_type]
        mse = ((target - model_output) ** 2).reshape(x_start.shape[0], -1).mean(axis=1)
        terms["mse"] = mse
        terms["loss"] = mse + terms["vb"] if "vb" in terms else mse
        return terms


class SpacedDiffusion(GaussianDiffusion):
    """Diffusion over a subset of the base process's timesteps.

    Rebuilds respace.SpacedDiffusion: the respaced betas are recomputed so
    consecutive kept steps have matching cumulative alphas, and model calls
    remap the compressed timestep index to the original scale
    (reference respace.py:62-150).
    """

    def __init__(self, use_timesteps, betas, **kwargs):
        use_timesteps = sorted(set(int(t) for t in use_timesteps))
        base = GaussianDiffusion(betas=np.asarray(betas), **kwargs)
        last_alpha_cumprod = 1.0
        new_betas = []
        timestep_map = []
        for i, alpha_cumprod in enumerate(base.alphas_cumprod):
            if i in set(use_timesteps):
                new_betas.append(1 - alpha_cumprod / last_alpha_cumprod)
                last_alpha_cumprod = alpha_cumprod
                timestep_map.append(i)
        object.__setattr__(self, "timestep_map", np.asarray(timestep_map, dtype=np.int64))
        object.__setattr__(self, "original_num_steps", len(betas))
        super().__init__(betas=np.asarray(new_betas), **kwargs)

    def _wrap(self, model):
        # already-wrapped guard (reference respace.py checks _WrappedModel):
        # training_losses(kl) wraps, then _vb_terms_bpd re-enters
        # p_mean_variance — without the guard t would map through
        # timestep_map twice (jnp.take clips silently -> wrong timesteps).
        if getattr(model, "_spaced_wrapped", False):
            return model
        tmap = self.timestep_map

        def wrapped(x, t, **kw):
            mapped = jnp.take(jnp.asarray(tmap), t)
            return model(x, mapped, **kw)

        wrapped._spaced_wrapped = True
        return wrapped

    def p_mean_variance(self, model, *args, **kwargs):
        return super().p_mean_variance(self._wrap(model), *args, **kwargs)

    def training_losses(self, model, *args, **kwargs):
        return super().training_losses(self._wrap(model), *args, **kwargs)


def create_gaussian_diffusion(
    *,
    steps: int = 1000,
    learn_sigma: bool = False,
    sigma_small: bool = False,
    noise_schedule: str = "linear",
    use_kl: bool = False,
    predict_xstart: bool = False,
    rescale_timesteps: bool = False,
    rescale_learned_sigmas: bool = False,
    timestep_respacing: str | Sequence[int] = "",
) -> SpacedDiffusion:
    """Factory with the reference's flag surface
    (reference odise/modeling/diffusion/diffusion_builder.py:21-55)."""
    del rescale_timesteps  # timestep rescaling handled by SpacedDiffusion map
    betas = get_named_beta_schedule(noise_schedule, steps)
    if use_kl:
        loss_type = "rescaled_kl"
    elif rescale_learned_sigmas:
        loss_type = "rescaled_mse"
    else:
        loss_type = "mse"
    if not timestep_respacing:
        timestep_respacing = [steps]
    return SpacedDiffusion(
        use_timesteps=space_timesteps(steps, timestep_respacing),
        betas=betas,
        mean_type="xstart" if predict_xstart else "eps",
        var_type=(
            ("learned_range" if not sigma_small else "learned")
            if learn_sigma
            else ("fixed_large" if not sigma_small else "fixed_small")
        ),
        loss_type=loss_type,
    )
