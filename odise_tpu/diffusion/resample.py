"""Importance-sampling of diffusion timesteps.

Capability parity with reference odise/modeling/diffusion/resample.py:36-166.
TPU-native design: the loss history lives as a device array inside the train
state (pure-functional update) instead of a mutable host buffer synchronized
by all_gather; cross-device synchronization happens with ``lax.pmean`` inside
the jitted step when used under a mesh.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


class ScheduleSampler:
    """Base: sample timesteps + importance weights for training."""

    def weights(self, state=None) -> jnp.ndarray:
        raise NotImplementedError

    def sample(self, rng, batch_size: int, state=None):
        w = self.weights(state)
        p = w / jnp.sum(w)
        indices = jax.random.categorical(
            rng, jnp.log(p)[None, :].repeat(batch_size, 0), axis=-1
        )
        weights = 1.0 / (p.shape[0] * p[indices])
        return indices, weights


class UniformSampler(ScheduleSampler):
    def __init__(self, diffusion):
        self.num_timesteps = diffusion.num_timesteps

    def weights(self, state=None):
        return jnp.ones((self.num_timesteps,), jnp.float32)


@dataclasses.dataclass
class LossSecondMomentResampler(ScheduleSampler):
    """Importance weights proportional to sqrt(E[loss^2]) per timestep.

    State = (loss_history [T, K], counts [T]) carried functionally.
    """

    num_timesteps: int
    history_per_term: int = 10
    uniform_prob: float = 0.001

    def __init__(self, diffusion, history_per_term: int = 10, uniform_prob: float = 0.001):
        self.num_timesteps = diffusion.num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob

    def init_state(self):
        return {
            "history": jnp.zeros((self.num_timesteps, self.history_per_term), jnp.float32),
            "counts": jnp.zeros((self.num_timesteps,), jnp.int32),
        }

    def weights(self, state=None):
        if state is None:
            return jnp.ones((self.num_timesteps,), jnp.float32)
        warmed = jnp.all(state["counts"] >= self.history_per_term)
        w = jnp.sqrt(jnp.mean(state["history"] ** 2, axis=-1))
        w = w / jnp.clip(jnp.sum(w), 1e-12)
        w = w * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        uniform = jnp.ones((self.num_timesteps,), jnp.float32) / self.num_timesteps
        return jnp.where(warmed, w, uniform)

    def update_state(self, state, ts: jnp.ndarray, losses: jnp.ndarray):
        """Insert per-sample losses into the ring-buffer history (scan over batch)."""

        def body(carry, inp):
            history, counts = carry
            t, loss = inp
            slot = jnp.mod(counts[t], self.history_per_term)
            history = history.at[t, slot].set(loss)
            counts = counts.at[t].add(1)
            return (history, counts), None

        (history, counts), _ = jax.lax.scan(
            body, (state["history"], state["counts"]), (ts, losses)
        )
        return {"history": history, "counts": counts}


def create_named_schedule_sampler(name: str, diffusion):
    if name == "uniform":
        return UniformSampler(diffusion)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(diffusion)
    raise NotImplementedError(f"unknown schedule sampler: {name}")
