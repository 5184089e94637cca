"""Deferred metric fetches in the train loop (VERDICT r3 weak #2 / #9):
with log_period > 1 the host must dispatch steps without blocking on the
previous step's metrics (one device sync per window), while check_finite
still covers every step and hooks still fire per step in order."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odise_tpu.engine.train_loop import Trainer, TrainState


def _heavy_step(n_matmuls=40, size=256, nan_at=None):
    """A step whose device compute dominates its host dispatch."""

    @jax.jit
    def step(state, batch, rng):
        x = batch["x"]
        for _ in range(n_matmuls):
            x = jnp.tanh(x @ x)
        loss = jnp.sum(x * 0.0) + 1.0 + 0.0 * jnp.sum(x)
        if nan_at is not None:
            loss = jnp.where(state.step == nan_at, jnp.nan, loss)
        return (TrainState(state.step + 1, state.params, state.opt_state),
                {"total_loss": loss, "step_f": state.step.astype(jnp.float32)
                 if hasattr(state.step, "astype")
                 else jnp.float32(state.step)})

    return step


def _data_iter(ts):
    x = np.random.RandomState(0).rand(256, 256).astype(np.float32) * 0.1
    while True:
        ts.append(time.perf_counter())
        yield {"x": jnp.asarray(x)}


class _Scalar:
    """Metric value that records WHEN the host converts it (= the fetch)."""

    def __init__(self, value, events, tag):
        self.value, self.events, self.tag = value, events, tag

    def __float__(self):
        self.events.append(("fetch", self.tag))
        return float(self.value)


def test_deferred_fetch_does_not_block_dispatch():
    # Deterministic ordering test (wall-clock is meaningless on a contended
    # 1-core box): the only host<->device sync in the loop is the float()
    # conversion at flush, so recording conversion events vs dispatch events
    # proves the loop dispatches a full window before fetching anything.
    events = []

    def step(state, batch, rng):
        it = int(state.step)
        events.append(("dispatch", it))
        return (TrainState(state.step + 1, state.params, state.opt_state),
                {"total_loss": _Scalar(1.0, events, it),
                 "step_f": _Scalar(float(it), events, it)})

    ts = []
    tr = Trainer(step, TrainState(0, {}, {}), _data_iter(ts),
                 jax.random.PRNGKey(0), log_period=4)
    tr.train(0, 8)
    dispatches = [i for i, e in enumerate(events) if e[0] == "dispatch"]
    # window 1: steps 0-3 all dispatched before the first fetch
    first_fetch = next(i for i, e in enumerate(events) if e[0] == "fetch")
    assert dispatches[:4] == [0, 1, 2, 3] or all(
        d < first_fetch for d in dispatches[:4]), events[:10]
    assert events[dispatches[3]] == ("dispatch", 3)
    assert first_fetch > dispatches[3]
    # window 2 likewise: step 7's dispatch precedes any window-2 fetch
    w2_fetches = [i for i, e in enumerate(events)
                  if e[0] == "fetch" and e[1] >= 4]
    assert min(w2_fetches) > dispatches[7]
    assert len(tr.metrics_history) == 8
    # per-step metrics fetched correctly and in order
    np.testing.assert_array_equal(
        [m["step_f"] for m in tr.metrics_history], np.arange(8.0))


def test_hooks_fire_per_step_at_flush():
    seen = []
    ts = []
    tr = Trainer(_heavy_step(n_matmuls=1), TrainState(jnp.int32(0), {}, {}),
                 _data_iter(ts), jax.random.PRNGKey(0),
                 hooks=[lambda it, state, m: seen.append(it)], log_period=3)
    tr.train(0, 7)
    assert seen == list(range(7))


def test_check_finite_still_covers_every_step():
    ts = []
    tr = Trainer(_heavy_step(n_matmuls=1, nan_at=1),
                 TrainState(jnp.int32(0), {}, {}), _data_iter(ts),
                 jax.random.PRNGKey(0), log_period=4)
    with pytest.raises(FloatingPointError, match="iteration=1"):
        tr.train(0, 4)
    # step 0 was recorded before the failure surfaced
    assert len(tr.metrics_history) == 1
