"""Engine tests: hook semantics, optimizer masking, LR schedule."""

import numpy as np

import jax
import jax.numpy as jnp

from odise_tpu.engine.hooks import EvalHook, IterationTimer, PeriodicWriter
from odise_tpu.engine.optimizer import make_optimizer, make_trainable_mask, multistep_lr
from odise_tpu.utils.events import EventStorage


def test_eval_hook_period_and_final_dedup():
    calls = []

    def eval_fn(final_iter, next_iter):
        calls.append((final_iter, next_iter))

    hook = EvalHook(period=2, eval_fn=eval_fn, max_iter=6)
    for it in range(6):
        hook(it, None, {})
    # periods at 2, 4 (in-loop, final_iter=False); 6 == max_iter -> only the
    # after-train eval runs (reference hooks.py:55-68 skip-duplicate)
    assert calls == [(False, 2), (False, 4), (True, 6)]


def test_iteration_timer_and_writer():
    storage = EventStorage()
    timer = IterationTimer()
    writer_calls = []

    class W:
        def write(self, s):
            writer_calls.append(s.iter)

    pw = PeriodicWriter([W()], storage, period=2)
    for it in range(4):
        metrics = {"loss": float(it)}
        timer(it, None, metrics)
        pw(it, None, metrics)
    assert len(writer_calls) == 2
    assert storage.iter == 4


def test_multistep_lr_values():
    sched = multistep_lr(1e-4, milestones=[10, 20], gamma=0.1, warmup_steps=5,
                         warmup_factor=0.0)
    np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(sched(5)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(15)), 1e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(25)), 1e-6, rtol=1e-6)


def test_optimizer_masks_frozen_params():
    params = {
        "decoder": {"w": jnp.ones((4, 4))},
        "unet": {"w": jnp.ones((4, 4))},
    }
    mask = make_trainable_mask(params)
    assert mask["decoder"]["w"] and not mask["unet"]["w"]
    tx = make_optimizer(params, lr=0.1, grad_clip=0.0, weight_decay=0.0)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["decoder"]["w"]).sum()) > 0
    np.testing.assert_allclose(np.asarray(updates["unet"]["w"]), 0.0)


def test_persistent_compilation_cache(tmp_path, monkeypatch):
    """enable_compilation_cache writes executables to the named directory
    (reference counterpart: none — d2 recompiles nothing, but our trunk
    compiles are minutes; resume-after-preemption should not re-pay them)."""
    from odise_tpu.engine.defaults import enable_compilation_cache

    cache_dir = tmp_path / "jaxcache"
    monkeypatch.setenv("ODISE_TPU_COMPILE_CACHE", str(cache_dir))
    assert enable_compilation_cache(min_compile_secs=0.0) == str(cache_dir)
    try:
        f = jax.jit(lambda x: jnp.sin(x) @ x.T)
        x = np.ones((256, 256), np.float32)
        np.testing.assert_allclose(np.asarray(f(x)), np.sin(x) @ x.T,
                                   rtol=1e-5)
        entries = list(cache_dir.iterdir())
        assert entries, "no cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
