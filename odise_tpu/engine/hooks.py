"""Training hooks.

Capability parity with the reference's hook surface (reference
odise/engine/hooks.py:23-69 EvalHook with final_iter/next_iter gating so
per-task eval periods and final-only tasks work, plus d2's timer / LR /
periodic-checkpoint hooks used at tools/train_net.py:279-297).

A hook is ``callable(iteration, state, metrics) -> None`` invoked after each
step by the Trainer.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Optional

logger = logging.getLogger(__name__)


class EvalHook:
    """Run ``eval_fn(final_iter, next_iter)`` every ``period`` iterations and
    at the end of training; skips the in-loop eval that would duplicate the
    final one (reference hooks.py:55-68)."""

    def __init__(self, period: int, eval_fn: Callable, max_iter: int,
                 eval_after_train: bool = True):
        self.period = period
        self.eval_fn = eval_fn
        self.max_iter = max_iter
        self.eval_after_train = eval_after_train

    def __call__(self, iteration: int, state, metrics) -> None:
        next_iter = iteration + 1
        if self.period > 0 and next_iter % self.period == 0:
            if next_iter != self.max_iter:
                self.eval_fn(final_iter=False, next_iter=next_iter)
        if self.eval_after_train and next_iter == self.max_iter:
            self.eval_fn(final_iter=True, next_iter=next_iter)


class PeriodicCheckpointer:
    def __init__(self, checkpointer, period: int, max_iter: int):
        self.checkpointer = checkpointer
        self.period = period
        self.max_iter = max_iter

    def __call__(self, iteration: int, state, metrics) -> None:
        import jax

        next_iter = iteration + 1
        if next_iter % self.period == 0 or next_iter == self.max_iter:
            name = ("model_final" if next_iter == self.max_iter
                    else f"model_{iteration:07d}")
            self.checkpointer.save(name, jax.device_get(state.params),
                                   jax.device_get(state.opt_state), next_iter)


class IterationTimer:
    """Per-iteration timing into metrics (reference tools/train_net.py:281)."""

    def __init__(self):
        self._last: Optional[float] = None

    def __call__(self, iteration: int, state, metrics) -> None:
        now = time.perf_counter()
        if self._last is not None:
            metrics["time"] = now - self._last
        self._last = now


class PeriodicWriter:
    def __init__(self, writers, storage, period: int = 20):
        self.writers = writers
        self.storage = storage
        self.period = period

    def __call__(self, iteration: int, state, metrics) -> None:
        self.storage.put_scalars(**{k: v for k, v in metrics.items()})
        if (iteration + 1) % self.period == 0:
            for w in self.writers:
                w.write(self.storage)
        self.storage.step()
