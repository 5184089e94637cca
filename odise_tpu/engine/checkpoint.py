"""Checkpointing with frozen-tower exclusion (Orbax-backed).

Capability parity with ``ODISECheckpointer`` (reference
odise/checkpoint/odise_checkpointer.py:54-141): frozen submodels (SD, CLIP)
are excluded from checkpoints — ODISE checkpoints carry only the ~28M
trainable params — and load reports group missing keys by common prefix.
``resume_or_load`` / ``has_checkpoint_in_dir`` semantics match the reference
(tools/train_net.py:300-306).

Design: a param leaf is "frozen" iff its path matches
``parallel.mesh.is_frozen_path``; save() strips those leaves, load() restores
them from the in-memory init (they are re-fetched from original sources by
the converter, mirroring the reference re-downloading SD/CLIP).

Backends: ``orbax`` (default) writes a ``<name>.orbax/`` directory holding
two orbax pytree checkpoints — ``state`` (trainable params + step + extra)
and ``opt`` (the optax state, restored into a caller-provided target tree so
namedtuple structure survives). Saves are asynchronous: ``save()`` enqueues
and returns; bookkeeping (last_checkpoint pointer, GC) is deferred until the
write is durable, and any read path waits for in-flight writes first.
``pickle`` is the single-file fallback; legacy round-1 layouts (pickle .ckpt,
orbax-with-opt_state.pkl) still load.
"""

from __future__ import annotations

import logging
import os
import pickle
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..parallel.mesh import is_frozen_path

logger = logging.getLogger(__name__)


def _path_keys(path) -> Tuple[str, ...]:
    return tuple(getattr(k, "key", str(k)) for k in path)


def split_frozen(params) -> Tuple[dict, dict]:
    """Return (trainable_only, frozen_only) pytrees with None placeholders."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    trainable = {}
    frozen = {}
    for path, leaf in flat[0]:
        keys = _path_keys(path)
        target = frozen if is_frozen_path(keys) else trainable
        node = target
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = np.asarray(leaf)
    return trainable, frozen


def merge_params(base: dict, override: dict) -> dict:
    """Deep-merge override into a copy of base."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_params(out[k], v)
        else:
            out[k] = v
    return out


class Checkpointer:
    """Save/load train state; frozen towers excluded from disk."""

    def __init__(self, save_dir: str, max_to_keep: int = 2,
                 backend: str = "orbax", async_save: bool = True):
        assert backend in ("pickle", "orbax")
        self.save_dir = save_dir
        self.max_to_keep = max_to_keep
        self.backend = backend
        self.async_save = async_save and backend == "orbax"
        self._pending: Optional[str] = None  # name with an in-flight write
        self._state_ckptr = None
        self._opt_ckptr = None
        os.makedirs(save_dir, exist_ok=True)

    # -- orbax plumbing -----------------------------------------------------
    def _ckptrs(self):
        if self._state_ckptr is None:
            import orbax.checkpoint as ocp

            self._state_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            self._opt_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        return self._state_ckptr, self._opt_ckptr

    def wait(self):
        """Block until any in-flight async save is durable, then finalize."""
        if self._pending is None:
            return
        state_ckptr, opt_ckptr = self._ckptrs()
        state_ckptr.wait_until_finished()
        opt_ckptr.wait_until_finished()
        name, self._pending = self._pending, None
        self._finalize(name)

    def _finalize(self, name: str):
        self._write_last(name)
        self._gc()

    def _path(self, name: str) -> str:
        suffix = ".orbax" if self.backend == "orbax" else ".ckpt"
        return os.path.join(self.save_dir, f"{name}{suffix}")

    # -- save ----------------------------------------------------------------
    def save(self, name: str, params, opt_state=None, step: int = 0,
             extra: Optional[Dict[str, Any]] = None) -> str:
        trainable, _ = split_frozen(params)
        opt_host = (jax.tree_util.tree_map(np.asarray, opt_state)
                    if opt_state is not None else None)
        path = self._path(name)
        if self.backend == "orbax":
            self.wait()  # at most one save in flight
            state_ckptr, opt_ckptr = self._ckptrs()
            state_tree = {"params": trainable, "step": step}
            if extra:
                state_tree["extra"] = dict(extra)
            os.makedirs(path, exist_ok=True)
            state_ckptr.save(os.path.abspath(os.path.join(path, "state")),
                             state_tree, force=True)
            if opt_host is not None:
                opt_ckptr.save(os.path.abspath(os.path.join(path, "opt")),
                               opt_host, force=True)
            self._pending = name
            if not self.async_save:
                self.wait()
        else:
            payload = {"params": trainable, "opt_state": opt_host,
                       "step": step, "extra": extra or {}}
            with open(path + ".tmp", "wb") as f:
                pickle.dump(payload, f, protocol=4)
            os.replace(path + ".tmp", path)
            self._finalize(name)
        logger.info("Saved checkpoint to %s%s", path,
                    " (async)" if self._pending else "")
        return path

    def _write_last(self, name: str):
        with open(os.path.join(self.save_dir, "last_checkpoint"), "w") as f:
            f.write(name)

    def _gc(self):
        ckpts = sorted(
            (f for f in os.listdir(self.save_dir)
             if f.endswith(".ckpt") or f.endswith(".orbax")),
            key=lambda f: os.path.getmtime(os.path.join(self.save_dir, f)))
        keep_always = {"model_final.ckpt", "model_best.ckpt",
                       "model_final.orbax", "model_best.orbax"}
        removable = [c for c in ckpts if c not in keep_always]
        while len(removable) > self.max_to_keep:
            victim = os.path.join(self.save_dir, removable.pop(0))
            if os.path.isdir(victim):
                shutil.rmtree(victim)
            else:
                os.remove(victim)

    # -- load ----------------------------------------------------------------
    def has_checkpoint(self) -> bool:
        self.wait()
        return os.path.isfile(os.path.join(self.save_dir, "last_checkpoint"))

    def get_checkpoint_file(self) -> Optional[str]:
        self.wait()
        try:
            with open(os.path.join(self.save_dir, "last_checkpoint")) as f:
                name = f.read().strip()
        except FileNotFoundError:
            return None
        # the pointer is backend-agnostic: prefer whichever file exists
        for suffix in (".orbax", ".ckpt"):
            p = os.path.join(self.save_dir, f"{name}{suffix}")
            if os.path.exists(p):
                return p
        return self._path(name)

    def load(self, path: str, init_params,
             init_opt_state=None) -> Tuple[dict, Any, int, dict]:
        """Restore trainable params over the given init (frozen kept).

        ``init_opt_state``: optional optax-state target tree; when given and
        the checkpoint carries an optimizer state, it is restored INTO that
        structure (namedtuples preserved).
        """
        self.wait()
        if os.path.isdir(path):  # orbax layouts
            import orbax.checkpoint as ocp

            ckptr = ocp.PyTreeCheckpointer()
            state_dir = os.path.join(path, "state")
            if os.path.isdir(state_dir):
                restored = ckptr.restore(os.path.abspath(state_dir))
                opt = None
                opt_dir = os.path.join(path, "opt")
                if os.path.isdir(opt_dir):
                    if init_opt_state is not None:
                        opt = ckptr.restore(os.path.abspath(opt_dir),
                                            item=init_opt_state)
                    else:
                        logger.warning(
                            "Checkpoint has an optimizer state but no target "
                            "tree was provided; skipping opt_state restore")
            else:  # legacy round-1 orbax layout
                restored = ckptr.restore(os.path.abspath(path))
                opt = None
                opt_pkl = os.path.join(path, "opt_state.pkl")
                if os.path.isfile(opt_pkl):
                    with open(opt_pkl, "rb") as f:
                        opt = pickle.load(f)
            payload = {"params": restored["params"],
                       "step": int(restored.get("step", 0)),
                       "extra": dict(restored.get("extra", {}) or {}),
                       "opt_state": opt}
        else:
            with open(path, "rb") as f:
                payload = pickle.load(f)
        params = merge_params(init_params, payload["params"])
        self._report_missing(init_params, payload["params"])
        return (params, payload.get("opt_state"), payload.get("step", 0),
                payload.get("extra", {}))

    def resume_or_load(self, path: Optional[str], init_params, resume: bool,
                       init_opt_state=None):
        """resume=True: prefer last checkpoint in save_dir; else load path."""
        if resume and self.has_checkpoint():
            return self.load(self.get_checkpoint_file(), init_params,
                             init_opt_state)
        if path:
            return self.load(path, init_params, init_opt_state)
        return init_params, None, 0, {}

    @staticmethod
    def _longest_common_prefix(names) -> str:
        """Common dotted prefix (fixes the d2 bug noted at
        odise_checkpointer.py:27-42)."""
        parts = [n.split(".") for n in names]
        if not parts:
            return ""
        m1, m2 = min(parts), max(parts)
        common = []
        for a, b in zip(m1, m2):
            if a != b:
                break
            common.append(a)
        return ".".join(common) + ("." if common else "")

    def _report_missing(self, init_params, loaded):
        def flatten(d, prefix=""):
            out = []
            for k, v in d.items():
                p = f"{prefix}{k}"
                if isinstance(v, dict):
                    out += flatten(v, p + ".")
                else:
                    out.append(p)
            return out

        init_keys = {k for k in flatten(init_params)
                     if not is_frozen_path(tuple(k.split(".")))}
        loaded_keys = set(flatten(loaded))
        missing = sorted(init_keys - loaded_keys)
        if missing:
            prefix = self._longest_common_prefix(missing)
            logger.warning("Missing %d trainable keys (common prefix %r)",
                           len(missing), prefix)
        unexpected = sorted(loaded_keys - init_keys)
        if unexpected:
            logger.warning("Unexpected keys in checkpoint: %s", unexpected[:10])


class BestCheckpointer:
    """Track a metric and keep model_best (reference tools/train_net.py:287-289)."""

    def __init__(self, checkpointer: Checkpointer, metric: str, mode: str = "max"):
        self.checkpointer = checkpointer
        self.metric = metric
        self.mode = mode
        self.best: Optional[float] = None

    def maybe_save(self, results: dict, params, opt_state=None, step: int = 0):
        value = results.get(self.metric)
        if value is None:
            return False
        better = (self.best is None or
                  (value > self.best if self.mode == "max" else value < self.best))
        if better:
            self.best = value
            self.checkpointer.save("model_best", params, opt_state, step,
                                   {"best_metric": value})
        return better
