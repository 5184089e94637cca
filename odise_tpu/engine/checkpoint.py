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
"""

from __future__ import annotations

import logging
import os
import pickle
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
    """Save/load train state; frozen towers excluded from disk.

    ``backend="pickle"`` (default) writes single-file .ckpt pickles;
    ``backend="orbax"`` uses orbax-checkpoint directories (async-capable,
    cloud-storage friendly).
    """

    def __init__(self, save_dir: str, max_to_keep: int = 2,
                 backend: str = "pickle"):
        assert backend in ("pickle", "orbax")
        self.save_dir = save_dir
        self.max_to_keep = max_to_keep
        self.backend = backend
        os.makedirs(save_dir, exist_ok=True)

    def _path(self, name: str) -> str:
        suffix = ".orbax" if self.backend == "orbax" else ".ckpt"
        return os.path.join(self.save_dir, f"{name}{suffix}")

    def save(self, name: str, params, opt_state=None, step: int = 0,
             extra: Optional[Dict[str, Any]] = None) -> str:
        trainable, _ = split_frozen(params)
        payload = {
            "params": trainable,
            "opt_state": jax.tree_util.tree_map(np.asarray, opt_state)
            if opt_state is not None else None,
            "step": step,
            "extra": extra or {},
        }
        path = self._path(name)
        if self.backend == "orbax":
            import orbax.checkpoint as ocp

            ckptr = ocp.PyTreeCheckpointer()
            ckptr.save(os.path.abspath(path),
                       {"params": payload["params"], "step": step,
                        "extra": payload["extra"]},
                       force=True)
            if payload["opt_state"] is not None:
                with open(os.path.join(path, "opt_state.pkl"), "wb") as f:
                    pickle.dump(payload["opt_state"], f, protocol=4)
        else:
            with open(path + ".tmp", "wb") as f:
                pickle.dump(payload, f, protocol=4)
            os.replace(path + ".tmp", path)
        self._write_last(name)
        self._gc()
        logger.info("Saved checkpoint to %s", path)
        return path

    def _write_last(self, name: str):
        with open(os.path.join(self.save_dir, "last_checkpoint"), "w") as f:
            f.write(name)

    def _gc(self):
        suffix = ".orbax" if self.backend == "orbax" else ".ckpt"
        ckpts = sorted(
            (f for f in os.listdir(self.save_dir) if f.endswith(suffix)),
            key=lambda f: os.path.getmtime(os.path.join(self.save_dir, f)))
        keep_always = {f"model_final{suffix}", f"model_best{suffix}"}
        removable = [c for c in ckpts if c not in keep_always]
        import shutil

        while len(removable) > self.max_to_keep:
            victim = os.path.join(self.save_dir, removable.pop(0))
            if os.path.isdir(victim):
                shutil.rmtree(victim)
            else:
                os.remove(victim)

    def has_checkpoint(self) -> bool:
        return os.path.isfile(os.path.join(self.save_dir, "last_checkpoint"))

    def get_checkpoint_file(self) -> Optional[str]:
        try:
            with open(os.path.join(self.save_dir, "last_checkpoint")) as f:
                return self._path(f.read().strip())
        except FileNotFoundError:
            return None

    def load(self, path: str, init_params) -> Tuple[dict, Any, int, dict]:
        """Restore trainable params over the given init (frozen kept)."""
        if os.path.isdir(path):  # orbax directory
            import orbax.checkpoint as ocp

            ckptr = ocp.PyTreeCheckpointer()
            restored = ckptr.restore(os.path.abspath(path))
            payload = {"params": restored["params"],
                       "step": int(restored.get("step", 0)),
                       "extra": restored.get("extra", {}),
                       "opt_state": None}
            opt_pkl = os.path.join(path, "opt_state.pkl")
            if os.path.isfile(opt_pkl):
                with open(opt_pkl, "rb") as f:
                    payload["opt_state"] = pickle.load(f)
        else:
            with open(path, "rb") as f:
                payload = pickle.load(f)
        params = merge_params(init_params, payload["params"])
        self._report_missing(init_params, payload["params"])
        return params, payload.get("opt_state"), payload.get("step", 0), payload.get("extra", {})

    def resume_or_load(self, path: Optional[str], init_params, resume: bool):
        """resume=True: prefer last checkpoint in save_dir; else load path."""
        if resume and self.has_checkpoint():
            return self.load(self.get_checkpoint_file(), init_params)
        if path:
            return self.load(path, init_params)
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
