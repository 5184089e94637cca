"""Default setup: dirs, loggers, env dump, config backup, seed.

Capability parity with reference odise/engine/defaults.py:44-100.
"""

from __future__ import annotations

import logging
import os

import numpy as np

from ..config import save_config
from ..utils.collect_env import collect_env_info
from ..utils.logging import setup_logger

logger = logging.getLogger(__name__)


DEFAULT_COMPILE_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "odise_tpu", "jaxcache")

_CACHE_OFF = ("0", "off", "none", "disable", "disabled")


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 1.0) -> str | None:
    """JAX's persistent compilation cache, ON by default.

    Amortizes the multi-minute trunk/train-step compiles across process
    restarts (resume after preemption pays ~0 compile); measured to work
    through the axon remote-compile relay too (a 4.8MB serialized TPU
    executable round-trips and reloads — NOTES.md round 4). Resolution:
    ``path`` arg > ``ODISE_TPU_COMPILE_CACHE`` env (a directory, or
    0/off/none to disable) > ``~/.cache/odise_tpu/jaxcache``.
    """
    env = os.environ.get("ODISE_TPU_COMPILE_CACHE")
    if path is None:
        if env is not None and env.strip().lower() in _CACHE_OFF:
            return None
        path = env or DEFAULT_COMPILE_CACHE
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every graph that took noticeable compile time, not just huge ones
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    if min_compile_secs <= 0:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    logger.info("persistent compilation cache at %s", path)
    return path


def default_setup(cfg, args=None) -> None:
    output_dir = cfg.train.output_dir
    os.makedirs(output_dir, exist_ok=True)
    setup_logger(output_dir)
    enable_compilation_cache()
    logger.info("Environment info:\n%s", collect_env_info())
    if args is not None:
        logger.info("Command line arguments: %s", args)
    save_config(cfg, os.path.join(output_dir, "config.yaml"))
    logger.info("Full config saved to %s", os.path.join(output_dir, "config.yaml"))
    seed = cfg.train.get("seed", 42)
    np.random.seed(seed)


def get_model_from_module(model):
    """Identity on TPU (no DDP wrapper to unwrap); kept for API parity."""
    return model
