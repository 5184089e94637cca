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


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 1.0) -> str | None:
    """Opt into JAX's persistent compilation cache.

    On a real TPU VM this amortizes the multi-minute trunk/train-step
    compiles across process restarts (resume after preemption pays ~0
    compile). Enabled when ``ODISE_TPU_COMPILE_CACHE`` names a directory or
    ``path`` is given; off by default because some remote-compile relays
    serve executables the client cannot serialize.
    """
    path = path or os.environ.get("ODISE_TPU_COMPILE_CACHE")
    if not path:
        return None
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
