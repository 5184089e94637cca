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


def default_setup(cfg, args=None) -> None:
    output_dir = cfg.train.output_dir
    os.makedirs(output_dir, exist_ok=True)
    setup_logger(output_dir)
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
