"""Batch preprocessing utilities.

Capability parity with reference odise/modeling/preprocess.py:15-37
(``batched_input_to_device`` for nested dict/list/tensor batches).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def batched_input_to_device(batched_inputs: Any, device=None, sharding=None):
    """Recursively move nested dict/list/array batches to a device/sharding."""
    placement = sharding if sharding is not None else device

    def _move(x):
        if isinstance(x, (np.ndarray, jax.Array)):
            return jax.device_put(x, placement) if placement is not None else x
        return x

    return jax.tree_util.tree_map(_move, batched_inputs)
