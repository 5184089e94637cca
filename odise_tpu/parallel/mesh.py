"""Device mesh and sharding rules.

The reference's only parallelism is DDP over NCCL (SURVEY.md section 2.5);
the TPU-native equivalent is a ``jax.sharding.Mesh`` with the batch sharded
over a ``data`` axis — XLA inserts the gradient psum automatically. On top of
that (beyond reference scope, for HBM headroom on v5e) the large *frozen*
tower weights can be sharded over a ``model`` axis; XLA all-gathers them
on demand over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(data: int = -1, model: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    """Create a (data, model) mesh. data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# param-path keywords identifying frozen towers whose weights may be sharded
# over the model axis (they are read-only; XLA all-gathers on use).
FROZEN_TOWER_KEYWORDS = ("vae", "unet", "sd_text", "clip_visual", "_text_enc",
                         "text_encoder", "clip_head")


def is_frozen_path(path: Tuple[str, ...]) -> bool:
    return any(any(k in comp for k in FROZEN_TOWER_KEYWORDS) for comp in path)


def param_sharding_rule(path: Tuple[str, ...], leaf, mesh: Mesh) -> NamedSharding:
    """Frozen 2D+ kernels: shard the last dim over ``model`` when divisible;
    everything else replicated."""
    model_size = mesh.shape[MODEL_AXIS]
    if (model_size > 1 and is_frozen_path(path) and hasattr(leaf, "ndim")
            and leaf.ndim >= 2 and leaf.shape[-1] % model_size == 0
            and leaf.shape[-1] >= 2 * model_size):
        spec = [None] * (leaf.ndim - 1) + [MODEL_AXIS]
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Apply param_sharding_rule over a param pytree (dict-of-dicts)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def _place(path, leaf):
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        return jax.device_put(leaf, param_sharding_rule(keys, leaf, mesh))

    return jax.tree_util.tree_map_with_path(
        lambda p, l: _place(p, l), params)
