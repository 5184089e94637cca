"""Multi-host helpers (single-process degenerate path).

The multi-process path follows the documented JAX runtime contract
(jax.distributed.initialize + make_array_from_process_local_data); a
single-host CI image can only execute the process_count()==1 behavior, which
must be bit-identical to the plain local path (reference counterpart: d2
comm.py degenerates the same way when world_size == 1).
"""

import jax
import numpy as np

from odise_tpu.parallel.mesh import batch_sharding, create_mesh
from odise_tpu.parallel.multihost import (
    global_batch_from_local, initialize_multihost, is_main_process,
    sync_global_devices)


def test_initialize_noop_without_optin(monkeypatch):
    monkeypatch.delenv("ODISE_TPU_MULTIHOST", raising=False)
    assert initialize_multihost() is False
    assert is_main_process()
    sync_global_devices("noop")  # must not block single-process


def test_global_batch_matches_device_put():
    mesh = create_mesh(data=8, model=1)
    batch = {
        "image": np.random.RandomState(0).rand(8, 16, 16, 3).astype(np.float32),
        "gt_labels": np.arange(8 * 4, dtype=np.int32).reshape(8, 4),
        "gt_valid": np.ones((8, 4), bool),
    }
    got = global_batch_from_local(batch, mesh)
    bs = batch_sharding(mesh)
    for k, v in batch.items():
        ref = jax.device_put(v, bs)
        assert got[k].sharding == bs or got[k].sharding.is_equivalent_to(
            bs, v.ndim)
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref))


def test_global_batch_feeds_jit():
    mesh = create_mesh(data=8, model=1)
    batch = {"x": np.ones((8, 4), np.float32)}
    got = global_batch_from_local(batch, mesh)
    assert float(jax.jit(lambda b: b["x"].sum())(got)) == 32.0
