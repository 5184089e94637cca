"""Worker process for the 2-process multi-host TRAIN test.

Launched by tests/test_multihost.py as a real OS process. Joins a
jax.distributed CPU cluster on localhost (the JAX counterpart of the
reference's d2 ``launch`` TCP rendezvous + 4-node DDP train, reference
tools/train_net.py:392-399, GETTING_STARTED.md:58-62), then runs the REAL
multi-process train path: initial params loaded from the parent's pickle
(the rank-0 broadcast analog — re-init would be seeded-identical but costs
a 2-min compile per worker on this box), params placed on the global
spanning mesh, per-process local batch halves assembled into a global batch
via ``global_batch_from_local`` (i.e. ``jax.make_array_from_process_local_
data``), and ``make_category_train_step`` jitted over the mesh — XLA
inserts the cross-process gradient psum that DDP's NCCL all-reduce did.

After N steps it writes its metrics and the (replicated) updated trainable
params so the parent can assert equality with a single-process oracle.

Usage: python multihost_train_worker.py <process_id> <num_processes> <port>
       <steps> <params_pkl> <out_pkl>
"""

import pickle
import sys


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    steps, params_pkl, out_pkl = int(sys.argv[4]), sys.argv[5], sys.argv[6]

    import jax

    # sitecustomize re-selects the axon TPU backend from env; config.update
    # is the reliable CPU pin (tests/conftest.py does the same)
    jax.config.update("jax_platforms", "cpu")

    import os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from odise_tpu.parallel.multihost import (
        global_batch_from_local, initialize_multihost)

    assert initialize_multihost(coordinator_address=f"localhost:{port}",
                                num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == nprocs  # one CPU device per process

    from odise_tpu.parallel.mesh import create_mesh, shard_params
    from tests.multihost_train_common import (
        STEPS_RNG_SEED, build_step, make_global_batch, make_model,
        params_to_np)

    # the data axis SPANS both processes — this is the scale-out contract
    mesh = create_mesh(data=len(jax.devices()), model=1)

    model, text_embed_raw = make_model()
    with open(params_pkl, "rb") as f:
        params_np = pickle.load(f)
    # shard_params places the identical host tree on the GLOBAL mesh
    # (replicated), exactly like tools/train_net.py::do_train
    full_params = shard_params(params_np, mesh)
    state, step = build_step(model, text_embed_raw, full_params, mesh=mesh)

    rng = jax.random.PRNGKey(STEPS_RNG_SEED)
    metrics = None
    for i in range(steps):
        full_batch = make_global_batch(step_idx=i)
        # each process feeds ONLY its local slice of the global batch
        local = {k: v[pid::nprocs] for k, v in full_batch.items()}
        batch = global_batch_from_local(local, mesh)
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        print(f"worker {pid} step {i} done", flush=True)

    out = {
        "metrics": {k: float(v) for k, v in metrics.items()},
        "params": params_to_np(state.params),
    }
    with open(out_pkl, "wb") as f:
        pickle.dump(out, f)

    from odise_tpu.parallel.multihost import sync_global_devices

    sync_global_devices("train_worker_exit")
    print(f"train worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
