"""Worker process for the 2-process multi-host eval test.

Launched by tests/test_multihost.py as a real OS process. Joins a
jax.distributed CPU cluster on localhost (the JAX counterpart of the
reference's d2 ``launch`` TCP rendezvous, reference tools/train_net.py:
392-399), then runs train_net.do_test — which shards the val set across
processes and merges evaluator statistics — and writes its merged metrics
as JSON.

Usage: python multihost_eval_worker.py <process_id> <num_processes> <port>
       <records_pkl> <out_json>
"""

import json
import pickle
import sys


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    records_pkl, out_json = sys.argv[4], sys.argv[5]

    import jax

    # sitecustomize re-selects the axon TPU backend from env; config.update
    # is the reliable CPU pin (tests/conftest.py does the same)
    jax.config.update("jax_platforms", "cpu")

    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
    from odise_tpu.parallel.multihost import initialize_multihost

    # the production rendezvous path (includes the warm-up collective that
    # establishes the Gloo context while ranks are still in lockstep)
    assert initialize_multihost(coordinator_address=f"localhost:{port}",
                                num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs

    import os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax.numpy as jnp

    import train_net

    from odise_tpu.config import ConfigDict
    from odise_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from odise_tpu.data.synthetic import SYNTH_LABELS, synth_categories
    from odise_tpu.model_zoo.factory import build_category_odise

    with open(records_pkl, "rb") as f:
        records = pickle.load(f)

    name = "_mh_eval_synth"
    DatasetCatalog.register(name, lambda: records)
    MetadataCatalog.get(name).set(ignore_label=255,
                                  categories=synth_categories())

    model = build_category_odise("tiny", train_labels=SYNTH_LABELS,
                                 with_clip_head=False, use_checkpoint=False,
                                 slide_training=False)
    # same PRNG seed on every process -> identical params everywhere
    # (the reference broadcasts rank-0 weights via DDP; JAX determinism
    # makes the broadcast unnecessary here)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((len(SYNTH_LABELS), 16)), method=type(model).init_full)

    cfg = ConfigDict(
        dataloader=ConfigDict(
            wrapper=ConfigDict(
                labels=[list(l) for l in SYNTH_LABELS],
                dataset_name=name,
                semantic_on=True, panoptic_on=True, instance_on=True,
            ),
            eval_short_side=64,
            eval_max_size=128,
        ),
    )
    results = train_net.do_test(cfg, model, variables)
    out = {k: float(v) for k, v in results["main"].items()
           if isinstance(v, (int, float))}
    with open(out_json, "w") as f:
        json.dump(out, f)
    # rendezvous before exit: post-merge metric derivation is per-host work
    # and can skew by minutes on an oversubscribed test box; exiting together
    # keeps both ranks inside the runtime's shutdown-barrier window
    from odise_tpu.parallel.multihost import sync_global_devices

    sync_global_devices("worker_exit")
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
