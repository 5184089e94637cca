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


def test_gather_pickled_single_process():
    from odise_tpu.parallel.multihost import gather_pickled

    obj = {"a": np.arange(3), "b": "text"}
    out = gather_pickled(obj)
    assert len(out) == 1
    np.testing.assert_array_equal(out[0]["a"], obj["a"])


def test_two_process_train_matches_single_process(tmp_path):
    """Real multi-host TRAIN: two OS processes join a jax.distributed CPU
    cluster, assemble global batches from per-process halves
    (``global_batch_from_local`` -> ``make_array_from_process_local_data``)
    and run ``make_category_train_step`` over a mesh SPANNING both
    processes. XLA's cross-process gradient psum must reproduce the
    single-process oracle exactly-ish: merged metrics equal and updated
    trainable params equal (reference 4-node DDP train semantics,
    /root/reference/tools/train_net.py:392-399).
    """
    import os
    import pickle
    import socket
    import subprocess
    import sys

    import jax

    from tests.multihost_train_common import (
        STEPS_RNG_SEED, build_step, init_params_np, make_global_batch,
        make_model, params_to_np)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    steps = 3

    # init ONCE in the parent (a ~2 min compile on this 1-core box) and run
    # the single-process oracle BEFORE spawning the workers, so the workers
    # never contend with anything but each other
    model, text_embed_raw = make_model()
    params_np = init_params_np(model, text_embed_raw)
    params_pkl = str(tmp_path / "init_params.pkl")
    with open(params_pkl, "wb") as f:
        pickle.dump(params_np, f)

    state, step = build_step(model, text_embed_raw, params_np)
    rng = jax.random.PRNGKey(STEPS_RNG_SEED)
    for i in range(steps):
        batch = {k: jax.numpy.asarray(v)
                 for k, v in make_global_batch(step_idx=i).items()}
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    oracle_metrics = {k: float(v) for k, v in metrics.items()}
    oracle_params = params_to_np(state.params)

    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_train_worker.py")
    env = dict(os.environ)
    env.pop("ODISE_TPU_MULTIHOST", None)
    # one CPU device per process: the mesh's data axis maps 1:1 onto
    # processes, so the gradient psum MUST cross the process boundary
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    outs = [str(tmp_path / f"train{i}.pkl") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), str(steps),
         params_pkl, outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    tails = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            tails.append(out.decode(errors="replace")[-2000:])
    finally:
        for p in procs:  # never leak workers onto this 1-core box
            if p.poll() is None:
                p.kill()
                p.wait()
    for p, tail in zip(procs, tails):
        assert p.returncode == 0, tail

    flat_oracle = jax.tree_util.tree_leaves_with_path(oracle_params)
    for out_path in outs:
        with open(out_path, "rb") as f:
            got = pickle.load(f)
        # params actually moved during the run (the step did real work)
        g0 = jax.tree_util.tree_leaves(got["params"])[0]
        assert np.isfinite(g0).all()
        for k, v in oracle_metrics.items():
            np.testing.assert_allclose(
                got["metrics"][k], v, rtol=2e-4, atol=1e-6,
                err_msg=f"metric {k}: 2-process={got['metrics'][k]} "
                        f"oracle={v}")
        flat_got = jax.tree_util.tree_leaves_with_path(got["params"])
        assert len(flat_got) == len(flat_oracle)
        for (pth, a), (_, b) in zip(flat_got, flat_oracle):
            np.testing.assert_allclose(
                a, b, rtol=2e-4, atol=1e-6,
                err_msg=f"param {jax.tree_util.keystr(pth)} diverged")


def test_two_process_eval_sharding_matches_single_process(tmp_path):
    """Real multi-host eval: two OS processes join a jax.distributed CPU
    cluster, each evaluates HALF the synthetic val set, and the merged
    metrics from BOTH processes must equal a single-process evaluation of
    the full set (reference DDP eval semantics, tools/train_net.py:126-135).
    """
    import json
    import os
    import pickle
    import socket
    import subprocess
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import train_net

    from odise_tpu.config import ConfigDict
    from odise_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from odise_tpu.data.synthetic import (
        SYNTH_LABELS, make_shapes_records, synth_categories)
    from odise_tpu.model_zoo.factory import build_category_odise

    records = make_shapes_records(str(tmp_path / "val"), 4, size=64, seed=7)
    records_pkl = str(tmp_path / "records.pkl")
    with open(records_pkl, "wb") as f:
        pickle.dump(records, f)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_eval_worker.py")
    env = dict(os.environ)
    env.pop("ODISE_TPU_MULTIHOST", None)
    procs = []
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    for i in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port),
             records_pkl, outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    tails = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        tails.append(out.decode(errors="replace")[-2000:])
    for p, tail in zip(procs, tails):
        assert p.returncode == 0, tail

    # single-process oracle over the FULL set (this pytest process)
    name = "_mh_eval_oracle"
    DatasetCatalog.remove(name)
    DatasetCatalog.register(name, lambda: records)
    MetadataCatalog.get(name).set(ignore_label=255,
                                  categories=synth_categories())
    import jax
    import jax.numpy as jnp

    model = build_category_odise("tiny", train_labels=SYNTH_LABELS,
                                 with_clip_head=False, use_checkpoint=False,
                                 slide_training=False)
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
    oracle = {k: float(v) for k, v in train_net.do_test(
        cfg, model, variables)["main"].items() if isinstance(v, (int, float))}
    DatasetCatalog.remove(name)

    skip_keys = {"s_per_img"}  # timing is per-host, not mergeable
    for out_path in outs:
        with open(out_path) as f:
            got = json.load(f)
        assert got["images"] == oracle["images"] == 4
        for k, v in oracle.items():
            if k in skip_keys:
                continue
            np.testing.assert_allclose(
                got[k], v, rtol=1e-5, atol=1e-7,
                err_msg=f"metric {k} diverged: merged={got[k]} oracle={v}")
