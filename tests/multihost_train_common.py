"""Shared model/step/batch construction for the 2-process multi-host TRAIN
test: the worker processes and the single-process oracle must build
byte-identical programs, so the construction lives in one module.

The recipe is the real category train path (tiny scale): seeded init via
``init_full``, ``partition_params`` trainable/frozen split, AdamW with clip,
``make_category_train_step``. Parity contract: a global batch sharded over a
2-process mesh must produce the SAME metrics and updated params as the same
batch on one device (DDP grad-sync semantics, reference
tools/train_net.py:392-399).

Cost note (1-core box): ``model.init`` costs a ~2 min jit compile, so the
PARENT inits once and ships the numpy param tree to the workers via a pickle
file — each worker then only pays its own train-step compile. (JAX's seeded
determinism would make re-init identical anyway; this is purely a wall-clock
optimization, mirroring the reference's rank-0 weight broadcast.)
"""

import numpy as np

K_SYNTH = 3           # len(SYNTH_LABELS)
IMG_SIZE = 64
GLOBAL_BATCH = 2
MAX_INST = 4
DATA_SEED = 123
STEPS_RNG_SEED = 7


def make_global_batch(step_idx: int):
    """Deterministic full global batch for one step (numpy, host-side)."""
    rng = np.random.RandomState(DATA_SEED + step_idx)
    B, S, T = GLOBAL_BATCH, IMG_SIZE, MAX_INST
    return {
        "image": rng.rand(B, S, S, 3).astype(np.float32),
        "gt_labels": rng.randint(0, K_SYNTH, (B, T)).astype(np.int32),
        "gt_masks": (rng.rand(B, T, S, S) > 0.6).astype(np.float32),
        "gt_valid": np.ones((B, T), bool),
    }


def make_model():
    """Build (model, text_embed_raw) — cheap, no compile."""
    import jax.numpy as jnp

    from odise_tpu.data.synthetic import SYNTH_LABELS
    from odise_tpu.model_zoo.factory import build_category_odise

    model = build_category_odise("tiny", train_labels=SYNTH_LABELS,
                                 with_clip_head=False, use_checkpoint=False,
                                 slide_training=False)
    n_flat = sum(len(g) for g in SYNTH_LABELS)
    # non-trivial text embeds so the text-projection gradient path is live
    text_embed_raw = jnp.asarray(
        np.random.RandomState(5).rand(n_flat, 16).astype(np.float32))
    return model, text_embed_raw


def init_params_np(model, text_embed_raw):
    """Seeded init -> numpy param tree (the expensive jit compile; parent
    pays it ONCE and ships the result to the workers)."""
    import jax
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG_SIZE, IMG_SIZE, 3)),
        text_embed_raw, method=type(model).init_full)
    return jax.tree_util.tree_map(np.asarray, variables["params"])


def build_step(model, text_embed_raw, full_params, mesh=None):
    """``full_params`` (already placed: mesh-replicated for the workers,
    plain local arrays for the oracle) -> (TrainState, step_fn)."""
    import jax.numpy as jnp

    from odise_tpu.data.synthetic import SYNTH_LABELS
    from odise_tpu.engine.optimizer import make_optimizer
    from odise_tpu.engine.train_loop import (
        TrainState, make_category_train_step, partition_params)
    from odise_tpu.losses import CriterionConfig

    params, frozen = partition_params(full_params)
    tx = make_optimizer(params, lr=1e-3, milestones=(10_000,),
                        grad_clip=0.01)
    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    step = make_category_train_step(
        model, tx,
        CriterionConfig(num_classes=K_SYNTH, num_points=256),
        text_embed_raw=text_embed_raw, labels=SYNTH_LABELS, mesh=mesh,
        frozen_params=frozen, grad_clip=0.01)
    return state, step


def params_to_np(params):
    """Fetch a (replicated) param tree to host numpy, shard-locally."""
    import jax

    def fetch(a):
        if hasattr(a, "addressable_data"):
            return np.asarray(a.addressable_data(0))
        return np.asarray(a)

    return jax.tree_util.tree_map(fetch, params)
