"""Open-vocabulary wrapper: bundle building + bound inference (tiny model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odise_tpu.model_zoo.factory import build_category_odise
from odise_tpu.models.odise import category_overlapping_mask
from odise_tpu.models.wrapper import OpenPanopticInference, build_open_vocabulary

TRAIN_LABELS = (("cat",), ("dog",), ("grass",))


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_category_odise("tiny", train_labels=TRAIN_LABELS,
                                 with_clip_head=True, use_checkpoint=False,
                                 slide_training=True)
    img = jnp.zeros((1, 64, 64, 3))
    text_raw = jnp.zeros((3, 16))
    variables = model.init(jax.random.PRNGKey(0), img, text_raw,
                           method=type(model).init_full)
    return model, variables


def test_category_overlap_mask():
    test_labels = (("cat", "kitty"), ("zebra",), ("grass",))
    m = category_overlapping_mask(TRAIN_LABELS, test_labels)
    np.testing.assert_array_equal(m, [1, 0, 1])


def test_build_vocab_and_infer(model_and_vars):
    model, variables = model_and_vars
    test_labels = [["cat", "kitty"], ["zebra"], ["grass"], ["sky"]]
    vocab = build_open_vocabulary(model, variables, test_labels,
                                  train_labels=TRAIN_LABELS,
                                  thing_mask=np.array([1, 1, 0, 0], bool))
    assert vocab.text_embed_raw.shape == (5, 16)  # 5 flat synonyms
    assert vocab.clip_text_embed is not None
    assert len(vocab.clip_labels) == 4
    np.testing.assert_array_equal(np.asarray(vocab.category_overlap), [1, 0, 1, 0])

    infer = OpenPanopticInference(model, variables, vocab)
    mask_cls, mask_pred = infer(jnp.full((1, 64, 64, 3), 0.5))
    assert mask_cls.shape == (1, model.num_queries, 5)  # K=4 + null
    assert mask_pred.shape == (1, model.num_queries, 64, 64)
    assert bool(jnp.isfinite(mask_cls).all())

    # a second vocabulary = a second independent bundle (functional swap)
    vocab2 = build_open_vocabulary(model, variables, [["dog"]],
                                   train_labels=TRAIN_LABELS,
                                   with_clip_head=False)
    infer2 = OpenPanopticInference(model, variables, vocab2)
    mask_cls2, _ = infer2(jnp.full((1, 64, 64, 3), 0.5))
    assert mask_cls2.shape == (1, model.num_queries, 2)


def test_sharded_eval_over_mesh(model_and_vars):
    """Eval forward with the batch sharded over all 8 virtual devices."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from odise_tpu.parallel.mesh import create_mesh, shard_params

    model, variables = model_and_vars
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(data=8, model=1, devices=devices[:8])

    params = shard_params(variables["params"], mesh)
    imgs = jax.device_put(np.full((8, 64, 64, 3), 0.5, np.float32),
                          NamedSharding(mesh, P("data")))
    text_raw = jax.device_put(np.zeros((3, 16), np.float32),
                              NamedSharding(mesh, P()))

    fn = jax.jit(lambda v, x, t: model.apply(
        v, x, t, TRAIN_LABELS, method=type(model).forward_eval))
    mask_cls, mask_pred = fn({"params": params}, imgs, text_raw)
    assert mask_cls.shape == (8, model.num_queries, 4)
    assert mask_pred.shape == (8, model.num_queries, 64, 64)
    # outputs stay sharded over data
    assert len(mask_cls.sharding.device_set) == 8


def test_multi_synonym_vocab_init_and_eval():
    """Regression: with multi-synonym train labels the flattened text-embed
    count exceeds the grouped logit width; init_full's dummy clip vocab and
    the eval ensemble must both use GROUP counts (found via demo vocab)."""
    import jax
    import jax.numpy as jnp

    from odise_tpu.model_zoo.factory import build_category_odise
    from odise_tpu.models.wrapper import (OpenPanopticInference,
                                          build_open_vocabulary)

    labels = (("cat", "kitty"), ("dog",), ("grass", "lawn", "turf"))
    flat = sum(len(g) for g in labels)
    assert flat != len(labels)
    model = build_category_odise(
        "tiny", train_labels=labels, with_clip_head=True,
        use_checkpoint=False, slide_training=False)
    img = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), img,
                           jnp.zeros((flat, 16)),
                           method=type(model).init_full)
    vocab = build_open_vocabulary(model, variables, labels)
    assert vocab.text_embed_raw.shape[0] == flat
    mc, mp = OpenPanopticInference(model, variables, vocab)(img)
    assert mc.shape[-1] == len(labels) + 1
    assert bool(jnp.isfinite(mc).all())


def test_eager_init_with_remat_then_jit_apply():
    """Regression: eager model.init with use_checkpoint=True used to leak
    init-time tracers out of the jax.checkpoint wrapper (conv kernels of
    the stride projections), crashing the next jit trace (found via demo)."""
    import functools

    import jax
    import jax.numpy as jnp

    from odise_tpu.model_zoo.factory import build_category_odise

    labels = (("a",), ("b",), ("c",))
    model = build_category_odise(
        "tiny", train_labels=labels, with_clip_head=False,
        use_checkpoint=True, slide_training=True)
    img = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), img, jnp.zeros((3, 16)),
                           method=type(model).init_full)  # eager, not jitted
    enc = jax.jit(functools.partial(model.apply,
                                    method=type(model).encode_vocab))
    out = enc(variables, jnp.zeros((2, 77), jnp.int32))
    assert out.shape == (2, 16)


def test_trunk_head_split_matches_fused_forward_eval(model_and_vars):
    """The trunk/head split (compile the expensive vocabulary-independent
    part once, re-bind vocabularies through a tiny head) must reproduce the
    fused forward_eval exactly — incl. the CLIP-head ensemble."""
    model, variables = model_and_vars
    test_labels = [["cat", "kitty"], ["zebra"], ["grass"]]
    vocab = build_open_vocabulary(model, variables, test_labels,
                                  train_labels=TRAIN_LABELS)
    img = jnp.asarray(
        np.random.RandomState(3).rand(1, 64, 64, 3), jnp.float32)

    fused_cls, fused_pred = model.apply(
        variables, img, vocab.text_embed_raw, vocab.labels,
        vocab.clip_text_embed, vocab.clip_labels, vocab.category_overlap,
        method=type(model).forward_eval)

    split_cls, split_pred = OpenPanopticInference(model, variables, vocab)(img)
    np.testing.assert_allclose(np.asarray(split_cls), np.asarray(fused_cls),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(split_pred), np.asarray(fused_pred),
                               rtol=1e-5, atol=1e-5)


def test_trunk_shared_across_vocabularies(model_and_vars):
    """Vocabulary 2..N on the same image shape must compile ZERO new trunk
    graphs — only its own tiny head (the full-eval-suite compile budget fix:
    6 tasks share one trunk per bucket)."""
    model, variables = model_and_vars
    img = jnp.full((1, 64, 64, 3), 0.25)

    vocab_a = build_open_vocabulary(
        model, variables, [["cat"], ["zebra"], ["grass"]],
        train_labels=TRAIN_LABELS)
    infer_a = OpenPanopticInference(model, variables, vocab_a)
    infer_a(img)
    n_trunk = infer_a._trunk._cache_size()
    assert n_trunk >= 1

    # different vocabulary AND different category count -> head recompiles,
    # trunk must not
    vocab_b = build_open_vocabulary(
        model, variables, [["dog", "puppy"], ["sky"]],
        train_labels=TRAIN_LABELS)
    infer_b = OpenPanopticInference(model, variables, vocab_b)
    mc, _ = infer_b(img)
    assert infer_b._trunk is infer_a._trunk
    assert infer_a._trunk._cache_size() == n_trunk  # zero new trunk compiles
    assert mc.shape[-1] == 3  # K=2 + null
