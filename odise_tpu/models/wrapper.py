"""Open-vocabulary inference wrapper.

Capability parity with ``OpenPanopticInference`` (reference odise/modeling/
wrapper/pano_wrapper.py:15-69): bind a test-time vocabulary to a trained
model. The reference mutates module state (open_state_dict swap); here a
vocabulary is an immutable bundle of precomputed arrays + static label
grouping, and binding is closing a jitted eval function over it.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.build import prompt_labels
from .odise import category_overlapping_mask


@dataclasses.dataclass(frozen=True)
class OpenVocabulary:
    """Everything the eval forward needs for one vocabulary."""

    labels: Tuple[Tuple[str, ...], ...]          # test-vocab synonym groups
    text_embed_raw: jnp.ndarray                  # [K_flat, D]
    clip_labels: Optional[Tuple[Tuple[str, ...], ...]] = None
    clip_text_embed: Optional[jnp.ndarray] = None
    category_overlap: Optional[jnp.ndarray] = None
    thing_mask: Optional[jnp.ndarray] = None     # [K] bool (for fusion)


def build_open_vocabulary(
    model,
    variables,
    labels: Sequence[Sequence[str]],
    *,
    train_labels: Optional[Sequence[Sequence[str]]] = None,
    thing_mask: Optional[np.ndarray] = None,
    prompt: str = "photo",
    with_clip_head: bool = True,
) -> OpenVocabulary:
    """Precompute the text embeddings for a vocabulary (one jit per vocab).

    Mirrors the reference's embed caches (odise.py:1281-1288, 1092-1102) —
    compute once, reuse for every image.
    """
    from .clip.tokenizer import tokenize

    labels = tuple(tuple(l) for l in labels)
    # variables as a jit argument — a partial would bake the frozen towers
    # into the HLO as constants (GBs at full scale)
    encode_jit = jax.jit(functools.partial(
        model.apply, method=type(model).encode_vocab))
    encode = lambda toks: encode_jit(variables, toks)

    flat = [t for group in labels for t in group]
    text_embed_raw = encode(jnp.asarray(tokenize(flat)))

    clip_labels = None
    clip_text_embed = None
    overlap = None
    if with_clip_head:
        clip_labels = tuple(tuple(l) for l in prompt_labels(
            [list(g) for g in labels], prompt))
        clip_flat = [t for group in clip_labels for t in group]
        clip_text_embed = encode(jnp.asarray(tokenize(clip_flat)))
        train_labels = train_labels if train_labels is not None else model.train_labels
        overlap = jnp.asarray(category_overlapping_mask(train_labels, labels))

    if thing_mask is None:
        thing_mask_arr = jnp.ones((len(labels),), bool)
    else:
        thing_mask_arr = jnp.asarray(thing_mask, bool)

    return OpenVocabulary(
        labels=labels,
        text_embed_raw=text_embed_raw,
        clip_labels=clip_labels,
        clip_text_embed=clip_text_embed,
        category_overlap=overlap,
        thing_mask=thing_mask_arr,
    )


class OpenPanopticInference:
    """Bind (model, variables, vocabulary) into a jitted eval callable.

    ``__call__(images [B,H,W,3] in [0,1])`` -> (mask_cls [B,Q,K+1],
    mask_pred [B,Q,H,W]); one compiled graph per (vocabulary, image shape).
    """

    def __init__(self, model, variables, vocabulary: OpenVocabulary):
        self.model = model
        self.variables = variables
        self.vocabulary = vocabulary
        v = vocabulary

        def fn(variables, images):
            return model.apply(
                variables, images, v.text_embed_raw, v.labels,
                v.clip_text_embed, v.clip_labels, v.category_overlap,
                method=type(model).forward_eval)

        self._fn = jax.jit(fn)

    def __call__(self, images):
        return self._fn(self.variables, images)


class ShardedOpenPanopticInference(OpenPanopticInference):
    """Data-parallel open-vocab inference over a mesh's ``data`` axis.

    TPU-native counterpart of the reference's DDP-wrapped evaluation
    (reference tools/train_net.py:126-135): instead of one process per GPU
    each pulling from a sharded dataset, the caller groups same-bucket images
    into microbatches of ``n_data = mesh.shape['data']``; the batch dim is
    sharded over the data axis so one jitted forward runs every image on its
    own device, and XLA keeps the (replicated) frozen towers local. Outputs
    stay batch-sharded; per-image statistic kernels consume the slices.
    """

    def __init__(self, model, variables, vocabulary: OpenVocabulary, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        super().__init__(model, variables, vocabulary)
        self.mesh = mesh
        self.n_data = mesh.shape["data"]
        self.batch_sharding = NamedSharding(mesh, P("data"))
        replicated = NamedSharding(mesh, P())
        v = vocabulary

        def fn(variables, images):
            return model.apply(
                variables, images, v.text_embed_raw, v.labels,
                v.clip_text_embed, v.clip_labels, v.category_overlap,
                method=type(model).forward_eval)

        self._fn = jax.jit(fn, in_shardings=(replicated, self.batch_sharding),
                           out_shardings=self.batch_sharding)

    def __call__(self, images):
        images = jax.device_put(images, self.batch_sharding)
        return self._fn(self.variables, images)
