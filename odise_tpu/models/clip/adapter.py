"""Functional CLIP adapter utilities.

Capability parity with the reference's ClipAdapter / MaskCLIP
(reference odise/modeling/meta_arch/clip.py:77-361), reorganized functionally
for JAX: preprocessing is a pure function; text embeddings for a vocabulary
are *precomputed arrays* passed into jitted steps (the reference caches them
as module buffers, clip.py:1092-1102 / odise.py:1238-1241); the MaskCLIP
attention mask is built on device from predicted masks.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .model import CLIP_PIXEL_MEAN, CLIP_PIXEL_STD
from .tokenizer import tokenize


class EmbeddedText(NamedTuple):
    text_embed: jnp.ndarray      # [N, D] (normalized if requested)
    text_encodings: jnp.ndarray  # [N, L, width]
    text_mask: jnp.ndarray       # [N, L] 1 where token != 0


class EmbeddedImage(NamedTuple):
    image_embed: jnp.ndarray       # [B, D]
    image_encodings: jnp.ndarray   # [B, H/16, W/16, D]


def clip_preprocess(image: jnp.ndarray, size: int) -> jnp.ndarray:
    """Resize shorter side to ``size`` (bicubic), center-crop, CLIP-normalize.

    Matches the reference's use of the open_clip preprocessing pipeline minus
    ToTensor (reference clip.py:92-94). ``image``: [B, H, W, 3] in [0, 1].
    """
    B, H, W, C = image.shape
    scale = size / min(H, W)
    nh, nw = max(int(round(H * scale)), size), max(int(round(W * scale)), size)
    image = jax.image.resize(image, (B, nh, nw, C), method="bicubic")
    top, left = (nh - size) // 2, (nw - size) // 2
    image = jax.lax.dynamic_slice(image, (0, top, left, 0), (B, size, size, C))
    mean = jnp.asarray(CLIP_PIXEL_MEAN, image.dtype)
    std = jnp.asarray(CLIP_PIXEL_STD, image.dtype)
    return (image - mean) / std


def embed_image(visual_apply, image: jnp.ndarray, image_size: int,
                normalize: bool = True) -> EmbeddedImage:
    """Encode an image with spatial encodings upsampled to stride 16 of the
    *preprocessed* input (reference clip.py:177-223).

    ``visual_apply(x)`` must return (image_embed [B, D], encodings
    [B, gh, gw, D]) — e.g. a bound VisionTransformer.
    """
    x = clip_preprocess(image, image_size)
    img_embed, enc = visual_apply(x)
    B, gh, gw, D = enc.shape
    th, tw = image_size // 16, image_size // 16
    enc = jax.image.resize(enc, (B, th, tw, D), method="bilinear")
    if normalize:
        from ..helper import l2_normalize

        img_embed = l2_normalize(img_embed)
    return EmbeddedImage(img_embed.astype(jnp.float32), enc)


def embed_text(text_apply, tokens: jnp.ndarray, normalize: bool = True) -> EmbeddedText:
    """Encode pre-tokenized text (reference clip.py:148-175).

    ``text_apply(tokens)`` -> (text_embed [N, D], encodings [N, L, width]).
    """
    text_mask = (tokens != 0).astype(jnp.int32)
    text_embed, text_encodings = text_apply(tokens)
    text_embed = text_embed.astype(jnp.float32)
    if normalize:
        from ..helper import l2_normalize

        text_embed = l2_normalize(text_embed)
    return EmbeddedText(text_embed, text_encodings.astype(jnp.float32), text_mask)


def build_text_embed(text_apply, labels, batch_size: int = 256,
                     normalize: bool = False) -> jnp.ndarray:
    """Embed a list (or list-of-synonym-lists) of label strings.

    Host-driving loop over chunks (reference clip.py:29-73); returns the
    flattened [sum(len(syns)), D] embedding table.
    """
    if isinstance(labels, str):
        labels = [labels]
    if labels and isinstance(labels[0], str):
        labels = [[t] for t in labels]
    flatten_text = [t for sub in labels for t in sub]
    outs = []
    for i in range(0, len(flatten_text), batch_size):
        toks = jnp.asarray(tokenize(flatten_text[i: i + batch_size]))
        emb, _ = text_apply(toks)
        outs.append(np.asarray(emb, dtype=np.float32))
    out = jnp.asarray(np.concatenate(outs, axis=0))
    if normalize:
        from ..helper import l2_normalize

        out = l2_normalize(out)
    return out


def build_mask_attn_mask(mask_logits: jnp.ndarray, patch_size: int,
                         num_image_tokens: int) -> jnp.ndarray:
    """Build the MaskCLIP attention mask from predicted mask logits.

    Args:
      mask_logits: [B, Q, S, S] at the CLIP input resolution.
      patch_size: ViT patch size.
      num_image_tokens: gh*gw patch tokens (excludes the class token).

    Returns:
      bool [B, L, L] with L = Q + 1 + num_image_tokens; True = masked out.
      Semantics (reference clip.py:282-323): nobody attends to mask tokens;
      mask token i attends to the class token and only the patches where its
      (sigmoid, max-pooled) mask exceeds 0.5.
    """
    B, Q = mask_logits.shape[:2]
    token_masked = _token_masked(mask_logits, patch_size, num_image_tokens)
    N = token_masked.shape[-1]
    L = Q + 1 + N
    attn_mask = jnp.zeros((B, L, L), jnp.bool_)
    attn_mask = attn_mask.at[:, :, :Q].set(True)      # no one attends to mask tokens
    attn_mask = attn_mask.at[:, :Q, -N:].set(token_masked)
    return attn_mask


def _token_masked(mask_logits, patch_size, num_image_tokens):
    prob = jax.nn.sigmoid(mask_logits)
    patch_mask = jax.lax.reduce_window(
        prob, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, patch_size, patch_size),
        window_strides=(1, 1, patch_size, patch_size),
        padding="VALID",
    )
    B, Q = mask_logits.shape[:2]
    token_masked = (patch_mask < 0.5).reshape(B, Q, -1)  # [B, Q, N]
    assert token_masked.shape[-1] == num_image_tokens, (
        token_masked.shape, num_image_tokens)
    return token_masked


def build_mask_reader_mask(mask_logits: jnp.ndarray, patch_size: int,
                           num_image_tokens: int) -> jnp.ndarray:
    """Split-stream MaskCLIP mask: bool [B, Q, 1+N]; True = masked out.

    Column 0 is the class token (always attended); columns 1..N mask the
    patches outside each predicted mask.  Same semantics as
    :func:`build_mask_attn_mask` rows 0..Q-1, for the reader-stream
    attention that skips the fused (Q+L)^2 softmax.
    """
    B, Q = mask_logits.shape[:2]
    token_masked = _token_masked(mask_logits, patch_size, num_image_tokens)
    cls_col = jnp.zeros((B, Q, 1), jnp.bool_)
    return jnp.concatenate([cls_col, token_masked], axis=-1)


class MaskCLIP:
    """Standalone MaskCLIP module (reference clip.py:239-361 API parity).

    Functional wrapper pairing a VisionTransformer (ViT-L/14-336) with the
    mask-attention forward: ``get_mask_embed(params, image, mask)`` returns
    per-mask CLIP embeddings; ``pred_logits`` classifies them against text
    embeds with synonym ensembling.
    """

    def __init__(self, visual, image_size: int = 336, patch_size: int = 14):
        self.visual = visual
        self.image_size = image_size
        self.patch_size = patch_size

    def get_mask_embed(self, variables, image: jnp.ndarray, mask: jnp.ndarray):
        S = self.image_size
        B, Q = mask.shape[:2]
        img = jax.image.resize(image, (B, S, S, 3), method="bilinear")
        img = clip_preprocess(img, S)
        m = jax.image.resize(mask, (B, Q, S, S), method="bilinear")
        n_tokens = (S // self.patch_size) ** 2
        reader_mask = build_mask_reader_mask(m, self.patch_size, n_tokens)
        return self.visual.apply(variables, img, mask_tokens=Q,
                                 reader_mask=reader_mask)

    @staticmethod
    def pred_logits(mask_embed, text_embed, labels, logit_scale=100.0):
        from ..helper import ensemble_logits_with_labels, l2_normalize

        logits = logit_scale * jnp.einsum(
            "bqc,kc->bqk", l2_normalize(mask_embed), l2_normalize(text_embed))
        return ensemble_logits_with_labels(logits, labels, "max")
