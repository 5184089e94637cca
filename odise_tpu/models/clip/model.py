"""CLIP text/image towers in Flax, including the MaskCLIP mask-attention path.

Capability parity with the reference's ClipAdapter / MaskCLIP wrappers around
open_clip (reference odise/modeling/meta_arch/clip.py:77-361): manual text
encoding returning (embed, encodings, mask) (clip.py:148-175); ViT image
encoding with spatial tokens bilinearly upsampled to stride 16
(clip.py:177-223); and the MaskCLIP masked forward where Q copies of the class
token are prepended and an attention mask restricts mask-token i to attend
only inside predicted mask i (clip.py:252-323, ref arXiv:2208.08984).

Architecture is the standard OpenAI CLIP ViT (QuickGELU activations, pre-LN
residual attention blocks). NHWC + token-major einsum attention for the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

CLIP_PIXEL_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_PIXEL_STD = (0.26862954, 0.26130258, 0.27577711)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class MultiheadAttention(nn.Module):
    """Attention with fused in-projection (torch nn.MultiheadAttention layout).

    ``attn_mask``: optional bool [B, L, L] or [L, L]; True = masked out.

    ``reader``/``reader_mask``: split-stream MaskCLIP mode — ``reader``
    [B, Q, C] tokens attend INTO ``x`` (keys/values from ``x``, masked per
    ``reader_mask`` [B, Q, L]) but are attended by nobody, while ``x``
    self-attends normally.  Mathematically identical to fused attention
    over [reader; x] with the MaskCLIP attention mask, but skips the
    (Q+L)^2 masked softmax (reference computes the fused form,
    clip.py:252-323).  Returns ``(out_x, out_reader)``.
    """

    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask: Optional[jnp.ndarray] = None,
                 reader: Optional[jnp.ndarray] = None,
                 reader_mask: Optional[jnp.ndarray] = None):
        B, L, C = x.shape
        in_proj = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")
        out_proj = nn.Dense(self.width, dtype=self.dtype, name="out_proj")
        hd = self.width // self.heads
        qkv = in_proj(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, self.heads, hd)
        k = k.reshape(B, L, self.heads, hd)
        v = v.reshape(B, L, self.heads, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        attn = attn * (hd ** -0.5)
        if attn_mask is not None:
            if attn_mask.ndim == 2:
                attn_mask = attn_mask[None, None]
            elif attn_mask.ndim == 3:
                attn_mask = attn_mask[:, None]
            attn = jnp.where(attn_mask, -jnp.inf, attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, L, self.width)
        out = out_proj(out)
        if reader is None:
            return out
        Q = reader.shape[1]
        q_r = in_proj(reader)[..., : self.width].reshape(B, Q, self.heads, hd)
        attn_r = jnp.einsum("bqhd,bkhd->bhqk", q_r, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        if reader_mask is not None:
            attn_r = jnp.where(reader_mask[:, None], -jnp.inf, attn_r)
        attn_r = jax.nn.softmax(attn_r, axis=-1).astype(v.dtype)
        out_r = jnp.einsum("bhqk,bkhd->bqhd", attn_r, v).reshape(B, Q, self.width)
        return out, out_proj(out_r)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, reader=None, reader_mask=None):
        ln_1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")
        attn = MultiheadAttention(self.width, self.heads, dtype=self.dtype,
                                  name="attn")
        ln_2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")
        c_fc = nn.Dense(self.width * 4, dtype=self.dtype, name="c_fc")
        c_proj = nn.Dense(self.width, dtype=self.dtype, name="c_proj")

        def mlp(t):
            return c_proj(quick_gelu(c_fc(t)))

        if reader is None:
            h = ln_1(x).astype(x.dtype)
            x = x + attn(h, attn_mask)
            h = ln_2(x).astype(x.dtype)
            return x + mlp(h)
        h = ln_1(x).astype(x.dtype)
        h_r = ln_1(reader).astype(reader.dtype)
        dx, dr = attn(h, None, reader=h_r, reader_mask=reader_mask)
        x = x + dx
        reader = reader + dr
        x = x + mlp(ln_2(x).astype(x.dtype))
        reader = reader + mlp(ln_2(reader).astype(reader.dtype))
        return x, reader


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, reader=None, reader_mask=None):
        for i in range(self.layers):
            block = ResidualAttentionBlock(self.width, self.heads,
                                           dtype=self.dtype,
                                           name=f"resblock_{i}")
            if reader is None:
                x = block(x, attn_mask)
            else:
                x, reader = block(x, attn_mask, reader=reader,
                                  reader_mask=reader_mask)
        if reader is None:
            return x
        return x, reader


class TextTransformer(nn.Module):
    """CLIP text tower. ``__call__(tokens)`` -> (text_embed, text_encodings)."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray):
        B, L = tokens.shape
        tok_emb = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                           name="token_embedding")(tokens)
        pos_emb = self.param("positional_embedding",
                             nn.initializers.normal(0.01),
                             (self.context_length, self.width))
        x = tok_emb + pos_emb[None, :L].astype(tok_emb.dtype)
        causal = jnp.triu(jnp.ones((L, L), jnp.bool_), k=1)
        x = Transformer(self.width, self.layers, self.heads, dtype=self.dtype,
                        name="transformer")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        text_encodings = x
        proj = self.param("text_projection", nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.embed_dim))
        # features at the eot token = argmax token id (highest id in sequence)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        text_embed = pooled.astype(jnp.float32) @ proj.astype(jnp.float32)
        return text_embed, text_encodings


class VisionTransformer(nn.Module):
    """CLIP ViT. Supports spatial encodings and MaskCLIP masked forward."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    def _embed_patches(self, image):
        """image [B, S, S, 3] -> tokens [B, 1+N, width] with cls + pos embed."""
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=self.patch_size, use_bias=False, padding="VALID",
                    dtype=self.dtype, name="conv1")(image)
        B, gh, gw, C = x.shape
        x = x.reshape(B, gh * gw, C)
        cls = self.param("class_embedding", nn.initializers.normal(self.width ** -0.5),
                         (self.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (B, 1, C)), x], axis=1)
        n_pos = (self.image_size // self.patch_size) ** 2 + 1
        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.width ** -0.5), (n_pos, self.width))
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x).astype(x.dtype)
        return x, (gh, gw)

    @nn.compact
    def __call__(self, image: jnp.ndarray, *, mask_tokens: Optional[int] = None,
                 attn_mask: Optional[jnp.ndarray] = None,
                 reader_mask: Optional[jnp.ndarray] = None):
        """Standard forward: returns (image_embed [B,D], image_encodings
        [B, gh, gw, D]). Masked forward (mask_tokens=Q + attn_mask [B,L,L]
        fused, or reader_mask [B,Q,1+N] split-stream — same math, the
        split form skips the fused (Q+L)^2 masked softmax): returns
        projected mask-token features [B, Q, D] (reference clip.py:252-280).
        """
        x, (gh, gw) = self._embed_patches(image)
        B = x.shape[0]
        transformer = Transformer(self.width, self.layers, self.heads,
                                  dtype=self.dtype, name="transformer")
        proj_init = nn.initializers.normal(self.width ** -0.5)
        if mask_tokens is not None and reader_mask is not None:
            reader = jnp.broadcast_to(x[:, 0:1],
                                      (B, mask_tokens, x.shape[-1]))
            _, r = transformer(x, reader=reader, reader_mask=reader_mask)
            proj = self.param("proj", proj_init, (self.width, self.embed_dim))
            r = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(r)
            return jnp.einsum("blc,cd->bld", r.astype(jnp.float32),
                              proj.astype(jnp.float32))
        if mask_tokens is not None:
            cls_embed = jnp.broadcast_to(x[:, 0:1], (B, mask_tokens, x.shape[-1]))
            x = jnp.concatenate([cls_embed, x], axis=1)
        x = transformer(x, attn_mask)
        proj = self.param("proj", proj_init, (self.width, self.embed_dim))
        if mask_tokens is not None:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(
                x[:, :mask_tokens])
            return jnp.einsum("blc,cd->bld", x.astype(jnp.float32),
                              proj.astype(jnp.float32))
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x)
        x = jnp.einsum("blc,cd->bld", x.astype(jnp.float32), proj.astype(jnp.float32))
        image_embed = x[:, 0]
        image_encodings = x[:, 1:].reshape(B, gh, gw, -1)
        return image_embed, image_encodings


class CLIP(nn.Module):
    """Combined towers + logit scale, with named sub-towers for checkpointing."""

    embed_dim: int = 768
    vision_cfg: Tuple[int, int, int, int, int] = (224, 14, 1024, 24, 16)
    text_cfg: Tuple[int, int, int, int, int] = (49408, 77, 768, 12, 12)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        s, p, w, l, h = self.vision_cfg
        self.visual = VisionTransformer(image_size=s, patch_size=p, width=w,
                                        layers=l, heads=h, embed_dim=self.embed_dim,
                                        dtype=self.dtype)
        v, cl, tw, tl, th = self.text_cfg
        self.text = TextTransformer(vocab_size=v, context_length=cl, width=tw,
                                    layers=tl, heads=th, embed_dim=self.embed_dim,
                                    dtype=self.dtype)
        self.logit_scale = self.param("logit_scale",
                                      nn.initializers.constant(jnp.log(1 / 0.07)), ())

    def encode_text(self, tokens):
        return self.text(tokens)

    def encode_image(self, image, **kw):
        return self.visual(image, **kw)

    def __call__(self, image, tokens):
        img_embed, _ = self.visual(image)
        txt_embed, _ = self.text(tokens)
        return img_embed, txt_embed, self.logit_scale


# Model registry: name -> (embed_dim, vision_cfg, text_cfg)
CLIP_CONFIGS = {
    "ViT-L-14": dict(embed_dim=768, vision_cfg=(224, 14, 1024, 24, 16),
                     text_cfg=(49408, 77, 768, 12, 12)),
    "ViT-L-14-336": dict(embed_dim=768, vision_cfg=(336, 14, 1024, 24, 16),
                         text_cfg=(49408, 77, 768, 12, 12)),
    "ViT-B-16": dict(embed_dim=512, vision_cfg=(224, 16, 768, 12, 12),
                     text_cfg=(49408, 77, 512, 12, 8)),
    "ViT-B-32": dict(embed_dim=512, vision_cfg=(224, 32, 768, 12, 12),
                     text_cfg=(49408, 77, 512, 12, 8)),
}


def create_clip(name: str, dtype=jnp.float32) -> CLIP:
    cfg = CLIP_CONFIGS[name]
    return CLIP(embed_dim=cfg["embed_dim"], vision_cfg=tuple(cfg["vision_cfg"]),
                text_cfg=tuple(cfg["text_cfg"]), dtype=dtype)
