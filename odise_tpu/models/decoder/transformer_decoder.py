"""Masked-attention transformer decoder with pluggable prediction heads.

Capability parity with:
  * ``MultiScaleMaskedTransformerDecoder`` (reference third_party/Mask2Former/
    mask2former/modeling/transformer_decoder/mask2former_transformer_decoder.py:
    208-461): 100 learned queries; 9 rounds of (masked cross-attn -> self-attn
    -> FFN) cycling 3 feature levels; the attention mask comes from the
    previous layer's mask prediction thresholded at 0.5 with fully-masked rows
    unmasked; auxiliary predictions per layer.
  * ``ODISEMultiScaleMaskedTransformerDecoder`` (reference odise/modeling/
    meta_arch/odise.py:622-776): pluggable class_embed / mask_embed /
    post_mask_embed and an extra-results dict threaded through every layer.
  * ``PooledMaskEmbed`` / ``MaskPooling`` / ``PseudoClassEmbed``
    (odise.py:910-1015).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..helper import mask_pooling
from .layers import MLP, MultiheadAttention, position_embedding_sine


class PseudoClassEmbed(nn.Module):
    """Constant fg=1 / bg=0 logits (reference odise.py:910-920)."""

    num_classes: int

    @nn.compact
    def __call__(self, x):
        fg = jnp.ones(x.shape[:-1] + (self.num_classes,), x.dtype)
        bg = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
        return jnp.concatenate([fg, bg], axis=-1)


class PooledMaskEmbed(nn.Module):
    """Mask-pool features + residual decoder output -> CLIP-space mask embed
    with learnable logit scale (reference odise.py:966-1015)."""

    hidden_dim: int
    mask_dim: int
    projection_dim: int
    temperature: float = 0.07
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, decoder_output, input_mask_embed, mask_features, pred_logits,
                 pred_masks):
        """decoder_output [B,Q,C], mask_features [B,H,W,C] (NHWC),
        pred_masks [B,Q,H,W]."""
        pooled = mask_pooling(mask_features, pred_masks)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name="pool_norm")(pooled).astype(decoder_output.dtype)
        pooled = nn.Dense(self.hidden_dim, dtype=self.dtype, name="pool_proj")(pooled)
        pooled = pooled + decoder_output
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="embed_norm")(pooled).astype(pooled.dtype)
        mask_embed = MLP(self.hidden_dim, self.projection_dim, 3, dtype=self.dtype,
                         name="embed_mlp")(h)
        logit_scale = self.param("logit_scale",
                                 nn.initializers.constant(np.log(1 / self.temperature)),
                                 ())
        logit_scale = jnp.clip(jnp.exp(logit_scale), max=100.0)
        return {
            "mask_embed": mask_embed,
            "mask_pooled_features": pooled,
            "logit_scale": logit_scale,
        }


class _CrossAttentionLayer(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, memory_mask, pos, query_pos):
        h = MultiheadAttention(self.dim, self.heads, dtype=self.dtype, name="attn")(
            tgt + query_pos, memory + pos, memory, memory_mask)
        tgt = tgt + h
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            name="norm")(tgt).astype(h.dtype)


class _SelfAttentionLayer(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos):
        q = tgt + query_pos
        h = MultiheadAttention(self.dim, self.heads, dtype=self.dtype, name="attn")(
            q, q, tgt, None)
        tgt = tgt + h
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            name="norm")(tgt).astype(h.dtype)


class _FFNLayer(nn.Module):
    dim: int
    ffn_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt):
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(tgt)
        h = nn.relu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(h)
        tgt = tgt + h
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            name="norm")(tgt).astype(h.dtype)


class ODISEMultiScaleMaskedTransformerDecoder(nn.Module):
    """The ODISE mask-generator decoder.

    ``__call__(x: list[NHWC] coarsest-first, mask_features [B,H,W,C])``
    returns a dict: pred_logits, pred_masks, aux_outputs (list of 9 dicts,
    one per pre-final layer), and extra results (mask_embed, logit_scale,
    mask_pooled_features) threaded into main + aux outputs.
    """

    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9
    mask_dim: int = 256
    num_classes: int = 133
    in_channels: int = 256
    num_feature_levels: int = 3
    mask_classification: bool = True
    enforce_input_project: bool = False
    pre_norm: bool = False
    class_embed: Optional[nn.Module] = None
    mask_embed: Optional[nn.Module] = None
    post_mask_embed: Optional[nn.Module] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.query_feat = self.param("query_feat", nn.initializers.normal(1.0),
                                     (self.num_queries, self.hidden_dim))
        self.query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                      (self.num_queries, self.hidden_dim))
        self.level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                      (self.num_feature_levels, self.hidden_dim))
        self.cross_layers = [
            _CrossAttentionLayer(self.hidden_dim, self.nheads, dtype=self.dtype,
                                 name=f"cross_{i}") for i in range(self.dec_layers)]
        self.self_layers = [
            _SelfAttentionLayer(self.hidden_dim, self.nheads, dtype=self.dtype,
                                name=f"self_{i}") for i in range(self.dec_layers)]
        self.ffn_layers = [
            _FFNLayer(self.hidden_dim, self.dim_feedforward, dtype=self.dtype,
                      name=f"ffn_{i}") for i in range(self.dec_layers)]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                         name="decoder_norm")
        if self.class_embed is None and self.mask_classification:
            self._class_embed = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                                         name="class_embed_linear")
        else:
            self._class_embed = self.class_embed
        if self.mask_embed is None:
            self._mask_embed = MLP(self.hidden_dim, self.mask_dim, 3,
                                   dtype=self.dtype, name="mask_embed_mlp")
        else:
            assert self.post_mask_embed is None
            self._mask_embed = self.mask_embed
        if self.enforce_input_project or self.in_channels != self.hidden_dim:
            self.input_proj = [
                nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"input_proj_{i}")
                for i in range(self.num_feature_levels)]
        else:
            self.input_proj = None

    @staticmethod
    def _threshold_attn_mask(mask_logits_hw):
        """[B, Q, h, w] mask logits at the attention resolution -> additive
        attention mask [B, 1, Q, h*w] (True = masked out), with fully-masked
        rows unmasked (reference odise.py:683)."""
        B, Q, h, w = mask_logits_hw.shape
        am = jax.nn.sigmoid(mask_logits_hw).reshape(B, Q, h * w) < 0.5
        all_masked = jnp.all(am, axis=-1, keepdims=True)
        am = jnp.where(all_masked, False, am)
        return jax.lax.stop_gradient(am)[:, None]

    def _prediction_heads(self, output, mask_features, attn_target_hw,
                          need_attn_mask=True):
        """One prediction-head pass (reference odise.py:729-776)."""
        x = self.decoder_norm(output).astype(output.dtype)
        outputs_class = self._class_embed(x)
        extra: Dict[str, Any] = {}
        mask_embed_results = self._mask_embed(x)
        if isinstance(mask_embed_results, dict):
            mask_embed = mask_embed_results.pop("mask_embed")
            extra.update(mask_embed_results)
        else:
            mask_embed = mask_embed_results
        outputs_mask = jnp.einsum("bqc,bhwc->bqhw", mask_embed, mask_features)

        if self.post_mask_embed is not None:
            post = self.post_mask_embed(x, mask_embed, mask_features,
                                        outputs_class, outputs_mask)
            if "outputs_mask" in post:
                outputs_mask = post.pop("outputs_mask")
            extra.update(post)

        am = None
        if need_attn_mask:
            B, Q = outputs_mask.shape[:2]
            h, w = attn_target_hw
            am = self._threshold_attn_mask(jax.image.resize(
                outputs_mask, (B, Q, h, w), method="bilinear"))
        return outputs_class, outputs_mask, am, extra

    def _fast_attn_mask(self, output, mask_features_lvl):
        """Attention mask ONLY, computed at the attention resolution.

        Bilinear resize is linear in the pixels and the mask einsum is linear
        in ``mask_features``, so ``resize(einsum(e, F)) == einsum(e,
        resize(F))`` — the full-resolution intermediate mask (a 256^2-pixel
        einsum + resize + the PooledMaskEmbed mask-pooling, per layer) is
        never needed at inference, where aux outputs are discarded
        (reference odise.py:729-776 computes them anyway; eval drops them in
        maskformer_model.py's inference path)."""
        x = self.decoder_norm(output).astype(output.dtype)
        r = self._mask_embed(x)
        mask_embed = r["mask_embed"] if isinstance(r, dict) else r
        m = jnp.einsum("bqc,bhwc->bqhw", mask_embed, mask_features_lvl)
        return self._threshold_attn_mask(m)

    def __call__(self, x: Sequence[jnp.ndarray], mask_features: jnp.ndarray,
                 training: bool = True):
        assert len(x) == self.num_feature_levels
        B = x[0].shape[0]
        srcs, poss, sizes = [], [], []
        for i, feat in enumerate(x):
            _, H, W, C = feat.shape
            sizes.append((H, W))
            pos = position_embedding_sine(H, W, self.hidden_dim // 2, dtype=feat.dtype)
            poss.append(jnp.broadcast_to(pos.reshape(1, H * W, -1), (B, H * W, self.hidden_dim)))
            f = feat.reshape(B, H * W, C)
            if self.input_proj is not None:
                f = self.input_proj[i](f)
            srcs.append(f + self.level_embed[i].astype(f.dtype))

        output = jnp.broadcast_to(self.query_feat[None], (B,) + self.query_feat.shape)
        query_pos = jnp.broadcast_to(self.query_embed[None], (B,) + self.query_embed.shape)
        output = output.astype(srcs[0].dtype)
        query_pos = query_pos.astype(srcs[0].dtype)

        fast = not training
        if fast:
            # inference discards aux outputs, so intermediate layers only
            # need the ATTENTION MASK — computed directly at the attention
            # resolution against pre-resized mask features (one resize per
            # level instead of one full-resolution mask einsum + resize +
            # mask-pooling per layer; see _fast_attn_mask)
            C = mask_features.shape[-1]
            mf_small = [
                jax.image.resize(mask_features, (B, h, w, C), method="bilinear")
                for (h, w) in sizes]

        classes, masks, extras = [], [], []
        if fast:
            attn_mask = self._fast_attn_mask(output, mf_small[0])
        else:
            out_cls, out_mask, attn_mask, extra = self._prediction_heads(
                output, mask_features, sizes[0])
            classes.append(out_cls)
            masks.append(out_mask)
            extras.append(extra)

        for i in range(self.dec_layers):
            li = i % self.num_feature_levels
            output = self.cross_layers[i](output, srcs[li], attn_mask, poss[li],
                                          query_pos)
            output = self.self_layers[i](output, query_pos)
            output = self.ffn_layers[i](output)
            if fast and i < self.dec_layers - 1:
                attn_mask = self._fast_attn_mask(
                    output, mf_small[(i + 1) % self.num_feature_levels])
            elif fast:
                out_cls, out_mask, _, extra = self._prediction_heads(
                    output, mask_features,
                    sizes[(i + 1) % self.num_feature_levels],
                    need_attn_mask=False)
                classes.append(out_cls)
                masks.append(out_mask)
                extras.append(extra)
            else:
                out_cls, out_mask, attn_mask, extra = self._prediction_heads(
                    output, mask_features,
                    sizes[(i + 1) % self.num_feature_levels])
                classes.append(out_cls)
                masks.append(out_mask)
                extras.append(extra)

        out = {
            "pred_logits": classes[-1],
            "pred_masks": masks[-1],
            "aux_outputs": [
                {"pred_logits": c, "pred_masks": m}
                for c, m in zip(classes[:-1], masks[:-1])
            ],
        }
        for k in extras[-1]:
            out[k] = extras[-1][k]
            for i in range(len(extras) - 1):
                out["aux_outputs"][i][k] = extras[i][k]
        return out


class MaskFormerHead(nn.Module):
    """pixel_decoder.forward_features -> predictor (reference
    mask2former/modeling/meta_arch/mask_former_head.py:115-132)."""

    pixel_decoder: nn.Module
    transformer_predictor: nn.Module
    num_classes: int = 133
    ignore_value: int = 255
    loss_weight: float = 1.0
    transformer_in_feature: str = "multi_scale_pixel_decoder"
    input_shape: Optional[dict] = None

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], training: bool = True):
        mask_features, multi_scale_features = self.pixel_decoder(features)
        return self.transformer_predictor(multi_scale_features, mask_features,
                                          training=training)
