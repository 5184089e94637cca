"""Stable-Diffusion feature-extractor backbone (the heart of ODISE).

Capability parity with:
  * ``LdmExtractor`` (reference odise/modeling/meta_arch/ldm.py:236-621) — a
    single SD pass at t=0 (with fixed shared noise, seed 42) capturing VAE
    encoder / UNet output-block / VAE decoder activations at configured block
    indices, with per-block stride bookkeeping.
  * ``LdmImplicitCaptionerExtractor`` (ldm.py:624-722) — CLIP image embedding
    projected by a learned 77-token PositionalLinear and injected as SD text
    conditioning ``uncond + tanh(alpha)*proj``, plus an optional learnable
    time-embedding delta.
  * ``FeatureExtractorBackbone`` (reference odise/modeling/backbone/
    feature_extractor.py:29-256) — bottleneck-GN projections per tap, stride
    clamping/grouping into s2..s5, same-stride sum, and sliding-window
    accumulation over large images.

TPU-native redesign:
  * Taps come out of the Flax towers natively (no external re-implementation
    of their forwards).
  * The sliding window is a *static* crop grid and all crops are folded into
    the batch dimension for one fused forward — G small UNet calls become one
    large MXU-friendly call (the reference loops crops serially,
    feature_extractor.py:216-244).
  * Frozen weights (VAE/UNet/SD-text/CLIP-vision) live under the param path
    prefixes in ``parallel.mesh.FROZEN_TOWER_KEYWORDS`` — the optimizer masks
    them out, the train step excludes them from differentiation, and the
    checkpointer excludes them from disk (reference freezes via requires_grad
    and empty state_dict, helper.py:44-56).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...diffusion import GaussianDiffusion, get_named_beta_schedule
from ..clip.model import VisionTransformer
from ..clip.adapter import clip_preprocess
from ..clip.tokenizer import tokenize
from ..sd.unet import UNetModel
from ..sd.vae import AutoencoderKL
from ..clip.model import TextTransformer

SD_PIXEL_MEAN = 0.5  # SD normalizes [0,1] -> [-1,1]
SD_PIXEL_STD = 0.5


class PositionalLinear(nn.Module):
    """Linear + learned 77-token positional expansion (reference ldm.py:624-635)."""

    out_features: int
    seq_len: int = 77
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_features, dtype=self.dtype, name="linear")(x)
        pos = self.param("positional_embedding",
                         nn.initializers.truncated_normal(0.02),
                         (1, self.seq_len, self.out_features))
        return x[:, None, :] + pos.astype(x.dtype)


def ldm_feature_dims_strides(
    model_channels: int = 320,
    vae_ch: int = 128,
    encoder_block_indices: Tuple[int, ...] = (5, 7),
    unet_block_indices: Tuple[int, ...] = (2, 5, 8, 11),
    decoder_block_indices: Tuple[int, ...] = (2, 5),
    steps: Tuple[int, ...] = (0,),
):
    """Static (dims, strides) for the tapped features.

    Mirrors the reference's bookkeeping (ldm.py:284-346): encoder stride
    2**((idx+2)//2-1); unet stride 64/2**((idx+3)//3-1); decoder stride
    8/2**((idx+3)//3-1). Dims follow the SD architecture.
    """
    # encoder tap dims: input channels of res block idx; layout for
    # ch_mult (1,2,4,4): block inputs [128,128, 128,256, 256,512, 512,512]
    enc_in = []
    prev = vae_ch
    for mult in (1, 2, 4, 4):
        out = vae_ch * mult
        enc_in.extend([prev, out])
        prev = out
    encoder_dims = [enc_in[i] for i in encoder_block_indices]
    encoder_strides = [2 ** ((i + 2) // 2 - 1) for i in encoder_block_indices]

    # unet output-block input dims (after skip concat), SD v1 layout
    mc = model_channels
    unet_in = [mc * 8, mc * 8, mc * 8,   # level 3 (8x8)
               mc * 8, mc * 8, mc * 6,   # level 2
               mc * 4, mc * 4, mc * 3,   # level 1
               mc * 2, mc * 2, mc * 2]   # level 0
    unet_dims = [unet_in[i] for i in unet_block_indices]
    unet_strides = [64 // (2 ** ((i + 3) // 3 - 1)) for i in unet_block_indices]

    # decoder tap dims: input of block idx (reversed levels, 3 blocks/level)
    dec_in = []
    prev = vae_ch * 4
    for mult in (4, 4, 2, 1):
        out = vae_ch * mult
        dec_in.extend([prev, out, out])
        prev = out
    decoder_dims = [dec_in[i] for i in decoder_block_indices]
    decoder_strides = [8 // (2 ** ((i + 3) // 3 - 1)) for i in decoder_block_indices]

    dims = encoder_dims + unet_dims * len(steps) + decoder_dims
    strides = encoder_strides + unet_strides * len(steps) + decoder_strides
    return dims, strides


class LdmExtractor(nn.Module):
    """Frozen SD as a one-step multi-scale feature extractor.

    ``__call__(img, cond_inputs, cond_emb)`` with img [B, S, S, 3] in [0, 1]
    returns the list of tapped features (NHWC), ordered encoder/unet/decoder.
    """

    encoder_block_indices: Tuple[int, ...] = (5, 7)
    unet_block_indices: Tuple[int, ...] = (2, 5, 8, 11)
    decoder_block_indices: Tuple[int, ...] = (2, 5)
    steps: Tuple[int, ...] = (0,)
    share_noise: bool = True
    model_channels: int = 320
    vae_ch: int = 128
    context_dim: int = 768
    sd_text_layers: int = 12
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vae = AutoencoderKL(
            ch=self.vae_ch,
            encoder_tap_indices=self.encoder_block_indices,
            decoder_tap_indices=self.decoder_block_indices,
            dtype=self.dtype,
        )
        self.unet = UNetModel(
            model_channels=self.model_channels,
            context_dim=self.context_dim,
            tap_indices=self.unet_block_indices,
            dtype=self.dtype,
        )
        # SD's own text encoder (CLIP-L text; conditioning = ln_final hidden
        # states, whose width IS the UNet context_dim)
        self.sd_text = TextTransformer(
            width=self.context_dim,
            layers=self.sd_text_layers,
            heads=max(1, self.context_dim // 64),
            embed_dim=self.context_dim,
            dtype=self.dtype,
        )
        self.diffusion = GaussianDiffusion(
            betas=get_named_beta_schedule("ldm_linear", 1000)
        )

    @property
    def feature_dims(self) -> List[int]:
        return ldm_feature_dims_strides(
            self.model_channels, self.vae_ch, self.encoder_block_indices,
            self.unet_block_indices, self.decoder_block_indices, self.steps)[0]

    @property
    def feature_strides(self) -> List[int]:
        return ldm_feature_dims_strides(
            self.model_channels, self.vae_ch, self.encoder_block_indices,
            self.unet_block_indices, self.decoder_block_indices, self.steps)[1]

    @property
    def num_groups(self) -> int:
        return (len(self.encoder_block_indices) + len(self.unet_block_indices)
                + len(self.decoder_block_indices))

    @property
    def grouped_indices(self) -> List[List[int]]:
        # same grouping as reference ldm.py:368-388
        ret = []
        for i in range(len(self.encoder_block_indices)):
            ret.append([i])
        off = len(self.encoder_block_indices)
        for i in range(len(self.unet_block_indices)):
            ret.append([i + t * len(self.unet_block_indices) + off
                        for t in range(len(self.steps))])
        off += len(self.steps) * len(self.unet_block_indices)
        for i in range(len(self.decoder_block_indices)):
            ret.append([i + off])
        return ret

    def embed_text(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """SD conditioning: ln_final hidden states [B, 77, 768]."""
        _, encodings = self.sd_text(tokens)
        return encodings.astype(self.dtype)

    def _shared_noise(self, latent_shape) -> jnp.ndarray:
        """Fixed noise (seed 42), bicubic-resized to the latent shape
        (reference ldm.py:271-279, 583-594)."""
        base = jax.random.normal(jax.random.PRNGKey(42), (1, 64, 64, 4), jnp.float32)
        if latent_shape[1:3] != (64, 64):
            base = jax.image.resize(
                base, (1, latent_shape[1], latent_shape[2], 4), method="bicubic")
        return jnp.broadcast_to(base, latent_shape).astype(self.dtype)

    def __call__(self, img: jnp.ndarray,
                 cond_inputs: Optional[jnp.ndarray] = None,
                 cond_emb: Optional[jnp.ndarray] = None) -> List[jnp.ndarray]:
        B = img.shape[0]
        x = (img - SD_PIXEL_MEAN) / SD_PIXEL_STD

        latent, encoder_features = self.vae.encode(x.astype(self.dtype))

        if cond_inputs is None:
            # unconditional: embed "" (tokens are a compile-time constant)
            uncond_tokens = jnp.asarray(tokenize([""]))
            cond_inputs = jnp.broadcast_to(
                self.embed_text(uncond_tokens), (B, 77, self.context_dim))

        unet_features: List[jnp.ndarray] = []
        for i, t in enumerate(self.steps):
            step_cond_emb = None if cond_emb is None else cond_emb[:, i]
            if t < 0:
                noisy_latent = latent
                t_vec = jnp.zeros((B,), jnp.int32)
            else:
                t_vec = jnp.full((B,), t, jnp.int32)
                if self.share_noise:
                    noise = self._shared_noise(latent.shape)
                else:
                    noise = jnp.zeros_like(latent)
                noisy_latent = self.diffusion.q_sample(latent, t_vec, noise)
            _, taps = self.unet(noisy_latent, t_vec, cond_inputs, step_cond_emb)
            unet_features.extend(taps)

        _, decoder_features = self.vae.decode(latent)

        features = [*encoder_features, *unet_features, *decoder_features]
        assert len(features) == len(self.feature_dims)
        return features


class LdmImplicitCaptionerExtractor(nn.Module):
    """LdmExtractor + implicit captioner (reference ldm.py:638-722).

    The CLIP image embedding replaces the caption: conditioning becomes
    ``uncond + tanh(alpha_cond) * PositionalLinear(clip_image_embed)`` and,
    optionally, a learnable delta ``tanh(alpha_cond_time_embed) * proj`` is
    added to the UNet time embedding.
    """

    encoder_block_indices: Tuple[int, ...] = (5, 7)
    unet_block_indices: Tuple[int, ...] = (2, 5, 8, 11)
    decoder_block_indices: Tuple[int, ...] = (2, 5)
    steps: Tuple[int, ...] = (0,)
    learnable_time_embed: bool = True
    num_timesteps: int = 1
    clip_model_name: str = "ViT-L-14"
    # tower dims (shrinkable for tests)
    model_channels: int = 320
    vae_ch: int = 128
    context_dim: int = 768
    sd_text_layers: int = 12
    # (image_size, patch, width, layers, heads, embed_dim)
    clip_vit_cfg: Tuple[int, int, int, int, int, int] = (224, 14, 1024, 24, 16, 768)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.ldm_extractor = LdmExtractor(
            encoder_block_indices=self.encoder_block_indices,
            unet_block_indices=self.unet_block_indices,
            decoder_block_indices=self.decoder_block_indices,
            steps=self.steps,
            model_channels=self.model_channels,
            vae_ch=self.vae_ch,
            context_dim=self.context_dim,
            sd_text_layers=self.sd_text_layers,
            dtype=self.dtype,
        )
        s, p, w, l, h, ed = self.clip_vit_cfg
        self.clip_image_size = s
        self.clip_visual = VisionTransformer(
            image_size=s, patch_size=p, width=w, layers=l, heads=h,
            embed_dim=ed, dtype=self.dtype)
        self.clip_project = PositionalLinear(
            self.context_dim, seq_len=77, dtype=self.dtype)
        # [1, 77, ctx]: the reference gates PER TOKEN POSITION
        # (zeros_like(uncond_inputs), ldm.py:657) — shape must match for
        # weight conversion; tanh(0)=0 keeps init behavior identical
        self.alpha_cond = self.param("alpha_cond", nn.initializers.zeros,
                                     (1, 77, self.context_dim))
        if self.learnable_time_embed:
            time_embed_dim = self.model_channels * 4
            self.time_embed_project = PositionalLinear(
                time_embed_dim, seq_len=self.num_timesteps, dtype=self.dtype)
            self.alpha_cond_time_embed = self.param(
                "alpha_cond_time_embed", nn.initializers.zeros, (1, time_embed_dim))

    def _dims_strides(self):
        return ldm_feature_dims_strides(
            self.model_channels, self.vae_ch, self.encoder_block_indices,
            self.unet_block_indices, self.decoder_block_indices, self.steps)

    @property
    def feature_dims(self):
        return self._dims_strides()[0]

    @property
    def feature_strides(self):
        return self._dims_strides()[1]

    @property
    def num_groups(self):
        return (len(self.encoder_block_indices) + len(self.unet_block_indices)
                + len(self.decoder_block_indices))

    @property
    def grouped_indices(self):
        ret = []
        for i in range(len(self.encoder_block_indices)):
            ret.append([i])
        off = len(self.encoder_block_indices)
        for i in range(len(self.unet_block_indices)):
            ret.append([i + t * len(self.unet_block_indices) + off
                        for t in range(len(self.steps))])
        off += len(self.steps) * len(self.unet_block_indices)
        for i in range(len(self.decoder_block_indices)):
            ret.append([i + off])
        return ret

    def __call__(self, img: jnp.ndarray) -> List[jnp.ndarray]:
        B = img.shape[0]
        # CLIP image embed (normalized, fp32 -> compute dtype)
        prep = clip_preprocess(img, self.clip_image_size).astype(self.dtype)
        image_embed, _ = self.clip_visual(prep)
        from ..helper import l2_normalize

        image_embed = jax.lax.stop_gradient(image_embed)
        image_embed = l2_normalize(image_embed)
        image_embed = image_embed.astype(self.dtype)

        prefix_embed = self.clip_project(image_embed)  # [B, 77, ctx]
        uncond_tokens = jnp.asarray(tokenize([""]))
        uncond = jnp.broadcast_to(
            self.ldm_extractor.embed_text(uncond_tokens),
            (B, 77, self.ldm_extractor.context_dim))
        cond_inputs = uncond + jnp.tanh(self.alpha_cond) * prefix_embed

        if self.learnable_time_embed:
            cond_emb = jnp.tanh(self.alpha_cond_time_embed)[None] * \
                self.time_embed_project(image_embed)  # [B, T, time_dim]
        else:
            cond_emb = None

        return self.ldm_extractor(img, cond_inputs=cond_inputs, cond_emb=cond_emb)


class BottleneckProjection(nn.Module):
    """d2-style bottleneck block with GroupNorm (reference
    feature_extractor.py:53-66 uses ResNet.make_stage(BottleneckBlock, GN))."""

    out_channels: int
    bottleneck_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def gn(h, name):
            g = 32 if h.shape[-1] % 32 == 0 else math.gcd(h.shape[-1], 32)
            return nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=jnp.float32,
                                name=name)(h.astype(jnp.float32)).astype(h.dtype)

        if x.shape[-1] == self.out_channels:
            # d2 BottleneckBlock omits the shortcut conv when channels match
            shortcut = x
        else:
            shortcut = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                               dtype=self.dtype, name="shortcut")(x)
            shortcut = gn(shortcut, "shortcut_norm")
        h = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.relu(gn(h, "norm1"))
        h = nn.Conv(self.bottleneck_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = nn.relu(gn(h, "norm2"))
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(h)
        h = gn(h, "norm3")
        return nn.relu(h + shortcut)


class FeatureExtractorBackbone(nn.Module):
    """Adapt a feature extractor to named s2..s5 pyramid outputs.

    ``__call__(img [B,H,W,3] in [0,1])`` -> dict name -> [B, H/s, W/s, C].
    """

    feature_extractor: nn.Module
    out_features: Sequence[str] = ("s2", "s3", "s4", "s5")
    backbone_in_size: Tuple[int, int] | int = (512, 512)
    min_stride: int = 4
    max_stride: int = 32
    projection_dim: int = 512
    use_checkpoint: bool = False
    slide_training: bool = False
    # training-only: process slide crops serially under remat (low memory)
    # instead of the fast fused batched forward (see slide_forward)
    slide_serial: bool = True
    dtype: jnp.dtype = jnp.float32

    def _grouping(self):
        """Static stride grouping (reference feature_extractor.py:88-112)."""
        fx = self.feature_extractor
        idx_to_stride = {}
        stride_to_indices: Dict[int, List[int]] = {}
        for indices in fx.grouped_indices:
            for idx in indices:
                stride = fx.feature_strides[idx]
                stride = min(max(stride, self.min_stride), self.max_stride)
                idx_to_stride[idx] = stride
                stride_to_indices.setdefault(stride, []).append(idx)
        sorted_groups = [stride_to_indices[s] for s in sorted(stride_to_indices)]
        names, strides, groups = [], {}, []
        for indices in sorted_groups:
            stride = idx_to_stride[indices[0]]
            name = f"s{int(math.log2(stride))}"
            if name not in self.out_features:
                continue
            names.append(name)
            strides[name] = stride
            groups.append(indices)
        return names, strides, groups

    def output_shape(self) -> Dict[str, dict]:
        names, strides, _ = self._grouping()
        return {
            name: {"channels": self.projection_dim, "stride": strides[name]}
            for name in names
        }

    @property
    def size_divisibility(self) -> int:
        return 64

    @property
    def slide_inference(self) -> bool:
        return not isinstance(self.backbone_in_size, int)

    def setup(self):
        self.feature_projections = [
            BottleneckProjection(self.projection_dim, self.projection_dim // 4,
                                 dtype=self.dtype, name=f"proj_{i}")
            for i in range(len(self.feature_extractor.feature_dims))
        ]

    def single_forward(self, img: jnp.ndarray, training: bool) -> Dict[str, jnp.ndarray]:
        input_size = img.shape[1:3]
        if isinstance(self.backbone_in_size, int):
            # resize shorter side (cap 1280), keep aspect, pad to /64
            h, w = input_size
            scale = self.backbone_in_size / min(h, w)
            nh, nw = int(round(h * scale)), int(round(w * scale))
            if max(nh, nw) > 1280:
                scale = 1280 / max(nh, nw)
                nh, nw = int(round(nh * scale)), int(round(nw * scale))
            nh64, nw64 = -(-nh // 64) * 64, -(-nw // 64) * 64
            img = jax.image.resize(img, (img.shape[0], nh, nw, 3), method="bicubic")
            img = jnp.pad(img, ((0, 0), (0, nh64 - nh), (0, nw64 - nw), (0, 0)))
        else:
            target = tuple(self.backbone_in_size)
            if input_size != target:
                img = jax.image.resize(
                    img, (img.shape[0],) + target + (3,), method="bicubic")

        def forward_features(features):
            names, strides, groups = self._grouping()
            out = {}
            for name, indices in zip(names, groups):
                stride = strides[name]
                acc = None
                for idx in indices:
                    f = features[idx]
                    target_hw = (input_size[0] // stride, input_size[1] // stride)
                    if f.shape[1:3] != target_hw:
                        f = jax.image.resize(
                            f, (f.shape[0],) + target_hw + (f.shape[-1],),
                            method="nearest")
                    p = self.feature_projections[idx](f)
                    acc = p if acc is None else acc + p
                out[name] = acc
            return out

        features = self.feature_extractor(img)
        # never wrap during init: param creation inside jax.checkpoint leaks
        # tracers into the returned variables (the projections' conv kernels
        # would escape the remat trace under an eager model.init)
        if self.use_checkpoint and not self.is_initializing():
            forward_features = jax.checkpoint(forward_features)
        return forward_features(features)

    def slide_forward(self, img: jnp.ndarray, training: bool) -> Dict[str, jnp.ndarray]:
        """Static crop grid; crops folded into batch for one fused forward."""
        B, h_img, w_img, _ = img.shape
        if self.slide_training and training:
            short_side = min(min(self.backbone_in_size), h_img, w_img)
        else:
            short_side = min(h_img, w_img)
        crop = stride = short_side
        h_grids = max(h_img - crop + stride - 1, 0) // stride + 1
        w_grids = max(w_img - crop + stride - 1, 0) // stride + 1

        boxes = []
        for hi in range(h_grids):
            for wi in range(w_grids):
                y2, x2 = min(hi * stride + crop, h_img), min(wi * stride + crop, w_img)
                y1, x1 = max(y2 - crop, 0), max(x2 - crop, 0)
                boxes.append((y1, x1))
        G = len(boxes)
        if training and self.slide_serial and G > 1:
            # memory-lean training path: crops processed serially with the
            # whole per-crop forward rematerialized, so peak activation
            # memory is one crop instead of G (the reference is also
            # crop-serial, feature_extractor.py:216-244). lax.scan over the
            # crop origins keeps the SD tower in the graph ONCE (a Python
            # unroll made the 1024px train graph too large to compile).
            # Eval keeps the fast fused batched path below.
            def body(mdl, carry, origin):
                crop_img = jax.lax.dynamic_slice(
                    img, (0, origin[0], origin[1], 0), (B, crop, crop, 3))
                return carry, mdl.single_forward(crop_img, training)

            scanned = nn.scan(
                nn.remat(body, prevent_cse=False),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0, out_axes=0)
            _, stacked = scanned(self, None, jnp.asarray(boxes, jnp.int32))
            # [G, B, h, w, C] -> [G*B, h, w, C] (crop-major, matching the
            # fused path's concatenate order)
            crop_feats = {k: v.reshape((G * B,) + v.shape[2:])
                          for k, v in stacked.items()}
        else:
            crops = jnp.concatenate(
                [jax.lax.dynamic_slice(img, (0, y1, x1, 0), (B, crop, crop, 3))
                 for (y1, x1) in boxes], axis=0)  # [G*B, crop, crop, 3]
            crop_feats = self.single_forward(crops, training)

        names, strides, _ = self._grouping()
        out, cnt = {}, {}
        for name in names:
            s = strides[name]
            out[name] = jnp.zeros((B, h_img // s, w_img // s, self.projection_dim),
                                  crop_feats[name].dtype)
            cnt[name] = jnp.zeros((1, h_img // s, w_img // s, 1), jnp.float32)
        for gi, (y1, x1) in enumerate(boxes):
            for name in names:
                s = strides[name]
                f = crop_feats[name][gi * B:(gi + 1) * B]
                ky, kx = y1 // s, x1 // s
                fh, fw = f.shape[1:3]
                pad = [(0, 0), (ky, out[name].shape[1] - ky - fh),
                       (kx, out[name].shape[2] - kx - fw), (0, 0)]
                out[name] = out[name] + jnp.pad(f, pad)
                ones = jnp.ones((1, fh, fw, 1), jnp.float32)
                cnt[name] = cnt[name] + jnp.pad(ones, pad)
        return {k: out[k] / cnt[k].astype(out[k].dtype) for k in out}

    def __call__(self, img: jnp.ndarray, training: bool = False) -> Dict[str, jnp.ndarray]:
        if (training and not self.slide_training) or not self.slide_inference:
            return self.single_forward(img, training)
        return self.slide_forward(img, training)
