"""LatentDiffusion wrapper: full SD capability surface.

Capability parity with the reference's ``LatentDiffusion`` wrapper
(reference odise/modeling/meta_arch/ldm.py:33-233): LDM config map
(sd://v1-3..v2-1 -> image/latent sizes), text embedding, VAE encode/decode,
classifier-free-guidance model application, and ``forward_test`` — full DDIM
text-to-image sampling (ldm.py:178-233). The feature-extraction path lives in
backbone/feature_extractor.py; this wrapper provides the generative API.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...diffusion import SpacedDiffusion, get_named_beta_schedule, space_timesteps
from ..clip.model import TextTransformer
from ..clip.tokenizer import tokenize
from .unet import UNetModel
from .vae import AutoencoderKL

# sd://version -> (image size, latent size) (reference ldm.py:66-74)
LDM_CONFIGS = {
    "sd://v1-3": ((512, 512), (64, 64)),
    "sd://v1-4": ((512, 512), (64, 64)),
    "sd://v1-5": ((512, 512), (64, 64)),
    "sd://v2-0": ((512, 512), (64, 64)),
    "sd://v2-1": ((768, 768), (96, 96)),
}


class LatentDiffusion(nn.Module):
    """SD v1 wrapper with text-conditional DDIM sampling."""

    diffusion_version: str = "sd://v1-3"
    num_timesteps: int = 1000
    ddim_steps: int = 50
    guidance_scale: float = 7.5
    # tower dims (shrinkable for tests)
    model_channels: int = 320
    vae_ch: int = 128
    context_dim: int = 768
    sd_text_layers: int = 12
    dtype: jnp.dtype = jnp.float32

    @property
    def image_size(self) -> Tuple[int, int]:
        return LDM_CONFIGS[self.diffusion_version][0]

    @property
    def latent_image_size(self) -> Tuple[int, int]:
        return LDM_CONFIGS[self.diffusion_version][1]

    latent_dim: int = 4

    def setup(self):
        self.vae = AutoencoderKL(ch=self.vae_ch, dtype=self.dtype)
        self.unet = UNetModel(model_channels=self.model_channels,
                              context_dim=self.context_dim, tap_indices=(),
                              dtype=self.dtype)
        self.text_encoder = TextTransformer(
            width=self.context_dim, layers=self.sd_text_layers,
            heads=max(1, self.context_dim // 64), embed_dim=self.context_dim,
            dtype=self.dtype)
        betas = get_named_beta_schedule("ldm_linear", self.num_timesteps)
        self.diffusion = SpacedDiffusion(
            use_timesteps=space_timesteps(self.num_timesteps,
                                          f"ldm_ddim{self.ddim_steps}"),
            betas=betas,
        )

    def embed_text(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """[B, 77] -> [B, 77, 768] conditioning (ln_final hidden states)."""
        _, enc = self.text_encoder(tokens)
        return enc.astype(self.dtype)

    def encode_to_latent(self, image: jnp.ndarray) -> jnp.ndarray:
        z, _ = self.vae.encode(image)
        return z

    def decode_from_latent(self, z: jnp.ndarray) -> jnp.ndarray:
        rgb, _ = self.vae.decode(z)
        return rgb

    def apply_model_with_guidance(self, x, t, cond, uncond) -> jnp.ndarray:
        """Classifier-free guidance (reference ldm.py:140-149): one batched
        UNet call over [cond; uncond], then lerp by guidance_scale."""
        B = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        c2 = jnp.concatenate([cond, uncond], axis=0)
        eps, _ = self.unet(x2, t2, c2)
        eps_c, eps_u = eps[:B], eps[B:]
        return eps_u + self.guidance_scale * (eps_c - eps_u)

    def forward_test(self, tokens: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """Full text -> image DDIM sampling (reference ldm.py:178-233)."""
        B = tokens.shape[0]
        cond = self.embed_text(tokens)
        uncond_tokens = jnp.broadcast_to(jnp.asarray(tokenize([""])), tokens.shape)
        uncond = self.embed_text(uncond_tokens)
        h, w = self.latent_image_size

        def model_fn(x, t, **kw):
            return self.apply_model_with_guidance(x, t, cond, uncond)

        # Unrolled DDIM loop: flax modules cannot be called inside lax.scan
        # bodies (tracer leak); ddim_steps is small and static, so unrolling
        # is fine for this non-hot generative path.
        rng, init_rng = jax.random.split(rng)
        latent = jax.random.normal(init_rng, (B, h, w, self.latent_dim),
                                   jnp.float32)
        for t_scalar in range(self.diffusion.num_timesteps - 1, -1, -1):
            t_vec = jnp.full((B,), t_scalar, jnp.int32)
            latent = self.diffusion.ddim_sample(
                model_fn, latent, t_vec, clip_denoised=True)["sample"]
        image = self.decode_from_latent(latent.astype(self.dtype))
        return jnp.clip((image + 1.0) / 2.0, 0.0, 1.0)

    def __call__(self, tokens: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        return self.forward_test(tokens, rng)
