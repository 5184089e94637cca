"""Multi-step LdmExtractor: the ``t > 0`` shared-noise q_sample branch.

The reference supports extracting UNet taps at several diffusion timesteps
(``LdmExtractor(steps=(0, 1, ...))``, reference ldm.py:552-607: for t>0 the
latent is diffused with the FIXED seed-42 noise, bicubic-resized to the
latent shape, via ``q_sample``). The default recipe uses ``steps=(0,)``, so
this branch is otherwise never exercised — this test pins its semantics with
an independently hand-computed noisy latent (VERDICT r3 weak #7).
"""

import jax
import jax.numpy as jnp
import numpy as np

from odise_tpu.models.backbone.feature_extractor import LdmExtractor


def _tiny(steps):
    return LdmExtractor(model_channels=8, vae_ch=8, context_dim=16,
                        sd_text_layers=1, steps=steps, dtype=jnp.float32)


def test_multistep_t1_matches_hand_computed_q_sample():
    ext0 = _tiny((0,))
    ext1 = _tiny((1,))
    img = jnp.asarray(
        np.random.RandomState(3).rand(1, 64, 64, 3).astype(np.float32))
    variables = ext0.init(jax.random.PRNGKey(0), img)

    feats0 = ext0.apply(variables, img)
    feats1 = ext1.apply(variables, img)  # same params, t=1 branch
    n_enc, n_unet, n_dec = 2, 4, 2
    assert len(feats0) == len(feats1) == n_enc + n_unet + n_dec

    # encoder/decoder taps don't depend on the UNet timestep
    for i in list(range(n_enc)) + [n_enc + n_unet, n_enc + n_unet + 1]:
        np.testing.assert_allclose(np.asarray(feats0[i]),
                                   np.asarray(feats1[i]), atol=1e-6)

    # hand-compute the t=1 noisy latent from first principles (reference
    # ldm.py:583-598: fixed seed-42 noise resized bicubic to the latent
    # grid, q_sample = sqrt(acp[t])*x0 + sqrt(1-acp[t])*noise) and run the
    # UNet on it directly — must equal the extractor's t=1 unet taps
    def hand(mod, img):
        x = (img - 0.5) / 0.5
        latent, _ = mod.vae.encode(x)
        base = jax.random.normal(jax.random.PRNGKey(42), (1, 64, 64, 4),
                                 jnp.float32)
        noise = jax.image.resize(base, (1,) + latent.shape[1:3] + (4,),
                                 method="bicubic")
        acp = np.asarray(mod.diffusion.alphas_cumprod)
        noisy = (np.sqrt(acp[1]) * latent
                 + np.sqrt(1.0 - acp[1]) * jnp.broadcast_to(noise, latent.shape))
        from odise_tpu.models.clip.tokenizer import tokenize

        cond = jnp.broadcast_to(
            mod.embed_text(jnp.asarray(tokenize([""]))), (1, 77, 16))
        _, taps = mod.unet(noisy, jnp.full((1,), 1, jnp.int32), cond, None)
        return taps

    expected = ext1.apply(variables, img, method=hand)
    for i in range(n_unet):
        np.testing.assert_allclose(np.asarray(feats1[n_enc + i]),
                                   np.asarray(expected[i]),
                                   rtol=1e-5, atol=1e-5)

    # and the branch actually does something: t=1 unet taps != t=0 taps
    diffs = [float(jnp.abs(feats1[n_enc + i] - feats0[n_enc + i]).max())
             for i in range(n_unet)]
    assert max(diffs) > 1e-4, diffs


def test_multistep_grouping_and_dims():
    """steps=(0,1): 2x unet taps; grouped_indices pools each tap across
    timesteps (reference ldm.py:368-388); feature_dims/strides align."""
    ext = _tiny((0, 1))
    assert len(ext.feature_dims) == 2 + 2 * 4 + 2
    groups = ext.grouped_indices
    assert groups[2] == [2, 6] and groups[5] == [5, 9]
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = ext.init(jax.random.PRNGKey(0), img)
    feats = ext.apply(variables, img)
    assert len(feats) == len(ext.feature_dims)
    for f, d in zip(feats, ext.feature_dims):
        assert f.shape[-1] == d, (f.shape, d)
