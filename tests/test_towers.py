"""Shape/structure tests for the frozen towers (tiny configs for the 1-core CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odise_tpu.models.clip.model import CLIP, TextTransformer, VisionTransformer
from odise_tpu.models.clip.tokenizer import tokenize, default_tokenizer
from odise_tpu.models.clip.adapter import (
    build_mask_attn_mask,
    clip_preprocess,
    embed_image,
    embed_text,
)
from odise_tpu.models.sd.unet import UNetModel, timestep_embedding
from odise_tpu.models.sd.vae import AutoencoderKL


def test_timestep_embedding_shape_and_values():
    emb = timestep_embedding(jnp.array([0, 10]), 8)
    assert emb.shape == (2, 8)
    # t=0: cos(0)=1, sin(0)=0 -> first half ones, second half zeros
    np.testing.assert_allclose(np.asarray(emb[0, :4]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), 0.0, atol=1e-6)


def test_vae_shapes_and_taps():
    vae = AutoencoderKL(ch=8, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
                        encoder_tap_indices=(5, 7), decoder_tap_indices=(2, 5))
    x = jnp.zeros((1, 64, 64, 3))
    params = vae.init(jax.random.PRNGKey(0), x)
    rgb, z, enc_taps, dec_taps = vae.apply(params, x)
    assert z.shape == (1, 8, 8, 4)  # /8 latent
    assert rgb.shape == (1, 64, 64, 3)
    # encoder taps: idx5 = level2 block1 input (stride 4, ch=8*4)
    assert enc_taps[0].shape == (1, 16, 16, 32)
    # idx7 = level3 block1 input (stride 8, ch=8*4)
    assert enc_taps[1].shape == (1, 8, 8, 32)
    # decoder taps: idx2 @ stride 8 ch 32, idx5 @ stride 4 ch 32
    assert dec_taps[0].shape == (1, 8, 8, 32)
    assert dec_taps[1].shape == (1, 16, 16, 32)


def test_unet_shapes_and_tap_channels():
    unet = UNetModel(model_channels=8, num_heads=2, context_dim=16,
                     tap_indices=(2, 5, 8, 11))
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 7, 16))
    t = jnp.array([0])
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    eps, taps = unet.apply(params, x, t, ctx)
    assert eps.shape == x.shape
    # channel pattern must match the reference taps (2560,1920,960,640)/320*mc
    mc = 8
    assert taps[0].shape == (1, 2, 2, mc * 8)        # idx2: 2560/320 = 8x
    assert taps[1].shape == (1, 4, 4, mc * 6)        # idx5: 1920/320 = 6x
    assert taps[2].shape == (1, 8, 8, mc * 3)        # idx8: 960/320 = 3x
    assert taps[3].shape == (1, 16, 16, mc * 2)      # idx11: 640/320 = 2x


def test_unet_cond_emb_changes_output():
    unet = UNetModel(model_channels=8, num_heads=2, context_dim=16)
    x = jnp.ones((1, 16, 16, 4))
    ctx = jnp.zeros((1, 7, 16))
    t = jnp.array([0])
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    # zero-init output convs make the net independent of emb at init; fill
    # every zero kernel with noise to exercise the full graph.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [
        jnp.where(jnp.all(l == 0), jax.random.normal(k, l.shape) * 0.02, l)
        for l, k in zip(leaves, keys)
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    eps1, _ = unet.apply(params, x, t, ctx)
    cond = jnp.ones((1, 32))
    eps2, _ = unet.apply(params, x, t, ctx, cond_emb=cond)
    assert not np.allclose(np.asarray(eps1), np.asarray(eps2))


def test_clip_text_tower():
    txt = TextTransformer(vocab_size=100, context_length=12, width=16, layers=2,
                          heads=2, embed_dim=8)
    tokens = jnp.array([[99, 5, 7, 98, 0, 0, 0, 0, 0, 0, 0, 0]])
    params = txt.init(jax.random.PRNGKey(0), tokens)
    embed, enc = txt.apply(params, tokens)
    assert embed.shape == (1, 8)
    assert enc.shape == (1, 12, 16)


def test_clip_vision_tower_and_masked_forward():
    vit = VisionTransformer(image_size=32, patch_size=8, width=16, layers=2,
                            heads=2, embed_dim=8)
    img = jnp.zeros((2, 32, 32, 3))
    params = vit.init(jax.random.PRNGKey(0), img)
    embed, enc = vit.apply(params, img)
    assert embed.shape == (2, 8)
    assert enc.shape == (2, 4, 4, 8)

    # masked forward: Q=3 mask tokens
    Q = 3
    mask_logits = jnp.full((2, Q, 32, 32), -5.0)
    mask_logits = mask_logits.at[:, 0, :16, :16].set(5.0)
    attn_mask = build_mask_attn_mask(mask_logits, patch_size=8, num_image_tokens=16)
    assert attn_mask.shape == (2, Q + 1 + 16, Q + 1 + 16)
    out = vit.apply(params, img, mask_tokens=Q, attn_mask=attn_mask)
    assert out.shape == (2, Q, 8)
    assert bool(jnp.isfinite(out).all())


def test_clip_preprocess_shapes():
    img = jnp.ones((1, 48, 64, 3)) * 0.5
    out = clip_preprocess(img, 32)
    assert out.shape == (1, 32, 32, 3)


def test_tokenizer_roundtrip_and_shape():
    toks = tokenize(["a photo of a cat", "dog"])
    assert toks.shape == (2, 77)
    tok = default_tokenizer()
    assert toks[0, 0] == tok.sot_token
    # eot present in each row
    assert (toks[0] == tok.eot_token).any()
    assert (toks[1] == tok.eot_token).any()
    # deterministic
    np.testing.assert_array_equal(toks, tokenize(["a photo of a cat", "dog"]))


def test_embed_text_adapter():
    txt = TextTransformer(vocab_size=49408, context_length=77, width=16, layers=1,
                          heads=2, embed_dim=8)
    tokens = jnp.asarray(tokenize(["hello world"]))
    params = txt.init(jax.random.PRNGKey(0), tokens)
    out = embed_text(lambda t: txt.apply(params, t), tokens)
    assert out.text_embed.shape == (1, 8)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out.text_embed)), 1.0, rtol=1e-5)
    assert out.text_mask.shape == (1, 77)


def test_latent_diffusion_text_to_image_tiny():
    """Full guided-DDIM text->image path on a tiny LatentDiffusion."""
    from odise_tpu.models.sd.ldm import LatentDiffusion
    from odise_tpu.models.clip.tokenizer import tokenize

    class TinyLDM(LatentDiffusion):
        @property
        def latent_image_size(self):
            return (8, 8)

    ldm = TinyLDM(model_channels=8, vae_ch=8, context_dim=16, sd_text_layers=1,
                  ddim_steps=2, num_timesteps=16)
    toks = jnp.asarray(tokenize(["a cat"]))
    variables = ldm.init(jax.random.PRNGKey(0), toks, jax.random.PRNGKey(1))
    img = ldm.apply(variables, toks, jax.random.PRNGKey(2))
    assert img.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(img).all())
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0


def test_clip_split_stream_matches_fused_masked_forward():
    """Split-stream reader attention (build_mask_reader_mask path) must
    equal the fused masked attention exactly (same math, no (Q+L)^2
    softmax). Random image + random masks, nontrivial batch."""
    from odise_tpu.models.clip.adapter import build_mask_reader_mask

    vit = VisionTransformer(image_size=32, patch_size=8, width=16, layers=3,
                            heads=2, embed_dim=8)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    params = vit.init(jax.random.PRNGKey(0), img)
    Q = 4
    mask_logits = jnp.asarray(rng.randn(2, Q, 32, 32).astype(np.float32) * 4)

    fused = vit.apply(params, img, mask_tokens=Q,
                      attn_mask=build_mask_attn_mask(mask_logits, 8, 16))
    split = vit.apply(params, img, mask_tokens=Q,
                      reader_mask=build_mask_reader_mask(mask_logits, 8, 16))
    np.testing.assert_allclose(np.asarray(split), np.asarray(fused),
                               rtol=2e-4, atol=2e-5)


def test_tokenizer_with_merges_file(tmp_path):
    """The ODISE_TPU_CLIP_BPE merges-file path: merges must be applied in
    rank order and the vocab laid out CLIP-style (256 bytes, 256 </w>
    bytes, merges, SOT/EOT) so the real file drops in unchanged."""
    import gzip
    from odise_tpu.models.clip.tokenizer import SimpleTokenizer

    bpe = tmp_path / "mini_bpe.txt.gz"
    with gzip.open(bpe, "wt", encoding="utf-8") as f:
        f.write("#version: mini\n")
        f.write("h e\nhe l\nhel l\nhell o</w>\nl o</w>\n")
    tok = SimpleTokenizer(str(bpe))
    assert tok.is_clip_compatible
    # "hello" collapses to the single merged token
    assert tok.bpe("hello") == "hello</w>"
    enc = tok.encode("hello")
    assert enc == [tok.encoder["hello</w>"]]
    # merged token ids start after the 512 byte-level entries
    assert tok.encoder["hello</w>"] >= 512
    # unmerged text falls back to byte-level pieces and roundtrips
    assert tok.decode(tok.encode("xyz")).strip() == "xyz"


def test_tokenizer_word_split_matches_clip_pattern_exactly():
    """Both word-split patterns (the verbatim CLIP pattern via the `regex`
    module and the stdlib fallback) must produce IDENTICAL token splits on
    every label-file entry this framework ever tokenizes, plus adversarial
    unicode (reference tokenization: open_clip.tokenize, used at
    odise/modeling/meta_arch/clip.py:64,165)."""
    import glob
    import os
    import re as _re

    regex = pytest.importorskip("regex")

    clip_pat = regex.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
        regex.IGNORECASE,
    )
    stdlib_pat = _re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[^\W\d_]+|\d|(?:[^\s\w]|_)+""",
        _re.IGNORECASE,
    )

    corpus = [
        "a photo of a cat", "It's the dog's day; they're 100% sure!",
        "café naïve résumé  Ångström", "straße söße", "日本語のラベル",
        "x_y_z under_scores", "3.14159 26 weird--punct...!?",
        "<|startoftext|>mixed<|endoftext|>",
        "there is a big flat screen tv in the photo",
        "emoji 🙂 and symbols ©®™ and mixed a1b2c3",
    ]
    label_dir = os.path.join(
        os.path.dirname(__file__), "..", "odise_tpu", "data", "datasets",
        "openseg_labels")
    for path in sorted(glob.glob(os.path.join(label_dir, "*.txt"))):
        with open(path, encoding="utf-8") as f:
            corpus.extend(f.read().splitlines())
    assert len(corpus) > 3000  # the full label universe really loaded

    from odise_tpu.models.clip.tokenizer import (_PAT, _basic_clean,
                                                 _whitespace_clean)

    for raw in corpus:
        text = _whitespace_clean(_basic_clean(raw)).lower()
        want = clip_pat.findall(text)
        assert stdlib_pat.findall(text) == want, raw
        assert _PAT.findall(text) == want, raw


# Known-true openai-CLIP/open_clip token ids ("a photo of a cat" is the
# canonical example in the CLIP repo docs). Only checkable when the real
# merge table is present (is_clip_compatible); committed so the assertion
# is live the moment bpe_simple_vocab_16e6.txt.gz lands (PARITY.md).
GOLDEN_CLIP_IDS = {
    "a photo of a cat": [49406, 320, 1125, 539, 320, 2368, 49407],
    "a photo of a dog": [49406, 320, 1125, 539, 320, 1929, 49407],
}


def test_tokenizer_golden_clip_ids():
    tok = default_tokenizer()
    if not tok.is_clip_compatible:
        pytest.skip("real CLIP merge table not present in this image "
                    "(zero-egress); golden ids are pinned for the day "
                    "it lands")
    for text, ids in GOLDEN_CLIP_IDS.items():
        got = [tok.sot_token] + tok.encode(text) + [tok.eot_token]
        assert got == ids, (text, got)
