"""Structural round-trip tests for the SD weight converters.

A synthetic CompVis-layout state dict (keys+shapes generated from the
architecture definition, independently of the converter) is converted and must
match the Flax init tree EXACTLY — catching any naming or layout drift that
would silently corrupt real-weight loading.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odise_tpu.model_zoo.convert import convert_sd_unet, convert_sd_vae
from odise_tpu.models.sd.unet import UNetModel
from odise_tpu.models.sd.vae import AutoencoderKL


def _conv(sd, name, cin, cout, k=3):
    sd[f"{name}.weight"] = np.zeros((cout, cin, k, k), np.float32)
    sd[f"{name}.bias"] = np.zeros((cout,), np.float32)


def _lin(sd, name, cin, cout, bias=True):
    sd[f"{name}.weight"] = np.zeros((cout, cin), np.float32)
    if bias:
        sd[f"{name}.bias"] = np.zeros((cout,), np.float32)


def _norm(sd, name, c):
    sd[f"{name}.weight"] = np.zeros((c,), np.float32)
    sd[f"{name}.bias"] = np.zeros((c,), np.float32)


def _vae_resblock(sd, name, cin, cout):
    _norm(sd, f"{name}.norm1", cin)
    _conv(sd, f"{name}.conv1", cin, cout)
    _norm(sd, f"{name}.norm2", cout)
    _conv(sd, f"{name}.conv2", cout, cout)
    if cin != cout:
        _conv(sd, f"{name}.nin_shortcut", cin, cout, k=1)


def _vae_attn(sd, name, c):
    _norm(sd, f"{name}.norm", c)
    for n in ("q", "k", "v", "proj_out"):
        _conv(sd, f"{name}.{n}", c, c, k=1)


def synth_vae_state_dict(ch=8, mult=(1, 2, 4, 4), nrb=2, z=4):
    sd = {}
    p = "first_stage_model."
    # encoder
    _conv(sd, p + "encoder.conv_in", 3, ch)
    cin = ch
    for i, m in enumerate(mult):
        cout = ch * m
        for j in range(nrb):
            _vae_resblock(sd, p + f"encoder.down.{i}.block.{j}", cin, cout)
            cin = cout
        if i != len(mult) - 1:
            _conv(sd, p + f"encoder.down.{i}.downsample.conv", cin, cin)
    _vae_resblock(sd, p + "encoder.mid.block_1", cin, cin)
    _vae_attn(sd, p + "encoder.mid.attn_1", cin)
    _vae_resblock(sd, p + "encoder.mid.block_2", cin, cin)
    _norm(sd, p + "encoder.norm_out", cin)
    _conv(sd, p + "encoder.conv_out", cin, 2 * z)
    # decoder
    top = ch * mult[-1]
    _conv(sd, p + "decoder.conv_in", z, top)
    _vae_resblock(sd, p + "decoder.mid.block_1", top, top)
    _vae_attn(sd, p + "decoder.mid.attn_1", top)
    _vae_resblock(sd, p + "decoder.mid.block_2", top, top)
    cin = top
    for i in reversed(range(len(mult))):
        cout = ch * mult[i]
        for j in range(nrb + 1):
            _vae_resblock(sd, p + f"decoder.up.{i}.block.{j}", cin, cout)
            cin = cout
        if i != 0:
            _conv(sd, p + f"decoder.up.{i}.upsample.conv", cin, cin)
    _norm(sd, p + "decoder.norm_out", cin)
    _conv(sd, p + "decoder.conv_out", cin, 3)
    _conv(sd, p + "quant_conv", 2 * z, 2 * z, k=1)
    _conv(sd, p + "post_quant_conv", z, z, k=1)
    return sd


def _unet_resblock(sd, name, cin, cout, temb):
    _norm(sd, f"{name}.in_layers.0", cin)
    _conv(sd, f"{name}.in_layers.2", cin, cout)
    _lin(sd, f"{name}.emb_layers.1", temb, cout)
    _norm(sd, f"{name}.out_layers.0", cout)
    _conv(sd, f"{name}.out_layers.3", cout, cout)
    if cin != cout:
        _conv(sd, f"{name}.skip_connection", cin, cout, k=1)


def _unet_attn(sd, name, c, ctx):
    _norm(sd, f"{name}.norm", c)
    _conv(sd, f"{name}.proj_in", c, c, k=1)
    b = f"{name}.transformer_blocks.0"
    _lin(sd, f"{b}.attn1.to_q", c, c, bias=False)
    _lin(sd, f"{b}.attn1.to_k", c, c, bias=False)
    _lin(sd, f"{b}.attn1.to_v", c, c, bias=False)
    _lin(sd, f"{b}.attn1.to_out.0", c, c)
    _lin(sd, f"{b}.attn2.to_q", c, c, bias=False)
    _lin(sd, f"{b}.attn2.to_k", ctx, c, bias=False)
    _lin(sd, f"{b}.attn2.to_v", ctx, c, bias=False)
    _lin(sd, f"{b}.attn2.to_out.0", c, c)
    _lin(sd, f"{b}.ff.net.0.proj", c, c * 8)
    _lin(sd, f"{b}.ff.net.2", c * 4, c)
    for n in ("norm1", "norm2", "norm3"):
        _norm(sd, f"{b}.{n}", c)
    _conv(sd, f"{name}.proj_out", c, c, k=1)


def synth_unet_state_dict(mc=8, mult=(1, 2, 4, 4), nrb=2, ctx=16,
                          attn_ds=(1, 2, 4)):
    sd = {}
    p = "model.diffusion_model."
    temb = mc * 4
    _lin(sd, p + "time_embed.0", mc, temb)
    _lin(sd, p + "time_embed.2", temb, temb)
    _conv(sd, p + "input_blocks.0.0", 4, mc)
    ds = 1
    k = 0
    chans = [mc]
    cin = mc
    for i, m in enumerate(mult):
        cout = mc * m
        for _ in range(nrb):
            k += 1
            _unet_resblock(sd, p + f"input_blocks.{k}.0", cin, cout, temb)
            if ds in attn_ds:
                _unet_attn(sd, p + f"input_blocks.{k}.1", cout, ctx)
            cin = cout
            chans.append(cin)
        if i != len(mult) - 1:
            k += 1
            _conv(sd, p + f"input_blocks.{k}.0.op", cin, cin)
            chans.append(cin)
            ds *= 2
    _unet_resblock(sd, p + "middle_block.0", cin, cin, temb)
    _unet_attn(sd, p + "middle_block.1", cin, ctx)
    _unet_resblock(sd, p + "middle_block.2", cin, cin, temb)
    oi = 0
    for i in reversed(range(len(mult))):
        cout = mc * mult[i]
        for j in range(nrb + 1):
            skip = chans.pop()
            _unet_resblock(sd, p + f"output_blocks.{oi}.0", cin + skip, cout, temb)
            mod = 1
            if ds in attn_ds:
                _unet_attn(sd, p + f"output_blocks.{oi}.{mod}", cout, ctx)
                mod += 1
            if i != 0 and j == nrb:
                _conv(sd, p + f"output_blocks.{oi}.{mod}.conv", cout, cout)
                ds //= 2
            cin = cout
            oi += 1
    _norm(sd, p + "out.0", cin)
    _conv(sd, p + "out.2", cin, 4)
    return sd


def _paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(np.shape(v))
    return out


def test_vae_converter_matches_flax_structure():
    sd = synth_vae_state_dict()
    tree = convert_sd_vae(sd)
    vae = AutoencoderKL(ch=8, encoder_tap_indices=(5, 7), decoder_tap_indices=(2, 5))
    ref = jax.eval_shape(lambda: vae.init(jax.random.PRNGKey(0),
                                          jnp.zeros((1, 32, 32, 3))))
    got = _paths(tree)
    want = _paths(jax.tree_util.tree_map(lambda s: s, ref["params"]))
    assert got == want, (sorted(set(want) - set(got))[:5],
                         sorted(set(got) - set(want))[:5],
                         {k: (want.get(k), got.get(k)) for k in want
                          if want.get(k) != got.get(k)})


def test_unet_converter_matches_flax_structure():
    sd = synth_unet_state_dict()
    tree = convert_sd_unet(sd)
    unet = UNetModel(model_channels=8, context_dim=16, num_heads=2,
                     tap_indices=())
    ref = jax.eval_shape(lambda: unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 7, 16))))
    got = _paths(tree)
    want = _paths(jax.tree_util.tree_map(lambda s: s, ref["params"]))
    assert got == want, (sorted(set(want) - set(got))[:5],
                         sorted(set(got) - set(want))[:5],
                         [(k, want.get(k), got.get(k)) for k in want
                          if want.get(k) != got.get(k)][:5])


def _mha(sd, name, c):
    sd[f"{name}.in_proj_weight"] = np.zeros((3 * c, c), np.float32)
    sd[f"{name}.in_proj_bias"] = np.zeros((3 * c,), np.float32)
    _lin(sd, f"{name}.out_proj", c, c)


def _d2_conv_gn(sd, name, cin, cout, k=3):
    sd[f"{name}.weight"] = np.zeros((cout, cin, k, k), np.float32)
    _norm(sd, f"{name}.norm", cout)


def synth_odise_trainable_state_dict(hid=32, clip_dim=16, queries=10,
                                     enc_layers=2, dec_layers=3,
                                     proj_dims=(32, 32, 64, 48, 24, 16, 32, 32),
                                     nlevels=3, npoints=4, nheads=4):
    """Reference module names for the trainable subset (tiny dims)."""
    sd = {}
    # backbone projections (d2 BottleneckBlock inside Sequential)
    for i, cin in enumerate(proj_dims):
        b = f"backbone.feature_projections.{i}.0"
        if cin != hid:
            _d2_conv_gn(sd, f"{b}.shortcut", cin, hid, k=1)
        _d2_conv_gn(sd, f"{b}.conv1", cin, hid // 4, k=1)
        _d2_conv_gn(sd, f"{b}.conv2", hid // 4, hid // 4, k=3)
        _d2_conv_gn(sd, f"{b}.conv3", hid // 4, hid, k=1)
    # implicit captioner
    _lin(sd, "backbone.feature_extractor.clip_project.linear", clip_dim, clip_dim)
    sd["backbone.feature_extractor.clip_project.positional_embedding"] = \
        np.zeros((1, 77, clip_dim), np.float32)
    # real reference: zeros_like(uncond_inputs) = [1, 77, ctx] (ldm.py:657)
    sd["backbone.feature_extractor.alpha_cond"] = np.zeros((1, 77, clip_dim), np.float32)
    _lin(sd, "backbone.feature_extractor.time_embed_project.linear", clip_dim, 8 * 4)
    sd["backbone.feature_extractor.time_embed_project.positional_embedding"] = \
        np.zeros((1, 1, 8 * 4), np.float32)
    # real reference: 1-D [time_embed_dim] (ldm.py:668); converter reshapes
    sd["backbone.feature_extractor.alpha_cond_time_embed"] = np.zeros((8 * 4,), np.float32)
    # pixel decoder
    pd = "sem_seg_head.pixel_decoder"
    for i in range(nlevels):
        sd[f"{pd}.input_proj.{i}.0.weight"] = np.zeros((hid, hid, 1, 1), np.float32)
        sd[f"{pd}.input_proj.{i}.0.bias"] = np.zeros((hid,), np.float32)
        sd[f"{pd}.input_proj.{i}.1.weight"] = np.zeros((hid,), np.float32)
        sd[f"{pd}.input_proj.{i}.1.bias"] = np.zeros((hid,), np.float32)
    sd[f"{pd}.transformer.level_embed"] = np.zeros((nlevels, hid), np.float32)
    for i in range(enc_layers):
        e = f"{pd}.transformer.encoder.layers.{i}"
        _lin(sd, f"{e}.self_attn.sampling_offsets", hid, nheads * nlevels * npoints * 2)
        _lin(sd, f"{e}.self_attn.attention_weights", hid, nheads * nlevels * npoints)
        _lin(sd, f"{e}.self_attn.value_proj", hid, hid)
        _lin(sd, f"{e}.self_attn.output_proj", hid, hid)
        _lin(sd, f"{e}.linear1", hid, 64)
        _lin(sd, f"{e}.linear2", 64, hid)
        _norm(sd, f"{e}.norm1", hid)
        _norm(sd, f"{e}.norm2", hid)
    _d2_conv_gn(sd, f"{pd}.lateral_convs.0", hid, hid, k=1)
    _d2_conv_gn(sd, f"{pd}.output_convs.0", hid, hid, k=3)
    _conv(sd, f"{pd}.mask_features", hid, hid, k=3)
    # predictor
    pr = "sem_seg_head.predictor"
    for n in ("query_feat", "query_embed"):
        sd[f"{pr}.{n}.weight"] = np.zeros((queries, hid), np.float32)
    sd[f"{pr}.level_embed.weight"] = np.zeros((nlevels, hid), np.float32)
    for i in range(dec_layers):
        _mha(sd, f"{pr}.transformer_cross_attention_layers.{i}.multihead_attn", hid)
        _norm(sd, f"{pr}.transformer_cross_attention_layers.{i}.norm", hid)
        _mha(sd, f"{pr}.transformer_self_attention_layers.{i}.self_attn", hid)
        _norm(sd, f"{pr}.transformer_self_attention_layers.{i}.norm", hid)
        _lin(sd, f"{pr}.transformer_ffn_layers.{i}.linear1", hid, 64)
        _lin(sd, f"{pr}.transformer_ffn_layers.{i}.linear2", 64, hid)
        _norm(sd, f"{pr}.transformer_ffn_layers.{i}.norm", hid)
    _norm(sd, f"{pr}.decoder_norm", hid)
    for i in range(3):
        cin = hid
        _lin(sd, f"{pr}.mask_embed.layers.{i}", cin, hid)
    pme = f"{pr}.post_mask_embed"
    _norm(sd, f"{pme}.pool_proj.0", hid)
    _lin(sd, f"{pme}.pool_proj.1", hid, hid)
    _norm(sd, f"{pme}.mask_embed.0", hid)
    for i in range(3):
        _lin(sd, f"{pme}.mask_embed.1.layers.{i}", hid, hid)
    sd[f"{pme}.logit_scale"] = np.zeros((), np.float32)
    # category head
    _lin(sd, "category_head.text_proj", clip_dim, hid)
    sd["category_head.null_embed"] = np.zeros((1, clip_dim), np.float32)
    return sd


def test_odise_trainable_converter_matches_model_structure():
    from odise_tpu.model_zoo.convert import convert_odise_trainable
    from odise_tpu.model_zoo.factory import build_category_odise
    from odise_tpu.parallel.mesh import is_frozen_path

    labels = (("a",), ("b",), ("c",))
    model = build_category_odise("tiny", train_labels=labels,
                                 with_clip_head=False, use_checkpoint=False,
                                 slide_training=False)
    ref = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((3, 16)),
        method=type(model).init_full))
    want = {k: v for k, v in _paths(ref["params"]).items()
            if not is_frozen_path(k)}

    # tiny backbone tap dims (mc=8, vae_ch=8): see ldm_feature_dims_strides
    from odise_tpu.models.backbone.feature_extractor import ldm_feature_dims_strides
    dims, _ = ldm_feature_dims_strides(model_channels=8, vae_ch=8)
    sd = synth_odise_trainable_state_dict(proj_dims=tuple(dims))
    tree = convert_odise_trainable(sd, enc_layers=2, dec_layers=3)
    got = _paths(tree)

    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    mismatched = [(k, want[k], got[k]) for k in want
                  if k in got and want[k] != got[k]]
    assert not missing and not extra and not mismatched, (
        missing[:6], extra[:6], mismatched[:6])
