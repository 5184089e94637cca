"""End-to-end smoke test: tiny CategoryODISE eval forward + on-device fusion.

Mirrors the reference's minimum slice (SURVEY.md section 7): backbone (SD
taps) -> pixel decoder -> masked transformer decoder -> category head ->
semantic/panoptic/instance fusion, with random weights and tiny dims.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odise_tpu.models.backbone.feature_extractor import (
    FeatureExtractorBackbone,
    LdmImplicitCaptionerExtractor,
)
from odise_tpu.models.clip.model import TextTransformer
from odise_tpu.models.decoder.pixel_decoder import MSDeformAttnPixelDecoder
from odise_tpu.models.decoder.transformer_decoder import (
    MaskFormerHead,
    ODISEMultiScaleMaskedTransformerDecoder,
    PooledMaskEmbed,
    PseudoClassEmbed,
)
from odise_tpu.models.inference import (
    instance_inference,
    panoptic_inference,
    semantic_inference,
)
from odise_tpu.models.odise import CategoryEmbed, CategoryODISE


HID = 32
NUM_Q = 10
LABELS = (("cat", "feline"), ("dog",), ("grass",))  # 2 things + 1 stuff
CLIP_DIM = 16


def build_tiny_model():
    captioner = LdmImplicitCaptionerExtractor(
        learnable_time_embed=True,
        model_channels=8,
        vae_ch=8,
        context_dim=CLIP_DIM,
        sd_text_layers=1,
        clip_vit_cfg=(32, 8, 16, 1, 2, CLIP_DIM),
        dtype=jnp.float32,
    )
    backbone = FeatureExtractorBackbone(
        feature_extractor=captioner,
        out_features=("s2", "s3", "s4", "s5"),
        backbone_in_size=(64, 64),
        projection_dim=HID,
        slide_training=True,
    )
    input_shape = backbone.output_shape()
    pixel_decoder = MSDeformAttnPixelDecoder(
        input_shape=input_shape, conv_dim=HID, mask_dim=HID,
        transformer_nheads=4, transformer_dim_feedforward=64,
        transformer_enc_layers=2)
    predictor = ODISEMultiScaleMaskedTransformerDecoder(
        hidden_dim=HID, num_queries=NUM_Q, nheads=4, dim_feedforward=64,
        dec_layers=3, mask_dim=HID, num_classes=len(LABELS), in_channels=HID,
        class_embed=PseudoClassEmbed(num_classes=len(LABELS)),
        post_mask_embed=PooledMaskEmbed(hidden_dim=HID, mask_dim=HID,
                                        projection_dim=HID))
    head = MaskFormerHead(pixel_decoder=pixel_decoder,
                          transformer_predictor=predictor,
                          num_classes=len(LABELS))
    model = CategoryODISE(
        backbone=backbone,
        sem_seg_head=head,
        category_head=CategoryEmbed(projection_dim=HID, clip_dim=CLIP_DIM),
        clip_head=None,
        train_labels=LABELS,
        num_queries=NUM_Q,
        text_encoder=TextTransformer(vocab_size=49408, context_length=77, width=16,
                                     layers=1, heads=2, embed_dim=CLIP_DIM),
    )
    return model


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_tiny_model()
    img = jnp.zeros((1, 64, 64, 3))
    text_raw = jnp.zeros((4, CLIP_DIM))  # 4 flat synonyms
    variables = model.init(jax.random.PRNGKey(0), img, text_raw,
                           method=CategoryODISE.init_full)
    return model, variables


def test_forward_train_outputs(model_and_vars):
    model, variables = model_and_vars
    img = jnp.ones((1, 64, 64, 3)) * 0.5
    text_raw = jax.random.normal(jax.random.PRNGKey(1), (4, CLIP_DIM))
    out = model.apply(variables, img, text_raw, method=CategoryODISE.forward_train)
    assert out["pred_logits"].shape == (1, NUM_Q, len(LABELS) + 1)
    assert out["pred_masks"].shape[0:2] == (1, NUM_Q)
    assert len(out["aux_outputs"]) == 3  # dec_layers
    for aux in out["aux_outputs"]:
        assert aux["pred_logits"].shape == (1, NUM_Q, len(LABELS) + 1)
    assert out["mask_embed"].shape == (1, NUM_Q, HID)
    assert bool(jnp.isfinite(out["pred_logits"]).all())


def test_forward_eval_and_fusion(model_and_vars):
    model, variables = model_and_vars
    img = jnp.ones((2, 64, 64, 3)) * 0.3
    text_raw = jax.random.normal(jax.random.PRNGKey(2), (4, CLIP_DIM))
    mask_cls, mask_pred = model.apply(
        variables, img, text_raw, LABELS, method=CategoryODISE.forward_eval)
    assert mask_cls.shape == (2, NUM_Q, len(LABELS) + 1)
    assert mask_pred.shape == (2, NUM_Q, 64, 64)

    thing_mask = jnp.array([True, True, False])
    sem = semantic_inference(mask_cls[0], mask_pred[0])
    assert sem.shape == (len(LABELS), 64, 64)
    assert bool(jnp.isfinite(sem).all())

    pan = panoptic_inference(mask_cls[0], mask_pred[0], thing_mask,
                             object_mask_threshold=0.0)
    assert pan.panoptic_seg.shape == (64, 64)
    n = int(pan.num_segments)
    assert 0 <= n <= NUM_Q
    # ids in map are within [0, n]
    assert int(pan.panoptic_seg.max()) <= n

    inst = instance_inference(mask_cls[0], mask_pred[0], thing_mask, topk=5)
    assert inst.scores.shape == (5,)
    assert inst.masks.shape == (5, 64, 64)
    # instance classes must be thing classes when panoptic_on
    assert all(bool(thing_mask[c]) or float(s) == 0.0
               for c, s in zip(np.asarray(inst.classes), np.asarray(inst.scores)))


def test_encode_vocab(model_and_vars):
    model, variables = model_and_vars
    from odise_tpu.models.clip.tokenizer import tokenize

    toks = jnp.asarray(tokenize(["cat", "dog"]))
    emb = model.apply(variables, toks, method=CategoryODISE.encode_vocab)
    assert emb.shape == (2, CLIP_DIM)


def test_panoptic_stuff_merging():
    # two queries predicting the same stuff class must share a segment id
    Q, K, H, W = 4, 3, 8, 8
    mask_cls = jnp.full((Q, K + 1), -10.0)
    # queries 0,1 -> class 2 (stuff), high confidence
    mask_cls = mask_cls.at[0, 2].set(10.0).at[1, 2].set(10.0)
    mask_cls = mask_cls.at[2, 0].set(10.0)  # thing class 0
    mask_cls = mask_cls.at[3, 3].set(10.0)  # null
    mask_pred = jnp.full((Q, H, W), -10.0)
    mask_pred = mask_pred.at[0, :4].set(10.0)   # top half
    mask_pred = mask_pred.at[1, 4:].set(10.0)   # bottom half
    mask_pred = mask_pred.at[2, :, :2].set(12.0)  # strictly beat q0/q1 on its columns
    thing_mask = jnp.array([True, True, False])
    pan = panoptic_inference(mask_cls, mask_pred, thing_mask,
                             object_mask_threshold=0.5, overlap_threshold=0.5)
    seg = np.asarray(pan.panoptic_seg)
    # stuff: rows 0-3 and rows 4-7 (cols 2+) share one id
    assert seg[0, 5] == seg[7, 5] != 0
    # thing occupies cols 0-1 (argmax tie -> q2 wins where it overlaps)
    assert seg[0, 0] != seg[0, 5]
    cats = np.asarray(pan.segment_category)
    n = int(pan.num_segments)
    assert n == 2
    assert set(cats[:n].tolist()) == {0, 2}


def test_slide_serial_matches_batched():
    """Training slide path (serial+remat) must equal the fused batched path."""
    from odise_tpu.models.backbone.feature_extractor import (
        FeatureExtractorBackbone, LdmImplicitCaptionerExtractor)

    def build(serial):
        cap = LdmImplicitCaptionerExtractor(
            model_channels=8, vae_ch=8, context_dim=16, sd_text_layers=1,
            clip_vit_cfg=(32, 8, 16, 1, 2, 16))
        return FeatureExtractorBackbone(
            feature_extractor=cap, backbone_in_size=(64, 64),
            projection_dim=32, slide_training=True, slide_serial=serial)

    img = jnp.asarray(np.random.RandomState(0).rand(1, 128, 128, 3), jnp.float32)
    b1 = build(False)
    variables = b1.init(jax.random.PRNGKey(0), img, training=True)
    out_batched = b1.apply(variables, img, training=True)
    b2 = build(True)
    out_serial = b2.apply(variables, img, training=True)
    for k in out_batched:
        np.testing.assert_allclose(np.asarray(out_serial[k]),
                                   np.asarray(out_batched[k]),
                                   rtol=2e-3, atol=2e-4)


def test_fast_inference_decoder_matches_training_path():
    """training=False computes intermediate attention masks directly at the
    attention resolution (resize commuted into mask_features — exact up to
    fp reassociation) and skips intermediate class/pool heads; the FINAL
    outputs must match the training path's final layer."""
    rng = jax.random.PRNGKey(3)
    B, C, dec_layers = 2, HID, 3
    predictor = ODISEMultiScaleMaskedTransformerDecoder(
        hidden_dim=C, num_queries=NUM_Q, nheads=4, dim_feedforward=64,
        dec_layers=dec_layers, mask_dim=C, num_classes=len(LABELS),
        in_channels=C,
        class_embed=PseudoClassEmbed(num_classes=len(LABELS)),
        post_mask_embed=PooledMaskEmbed(hidden_dim=C, mask_dim=C,
                                        projection_dim=C))
    keys = jax.random.split(rng, 6)
    xs = [jax.random.normal(keys[i], (B, s, s, C)) * 0.3
          for i, s in enumerate((4, 8, 16))]
    mask_features = jax.random.normal(keys[3], (B, 32, 32, C)) * 0.3
    variables = predictor.init(keys[4], xs, mask_features)

    full = predictor.apply(variables, xs, mask_features, training=True)
    fast = predictor.apply(variables, xs, mask_features, training=False)

    assert len(full["aux_outputs"]) == dec_layers
    assert fast["aux_outputs"] == []
    for k in ("pred_logits", "pred_masks", "mask_embed",
              "mask_pooled_features"):
        np.testing.assert_allclose(np.asarray(fast[k]), np.asarray(full[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(fast["logit_scale"]),
                               np.asarray(full["logit_scale"]))
