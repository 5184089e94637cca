"""Model factory: assemble CategoryODISE / CaptionODISE at named scales.

The "full" scale reproduces the reference's shipped config graph
(reference configs/common/models/mask_generator_with_label.py:28-104 and
odise_with_label.py:16-32); "tiny" is a structurally identical miniature for
tests and CPU dry-runs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..data.build import get_openseg_labels
from ..models.backbone.feature_extractor import (
    FeatureExtractorBackbone,
    LdmImplicitCaptionerExtractor,
)
from ..models.clip.model import TextTransformer
from ..models.decoder.pixel_decoder import MSDeformAttnPixelDecoder
from ..models.decoder.transformer_decoder import (
    MaskFormerHead,
    ODISEMultiScaleMaskedTransformerDecoder,
    PooledMaskEmbed,
    PseudoClassEmbed,
)
from ..models.odise import (
    CategoryEmbed,
    CategoryODISE,
    CaptionODISE,
    PoolingCLIPHead,
    WordEmbed,
)

TINY = dict(
    hidden=32, queries=10, dec_layers=3, enc_layers=2, nheads=4, ffn=64,
    model_channels=8, vae_ch=8, context_dim=16, sd_text_layers=1,
    clip_vit_cfg=(32, 8, 16, 1, 2, 16), clip_dim=16,
    backbone_in_size=(64, 64), projection_dim=32,
    pooling_clip=dict(clip_image_size=32, patch_size=8, vit_width=16,
                      vit_layers=1, vit_heads=2, embed_dim=16),
    text_encoder=dict(width=16, layers=1, heads=2, embed_dim=16),
)

FULL = dict(
    hidden=256, queries=100, dec_layers=9, enc_layers=6, nheads=8, ffn=2048,
    model_channels=320, vae_ch=128, context_dim=768, sd_text_layers=12,
    clip_vit_cfg=(224, 14, 1024, 24, 16, 768), clip_dim=768,
    backbone_in_size=(512, 512), projection_dim=512,
    pooling_clip=dict(clip_image_size=336, patch_size=14, vit_width=1024,
                      vit_layers=24, vit_heads=16, embed_dim=768),
    text_encoder=dict(width=768, layers=12, heads=12, embed_dim=768),
)


def build_category_odise(
    scale: str = "full",
    *,
    train_labels: Optional[tuple] = None,
    with_clip_head: bool = True,
    use_checkpoint: bool = True,
    slide_training: bool = True,
    slide_serial: bool = True,
    backbone_in_size: Optional[tuple] = None,
    dtype=jnp.float32,
) -> CategoryODISE:
    cfg = dict(TINY if scale == "tiny" else FULL)
    if backbone_in_size is not None:
        # override so tiny-scale tests can exercise a REAL slide grid
        # (image larger than the backbone window), cf. reference
        # odise/modeling/backbone/feature_extractor.py:181-250
        cfg["backbone_in_size"] = tuple(backbone_in_size)
    if train_labels is None:
        if scale == "tiny":
            train_labels = (("thing a",), ("thing b",), ("stuff c",))
        else:
            train_labels = tuple(
                tuple(l) for l in get_openseg_labels("coco_panoptic", True))
    num_classes = len(train_labels)

    captioner = LdmImplicitCaptionerExtractor(
        learnable_time_embed=True,
        model_channels=cfg["model_channels"],
        vae_ch=cfg["vae_ch"],
        context_dim=cfg["context_dim"],
        sd_text_layers=cfg["sd_text_layers"],
        clip_vit_cfg=tuple(cfg["clip_vit_cfg"]),
        dtype=dtype,
    )
    backbone = FeatureExtractorBackbone(
        feature_extractor=captioner,
        out_features=("s2", "s3", "s4", "s5"),
        backbone_in_size=tuple(cfg["backbone_in_size"]),
        projection_dim=cfg["projection_dim"],
        use_checkpoint=use_checkpoint,
        slide_training=slide_training,
        slide_serial=slide_serial,
        dtype=dtype,
    )
    hidden = cfg["hidden"]
    pixel_decoder = MSDeformAttnPixelDecoder(
        input_shape=backbone.output_shape(),
        conv_dim=hidden, mask_dim=hidden,
        transformer_nheads=cfg["nheads"],
        transformer_dim_feedforward=max(cfg["ffn"] // 2, 64),
        transformer_enc_layers=cfg["enc_layers"],
        dtype=dtype,
    )
    predictor = ODISEMultiScaleMaskedTransformerDecoder(
        hidden_dim=hidden, num_queries=cfg["queries"], nheads=cfg["nheads"],
        dim_feedforward=cfg["ffn"], dec_layers=cfg["dec_layers"],
        mask_dim=hidden, num_classes=num_classes, in_channels=hidden,
        class_embed=PseudoClassEmbed(num_classes=num_classes),
        post_mask_embed=PooledMaskEmbed(hidden_dim=hidden, mask_dim=hidden,
                                        projection_dim=hidden, dtype=dtype),
        dtype=dtype,
    )
    head = MaskFormerHead(pixel_decoder=pixel_decoder,
                          transformer_predictor=predictor,
                          num_classes=num_classes)
    te = cfg["text_encoder"]
    return CategoryODISE(
        backbone=backbone,
        sem_seg_head=head,
        category_head=CategoryEmbed(projection_dim=hidden,
                                    clip_dim=cfg["clip_dim"], dtype=dtype),
        clip_head=(PoolingCLIPHead(dtype=dtype, **cfg["pooling_clip"])
                   if with_clip_head else None),
        train_labels=train_labels,
        num_queries=cfg["queries"],
        text_encoder=TextTransformer(width=te["width"], layers=te["layers"],
                                     heads=te["heads"], embed_dim=te["embed_dim"],
                                     dtype=dtype),
        dtype=dtype,
    )


def build_caption_odise(
    scale: str = "full",
    *,
    train_labels: Optional[tuple] = None,
    with_clip_head: bool = True,
    use_checkpoint: bool = True,
    slide_training: bool = True,
    slide_serial: bool = True,
    backbone_in_size: Optional[tuple] = None,
    dtype=jnp.float32,
) -> CaptionODISE:
    """Caption-supervised variant (reference
    configs/common/models/mask_generator_with_caption.py:27-105:
    num_classes=1, WordEmbed, MaskGroundingCriterion)."""
    cfg = dict(TINY if scale == "tiny" else FULL)
    if backbone_in_size is not None:
        cfg["backbone_in_size"] = tuple(backbone_in_size)
    if train_labels is None:
        if scale == "tiny":
            train_labels = (("thing a",), ("thing b",), ("stuff c",))
        else:
            train_labels = tuple(
                tuple(l) for l in get_openseg_labels("coco_panoptic", True))

    captioner = LdmImplicitCaptionerExtractor(
        learnable_time_embed=True,
        model_channels=cfg["model_channels"],
        vae_ch=cfg["vae_ch"],
        context_dim=cfg["context_dim"],
        sd_text_layers=cfg["sd_text_layers"],
        clip_vit_cfg=tuple(cfg["clip_vit_cfg"]),
        dtype=dtype,
    )
    backbone = FeatureExtractorBackbone(
        feature_extractor=captioner,
        out_features=("s2", "s3", "s4", "s5"),
        backbone_in_size=tuple(cfg["backbone_in_size"]),
        projection_dim=cfg["projection_dim"],
        use_checkpoint=use_checkpoint,
        slide_training=slide_training,
        slide_serial=slide_serial,
        dtype=dtype,
    )
    hidden = cfg["hidden"]
    pixel_decoder = MSDeformAttnPixelDecoder(
        input_shape=backbone.output_shape(),
        conv_dim=hidden, mask_dim=hidden,
        transformer_nheads=cfg["nheads"],
        transformer_dim_feedforward=max(cfg["ffn"] // 2, 64),
        transformer_enc_layers=cfg["enc_layers"],
        dtype=dtype,
    )
    predictor = ODISEMultiScaleMaskedTransformerDecoder(
        hidden_dim=hidden, num_queries=cfg["queries"], nheads=cfg["nheads"],
        dim_feedforward=cfg["ffn"], dec_layers=cfg["dec_layers"],
        mask_dim=hidden, num_classes=1, in_channels=hidden,
        class_embed=PseudoClassEmbed(num_classes=1),
        post_mask_embed=PooledMaskEmbed(hidden_dim=hidden, mask_dim=hidden,
                                        projection_dim=hidden, dtype=dtype),
        dtype=dtype,
    )
    head = MaskFormerHead(pixel_decoder=pixel_decoder,
                          transformer_predictor=predictor, num_classes=1)
    te = cfg["text_encoder"]
    return CaptionODISE(
        backbone=backbone,
        sem_seg_head=head,
        word_head=WordEmbed(projection_dim=hidden, clip_dim=cfg["clip_dim"],
                            dtype=dtype),
        clip_head=(PoolingCLIPHead(alpha=0.35, beta=0.65, dtype=dtype,
                                   **cfg["pooling_clip"])
                   if with_clip_head else None),
        train_labels=train_labels,
        num_queries=cfg["queries"],
        text_encoder=TextTransformer(width=te["width"], layers=te["layers"],
                                     heads=te["heads"], embed_dim=te["embed_dim"],
                                     dtype=dtype),
        dtype=dtype,
    )
