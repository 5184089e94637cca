#!/usr/bin/env python
"""Reference-side (PyTorch) activation capture for weight-exact parity.

Runs INSIDE an NVlabs/ODISE environment (torch + detectron2 + the odise
package importable) and writes the exact ``.npz`` that
``tools/verify_parity.py --ref`` consumes, so the moment real weights are
available parity is two commands with zero hand-written glue:

    # reference environment (GPU box with NVlabs/ODISE checked out):
    python tools/ref_capture_torch.py \
        --config-file configs/Panoptic/odise_label_coco_50e.py \
        --init-from odise_label_coco_50e.pth --out ref_acts.npz \
        [--image img.jpg] [--image-size 512] \
        [--vocab "cat,dog,grass"]        # optional clip-head capture

    # this repo (TPU side):
    python tools/verify_parity.py --ref ref_acts.npz \
        --sd-ckpt sd-v1-3.ckpt --clip-ckpt clip.pth --odise-ckpt odise.pth

Captured stages (reference tap points):
  * ``tap_{i}``       — the LdmExtractor feature list in its native order
                        (VAE encoder blocks 5,7; UNet output blocks
                        2,5,8,11 per step; VAE decoder blocks 2,5 —
                        reference odise/modeling/meta_arch/ldm.py:424-533),
                        captured by calling ``model.backbone.
                        feature_extractor(dict(img=...))`` directly.
  * ``backbone_{s2..s5}`` — FeatureExtractorBackbone outputs after
                        projection/grouping (reference odise/modeling/
                        backbone/feature_extractor.py:157-179).
  * ``head_pred_logits`` / ``head_pred_masks`` / ``head_mask_embed`` /
    ``head_logit_scale`` — sem_seg_head outputs on those features.
  * with ``--vocab``:  ``clip_mask_cls`` (the final ensembled open-vocab
                        logits, reference odise.py:286-342 eval branch) plus
                        ``vocab_text_raw`` / ``vocab_clip_text`` /
                        ``vocab_labels`` so the TPU side can feed the SAME
                        text embeddings instead of re-encoding the text.

Everything is converted to the channel-last layout verify_parity.py
documents: 4-D activations [B, C, H, W] -> [B, H, W, C]; ``pred_masks``
stays [B, Q, H, W] (it is query-major on both sides).

The capture orchestration (`capture_reference`) touches the model only
through the attribute surface ``backbone.feature_extractor``, ``backbone``,
``sem_seg_head``, ``category_head``, ``cal_pred_logits``, ``clip_head`` —
tests/test_parity_tools.py dry-runs it against a mock with that surface, so
the glue is exercised in CI without the torch/odise environment.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def ramp_image(S: int) -> np.ndarray:
    """Deterministic ramp input, IDENTICAL to capture_activations.ramp_image
    on the TPU side (channels y/S, x/S, (x+y)/2S in [0, 1])."""
    yy, xx = np.mgrid[0:S, 0:S]
    return np.stack([yy / S, xx / S, (yy + xx) / (2 * S)], -1).astype(np.float32)


def chw_to_hwc(x) -> np.ndarray:
    """Torch [B, C, H, W] activation -> the npz's [B, H, W, C] layout."""
    a = np.asarray(x, np.float32)
    if a.ndim != 4:
        raise ValueError(f"expected 4-D [B,C,H,W], got {a.shape}")
    return np.ascontiguousarray(a.transpose(0, 2, 3, 1))


def assemble_capture(taps, backbone_feats, head_out, extras=None) -> dict:
    """Pure layout/naming step: build the npz dict verify_parity consumes.

    ``taps``            list of [B,C,H,W] arrays (LdmExtractor order)
    ``backbone_feats``  dict name->[B,C,H,W] (s2..s5)
    ``head_out``        dict with pred_logits [B,Q,K?], pred_masks [B,Q,H,W],
                        optionally mask_embed [B,Q,C], logit_scale scalar
    ``extras``          optional pre-shaped entries merged verbatim
    """
    cap = {}
    for i, t in enumerate(taps):
        cap[f"tap_{i}"] = chw_to_hwc(t)
    for name, f in backbone_feats.items():
        cap[f"backbone_{name}"] = chw_to_hwc(f)
    for key in ("pred_logits", "pred_masks", "mask_embed", "logit_scale"):
        if key in head_out and head_out[key] is not None:
            cap[f"head_{key}"] = np.asarray(head_out[key], np.float32)
    if extras:
        cap.update({k: np.asarray(v) for k, v in extras.items()})
    return cap


def capture_reference(model, img_hwc01: np.ndarray, vocab=None,
                      torch_mod=None) -> dict:
    """Run the three capture stages on a reference-model-shaped object.

    ``model`` needs the CategoryODISE attribute surface (see module
    docstring); ``img_hwc01`` is one [H, W, 3] float image in [0, 1] —
    the same range the reference backbone receives (the meta arch maps
    uint8 [0,255] to [0,1] via pixel_mean=0/pixel_std=255, reference
    configs/common/models/mask_generator_with_label.py:97-98, and the
    LdmExtractor applies the SD 0.5/0.5 normalization internally,
    ldm.py:80-81).
    """
    if torch_mod is None:
        import torch as torch_mod  # pragma: no cover — real environment

    t = torch_mod
    with t.no_grad():
        img = t.as_tensor(np.asarray(img_hwc01, np.float32)).permute(2, 0, 1)[None]
        if hasattr(model, "device"):
            img = img.to(model.device)

        # 1. raw LdmExtractor taps, bypassing resize/padding (the 64-divisible
        # ramp makes both no-ops; same bypass as the TPU-side capture)
        taps = model.backbone.feature_extractor(dict(img=img))
        taps_np = [x.float().cpu().numpy() for x in taps]

        # 2. grouped/projected pyramid
        feats = model.backbone(img)
        feats_np = {k: v.float().cpu().numpy() for k, v in feats.items()}

        # 3. head outputs on those features
        outputs = model.sem_seg_head(feats)
        head_np = {k: outputs[k].float().cpu().numpy()
                   for k in ("pred_logits", "pred_masks", "mask_embed")
                   if k in outputs and t.is_tensor(outputs[k])}
        if "logit_scale" in outputs:
            head_np["logit_scale"] = np.asarray(
                outputs["logit_scale"].float().cpu().numpy())

        extras = {}
        if vocab:
            extras.update(_capture_vocab(model, dict(outputs), img, vocab, t))
    return assemble_capture(taps_np, feats_np, head_np, extras)


def _capture_vocab(model, outputs, img, vocab, t) -> dict:
    """Open-vocabulary eval capture: the final ensembled mask_cls plus the
    raw text embeddings, mirroring the reference eval branch
    (odise.py:283-342) with an explicit label list."""
    labels = [[v] if isinstance(v, str) else list(v) for v in vocab]
    extras = {"vocab_labels": np.frombuffer(
        json.dumps(labels).encode(), np.uint8)}

    # raw (pre-projection) CLIP text embeds the category head consumes —
    # the TPU side feeds these as text_embed_raw instead of re-encoding
    text_raw = model.category_head.get_and_cache_test_text_embed(
        tuple(tuple(l) for l in labels))
    extras["vocab_text_raw"] = text_raw.float().cpu().numpy()

    cat_out = model.category_head(outputs)
    outputs.update(cat_out)
    outputs["pred_logits"] = model.cal_pred_logits(outputs)
    outputs["images"] = img  # clip head reads the denormalized image here
    mask_cls = outputs["pred_logits"]

    clip_head = getattr(model, "clip_head", None)
    if clip_head is not None:
        clip_text = clip_head.get_and_cache_test_text_embed(
            tuple(tuple(l) for l in labels))
        extras["vocab_clip_text"] = clip_text.float().cpu().numpy()
        if clip_head.with_bg:
            outputs["pred_open_logits"] = outputs["pred_logits"]
            outputs.update(clip_head(outputs))
            mask_cls = outputs["pred_open_logits"]
        else:
            outputs["pred_open_logits"] = outputs["pred_logits"][..., :-1]
            outputs.update(clip_head(outputs))
            open_logits = outputs["pred_open_logits"]
            binary = t.zeros(mask_cls.shape[:2] + (2,), device=mask_cls.device,
                             dtype=mask_cls.dtype)
            binary[..., -1] = t.nn.functional.softmax(mask_cls, dim=-1)[..., -1]
            binary[..., 0] = 1 - binary[..., -1]
            probs = t.nn.functional.softmax(open_logits, dim=-1)
            mask_cls = t.cat([probs * binary[..., 0:1], binary[..., 1:2]], -1)
    extras["clip_mask_cls"] = mask_cls.float().cpu().numpy()
    return extras


def main():  # pragma: no cover — requires the torch/odise environment
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True,
                    help="reference lazy config, e.g. "
                         "configs/Panoptic/odise_label_coco_50e.py")
    ap.add_argument("--init-from", default="",
                    help="reference checkpoint (.pth); empty = random init")
    ap.add_argument("--out", default="ref_acts.npz")
    ap.add_argument("--image", default="", help="input image (else fixed ramp)")
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--vocab", default="",
                    help="comma-separated labels; enables the clip_mask_cls "
                         "+ text-embed capture")
    ap.add_argument("--save-panoptic", action="store_true",
                    help="also run the demo-style panoptic fusion and save "
                         "the id map as 'panoptic'")
    args = ap.parse_args()

    import torch
    from detectron2.checkpoint import DetectionCheckpointer
    from detectron2.config import LazyConfig

    from odise.config import instantiate_odise

    cfg = LazyConfig.load(args.config_file)
    model = instantiate_odise(cfg.model)
    model.eval()
    if torch.cuda.is_available():
        model.cuda()
    if args.init_from:
        DetectionCheckpointer(model).load(args.init_from)

    S = args.image_size
    if args.image:
        import cv2
        from PIL import Image

        img = np.asarray(Image.open(args.image).convert("RGB"))
        img = cv2.resize(img, (S, S)).astype(np.float32) / 255.0
    else:
        img = ramp_image(S)

    vocab = [v.strip() for v in args.vocab.split(",") if v.strip()] or None
    cap = capture_reference(model, img, vocab=vocab)

    if args.save_panoptic:
        with torch.no_grad():
            res = model([{"image": torch.as_tensor(img * 255.0).permute(2, 0, 1),
                          "height": S, "width": S}])[0]
        if "panoptic_seg" in res:
            cap["panoptic"] = res["panoptic_seg"][0].cpu().numpy()

    np.savez_compressed(args.out, **cap)
    print(f"wrote {args.out}: " + ", ".join(
        f"{k}{list(np.asarray(v).shape)}" for k, v in list(cap.items())[:8])
        + ", ...")


if __name__ == "__main__":
    main()
