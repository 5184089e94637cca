#!/usr/bin/env python
"""Weight-exact parity verification against the reference implementation.

One command closes SURVEY.md hard part #1 the moment real weights are
available: load the converted SD / CLIP / ODISE zoo checkpoints, diff
per-block activations against a torch-side capture, then compare panoptic
outputs on a demo image.

Workflow (two machines / environments):

1. Reference side (any environment with NVlabs/ODISE installed):
   capture the same stages on the SAME input — the deterministic ramp image
   (see ``capture_activations.ramp_image``: channels are y/S, x/S,
   (x+y)/2S) or a shared image file — into an .npz with keys
   ``tap_{i}`` (VAE enc blocks 5,7; UNet out blocks 2,5,8,11; VAE dec 2,5
   in that order), ``backbone_{s2..s5}``, ``head_pred_logits``,
   ``head_pred_masks``. Channel-last layout ([B, H, W, C]); torch tensors
   need .permute(0, 2, 3, 1). Optionally save the reference demo's
   panoptic id map as ``panoptic`` in the same npz.

2. This side:
   python tools/verify_parity.py --ref ref_acts.npz \
       --sd-ckpt sd-v1-3.ckpt --clip-ckpt clip.pth --odise-ckpt odise.pth

   Exit code 0 iff every stage is within tolerance (bf16-scale rel err on
   taps, looser on heads where error compounds) and, if a reference
   panoptic map is present, the maps agree on >= 95% of pixels.

3. Self-consistency (no weights needed; CI mode):
   python tools/verify_parity.py --self-check
   captures with a fixed random init, round-trips the weights through the
   checkpointer, re-captures, and requires bit-identical activations plus
   identical panoptic maps — exercising the full diff path end-to-end.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from capture_activations import (build_with_weights, capture_activations,
                                 ramp_image)

# per-stage relative tolerance: frozen-tower taps must match tightly;
# decoder heads accumulate error across 9 layers
TOLERANCES = [
    ("tap_", 2e-2),
    ("backbone_", 3e-2),
    ("head_", 5e-2),
]


def rel_err(a: np.ndarray, b: np.ndarray) -> float:
    denom = np.abs(b).max()
    if denom == 0:
        return float(np.abs(a).max())
    return float(np.abs(a - b).max() / denom)


def diff_captures(ours: dict, ref: dict) -> bool:
    ok = True
    print(f"{'stage':28s} {'shape':20s} {'max rel err':>12s}  verdict")
    for key in sorted(set(ours) & set(ref)):
        a, b = np.asarray(ours[key]), np.asarray(ref[key])
        if a.shape != b.shape:
            print(f"{key:28s} {str(list(a.shape)):20s} SHAPE MISMATCH ref="
                  f"{list(b.shape)}")
            ok = False
            continue
        tol = next((t for p, t in TOLERANCES if key.startswith(p)), 1e-2)
        e = rel_err(a, b)
        good = e <= tol
        ok &= good
        print(f"{key:28s} {str(list(a.shape)):20s} {e:12.2e}  "
              f"{'ok' if good else f'FAIL (tol {tol:g})'}")
    missing = sorted(set(ref) - set(ours) - {"panoptic"})
    if missing:
        print(f"reference-only keys not compared: {missing}")
    return ok


def panoptic_map(model, variables, img: np.ndarray) -> np.ndarray:
    """Run the eval forward + fusion with a synthetic vocabulary."""
    import jax.numpy as jnp

    from odise_tpu.models.inference import panoptic_inference

    K = len(model.train_labels)
    clip_dim = model.category_head.clip_dim
    text = np.linspace(-1, 1, K * clip_dim).reshape(K, clip_dim).astype(np.float32)
    mask_cls, mask_pred = model.apply(
        variables, jnp.asarray(img[None]), jnp.asarray(text),
        model.train_labels, None, None, None,
        method=type(model).forward_eval)
    thing = jnp.ones((K,), bool)
    pan = panoptic_inference(mask_cls[0], mask_pred[0], thing,
                             object_mask_threshold=0.0, overlap_threshold=0.8)
    return np.asarray(pan.panoptic_seg)


def compare_panoptic(ours: np.ndarray, ref: np.ndarray,
                     min_agreement: float = 0.95) -> bool:
    """Segment-id-permutation-invariant pixel agreement."""
    if ours.shape != ref.shape:
        print(f"panoptic shape mismatch: {ours.shape} vs {ref.shape}")
        return False
    # map each ref segment to its majority-overlap segment in ours
    agree = 0
    for rid in np.unique(ref):
        sel = ref == rid
        vals, cnts = np.unique(ours[sel], return_counts=True)
        agree += int(cnts.max())
    frac = agree / ref.size
    print(f"panoptic map agreement: {frac:.4f} (threshold {min_agreement})")
    return frac >= min_agreement


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="", help="reference-side capture .npz")
    ap.add_argument("--scale", default="full", choices=["tiny", "full"])
    ap.add_argument("--image", default="", help="input image (else fixed ramp)")
    ap.add_argument("--sd-ckpt", default="")
    ap.add_argument("--clip-ckpt", default="")
    ap.add_argument("--odise-ckpt", default="")
    ap.add_argument("--self-check", action="store_true",
                    help="random-weight self-consistency (no ref needed)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu or args.self_check:
        jax.config.update("jax_platforms", "cpu")

    scale = "tiny" if args.self_check and args.scale == "full" else args.scale
    S = 64 if scale == "tiny" else 512
    if args.image:
        import cv2
        from PIL import Image

        img = np.asarray(Image.open(args.image).convert("RGB"))
        img = cv2.resize(img, (S, S)).astype(np.float32) / 255.0
    else:
        img = ramp_image(S)

    model, variables = build_with_weights(
        scale, sd_ckpt=args.sd_ckpt, clip_ckpt=args.clip_ckpt,
        odise_ckpt=args.odise_ckpt)
    ours = capture_activations(model, variables, img)

    if args.self_check:
        # round-trip the trainable weights through the checkpointer and
        # require bit-identical activations + panoptic map
        import tempfile

        from odise_tpu.engine.checkpoint import Checkpointer

        with tempfile.TemporaryDirectory() as d:
            ck = Checkpointer(d)
            ck.save("parity", variables["params"], step=0)
            loaded, _, _, _ = ck.load(ck.get_checkpoint_file(),
                                      variables["params"])
        again = capture_activations(model, {"params": loaded}, img)
        ok = diff_captures(ours, again)
        pan_a = panoptic_map(model, variables, img)
        pan_b = panoptic_map(model, {"params": loaded}, img)
        ok &= compare_panoptic(pan_a, pan_b, min_agreement=1.0)
        print("self-check:", "PASS" if ok else "FAIL")
        sys.exit(0 if ok else 1)

    if not args.ref:
        ap.error("--ref is required (or use --self-check)")
    ref = dict(np.load(args.ref))
    ok = diff_captures(ours, ref)
    if "panoptic" in ref:
        ok &= compare_panoptic(panoptic_map(model, variables, img),
                               ref["panoptic"])
    print("parity:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
