#!/usr/bin/env python
"""Open-vocabulary panoptic segmentation demo.

Capability parity with the reference demo (reference demo/demo.py:263-483):
builds a merged vocabulary (COCO + ADE + LVIS openseg labels, plus user
``--vocab`` semicolon-separated synonym lists and ``--caption`` nouns),
registers demo metadata, runs open-vocab panoptic inference, and saves a
visualization.

Usage:
  python demo/demo.py --input img.jpg --output out.png \
      --vocab "black pickup truck, pickup truck; blue sky, sky" \
      --config-file configs/Panoptic/odise_label_coco_50e.py \
      [--init-from ckpt]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default="configs/Panoptic/odise_label_coco_50e.py")
    p.add_argument("--input", nargs="+", default=[])
    p.add_argument("--video-input", default="", help="video file (or webcam id)")
    p.add_argument("--output", default="demo_out")
    p.add_argument("--vocab", default="",
                   help="semicolon-separated synonym lists, comma within")
    p.add_argument("--caption", default="", help="extract extra nouns from caption")
    p.add_argument("--label", nargs="+", default=["COCO"],
                   choices=["COCO", "ADE", "LVIS"], help="builtin vocabularies")
    p.add_argument("--init-from", default="", help="checkpoint to load")
    p.add_argument("--image-size", type=int, default=1024)
    return p.parse_args()


def build_demo_vocab(args):
    """Merged vocabulary (reference demo/demo.py:324-379)."""
    from odise_tpu.data.build import get_openseg_labels

    demo_classes = []
    demo_thing_flags = []

    if args.vocab:
        for group in args.vocab.split(";"):
            syns = [s.strip() for s in group.split(",") if s.strip()]
            if syns:
                demo_classes.append(syns)
                demo_thing_flags.append(True)

    if args.caption:
        try:
            import nltk

            tokens = nltk.word_tokenize(args.caption)
            nouns = [w for w, pos in nltk.pos_tag(tokens) if pos.startswith("NN")]
        except Exception:
            nouns = [w for w in args.caption.split() if len(w) > 2]
        for n in nouns:
            demo_classes.append([n])
            demo_thing_flags.append(True)

    builtin = {"COCO": "coco_panoptic", "ADE": "ade20k_150", "LVIS": "lvis_1203"}
    for key in args.label:
        labels = get_openseg_labels(builtin[key], prompt_engineered=True)
        if key == "COCO":
            flags = [i < 80 for i in range(len(labels))]
        else:
            flags = [True] * len(labels)
        demo_classes.extend(labels)
        demo_thing_flags.extend(flags)
    return demo_classes, np.asarray(demo_thing_flags)


def colorize(pan_seg: np.ndarray, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 255, (int(pan_seg.max()) + 1, 3), dtype=np.uint8)
    palette[0] = 0
    return palette[pan_seg]


def main():
    args = parse_args()
    import jax

    if os.environ.get("ODISE_TPU_FORCE_CPU"):
        # the ambient sitecustomize re-selects the TPU relay even when
        # JAX_PLATFORMS=cpu is exported; pin via config for local testing
        jax.config.update("jax_platforms", "cpu")
    from odise_tpu.engine.defaults import enable_compilation_cache

    enable_compilation_cache()  # opt-in via ODISE_TPU_COMPILE_CACHE
    import jax.numpy as jnp
    from PIL import Image

    from odise_tpu.config import instantiate_odise, load_config, resolve
    from odise_tpu.models.inference import panoptic_inference
    from odise_tpu.models.wrapper import OpenPanopticInference, build_open_vocabulary

    cfg = resolve(load_config(args.config_file))
    # demo thresholds (reference demo/demo.py:315-318); configs built from
    # the compact factory (e.g. the tiny synth smoke configs) don't expose
    # these keys — skip rather than pass unknown kwargs to the target
    if "overlap_threshold" in cfg.model:
        cfg.model.overlap_threshold = 0.0
    overlap_threshold = cfg.model.get("overlap_threshold", 0.0)
    if getattr(cfg.model, "clip_head", None) is not None:
        cfg.model.clip_head.alpha = 0.35
        cfg.model.clip_head.beta = 0.65
    model = instantiate_odise(cfg.model)

    labels, thing_flags = build_demo_vocab(args)
    print(f"Vocabulary: {len(labels)} categories")

    train_labels = model.train_labels
    flat = [t for g in train_labels for t in g]
    # jitted init: eager init through a remote device relay pays one round
    # trip per op (minutes); one compiled graph initializes in seconds
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((len(flat), model.category_head.clip_dim)),
        method=type(model).init_full))()
    if args.init_from:
        from odise_tpu.engine.checkpoint import Checkpointer
        from odise_tpu.model_zoo.convert import load_torch_state_dict
        from odise_tpu.utils.file_io import get_local_path

        path = get_local_path(args.init_from)
        if path.endswith((".pth", ".ckpt")) and not path.endswith(".ckpt.ckpt"):
            try:
                from odise_tpu.model_zoo.convert import convert_odise_trainable
                from odise_tpu.engine.checkpoint import merge_params

                state = load_torch_state_dict(path)
                variables = {"params": merge_params(
                    variables["params"], convert_odise_trainable(state))}
            except Exception:
                ck = Checkpointer(os.path.dirname(path) or ".")
                params, _, _, _ = ck.load(path, variables["params"])
                variables = {"params": params}

    vocab = build_open_vocabulary(model, variables, labels,
                                  thing_mask=thing_flags,
                                  with_clip_head=model.clip_head is not None)
    infer = OpenPanopticInference(model, variables, vocab)

    os.makedirs(args.output, exist_ok=True)

    if args.video_input:
        # frame-by-frame video demo (reference demo/demo.py webcam/video path)
        import cv2

        src = int(args.video_input) if args.video_input.isdigit() else args.video_input
        cap = cv2.VideoCapture(src)
        writer = None
        S = args.image_size
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            img = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            scale = S / min(img.shape[:2])
            nh, nw = int(img.shape[0] * scale + 0.5), int(img.shape[1] * scale + 0.5)
            resized = cv2.resize(img, (nw, nh))
            h64, w64 = -(-nh // 64) * 64, -(-nw // 64) * 64
            padded = np.zeros((1, h64, w64, 3), np.float32)
            padded[0, :nh, :nw] = resized.astype(np.float32) / 255.0
            mask_cls, mask_pred = infer(jnp.asarray(padded))
            pan = panoptic_inference(mask_cls[0], mask_pred[0],
                                     jnp.asarray(vocab.thing_mask),
                                     object_mask_threshold=0.0,
                                     overlap_threshold=overlap_threshold)
            seg = np.asarray(pan.panoptic_seg)[:nh, :nw]
            overlay = (0.5 * resized + 0.5 * colorize(seg)).astype(np.uint8)
            if writer is None:
                out_path = os.path.join(args.output, "video_out.mp4")
                writer = cv2.VideoWriter(out_path,
                                         cv2.VideoWriter_fourcc(*"mp4v"),
                                         cap.get(cv2.CAP_PROP_FPS) or 24,
                                         (nw, nh))
            writer.write(cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))
        if writer is not None:
            writer.release()
        cap.release()
        return

    for path in args.input:
        img = np.asarray(Image.open(path).convert("RGB"))
        S = args.image_size
        import cv2

        scale = S / min(img.shape[:2])
        nh, nw = int(img.shape[0] * scale + 0.5), int(img.shape[1] * scale + 0.5)
        resized = cv2.resize(img, (nw, nh))
        h64, w64 = -(-nh // 64) * 64, -(-nw // 64) * 64
        padded = np.zeros((1, h64, w64, 3), np.float32)
        padded[0, :nh, :nw] = resized.astype(np.float32) / 255.0

        mask_cls, mask_pred = infer(jnp.asarray(padded))
        pan = panoptic_inference(mask_cls[0], mask_pred[0],
                                 jnp.asarray(vocab.thing_mask),
                                 object_mask_threshold=0.0,
                                 overlap_threshold=overlap_threshold)
        seg = np.asarray(pan.panoptic_seg)[:nh, :nw]
        n = int(pan.num_segments)
        cats = np.asarray(pan.segment_category)
        from odise_tpu.utils.visualizer import Visualizer

        vis = Visualizer(resized, class_names=[l[0] for l in labels])
        overlay = vis.draw_panoptic_seg(seg, cats, n)
        out_path = os.path.join(args.output, os.path.basename(path))
        Image.fromarray(overlay).save(out_path)
        names = [labels[c][0] for c in cats[:n]]
        print(f"{path}: {n} segments -> {out_path}; categories: {names}")


if __name__ == "__main__":
    main()
