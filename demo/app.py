#!/usr/bin/env python
"""Gradio demo app (capability parity with reference demo/app.py:1-332).

Blocks UI: image input, extra-vocabulary textbox, builtin vocab checkboxes,
panoptic overlay output. Requires ``gradio`` (not bundled in air-gapped
environments — the CLI demo demo/demo.py covers the same inference path).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_inference(config_file: str, init_from: str = ""):
    import jax
    import jax.numpy as jnp

    from odise_tpu.config import instantiate_odise, load_config, resolve

    cfg = resolve(load_config(config_file))
    cfg.model.overlap_threshold = 0.0
    model = instantiate_odise(cfg.model)
    train_labels = model.train_labels
    flat = [t for g in train_labels for t in g]
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((len(flat), model.category_head.clip_dim)),
        method=type(model).init_full)
    return model, variables


def main():
    try:
        import gradio as gr
    except ImportError:
        print("gradio is not installed; use demo/demo.py for CLI inference.")
        return

    import jax.numpy as jnp

    from demo.demo import build_demo_vocab, colorize
    from odise_tpu.models.inference import panoptic_inference
    from odise_tpu.models.wrapper import OpenPanopticInference, build_open_vocabulary

    config_file = os.environ.get(
        "ODISE_TPU_DEMO_CONFIG", "configs/Panoptic/odise_label_coco_50e.py")
    model, variables = build_inference(config_file,
                                       os.environ.get("ODISE_TPU_DEMO_CKPT", ""))

    def predict(image, vocab_text, use_coco, use_ade, use_lvis):
        import argparse
        import cv2

        labels_args = argparse.Namespace(
            vocab=vocab_text or "", caption="",
            label=[n for n, u in (("COCO", use_coco), ("ADE", use_ade),
                                  ("LVIS", use_lvis)) if u] or ["COCO"])
        labels, thing_flags = build_demo_vocab(labels_args)
        vocab = build_open_vocabulary(model, variables, labels,
                                      thing_mask=thing_flags,
                                      with_clip_head=model.clip_head is not None)
        infer = OpenPanopticInference(model, variables, vocab)
        img = np.asarray(image)
        scale = 512 / min(img.shape[:2])
        nh, nw = int(img.shape[0] * scale + 0.5), int(img.shape[1] * scale + 0.5)
        resized = cv2.resize(img, (nw, nh))
        h64, w64 = -(-nh // 64) * 64, -(-nw // 64) * 64
        padded = np.zeros((1, h64, w64, 3), np.float32)
        padded[0, :nh, :nw] = resized.astype(np.float32) / 255.0
        mask_cls, mask_pred = infer(jnp.asarray(padded))
        pan = panoptic_inference(mask_cls[0], mask_pred[0],
                                 jnp.asarray(vocab.thing_mask),
                                 object_mask_threshold=0.0)
        seg = np.asarray(pan.panoptic_seg)[:nh, :nw]
        return (0.5 * resized + 0.5 * colorize(seg)).astype(np.uint8)

    with gr.Blocks(title="ODISE-TPU") as demo:
        gr.Markdown("# ODISE-TPU: Open-Vocabulary Panoptic Segmentation")
        with gr.Row():
            inp = gr.Image(label="input")
            out = gr.Image(label="panoptic")
        vocab = gr.Textbox(label="extra vocabulary (semicolon-separated synonym lists)")
        with gr.Row():
            coco = gr.Checkbox(True, label="COCO")
            ade = gr.Checkbox(False, label="ADE")
            lvis = gr.Checkbox(False, label="LVIS")
        btn = gr.Button("Segment")
        btn.click(predict, [inp, vocab, coco, ade, lvis], out)
    demo.launch()


if __name__ == "__main__":
    main()
