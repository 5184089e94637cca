#!/usr/bin/env python
"""Gradio demo app (feature parity with reference demo/app.py:1-332).

Feature-for-feature vs the reference Blocks UI:
  * model dropdown — ODISE(Label) / ODISE(Caption) configs
  * extra-vocabulary textbox (semicolon-separated synonym lists, "a;b,c")
  * "Category to use" checkbox group: COCO (133), ADE (150), LVIS (1203)
  * examples gallery (demo/examples/*.jpg, each with preset vocab+categories)
  * alpha/beta sliders for the CLIP-head geometric ensemble (seen/novel)
  * Clear / Submit buttons, description/article markdown
  * output rendered by the native Visualizer with category names drawn

Requires ``gradio`` (not bundled in air-gapped environments — the CLI demo
demo/demo.py covers the same inference path). All inference logic lives in
gradio-free functions below so tests exercise it without the UI.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

TITLE = "ODISE-TPU: Open-Vocabulary Panoptic Segmentation"
DESCRIPTION = """ODISE segments an image into panoptic masks and classifies
each mask against CLIP text embeddings of *arbitrary* category names — edit
the vocabulary below and resubmit; no retraining involved. Pick builtin
category lists (COCO / ADE / LVIS) and add your own comma-separated synonym
lists separated by semicolons, e.g. `Mt. Fuji; sky, clouds`."""
ARTICLE = """Runs the TPU-native odise-tpu stack: frozen Stable-Diffusion
feature backbone, Mask2Former-style decoder, CLIP-head ensembling, on-device
panoptic fusion."""

CATEGORY_CHOICES = ["COCO (133 categories)", "ADE (150 categories)",
                    "LVIS (1203 categories)"]

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "examples")

# (image, extra vocab, category lists, model) rows for the examples gallery;
# populated from demo/examples/ at startup (drop images there to extend)
EXAMPLE_PRESETS = {
    "coco.jpg": ("", [CATEGORY_CHOICES[0]], "ODISE(Label)"),
    "ade.jpg": ("", [CATEGORY_CHOICES[1]], "ODISE(Label)"),
    "ego4d.jpg": ("Mt. Fuji; sky", [CATEGORY_CHOICES[0]], "ODISE(Label)"),
}

MODEL_CONFIGS = {
    "ODISE(Label)": "configs/Panoptic/odise_label_coco_50e.py",
    "ODISE(Caption)": "configs/Panoptic/odise_caption_coco_50e.py",
}


def list_examples():
    rows = []
    if os.path.isdir(EXAMPLES_DIR):
        for name in sorted(os.listdir(EXAMPLES_DIR)):
            if name.lower().endswith((".jpg", ".jpeg", ".png")):
                vocab, cats, mdl = EXAMPLE_PRESETS.get(
                    name, ("", [CATEGORY_CHOICES[0]], "ODISE(Label)"))
                rows.append([os.path.join(EXAMPLES_DIR, name), vocab, cats,
                             mdl])
    return rows


@functools.lru_cache(maxsize=2)
def build_inference(model_name: str):
    """Instantiate (model, variables) for a dropdown choice (cached)."""
    import jax
    import jax.numpy as jnp

    from odise_tpu.config import instantiate_odise, load_config, resolve

    cfg = resolve(load_config(MODEL_CONFIGS[model_name]))
    cfg.model.overlap_threshold = 0.0
    model = instantiate_odise(cfg.model)
    flat_dim = (model.category_head.clip_dim
                if getattr(model, "category_head", None) is not None
                else model.word_head.clip_dim)
    train_labels = model.train_labels
    flat = [t for g in train_labels for t in g]
    init_aux = jnp.zeros((len(flat), flat_dim))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), init_aux,
        method=type(model).init_full)
    ckpt = os.environ.get("ODISE_TPU_DEMO_CKPT", "")
    if ckpt:
        from odise_tpu.engine.checkpoint import Checkpointer

        ck = Checkpointer(os.path.dirname(ckpt) or ".")
        params, _, _, _ = ck.load(ckpt, variables["params"])
        variables = {"params": params}
    return model, variables


def checkbox_to_label_args(category_list):
    out = []
    for c in category_list or []:
        for tag in ("COCO", "ADE", "LVIS"):
            if tag in c:
                out.append(tag)
    return out or ["COCO"]


def run_inference(image: np.ndarray, vocab_text: str, category_list,
                  model_name: str = "ODISE(Label)",
                  alpha: float = None, beta: float = None) -> np.ndarray:
    """Gradio-free core: image array -> panoptic overlay array."""
    import argparse

    import cv2
    import jax.numpy as jnp

    from demo.demo import build_demo_vocab
    from odise_tpu.models.inference import panoptic_inference
    from odise_tpu.models.wrapper import (
        OpenPanopticInference, build_open_vocabulary)
    from odise_tpu.utils.visualizer import Visualizer

    model, variables = build_inference(model_name)
    if alpha is not None and model.clip_head is not None:
        object.__setattr__(model.clip_head, "alpha", float(alpha))
    if beta is not None and model.clip_head is not None:
        object.__setattr__(model.clip_head, "beta", float(beta))

    labels_args = argparse.Namespace(
        vocab=vocab_text or "", caption="",
        label=checkbox_to_label_args(category_list))
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
    cats = np.asarray(pan.segment_category)
    n = int(pan.num_segments)
    vis = Visualizer(resized, class_names=[l[0] for l in labels])
    return vis.draw_panoptic_seg(seg, cats, n)


def main():
    if os.environ.get("ODISE_TPU_FORCE_CPU"):
        import jax

        # sitecustomize re-selects the TPU relay even when JAX_PLATFORMS=cpu
        # is exported; pin via config for local testing
        jax.config.update("jax_platforms", "cpu")
    try:
        import gradio as gr
    except ImportError:
        print("gradio is not installed; use demo/demo.py for CLI inference.")
        return

    def predict(image, vocab_text, category_list, model_name, alpha, beta):
        return run_inference(image, vocab_text, category_list, model_name,
                             alpha, beta)

    with gr.Blocks(title=TITLE) as demo:
        gr.Markdown(f"<h1 style='text-align: center'>{TITLE}</h1>")
        gr.Markdown(DESCRIPTION)
        with gr.Row():
            with gr.Column(scale=3, variant="panel"):
                inp = gr.Image(label="input")
                model_name = gr.Dropdown(
                    label="Model", choices=list(MODEL_CONFIGS),
                    value="ODISE(Label)")
                vocab = gr.Textbox(
                    label="Extra Vocabulary",
                    placeholder="black pickup truck, pickup truck; blue sky")
                cats = gr.CheckboxGroup(
                    choices=CATEGORY_CHOICES, value=[CATEGORY_CHOICES[0]],
                    label="Category to use")
                with gr.Row():
                    alpha = gr.Slider(0.0, 1.0, value=0.3, step=0.05,
                                      label="alpha (seen-category CLIP weight)")
                    beta = gr.Slider(0.0, 1.0, value=0.7, step=0.05,
                                     label="beta (novel-category CLIP weight)")
                with gr.Row():
                    clear_btn = gr.Button("Clear")
                    submit_btn = gr.Button("Submit", variant="primary")
            with gr.Column(scale=2):
                out = gr.Image(label="Panoptic Segmentation")
                gr.Examples(
                    examples=list_examples(),
                    inputs=[inp, vocab, cats, model_name],
                    examples_per_page=5,
                )
        gr.Markdown(ARTICLE)
        submit_btn.click(predict, [inp, vocab, cats, model_name, alpha, beta],
                         out)
        clear_btn.click(
            lambda: (None, "", [CATEGORY_CHOICES[0]], "ODISE(Label)", 0.3,
                     0.7, None),
            [], [inp, vocab, cats, model_name, alpha, beta, out])
    demo.launch()


if __name__ == "__main__":
    main()
