"""Gradio app logic tests (UI-free: gradio is absent in this image).

Covers the reference app's capability surface (reference demo/app.py:1-332)
through the gradio-free core: example-gallery rows, category checkbox
parsing, and the full run_inference path on the tiny model.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from demo import app


def test_examples_and_checkbox_parsing():
    rows = app.list_examples()
    for row in rows:
        assert os.path.isfile(row[0])
        assert isinstance(row[1], str)
    assert app.checkbox_to_label_args(["COCO (133 categories)"]) == ["COCO"]
    assert app.checkbox_to_label_args(
        ["ADE (150 categories)", "LVIS (1203 categories)"]) == ["ADE", "LVIS"]
    assert app.checkbox_to_label_args([]) == ["COCO"]  # default


def test_run_inference_tiny(monkeypatch):
    import jax
    import jax.numpy as jnp

    from odise_tpu.model_zoo.factory import build_category_odise

    model = build_category_odise(
        "tiny", with_clip_head=False, use_checkpoint=False,
        slide_training=False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((3, 16)), method=type(model).init_full)
    monkeypatch.setattr(app, "build_inference",
                        lambda name: (model, variables))

    img = (np.random.RandomState(0).rand(96, 128, 3) * 255).astype(np.uint8)
    out = app.run_inference(img, "zebra, equine; blue sky",
                            ["COCO (133 categories)"])
    assert out.dtype == np.uint8
    # output matches the 512-short-side resize of the input
    scale = 512 / 96
    assert out.shape[:2] == (int(96 * scale + 0.5), int(128 * scale + 0.5))
