"""Dry-run of the reference-side capture glue (tools/ref_capture_torch.py).

The real script runs inside an NVlabs/ODISE torch environment; here a mock
with the same attribute surface (backbone.feature_extractor / backbone /
sem_seg_head / category_head / cal_pred_logits / clip_head) exercises the
orchestration + layout logic, and the output is cross-checked against what
tools/verify_parity.py expects to consume."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

torch = pytest.importorskip("torch")

from ref_capture_torch import (assemble_capture, capture_reference,
                               chw_to_hwc, ramp_image)

B, Q, K, C, S = 1, 5, 3, 8, 16


class MockBackbone:
    def __init__(self):
        self.feature_extractor = self._taps

    def _taps(self, batched_inputs):
        img = batched_inputs["img"]
        assert img.shape == (B, 3, S, S), img.shape
        # 8 taps like the production config (2 enc + 4 unet + 2 dec)
        return [torch.full((B, 4 + i, S // 2, S // 2), float(i))
                for i in range(8)]

    def __call__(self, img):
        return {f"s{i}": torch.full((B, C, S // 2 ** i, S // 2 ** i), float(i))
                for i in range(2, 6)}


class MockCategoryHead:
    def get_and_cache_test_text_embed(self, labels):
        assert isinstance(labels, tuple) and isinstance(labels[0], tuple)
        return torch.arange(len(labels) * C, dtype=torch.float32).reshape(
            len(labels), C)

    def __call__(self, outputs):
        return {"text_embed": torch.ones(K, C), "null_embed": torch.ones(1, C)}


class MockClipHead:
    with_bg = False

    def get_and_cache_test_text_embed(self, labels):
        return torch.ones(len(labels), C) * 2

    def __call__(self, outputs):
        # reference PoolingCLIPHead returns ensembled pred_open_logits
        return {"pred_open_logits": outputs["pred_open_logits"] + 1.0}


class MockModel:
    def __init__(self):
        self.backbone = MockBackbone()
        self.category_head = MockCategoryHead()
        self.clip_head = MockClipHead()

    def sem_seg_head(self, feats):
        assert set(feats) == {"s2", "s3", "s4", "s5"}
        return {
            "pred_logits": torch.zeros(B, Q, K + 1),
            "pred_masks": torch.arange(B * Q * S * S, dtype=torch.float32
                                       ).reshape(B, Q, S, S),
            "mask_embed": torch.ones(B, Q, C),
            "logit_scale": torch.tensor(4.6),
            "aux_outputs": [],
        }

    def cal_pred_logits(self, outputs):
        return outputs["pred_logits"]


def test_chw_to_hwc_layout():
    x = np.arange(2 * 3 * 4 * 5, dtype=np.float32).reshape(2, 3, 4, 5)
    y = chw_to_hwc(x)
    assert y.shape == (2, 4, 5, 3)
    np.testing.assert_array_equal(y[1, 2, 3], x[1, :, 2, 3])
    with pytest.raises(ValueError):
        chw_to_hwc(np.zeros((3, 4, 5)))


def test_ramp_matches_tpu_side():
    from capture_activations import ramp_image as tpu_ramp

    np.testing.assert_array_equal(ramp_image(32), tpu_ramp(32))


def test_capture_reference_mock_full_surface():
    cap = capture_reference(MockModel(), ramp_image(S),
                            vocab=["cat", "dog", "grass"], torch_mod=torch)

    # tap keys in LdmExtractor order, channel-last
    for i in range(8):
        assert cap[f"tap_{i}"].shape == (B, S // 2, S // 2, 4 + i)
        assert float(cap[f"tap_{i}"][0, 0, 0, 0]) == float(i)
    # backbone pyramid permuted to [B, H, W, C]
    for i in range(2, 6):
        assert cap[f"backbone_s{i}"].shape == (B, S // 2 ** i, S // 2 ** i, C)
    # head keys: pred_masks query-major (NOT permuted)
    assert cap["head_pred_logits"].shape == (B, Q, K + 1)
    assert cap["head_pred_masks"].shape == (B, Q, S, S)
    np.testing.assert_array_equal(
        cap["head_pred_masks"].ravel(), np.arange(B * Q * S * S, dtype=np.float32))
    assert cap["head_mask_embed"].shape == (B, Q, C)
    assert float(cap["head_logit_scale"]) == pytest.approx(4.6)

    # vocab extras: labels round-trip through the npz byte encoding
    labels = json.loads(np.asarray(cap["vocab_labels"]).tobytes().decode())
    assert labels == [["cat"], ["dog"], ["grass"]]
    assert cap["vocab_text_raw"].shape == (3, C)
    assert cap["vocab_clip_text"].shape == (3, C)
    # with_bg=False branch: [B, Q, K+1] with renormalized bg column
    assert cap["clip_mask_cls"].shape == (B, Q, K + 1)

    # what verify_parity.py keys on
    prefixes = {k.split("_")[0] for k in cap}
    assert {"tap", "backbone", "head", "clip", "vocab"} <= prefixes


def test_capture_reference_no_vocab_minimal_model():
    class NoClipModel(MockModel):
        clip_head = None

    cap = capture_reference(NoClipModel(), ramp_image(S), torch_mod=torch)
    assert "clip_mask_cls" not in cap and "vocab_text_raw" not in cap
    assert "tap_0" in cap and "head_pred_masks" in cap


def test_assemble_capture_rejects_bad_layout():
    with pytest.raises(ValueError):
        assemble_capture([np.zeros((3, 4, 5))], {}, {})
