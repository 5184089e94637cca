"""Image/segmentation augmentations (host-side numpy).

Capability parity with the detectron2 transforms the reference composes for
LSJ training (reference configs/common/data/coco_panoptic_semseg.py:40-58:
RandomFlip, ResizeScale 0.1-2.0 @ 1024, FixedSizeCrop 1024^2) and
ResizeShortestEdge for eval. Implemented fresh on numpy + cv2.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _resize(img: np.ndarray, h: int, w: int, interp: str) -> np.ndarray:
    flags = {"bilinear": cv2.INTER_LINEAR, "nearest": cv2.INTER_NEAREST,
             "bicubic": cv2.INTER_CUBIC}[interp]
    return cv2.resize(img, (w, h), interpolation=flags)


@dataclasses.dataclass
class AugInput:
    image: np.ndarray                 # [H, W, 3] uint8
    sem_seg: Optional[np.ndarray] = None   # [H, W] int
    pan_seg: Optional[np.ndarray] = None   # [H, W] int (rgb2id'd)

    def apply(self, img_fn, seg_fn):
        self.image = img_fn(self.image)
        if self.sem_seg is not None:
            self.sem_seg = seg_fn(self.sem_seg)
        if self.pan_seg is not None:
            self.pan_seg = seg_fn(self.pan_seg)
        return self


class RandomFlip:
    def __init__(self, prob: float = 0.5, horizontal: bool = True):
        self.prob = prob
        self.horizontal = horizontal

    def __call__(self, ai: AugInput, rng: np.random.RandomState) -> AugInput:
        if rng.rand() < self.prob:
            ax = 1 if self.horizontal else 0
            return ai.apply(lambda x: np.flip(x, axis=ax).copy(),
                            lambda x: np.flip(x, axis=ax).copy())
        return ai


class ResizeScale:
    """Scale by U(min_scale, max_scale) relative to a target size (LSJ)."""

    def __init__(self, min_scale: float, max_scale: float,
                 target_height: int, target_width: int):
        self.min_scale, self.max_scale = min_scale, max_scale
        self.th, self.tw = target_height, target_width

    def __call__(self, ai: AugInput, rng: np.random.RandomState) -> AugInput:
        scale = rng.uniform(self.min_scale, self.max_scale)
        h, w = ai.image.shape[:2]
        out_scale = min(self.th * scale / h, self.tw * scale / w)
        nh, nw = max(1, int(h * out_scale + 0.5)), max(1, int(w * out_scale + 0.5))
        return ai.apply(
            lambda x: _resize(x, nh, nw, "bilinear"),
            lambda x: _resize(x.astype(np.int32), nh, nw, "nearest"),
        )


class FixedSizeCrop:
    """Random-crop (if larger) then pad (if smaller) to a fixed size."""

    def __init__(self, crop_size: Tuple[int, int], pad_value: float = 128.0,
                 seg_pad_value: int = 0):
        self.ch, self.cw = crop_size
        self.pad_value = pad_value
        self.seg_pad_value = seg_pad_value

    def __call__(self, ai: AugInput, rng: np.random.RandomState) -> AugInput:
        h, w = ai.image.shape[:2]
        y0 = rng.randint(0, max(h - self.ch, 0) + 1)
        x0 = rng.randint(0, max(w - self.cw, 0) + 1)

        def crop_pad(x, pad_val):
            x = x[y0: y0 + self.ch, x0: x0 + self.cw]
            ph, pw = self.ch - x.shape[0], self.cw - x.shape[1]
            if ph > 0 or pw > 0:
                pads = [(0, ph), (0, pw)] + [(0, 0)] * (x.ndim - 2)
                x = np.pad(x, pads, constant_values=pad_val)
            return x

        ai.image = crop_pad(ai.image, self.pad_value)
        if ai.sem_seg is not None:
            ai.sem_seg = crop_pad(ai.sem_seg, self.seg_pad_value)
        if ai.pan_seg is not None:
            ai.pan_seg = crop_pad(ai.pan_seg, 0)
        return ai


class ResizeShortestEdge:
    """Resize shorter side to ``short``, cap longer side at ``max_size``."""

    def __init__(self, short: int, max_size: int = 2560):
        self.short, self.max_size = short, max_size

    def __call__(self, ai: AugInput, rng=None) -> AugInput:
        h, w = ai.image.shape[:2]
        scale = self.short / min(h, w)
        if max(h, w) * scale > self.max_size:
            scale = self.max_size / max(h, w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        return ai.apply(
            lambda x: _resize(x, nh, nw, "bilinear"),
            lambda x: _resize(x.astype(np.int32), nh, nw, "nearest"),
        )


def rgb2id(color: np.ndarray) -> np.ndarray:
    """Panoptic png RGB -> segment id (panopticapi convention)."""
    color = color.astype(np.uint32)
    return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]


def id2rgb(ids: np.ndarray) -> np.ndarray:
    """Segment id map -> RGB png (inverse of rgb2id)."""
    ids = ids.astype(np.uint32)
    return np.stack([ids % 256, (ids // 256) % 256, (ids // 65536) % 256],
                    axis=-1).astype(np.uint8)
