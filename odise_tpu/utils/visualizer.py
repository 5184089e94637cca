"""Panoptic/instance visualization (d2 Visualizer capability for the demo).

Lightweight PIL+numpy implementation: deterministic per-category colors,
alpha-blended segment overlay, boundary darkening, and category-name labels
at segment centers (reference demo uses detectron2's Visualizer,
demo/demo.py:153-199).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def _color_for(cat_id: int) -> np.ndarray:
    rng = np.random.RandomState(cat_id * 7919 + 13)
    # bright-ish deterministic color
    c = rng.randint(60, 255, 3)
    return c.astype(np.uint8)


def _boundaries(seg: np.ndarray) -> np.ndarray:
    b = np.zeros(seg.shape, bool)
    b[1:] |= seg[1:] != seg[:-1]
    b[:, 1:] |= seg[:, 1:] != seg[:, :-1]
    return b


class Visualizer:
    def __init__(self, image: np.ndarray,
                 class_names: Optional[Sequence[str]] = None,
                 alpha: float = 0.55):
        self.image = np.asarray(image).astype(np.float32)
        self.class_names = class_names
        self.alpha = alpha

    def draw_panoptic_seg(self, panoptic_seg: np.ndarray,
                          segment_category: Sequence[int],
                          num_segments: int) -> np.ndarray:
        """panoptic_seg [H, W] int ids (0 = void); segment_category[i] is the
        category of segment id i+1. Returns a uint8 overlay image."""
        seg = np.asarray(panoptic_seg)
        out = self.image.copy()
        centers = []
        for sid in range(1, int(num_segments) + 1):
            mask = seg == sid
            if not mask.any():
                continue
            cat = int(segment_category[sid - 1])
            color = _color_for(cat).astype(np.float32)
            out[mask] = (1 - self.alpha) * out[mask] + self.alpha * color
            ys, xs = np.nonzero(mask)
            centers.append((int(xs.mean()), int(ys.mean()), cat))
        out[_boundaries(seg)] *= 0.3
        out = np.clip(out, 0, 255).astype(np.uint8)

        if self.class_names is not None and centers:
            try:
                from PIL import Image, ImageDraw

                img = Image.fromarray(out)
                draw = ImageDraw.Draw(img)
                for (x, y, cat) in centers:
                    name = (self.class_names[cat]
                            if cat < len(self.class_names) else str(cat))
                    # halo for readability
                    for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                        draw.text((x + dx, y + dy), name, fill=(0, 0, 0))
                    draw.text((x, y), name, fill=(255, 255, 255))
                out = np.asarray(img)
            except Exception:
                pass
        return out

    def draw_instances(self, masks: np.ndarray, classes: Sequence[int],
                       scores: Sequence[float],
                       score_threshold: float = 0.5) -> np.ndarray:
        """masks [N, H, W] bool; draws instances above threshold."""
        out = self.image.copy()
        seg = np.zeros(self.image.shape[:2], np.int32)
        kept = []
        for i in range(len(masks)):
            if float(scores[i]) < score_threshold:
                continue
            seg[masks[i] & (seg == 0)] = len(kept) + 1
            kept.append(int(classes[i]))
        return Visualizer(out, self.class_names, self.alpha).draw_panoptic_seg(
            seg, kept, len(kept))
