"""Static shape buckets for variable-size evaluation.

The reference evaluates arbitrary image shapes natively (reference
odise/evaluation/evaluator.py:30-149, batch-1 ``ResizeShortestEdge``). Under
XLA every distinct padded shape is a fresh compile (~minutes per graph on
TPU), so the rebuild pads each resized image into a small canonical set of
aspect-ratio buckets: the whole multi-dataset eval suite compiles one graph
per (vocabulary, bucket) instead of one per image shape. Pixels between the
valid region and the bucket boundary are masked out of fusion via the
``valid_hw`` argument of models.inference.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

# ratios covering COCO/ADE/Pascal val aspect distributions; max jump 1.25x
# bounds the padded-compute waste at ~25%
DEFAULT_RATIOS = (1.0, 4 / 3, 5 / 3, 2.0, 2.5)


def compute_eval_buckets(
    short_side: int = 1024,
    max_size: int = 2560,
    divisibility: int = 64,
    ratios: Sequence[float] = DEFAULT_RATIOS,
) -> List[Tuple[int, int]]:
    """Canonical (H, W) bucket shapes, landscape + portrait, /divisibility."""
    def ceil_div(x: float) -> int:
        return int(math.ceil(x / divisibility)) * divisibility

    max_long = ceil_div(max_size) if max_size % divisibility else max_size
    shapes = set()
    short = ceil_div(short_side)
    for r in ratios:
        long = min(ceil_div(short_side * r), max_long)
        shapes.add((short, long))
        shapes.add((long, short))
    return sorted(shapes)


def pick_bucket(h: int, w: int,
                buckets: Sequence[Tuple[int, int]]) -> Optional[Tuple[int, int]]:
    """Smallest-area bucket that contains (h, w); None if nothing fits."""
    fitting = [b for b in buckets if b[0] >= h and b[1] >= w]
    if not fitting:
        return None
    return min(fitting, key=lambda b: b[0] * b[1])
