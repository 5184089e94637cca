"""COCO-format segmentation decoding (polygons and RLE) without pycocotools.

Capability parity with the mask decoding the reference gets from
pycocotools.mask (used via detectron2's COCO loaders and the COCOEvaluator,
reference odise/evaluation/d2_evaluator.py:104-144).  Supports the three
COCO ``segmentation`` encodings:

* list of polygons ``[[x0, y0, x1, y1, ...], ...]``
* uncompressed RLE ``{"size": [h, w], "counts": [int, ...]}``
* compressed RLE ``{"size": [h, w], "counts": "<ascii string>"}``

RLE runs are column-major (Fortran order) and alternate background /
foreground starting with background, matching the COCO spec.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np

Segmentation = Union[List[Sequence[float]], Dict]


def decode_compressed_counts(s: Union[str, bytes]) -> List[int]:
    """Decode COCO's LEB128-style compressed RLE counts string.

    Each count is stored as a sequence of 6-bit chunks (chars offset by 48);
    bit 5 of a chunk is the continuation flag.  From the third count onward
    the stored value is a delta against counts[-2].
    """
    if isinstance(s, bytes):
        s = s.decode("ascii")
    counts: List[int] = []
    p = 0
    n = len(s)
    while p < n:
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def encode_compressed_counts(counts: Sequence[int]) -> str:
    """Inverse of :func:`decode_compressed_counts` (for writing results)."""
    out: List[str] = []
    for i, x in enumerate(counts):
        if i > 2:
            x = int(x) - int(counts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            # sign-aware termination: stop when the remaining bits are pure
            # sign extension of bit 4
            more = x != (-1 if c & 0x10 else 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def rle_to_mask(rle: Dict) -> np.ndarray:
    """Uncompressed or compressed RLE dict -> bool mask of shape ``size``."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = decode_compressed_counts(counts)
    total = int(sum(counts))
    if total != h * w:
        raise ValueError(f"RLE covers {total} pixels, expected {h * w}")
    flat = np.zeros(h * w, dtype=bool)
    pos = 0
    val = False
    for c in counts:
        if val:
            flat[pos:pos + c] = True
        pos += c
        val = not val
    return flat.reshape((w, h)).T  # column-major


def mask_to_rle(mask: np.ndarray, compress: bool = True) -> Dict:
    """Bool mask -> COCO RLE dict (column-major runs)."""
    h, w = mask.shape
    flat = np.asarray(mask, bool).T.reshape(-1)
    # run-length encode, first run counts zeros
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(bounds).tolist()
    if flat.size and flat[0]:
        counts = [0] + counts
    if compress:
        return {"size": [h, w], "counts": encode_compressed_counts(counts)}
    return {"size": [h, w], "counts": counts}


def polygons_to_mask(polygons: List[Sequence[float]], h: int, w: int) -> np.ndarray:
    """Rasterize COCO polygons ([x0, y0, x1, y1, ...] lists) to a bool mask."""
    import cv2

    mask = np.zeros((h, w), np.uint8)
    pts = [np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
           for p in polygons if len(p) >= 6]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask.astype(bool)


def segmentation_to_mask(seg: Segmentation, h: int, w: int) -> np.ndarray:
    """Any COCO ``segmentation`` payload -> (h, w) bool mask."""
    if isinstance(seg, list):
        return polygons_to_mask(seg, h, w)
    if isinstance(seg, dict):
        m = rle_to_mask(seg)
        if m.shape != (h, w):
            raise ValueError(f"RLE size {m.shape} != image size {(h, w)}")
        return m
    raise TypeError(f"unsupported segmentation type {type(seg)}")


def annotations_to_masks(anns: List[Dict], h: int, w: int) -> np.ndarray:
    """Stack of (N, h, w) bool masks from a list of COCO annotations."""
    if not anns:
        return np.zeros((0, h, w), bool)
    return np.stack([segmentation_to_mask(a["segmentation"], h, w)
                     for a in anns])
