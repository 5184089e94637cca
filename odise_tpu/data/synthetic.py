"""Synthetic shapes dataset: the in-image substitute for real-data training.

The reference proves its training recipe on COCO (6 days, 32 V100s); this
air-gapped image has neither datasets nor released weights, so learning is
proven on a generated panoptic task instead: color-coded shapes on a stuff
background. Anything with a wrong-sign matcher cost, a mis-assigned target,
or a broken gradient path cannot fit this task; a correct pipeline drives
synthetic PQ from ~0 toward 100 within a few hundred steps
(tools/convergence.py, tests/test_convergence.py).

Layout per image (categories are color-coded so even RANDOM frozen-tower
features remain linearly separable):
  * class 2 "grass" (stuff): green-ish background
  * class 0 "cat"  (thing): red rectangle, random size/position
  * class 1 "dog"  (thing): blue disk, random radius/center (drawn on top)

Records are d2-style dicts compatible with both the training mapper
(COCOPanopticDatasetMapper) and the eval path (train_net.do_test):
file_name / pan_seg_file_name / sem_seg_file_name / segments_info.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

SYNTH_LABELS: Tuple[Tuple[str, ...], ...] = (("cat",), ("dog",), ("grass",))
SYNTH_THING = (True, True, False)


def synth_categories() -> List[Dict]:
    return [{"id": i, "isthing": int(SYNTH_THING[i]), "name": l[0]}
            for i, l in enumerate(SYNTH_LABELS)]


def _draw_sample(rng: np.random.RandomState, size: int, vary: bool = False):
    """One image + per-pixel category map + instance-id map.

    ``vary=True`` makes each thing present with p=0.75 (at least one always)
    — required by the caption variant: the grounding InfoNCE contrasts
    images against each other through their word sets, so identical captions
    across the batch would make the contrastive task degenerate
    (reference grounding dynamics: odise.py:815-907).
    """
    img = np.empty((size, size, 3), np.float32)
    # grass background with texture noise
    img[..., 0] = 30
    img[..., 1] = 150
    img[..., 2] = 40
    img += rng.randn(size, size, 3) * 18

    sem = np.full((size, size), 2, np.uint8)     # grass
    ids = np.full((size, size), 3, np.uint32)    # grass segment id

    if vary:
        with_cat = rng.rand() < 0.75
        # at least one thing in every image
        with_dog = rng.rand() < 0.75 or not with_cat
    else:
        with_cat = with_dog = True

    # cat: red rectangle
    cat = np.zeros((size, size), bool)
    if with_cat:
        h = rng.randint(size // 4, size // 2 + 1)
        w = rng.randint(size // 4, size // 2 + 1)
        y = rng.randint(0, size - h)
        x = rng.randint(0, size - w)
        cat[y:y + h, x:x + w] = True
        img[cat] = (np.asarray([200, 40, 40])
                    + rng.randn(int(cat.sum()), 3) * 15)
        sem[cat] = 0
        ids[cat] = 1

    # dog: blue disk, drawn on top (may partially occlude the cat)
    if with_dog:
        yy, xx = np.mgrid[:size, :size]
        for _ in range(100):
            r = rng.randint(size // 8, size // 4 + 1)
            cy = rng.randint(r, size - r)
            cx = rng.randint(r, size - r)
            dog = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            # keep a visible chunk of the cat (panoptic GT needs both things)
            if not with_cat or (cat & ~dog).sum() >= (size * size) // 64:
                break
        img[dog] = (np.asarray([40, 60, 210])
                    + rng.randn(int(dog.sum()), 3) * 15)
        sem[dog] = 1
        ids[dog] = 2

    img = np.clip(img, 0, 255).astype(np.uint8)
    return img, sem, ids


def make_shapes_records(
    out_dir: str,
    n: int,
    *,
    size: int = 64,
    seed: int = 0,
    prefix: str = "synth",
    with_captions: bool = False,
    vary: bool = False,
) -> List[Dict]:
    """Write n images (+ panoptic/semantic GT pngs) and return records.

    ``with_captions=True`` adds ``captions`` (one sentence naming the
    categories present) and ``words`` (the offline-extracted noun list the
    caption mapper samples from — the rebuild moves the reference's
    per-step NLTK extraction, odise.py:1161-1191, to data prep).
    ``vary=True`` randomizes thing presence (see ``_draw_sample``).
    """
    from PIL import Image

    from .transforms import id2rgb

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    records = []
    for i in range(n):
        img, sem, ids = _draw_sample(rng, size, vary=vary)
        img_path = os.path.join(out_dir, f"{prefix}{i}.png")
        pan_path = os.path.join(out_dir, f"{prefix}{i}_pan.png")
        sem_path = os.path.join(out_dir, f"{prefix}{i}_sem.png")
        Image.fromarray(img).save(img_path)
        Image.fromarray(id2rgb(ids)).save(pan_path)
        Image.fromarray(sem).save(sem_path)
        segments = []
        for seg_id, cat_id in ((1, 0), (2, 1), (3, 2)):
            if (ids == seg_id).any():
                segments.append(
                    {"id": seg_id, "category_id": cat_id, "iscrowd": 0})
        record = {
            "file_name": img_path,
            "image_id": i,
            "pan_seg_file_name": pan_path,
            "sem_seg_file_name": sem_path,
            "segments_info": segments,
        }
        if with_captions:
            present = [SYNTH_LABELS[s["category_id"]][0] for s in segments]
            things = [n for n in present if n != "grass"]
            record["captions"] = [
                "a photo of a " + " and a ".join(things) + " on grass"]
            record["words"] = present
        records.append(record)
    return records
