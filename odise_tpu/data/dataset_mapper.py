"""Dataset mappers: record dict -> fixed-shape training arrays.

Capability parity with ``COCOPanopticDatasetMapper`` (reference
odise/data/dataset_mapper.py:29-149): read image + panoptic png, LSJ
augmentations, rgb2id, per-segment binary masks with contiguous category ids,
carried captions.

TPU-native: targets are padded to a static ``max_instances`` with a validity
mask so the jitted train step sees fixed shapes (the reference emits
variable-length Instances).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from .transforms import AugInput, FixedSizeCrop, RandomFlip, ResizeScale, rgb2id
from ..models.clip.tokenizer import tokenize


def default_lsj_augmentations(image_size: int = 1024):
    """LSJ recipe (reference configs/common/data/coco_panoptic_semseg.py:43-52)."""
    return [
        RandomFlip(0.5),
        ResizeScale(0.1, 2.0, image_size, image_size),
        FixedSizeCrop((image_size, image_size)),
    ]


@dataclasses.dataclass
class COCOPanopticDatasetMapper:
    """Map a d2-style record to fixed-shape arrays.

    Record keys: file_name, pan_seg_file_name (or preloaded arrays "image" /
    "pan_seg"), segments_info (list of {id, category_id, iscrowd}), optional
    captions (list[str]).

    Output dict:
      image: [S, S, 3] float32 in [0, 1]
      gt_labels: [T] int32, gt_masks: [T, S, S] bool, gt_valid: [T] bool
      word_tokens: [num_words, 77] int32 (caption path), word_valid: [num_words]
    """

    is_train: bool = True
    image_size: int = 1024
    max_instances: int = 100
    with_captions: bool = False
    num_words: int = 8
    word_dropout: float = 0.0
    augmentations: Optional[list] = None
    seed: int = 0

    def __post_init__(self):
        if self.augmentations is None:
            self.augmentations = default_lsj_augmentations(self.image_size)

    def _read_image(self, record) -> np.ndarray:
        if "image" in record:
            return np.asarray(record["image"])
        from PIL import Image

        return np.asarray(Image.open(record["file_name"]).convert("RGB"))

    def _read_pan_seg(self, record) -> Optional[np.ndarray]:
        if "pan_seg" in record:
            return np.asarray(record["pan_seg"])
        if "pan_seg_file_name" in record:
            from PIL import Image

            rgb = np.asarray(Image.open(record["pan_seg_file_name"]).convert("RGB"))
            return rgb2id(rgb)
        return None

    def __call__(self, record: Dict, rng: Optional[np.random.RandomState] = None) -> Dict:
        rng = rng or np.random.RandomState(self.seed)
        image = self._read_image(record)
        pan_seg = self._read_pan_seg(record)

        ai = AugInput(image=image, pan_seg=pan_seg)
        if self.is_train:
            for aug in self.augmentations:
                ai = aug(ai, rng)
        image = ai.image.astype(np.float32) / 255.0
        pan_seg = ai.pan_seg

        out: Dict = {"image": image}
        T = self.max_instances
        S = image.shape[0]
        gt_labels = np.zeros((T,), np.int32)
        gt_masks = np.zeros((T, image.shape[0], image.shape[1]), bool)
        gt_valid = np.zeros((T,), bool)
        if pan_seg is not None and "segments_info" in record:
            i = 0
            for seg in record["segments_info"]:
                if seg.get("iscrowd", 0):
                    continue
                mask = pan_seg == seg["id"]
                if not mask.any():
                    continue
                if i >= T:
                    break
                gt_labels[i] = seg["category_id"]
                gt_masks[i] = mask
                gt_valid[i] = True
                i += 1
        out.update(gt_labels=gt_labels, gt_masks=gt_masks, gt_valid=gt_valid)

        if self.with_captions:
            words: List[str] = []
            # words pre-extracted offline (noun phrases); fall back to raw captions
            for key in ("words", "captions"):
                if key in record and record[key]:
                    words = list(record[key])
                    break
            chosen = []
            for _ in range(self.num_words):
                if words and (self.word_dropout <= 0 or rng.rand() >= self.word_dropout):
                    chosen.append(words[rng.randint(len(words))])
                else:
                    chosen.append("")
            out["word_tokens"] = tokenize(chosen)
            out["word_valid"] = np.asarray([bool(wd) for wd in chosen])
        return out


def collate(samples: Sequence[Dict]) -> Dict[str, np.ndarray]:
    """Stack a list of mapped samples into batch arrays."""
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}
