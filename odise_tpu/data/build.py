"""Label parsing, prompt templates, and dataloader builders.

Capability parity with reference odise/data/build.py:
  * ``get_openseg_labels`` (build.py:18-51): parse ``id:name1,name2,...``
    label files into list-of-synonym-lists for 7 vocabularies.
  * ``prompt_labels`` (build.py:54-71): "a {}" / "a photo of a {}." /
    "a photo of a {} in the scene." templates.
  * ``build_d2_train_dataloader`` / ``build_d2_test_dataloader``
    (build.py:74-151): world-size-divisible batches; here implemented over
    the framework's grain/numpy pipeline (see loader.py).
"""

from __future__ import annotations

import copy
import os
from typing import List

_LABEL_DIR = os.path.join(os.path.dirname(__file__), "datasets", "openseg_labels")

PROMPT_TEMPLATES = {
    None: "{}",
    "a": "a {}",
    "photo": "a photo of a {}.",
    "scene": "a photo of a {} in the scene.",
}


def get_openseg_labels(dataset: str, prompt_engineered: bool = False) -> List[List[str]]:
    """Parse an openseg label file into a list of synonym lists."""
    available = [
        "ade20k_150",
        "ade20k_847",
        "coco_panoptic",
        "pascal_context_59",
        "pascal_context_459",
        "pascal_voc_21",
        "lvis_1203",
    ]
    assert dataset in available, f"{dataset} not in {available}"
    filename = os.path.join(
        _LABEL_DIR, f"{dataset}_with_prompt_eng.txt" if prompt_engineered else f"{dataset}.txt"
    )
    with open(filename) as f:
        lines = [l.strip() for l in f if l.strip()]
    categories = []
    for line in lines:
        _, names = line.split(":", 1)
        if names == "invalid_class_id":  # placeholder rows (reference build.py:44-46)
            continue
        categories.append([n.strip() for n in names.split(",")])
    return categories


def prompt_labels(labels: List[List[str]], prompt: str | None) -> List[List[str]]:
    """Apply a prompt template to every synonym (reference build.py:54-71)."""
    if prompt is None:
        return labels
    template = PROMPT_TEMPLATES[prompt]
    labels = copy.deepcopy(labels)
    return [[template.format(l) for l in syns] for syns in labels]
