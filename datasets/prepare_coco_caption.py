#!/usr/bin/env python
"""Merge COCO captions into the panoptic json + extract noun-phrase words.

Capability parity with reference datasets/prepare_coco_caption.py, extended
TPU-first: the reference extracts noun phrases from captions with NLTK *per
training step on the host* (reference odise/modeling/meta_arch/odise.py:
1114-1191), which would stall a TPU. Here the extraction happens once,
offline, and the words ship inside the json (SURVEY.md section 7 build plan).

Usage:
  python datasets/prepare_coco_caption.py [DATASET_ROOT]
"""

from __future__ import annotations

import json
import os
import sys


def get_noun_phrases(text: str) -> list[str]:
    """NLTK RegexpParser noun-phrase extraction (reference odise.py:1114-1152)."""
    import nltk

    try:
        tokenized = nltk.word_tokenize(text)
        tagged = nltk.pos_tag(tokenized, tagset="universal")
    except LookupError:
        nltk.download("punkt", quiet=True)
        nltk.download("averaged_perceptron_tagger", quiet=True)
        nltk.download("universal_tagset", quiet=True)
        tokenized = nltk.word_tokenize(text)
        tagged = nltk.pos_tag(tokenized, tagset="universal")
    grammar = "NP: {<ADJ>*<NOUN>+}"
    cp = nltk.RegexpParser(grammar)
    tree = cp.parse(tagged)
    phrases = []
    for subtree in tree.subtrees(filter=lambda t: t.label() == "NP"):
        phrases.append(" ".join(w for w, _ in subtree.leaves()))
    return phrases


def main(root: str):
    ann_dir = os.path.join(root, "coco", "annotations")
    with open(os.path.join(ann_dir, "captions_train2017.json")) as f:
        captions = json.load(f)
    with open(os.path.join(ann_dir, "panoptic_train2017.json")) as f:
        panoptic = json.load(f)

    cap_by_img: dict[int, list[str]] = {}
    words_by_img: dict[int, list[str]] = {}
    n = len(captions["annotations"])
    for i, ann in enumerate(captions["annotations"]):
        img = ann["image_id"]
        cap_by_img.setdefault(img, []).append(ann["caption"])
        try:
            words_by_img.setdefault(img, []).extend(get_noun_phrases(ann["caption"]))
        except Exception:
            pass
        if (i + 1) % 50000 == 0:
            print(f"{i + 1}/{n} captions processed")

    for ann in panoptic["annotations"]:
        img = int(ann["image_id"])
        ann["captions"] = cap_by_img.get(img, [])
        ann["words"] = sorted(set(words_by_img.get(img, [])))

    out = os.path.join(ann_dir, "panoptic_caption_train2017.json")
    with open(out, "w") as f:
        json.dump(panoptic, f)
    print("wrote", out)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.environ.get("DETECTRON2_DATASETS", "datasets"))
