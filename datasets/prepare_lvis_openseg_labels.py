#!/usr/bin/env python
"""Generate the LVIS-1203 openseg label file from the LVIS annotation json.

Capability parity with the reference's LVIS openseg label generation: one
``id:name1,name2`` line per category, synonyms from the LVIS "synonyms" field,
underscores replaced by spaces. The shipped
odise_tpu/data/datasets/openseg_labels/lvis_1203*.txt were produced this way.
"""

from __future__ import annotations

import json
import os
import sys


def main(root: str):
    ann = os.path.join(root, "lvis", "lvis_v1_val.json")
    if not os.path.isfile(ann):
        print(f"missing {ann}")
        return
    with open(ann) as f:
        data = json.load(f)
    cats = sorted(data["categories"], key=lambda c: c["id"])
    out = os.path.join(os.path.dirname(__file__), "..", "odise_tpu", "data",
                       "datasets", "openseg_labels")
    with open(os.path.join(out, "lvis_1203.txt"), "w") as f:
        for c in cats:
            name = c["name"].replace("_", " ")
            f.write(f"{c['id']}:{name}\n")
    with open(os.path.join(out, "lvis_1203_with_prompt_eng.txt"), "w") as f:
        for c in cats:
            syns = [s.replace("_", " ") for s in c.get("synonyms", [c["name"]])]
            f.write(f"{c['id']}:{','.join(dict.fromkeys(syns))}\n")
    print("wrote lvis label files")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.environ.get("DETECTRON2_DATASETS", "datasets"))
