#!/usr/bin/env python
"""ADE20K-150 semantic annotations: shift ids by -1 (255 = void).

Capability parity with the reference prep script of the same name.
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image


def main(root: str):
    base = os.path.join(root, "ADEChallengeData2016")
    for split in ("training", "validation"):
        src = os.path.join(base, "annotations", split)
        dst = os.path.join(base, "annotations_detectron2", split)
        os.makedirs(dst, exist_ok=True)
        files = sorted(os.listdir(src))
        for i, f in enumerate(files):
            lab = np.asarray(Image.open(os.path.join(src, f)))
            lab = lab.astype(np.int16) - 1  # 0 (unlabeled) -> -1 -> 255
            lab[lab < 0] = 255
            Image.fromarray(lab.astype(np.uint8)).save(os.path.join(dst, f))
            if (i + 1) % 2000 == 0:
                print(f"{split}: {i + 1}/{len(files)}")
    print("done")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.environ.get("DETECTRON2_DATASETS", "datasets"))
