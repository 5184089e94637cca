"""Parameter counting tables.

Capability parity with reference odise/utils/parameter_count.py (fvcore-style
table with a trainable_only flag, used to verify the 28.1M trainable count,
reference README.md:89 / train_loop.py:76-79).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Optional, Tuple

import jax

from ..parallel.mesh import is_frozen_path


def _path_keys(path) -> Tuple[str, ...]:
    return tuple(getattr(k, "key", str(k)) for k in path)


def parameter_count(params, trainable_only: bool = False) -> Dict[str, int]:
    """Count params per module prefix ('' = total)."""
    counts: Dict[str, int] = defaultdict(int)
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = _path_keys(path)
        if trainable_only and is_frozen_path(keys):
            continue
        size = int(leaf.size) if hasattr(leaf, "size") else 0
        for i in range(len(keys) + 1):
            counts[".".join(keys[:i])] += size
    return dict(counts)


def _fmt(n: int) -> str:
    if n >= 1e9:
        return f"{n / 1e9:.2f}G"
    if n >= 1e6:
        return f"{n / 1e6:.2f}M"
    if n >= 1e3:
        return f"{n / 1e3:.2f}K"
    return str(n)


def parameter_count_table(params, max_depth: int = 3,
                          trainable_only: bool = False) -> str:
    counts = parameter_count(params, trainable_only=trainable_only)
    rows = [("model", _fmt(counts.get("", 0)))]
    for name in sorted(counts):
        if not name or name.count(".") >= max_depth:
            continue
        rows.append((" " * (name.count(".") + 1) + name.rsplit(".", 1)[-1],
                     _fmt(counts[name])))
    width = max(len(r[0]) for r in rows) + 2
    lines = [f"{'name':<{width}} #params", "-" * (width + 8)]
    lines += [f"{n:<{width}} {c}" for n, c in rows]
    return "\n".join(lines)
