"""Background-thread prefetch for host-side eval prep.

The eval loop alternates host work (image decode, resize, gt rasterize)
with device work (inference + statistics); on a single-core host the two
serialize.  ``prefetch_iter`` computes ``fn(item)`` up to ``depth`` items
ahead in a worker thread — PIL/cv2/numpy release the GIL during their hot
loops, and device fetches block outside the GIL, so prep overlaps device
time almost fully.  (Capability analog of the reference's
num_workers-based d2 test loader, reference
configs/common/data/pano_open_d2_eval.py:36-53.)
"""

from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")
U = TypeVar("U")


def prefetch_iter(items: Iterable[T], fn: Callable[[T], U],
                  depth: int = 2) -> Iterator[U]:
    """Yield ``fn(item)`` in order, computed up to ``depth`` ahead."""
    if depth <= 0:
        for item in items:
            yield fn(item)
        return
    with ThreadPoolExecutor(max_workers=1) as ex:
        pending: collections.deque = collections.deque()
        it = iter(items)
        exhausted = False
        while True:
            while not exhausted and len(pending) < depth:
                try:
                    pending.append(ex.submit(fn, next(it)))
                except StopIteration:
                    exhausted = True
            if not pending:
                return
            yield pending.popleft().result()
