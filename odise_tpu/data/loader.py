"""Data loaders: infinite shuffled training stream + sequential test stream.

Capability parity with ``build_d2_train_dataloader`` /
``build_d2_test_dataloader`` (reference odise/data/build.py:74-151):
world-size-divisible total batch with per-host slicing, seeded infinite
sampling for training, batch-1 sequential testing.

Host-side numpy; heavy decoding can be moved to grain workers later (the CI
machine is single-core, so the default is in-process).
"""

from __future__ import annotations

import itertools
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np

from .catalog import DatasetCatalog
from .dataset_mapper import collate


class TrainingSampler:
    """Infinite shuffled index stream (d2 TrainingSampler semantics)."""

    def __init__(self, size: int, seed: int = 42, shuffle: bool = True):
        self.size = size
        self.seed = seed
        self.shuffle = shuffle

    def __iter__(self) -> Iterator[int]:
        epoch = 0
        while True:
            rng = np.random.RandomState(self.seed + epoch)
            order = rng.permutation(self.size) if self.shuffle else np.arange(self.size)
            yield from order.tolist()
            epoch += 1


def build_train_loader(
    dataset: str | List[dict],
    mapper: Callable,
    total_batch_size: int,
    *,
    num_hosts: int = 1,
    host_id: int = 0,
    seed: int = 42,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield collated batches of per-host size total/num_hosts, forever."""
    records = DatasetCatalog.get(dataset) if isinstance(dataset, str) else dataset
    assert total_batch_size % num_hosts == 0, (total_batch_size, num_hosts)
    per_host = total_batch_size // num_hosts
    sampler = iter(TrainingSampler(len(records), seed=seed))
    # skip indices belonging to other hosts
    sampler = itertools.islice(sampler, host_id, None, num_hosts)
    rng = np.random.RandomState(seed * 1000 + host_id)
    while True:
        samples = []
        for _ in range(per_host):
            idx = next(sampler)
            samples.append(mapper(records[idx], rng=rng))
        yield collate(samples)


def build_test_loader(
    dataset: str | List[dict],
    mapper: Optional[Callable] = None,
    batch_size: int = 1,
    limit: Optional[int] = None,
) -> Iterator:
    """Sequential pass over the dataset (batch 1 like the reference)."""
    records = DatasetCatalog.get(dataset) if isinstance(dataset, str) else dataset
    if limit is not None:
        records = records[:limit]
    for i in range(0, len(records), batch_size):
        chunk = records[i: i + batch_size]
        if mapper is None:
            yield chunk
        else:
            yield [mapper(r) for r in chunk]


def build_grain_train_loader(
    dataset: str | List[dict],
    mapper: Callable,
    total_batch_size: int,
    *,
    num_hosts: int = 1,
    host_id: int = 0,
    seed: int = 42,
    worker_count: int = 4,
) -> Iterator[Dict[str, np.ndarray]]:
    """Multi-worker training loader built on grain (the reference uses 4 d2
    worker processes per GPU; tools/train_net.py). Falls back to the
    in-process loader when grain is unavailable or worker_count == 0."""
    if worker_count <= 0:
        yield from build_train_loader(dataset, mapper, total_batch_size,
                                      num_hosts=num_hosts, host_id=host_id,
                                      seed=seed)
        return
    try:
        import grain.python as grain
    except ImportError:
        yield from build_train_loader(dataset, mapper, total_batch_size,
                                      num_hosts=num_hosts, host_id=host_id,
                                      seed=seed)
        return

    records = DatasetCatalog.get(dataset) if isinstance(dataset, str) else dataset
    per_host = total_batch_size // num_hosts

    class _Map(grain.MapTransform):
        def map(self, idx_record):
            idx, record = idx_record
            rng = np.random.RandomState((seed + idx) % (2 ** 31))
            return mapper(record, rng=rng)

    source = grain.MapDataset.source([(i, r) for i, r in enumerate(records)])
    ds = (source.shuffle(seed=seed)
          .repeat(None)
          .map(_Map())
          .batch(per_host, drop_remainder=True))
    it = iter(ds.to_iter_dataset(
        grain.ReadOptions(num_threads=worker_count, prefetch_buffer_size=2)))
    for batch in it:
        yield {k: np.asarray(v) for k, v in batch.items()}
