"""Scalable Bloom filter (parity: reference
``src/bloom/scalable-bloom-filter.ts``).

A growing cascade of PartitionedBloomFilters: a new filter is appended
when the current one's load reaches 0.5; filter i has size
``filters[0]._m * 2**i``, error rate ``eps_{i-1} * ratio`` and
``k_i = ceil(k_0 + i*log2(1/ratio))`` hashes. ``has`` = any filter hit.

Distribution note (engine): the filter cascade diverges between
builders, so cross-partition merge is NOT defined — the engine shards
the keyspace (``hash(key) % P``) and gives each shard its own filter
(see stages.seen_set).
"""

from __future__ import annotations

import math

import numpy as np

from ..hashing import DEFAULT_SEED
from .partitioned_bloom import PartitionedBloomFilter
from .serde import export_bigint, import_bigint

_S = 2  # growth power (scalable-bloom-filter.ts:35)
DEFAULT_RATIO = 0.8


class ScalableBloomFilter:
    def __init__(self, initial_size: int = 128, initial_error_rate: float = 0.001,
                 ratio: float = DEFAULT_RATIO, seed: int = DEFAULT_SEED,
                 hasher=None):
        self._initial_size = initial_size
        self._initial_error_rate = initial_error_rate
        self._ratio = ratio
        self._seed = seed
        # custom Hashing (README "Seeding and Hashing" parity): handed
        # down to every internal PartitionedBloomFilter — the engine
        # twin of assigning _hashing on each cascade member
        self._hasher = hasher
        self._filters: list[PartitionedBloomFilter] = []
        self._add_filter()

    @classmethod
    def create(cls, size: int, error_rate: float, ratio: float = DEFAULT_RATIO,
               seed: int = DEFAULT_SEED, hasher=None) -> "ScalableBloomFilter":
        return cls(size, error_rate, ratio, seed, hasher)

    @property
    def current(self) -> PartitionedBloomFilter:
        return self._filters[-1]

    def _add_filter(self) -> None:
        index = len(self._filters)
        if index == 0:
            new_size, new_error_rate, new_hashes = self._initial_size, self._initial_error_rate, None
        else:
            new_size = self._filters[0]._m * _S**index
            new_error_rate = self.current._error_rate * self._ratio
            new_hashes = math.ceil(self._filters[0]._k + index * math.log2(1 / self._ratio))
        f = PartitionedBloomFilter.create(new_size, new_error_rate, new_hashes,
                                          seed=self._seed,
                                          hasher=getattr(self, "_hasher", None))
        self._filters.append(f)

    def add(self, element) -> None:
        if self.current.load() >= 0.5:
            self._add_filter()
        self.current.add(element)

    def add_many(self, elements) -> None:
        """Vectorized bulk add: fills the current filter in sub-batches,
        re-checking the growth condition between them (semantics match a
        sequence of ``add`` calls up to intra-sub-batch growth timing).
        Accepts lists or Arrow arrays (zero-copy slicing)."""
        import pyarrow as pa

        if isinstance(elements, pa.ChunkedArray):
            elements = elements.combine_chunks()
        is_arrow = isinstance(elements, pa.Array)
        if not is_arrow:
            elements = list(elements)
        pos = 0
        while pos < len(elements):
            if self.current.load() >= 0.5:
                self._add_filter()
            # small chunks so the load re-check keeps overshoot past the
            # 0.5-load growth threshold negligible
            room = max(64, self.current.capacity // 8)
            chunk = elements.slice(pos, room) if is_arrow \
                else elements[pos : pos + room]
            self.current.add_many(chunk)
            pos += len(chunk)

    def has(self, element) -> bool:
        return any(f.has(element) for f in self._filters)

    def has_many(self, elements) -> np.ndarray:
        if len(elements) == 0:
            return np.zeros(0, dtype=bool)
        out = np.zeros(len(elements), dtype=bool)
        for f in self._filters:
            out |= f.has_many(elements)
        return out

    def capacity(self) -> int:
        return sum(f.capacity for f in self._filters)

    def rate(self) -> float:
        r = 1.0
        for f in self._filters:
            r *= f.rate()
        return r

    @property
    def nb_filters(self) -> int:
        return len(self._filters)

    def save_as_json(self) -> dict:
        return {
            "_initial_size": self._initial_size,
            "_initial_error_rate": self._initial_error_rate,
            "_filters": [f.save_as_json() for f in self._filters],
            "_seed": export_bigint(self._seed),
            "_ratio": self._ratio,
        }

    @staticmethod
    def from_json(data: dict) -> "ScalableBloomFilter":
        f = ScalableBloomFilter(data["_initial_size"], data["_initial_error_rate"],
                                data["_ratio"], import_bigint(data["_seed"]))
        f._filters = [PartitionedBloomFilter.from_json(d) for d in data["_filters"]]
        return f
