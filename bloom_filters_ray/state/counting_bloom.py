"""Counting Bloom filter (parity: reference ``src/bloom/counting-bloom-filter.ts``).

Cells are ``[bit, counter]`` pairs; ``remove`` decrements unchecked and
clears the bit when the counter drops to <= 0; ``rate() =
(1 - e^(-k*length/size))^k``. Engine extension: counters merge across
partitions by elementwise ``+`` (bit = counter > 0).
"""

from __future__ import annotations

import math

import numpy as np

from ..formulas import optimal_filter_size, optimal_hashes
from ..hashing import DEFAULT_SEED, Hashing, get_indexes
from ._batch import indexes_batch
from .serde import export_bigint, import_bigint


class CountingBloomFilter:
    def __init__(self, size: int, nb_hashes: int, seed: int = DEFAULT_SEED,
                 hasher: Hashing | None = None):
        if nb_hashes < 1:
            raise ValueError("A CountingBloomFilter must use at least one hash function")
        self._size = size
        self._nb_hashes = nb_hashes
        self._seed = seed
        self._hasher = hasher
        self._bits = np.zeros(size, dtype=np.uint8)
        self._counters = np.zeros(size, dtype=np.int64)
        self._length = 0

    @classmethod
    def create(cls, capacity: int, error_rate: float, seed: int = DEFAULT_SEED):
        s = optimal_filter_size(capacity, error_rate)
        return cls(s, optimal_hashes(s, capacity), seed)

    @classmethod
    def from_items(cls, items, error_rate: float, seed: int = DEFAULT_SEED):
        items = list(items)
        f = cls.create(len(items), error_rate, seed)
        f.add_many(items)
        return f

    @property
    def size(self) -> int:
        return self._size

    @property
    def length(self) -> int:
        return self._length

    def _indexes(self, element) -> list[int]:
        if self._hasher is not None:
            return self._hasher.get_indexes(element, self._size,
                                            self._nb_hashes, self._seed)
        return get_indexes(element, self._size, self._nb_hashes, self._seed)

    def add(self, element) -> None:
        for i in self._indexes(element):
            self._counters[i] += 1
            if self._counters[i] > 0:
                self._bits[i] = 1
        self._length += 1

    def remove(self, element) -> bool:
        for i in self._indexes(element):
            self._counters[i] -= 1
            if self._counters[i] <= 0:
                self._bits[i] = 0
        self._length -= 1
        return True

    def has(self, element) -> bool:
        return all(self._bits[i] for i in self._indexes(element))

    def add_many(self, elements) -> None:
        if len(elements) == 0:
            return
        idx = indexes_batch(elements, self._size, self._nb_hashes, self._seed).ravel()
        np.add.at(self._counters, idx, 1)
        self._bits[self._counters > 0] = 1
        self._length += len(elements)

    def has_many(self, elements) -> np.ndarray:
        if len(elements) == 0:
            return np.zeros(0, dtype=bool)
        m = indexes_batch(elements, self._size, self._nb_hashes, self._seed)
        return (self._bits[m] != 0).all(axis=1)

    def rate(self) -> float:
        return (1 - math.exp(-self._nb_hashes * self._length / self._size)) ** self._nb_hashes

    def equals(self, other: "CountingBloomFilter") -> bool:
        return (self._size == other._size and self._nb_hashes == other._nb_hashes
                and self._length == other._length
                and np.array_equal(self._counters, other._counters))

    def merge_inplace(self, other: "CountingBloomFilter") -> None:
        """Engine extension: distributed partial-build merge (+ counters)."""
        assert self._size == other._size and self._nb_hashes == other._nb_hashes \
            and self._seed == other._seed
        self._counters += other._counters
        self._bits = (self._counters > 0).astype(np.uint8)
        self._length += other._length

    def save_as_json(self) -> dict:
        return {
            "_seed": export_bigint(self._seed),
            "_size": self._size,
            "_nbHashes": self._nb_hashes,
            "_filter": [[int(b), int(c)] for b, c in zip(self._bits, self._counters)],
            "_length": self._length,
        }

    @staticmethod
    def from_json(data: dict) -> "CountingBloomFilter":
        f = CountingBloomFilter(data["_size"], data["_nbHashes"], import_bigint(data["_seed"]))
        cells = np.asarray(data["_filter"], dtype=np.int64).reshape(data["_size"], 2)
        f._bits = cells[:, 0].astype(np.uint8)
        f._counters = cells[:, 1].copy()
        f._length = data["_length"]
        return f
