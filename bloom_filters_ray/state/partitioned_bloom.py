"""Partitioned Bloom filter (parity: reference
``src/bloom/partitioned-bloom-filter.ts``).

M total bits split into k slices of m = ceil(M/k) bits; index i of the
double-hash family lands in slice i. ``create(size, eps, k?)``:
k = max(k or ceil(log2(1/eps)), 2), M = size*|ln eps|/ln(2)^2 (note the
reference passes the *float* M to the constructor, which allocates
ceil(M/k)-bit slices). ``load()`` = setBits/M; ``rate() = load()^k``.
"""

from __future__ import annotations

import math

import numpy as np

from ..hashing import DEFAULT_SEED, Hashing, get_indexes
from ._batch import indexes_batch
from .bitset import BitSet
from .serde import export_bigint, import_bigint


class PartitionedBloomFilter:
    def __init__(self, bits: float, nb_hashes: int, error_rate: float,
                 seed: int = DEFAULT_SEED, hasher: Hashing | None = None):
        self._hasher = hasher
        self._bits = bits
        self._k = nb_hashes
        self._error_rate = error_rate
        self._m = math.ceil(bits / nb_hashes)
        self._seed = seed
        self._filter = [BitSet(self._m) for _ in range(self._k)]

    @classmethod
    def create(cls, size: int, error_rate: float, nb_hashes: int | None = None,
               seed: int = DEFAULT_SEED, hasher: "Hashing | None" = None
               ) -> "PartitionedBloomFilter":
        L = max(nb_hashes if nb_hashes else math.ceil(math.log2(1 / error_rate)), 2)
        M = (size * abs(math.log(error_rate))) / (math.log(2) ** 2)
        return cls(M, L, error_rate, seed, hasher)

    @classmethod
    def from_items(cls, items, error_rate: float, seed: int = DEFAULT_SEED):
        items = list(items)
        f = cls.create(len(items), error_rate, seed=seed)
        f.add_many(items)
        return f

    @property
    def capacity(self) -> int:
        return math.floor((self._k * self._m * math.log(2) ** 2)
                          / abs(math.log(self._error_rate)))

    @property
    def size(self) -> float:
        return self._bits

    def add(self, element) -> None:
        idx = (self._hasher.get_indexes(element, self._m, self._k,
                                        self._seed)
               if getattr(self, "_hasher", None) is not None else
               get_indexes(element, self._m, self._k, self._seed))
        for i in range(self._k):
            self._filter[i].add(idx[i])

    def has(self, element) -> bool:
        idx = (self._hasher.get_indexes(element, self._m, self._k,
                                        self._seed)
               if getattr(self, "_hasher", None) is not None else
               get_indexes(element, self._m, self._k, self._seed))
        return all(self._filter[i].has(idx[i]) for i in range(self._k))

    def add_many(self, elements) -> None:
        if len(elements) == 0:
            return
        m = indexes_batch(elements, self._m, self._k, self._seed)
        for i in range(self._k):
            self._filter[i].add_many(m[:, i])

    def has_many(self, elements) -> np.ndarray:
        if len(elements) == 0:
            return np.zeros(0, dtype=bool)
        m = indexes_batch(elements, self._m, self._k, self._seed)
        out = np.ones(len(m), dtype=bool)
        for i in range(self._k):
            out &= self._filter[i].has_many(m[:, i])
        return out

    def load(self) -> float:
        set_bits = sum(bs.bit_count() for bs in self._filter)
        return set_bits / self._bits

    def rate(self) -> float:
        return self.load() ** self._k

    def equals(self, other: "PartitionedBloomFilter") -> bool:
        return (self._bits == other._bits and self._k == other._k
                and all(a.equals(b) for a, b in zip(self._filter, other._filter)))

    def union_inplace(self, other: "PartitionedBloomFilter") -> None:
        """Engine extension: per-slice OR merge of equal-config filters."""
        assert self._m == other._m and self._k == other._k and self._seed == other._seed
        for a, b in zip(self._filter, other._filter):
            a.union_inplace(b)

    def save_as_json(self) -> dict:
        return {
            "_bits": self._bits,
            "_k": self._k,
            "_filter": [bs.export() for bs in self._filter],
            "_seed": export_bigint(self._seed),
            "_m": self._m,
            "_errorRate": self._error_rate,
        }

    @staticmethod
    def from_json(data: dict) -> "PartitionedBloomFilter":
        f = PartitionedBloomFilter(data["_bits"], data["_k"], data["_errorRate"],
                                   import_bigint(data["_seed"]))
        f._m = data["_m"]
        f._filter = [BitSet.import_(b) for b in data["_filter"]]
        return f
