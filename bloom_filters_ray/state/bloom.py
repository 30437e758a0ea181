"""Classic Bloom filter (parity: reference ``src/bloom/bloom-filter.ts``).

Semantics: k enhanced-double-hashed indexes over one BitSet;
``rate() = (1 - e^(-bitCount/m))^k``. Engine extensions: vectorized
``add_many``/``has_many`` over element batches, and ``union_inplace``
(bitwise OR of equal-config filters) for distributed partial build —
valid because ``add`` only sets bit positions derived solely from the
element and the shared (size, k, seed) config.
"""

from __future__ import annotations

import math

import numpy as np

from ..formulas import optimal_filter_size, optimal_hashes
from ..hashing import DEFAULT_SEED, Hashing, get_indexes
from ._batch import indexes_batch
from .bitset import BitSet
from .serde import export_bigint, import_bigint


def _aslist(elements):
    return elements.to_pylist() if hasattr(elements, "to_pylist") \
        else list(elements)


class BloomFilter:
    def __init__(self, size: int, nb_hashes: int, seed: int = DEFAULT_SEED,
                 hasher: Hashing | None = None):
        if nb_hashes < 1:
            raise ValueError("A BloomFilter cannot use less than one hash function")
        self._size = size
        self._nb_hashes = nb_hashes
        self._seed = seed
        self._hasher = hasher  # custom Hashing object (README parity);
        self._filter = BitSet(size)  # None keeps the vectorized kernel

    @classmethod
    def create(cls, nb_items: int, error_rate: float, seed: int = DEFAULT_SEED) -> "BloomFilter":
        size = optimal_filter_size(nb_items, error_rate)
        return cls(size, optimal_hashes(size, nb_items), seed)

    @classmethod
    def from_items(cls, items, error_rate: float, seed: int = DEFAULT_SEED) -> "BloomFilter":
        items = list(items)
        f = cls.create(len(items), error_rate, seed)
        f.add_many(items)
        return f

    @property
    def size(self) -> int:
        return self._size

    @property
    def seed(self) -> int:
        return self._seed

    @property
    def length(self) -> int:
        return self._filter.bit_count()

    def _indexes(self, element) -> list[int]:
        if self._hasher is not None:
            return self._hasher.get_indexes(element, self._size,
                                            self._nb_hashes, self._seed)
        return get_indexes(element, self._size, self._nb_hashes, self._seed)

    def add(self, element) -> None:
        for i in self._indexes(element):
            self._filter.add(i)

    def has(self, element) -> bool:
        return all(self._filter.has(i) for i in self._indexes(element))

    def add_many(self, elements) -> None:
        if len(elements) == 0:
            return
        if self._hasher is not None:  # custom hash: per-element path
            for e in _aslist(elements):
                self.add(e)
            return
        self._filter.add_many(indexes_batch(elements, self._size, self._nb_hashes, self._seed))

    def has_many(self, elements) -> np.ndarray:
        if len(elements) == 0:
            return np.zeros(0, dtype=bool)
        if self._hasher is not None:
            return np.array([self.has(e) for e in _aslist(elements)])
        m = indexes_batch(elements, self._size, self._nb_hashes, self._seed)
        return self._filter.has_many(m).all(axis=1)

    def rate(self) -> float:
        return (1 - math.exp(-self.length / self._size)) ** self._nb_hashes

    def equals(self, other: "BloomFilter") -> bool:
        return (self._size == other._size and self._nb_hashes == other._nb_hashes
                and self._filter.equals(other._filter))

    def union_inplace(self, other: "BloomFilter") -> None:
        assert self._size == other._size and self._nb_hashes == other._nb_hashes \
            and self._seed == other._seed
        self._filter.union_inplace(other._filter)

    def save_as_json(self) -> dict:
        return {
            "_size": self._size,
            "_nbHashes": self._nb_hashes,
            "_filter": self._filter.export(),
            "_seed": export_bigint(self._seed),
        }

    @staticmethod
    def from_json(data: dict) -> "BloomFilter":
        f = BloomFilter(data["_size"], data["_nbHashes"], import_bigint(data["_seed"]))
        raw = data["_filter"]
        if isinstance(raw, list):  # legacy array encoding (bloom-filter.ts:190-197)
            bs = BitSet(len(raw))
            for i, v in enumerate(raw):
                if v != 0:
                    bs.add(i)
            f._filter = bs
        else:
            f._filter = BitSet.import_(raw)
        return f
