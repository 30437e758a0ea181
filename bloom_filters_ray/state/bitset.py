"""Byte-backed bit array (parity: reference ``src/bloom/bit-set.ts``).

Bit layout is identical to the reference: bit *i* lives in byte
``i // 8`` under mask ``1 << (i % 8)``; the size is rounded up to a
multiple of 8 at construction (``bit-set.ts:25-29``). Adds/queries are
vectorized over numpy index arrays.
"""

from __future__ import annotations

import numpy as np

from .serde import export_bytes, import_bytes


class BitSet:
    def __init__(self, size: int):
        diff = 8 - (size % 8)
        self.size = size + (0 if diff in (0, 8) else diff)
        self.array = np.zeros(self.size // 8, dtype=np.uint8)

    def add(self, index: int) -> None:
        self.array[index >> 3] |= np.uint8(1 << (index & 7))

    def has(self, index: int) -> bool:
        return bool(self.array[index >> 3] & np.uint8(1 << (index & 7)))

    def add_many(self, indexes: np.ndarray) -> None:
        """Vectorized add of an arbitrary index array (duplicates fine)."""
        idx = np.asarray(indexes, dtype=np.int64).ravel()
        np.bitwise_or.at(self.array, idx >> 3, (np.uint8(1) << (idx & 7).astype(np.uint8)))

    def has_many(self, indexes: np.ndarray) -> np.ndarray:
        """Vectorized membership of an index array → bool array (same shape)."""
        idx = np.asarray(indexes, dtype=np.int64)
        return (self.array[idx >> 3] & (np.uint8(1) << (idx & 7).astype(np.uint8))) != 0

    def max(self) -> int:
        nz = np.flatnonzero(self.array)
        if len(nz) == 0:
            return 0
        i = nz[-1]
        return int(i) * 8 + int(self.array[i]).bit_length() - 1

    def bit_count(self) -> int:
        return int(np.unpackbits(self.array).sum())

    def equals(self, other: "BitSet") -> bool:
        return self.size == other.size and bool(np.array_equal(self.array, other.array))

    def union_inplace(self, other: "BitSet") -> None:
        """Engine extension: position-idempotent OR merge of two equal-config
        bit arrays (valid because Bloom ``add`` only sets bits)."""
        assert self.size == other.size
        np.bitwise_or(self.array, other.array, out=self.array)

    def export(self) -> dict:
        return {"size": self.size, "content": export_bytes(self.array)}

    @staticmethod
    def import_(data: dict) -> "BitSet":
        bs = BitSet(data["size"])
        bs.array = import_bytes(data["content"])
        return bs
