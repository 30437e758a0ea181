"""Xor filter (parity: reference ``src/bloom/xor-filter.ts``).

Static-set membership via 3-block peeling: array length =
1.23*n + 32 rounded down to a multiple of 3; block index i derives
from bits ``(hash >> (i*21)) % blockLength`` (asUintN(32)); fingerprint
= asUintN(bits, hash ^ (hash >> 32)); construction retries new seeds
(<= 100 iterations) until the 3-uniform hypergraph peels completely.

Hash family: XXH3-64 (matching src/bloom/xor-filter.ts:138-140, via
the pure-numpy bloom_filters_ray.xxh3 implementation). Construction
retry seeds follow the reference chain exactly (state/arc4.py
seedrandom-ARC4: seed=0, then int32() draws with the seed setter
re-keying the rng per retry, xor-filter.ts:159-165).
"""

from __future__ import annotations

import math

from ..hashing import DEFAULT_SEED
from ..xxh3 import xxh3_64
from .serde import export_bigint, import_bigint

ALLOWED_FINGERPRINT_SIZES = (8, 16, 32, 64)
_HASHES = 3
_OFFSET = 32
_FACTOR_TIMES_100 = 123
_MAX_ITERATIONS = 100
_MASK32 = (1 << 32) - 1


class XorFilter:
    def __init__(self, size: int, bits_per_fingerprint: int = 8,
                 seed: int = DEFAULT_SEED, hasher=None):
        if bits_per_fingerprint not in ALLOWED_FINGERPRINT_SIZES:
            raise ValueError(
                f"bits_per_fingerprint must be one of {ALLOWED_FINGERPRINT_SIZES}")
        if size <= 0:
            raise ValueError("a XorFilter must be calibrated for a given number of elements")
        self._bits = bits_per_fingerprint
        self._size = size
        array_length = self._optimal_filter_size(size)
        self._block_length = array_length // _HASHES
        self._filter = [0] * array_length
        self._seed = seed
        # custom Hashing: serialize replaces the reference's public
        # _hash64 (xor-filter.ts:138-140) — the overridable primitive;
        # None keeps the vectorized XXH3-64 fast path
        self._hasher = hasher

    @staticmethod
    def _optimal_filter_size(size: int) -> int:
        s = (_FACTOR_TIMES_100 * size) / 100 + _OFFSET
        s = s + math.fmod(-s, _HASHES)  # JS `s + (-s % 3)`: round down to x3
        return int(round(s))

    def _hash64(self, element, seed: int) -> int:
        if self._hasher is not None:
            return self._hasher.serialize(element, seed)
        return xxh3_64(element, seed)

    @staticmethod
    def _create_hx(index: int, h: int, block_length: int) -> int:
        return ((h >> (index * 21)) % block_length) & _MASK32

    def _fingerprint(self, h: int) -> int:
        return (h ^ (h >> 32)) & ((1 << self._bits) - 1)

    def has(self, element) -> bool:
        h = self._hash64(element, self._seed)
        fp = self._fingerprint(h)
        x = 0
        for i in range(_HASHES):
            hi = self._create_hx(i, h, self._block_length)
            x ^= self._filter[hi + i * self._block_length]
        return fp == x

    def has_many(self, values) -> "np.ndarray":
        """Vectorized membership probe over an Arrow string array (or
        ChunkedArray): bool per value, identical to ``has``."""
        import numpy as np
        import pyarrow as pa

        from ..xxh3 import xxh3_64_arrow

        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if self._hasher is not None:  # custom hash: per-element path
            h = np.array([self._hash64(v, self._seed)
                          for v in values.to_pylist()], dtype=np.uint64)
        else:
            h = xxh3_64_arrow(values, self._seed)
        fp = (h ^ (h >> np.uint64(32))) & np.uint64((1 << self._bits) - 1)
        filt = np.asarray(self._filter, dtype=np.uint64)
        bl = np.uint64(self._block_length)
        x = np.zeros(len(h), dtype=np.uint64)
        for i in range(_HASHES):
            hi = ((h >> np.uint64(i * 21)) % bl) & np.uint64(_MASK32)
            x ^= filt[(hi + np.uint64(i) * bl).astype(np.int64)]
        return fp == x

    def add(self, elements: list) -> "XorFilter":
        if len(elements) != self._size:
            raise ValueError(f"This filter has been created for exactly {self._size} elements")
        if len(set(elements)) != len(elements):
            raise ValueError("This filter has duplicate values; remove them first")
        self._create(elements)
        return self

    @classmethod
    def create(cls, elements: list, bits_per_fingerprint: int = 8,
               seed: int = DEFAULT_SEED, hasher=None) -> "XorFilter":
        return cls(len(elements), bits_per_fingerprint, seed,
                   hasher=hasher).add(elements)

    def _create(self, elements: list) -> None:
        from .arc4 import SeedRandom

        n = self._size
        flen = len(self._filter)
        bl = self._block_length
        reverse_order = [0] * n
        reverse_h = [0] * n
        # reference retry-seed chain (xor-filter.ts:159-165): seed = 0,
        # then each retry draws int32() from seedrandom(`${seed}`) and
        # the seed SETTER re-keys the rng — deterministic and
        # independent of the constructor seed; the chosen seed is
        # stored, so membership probes are portable either way
        self._seed = 0
        rng = SeedRandom("0")
        for _ in range(_MAX_ITERATIONS):
            self._seed = rng.int32()
            rng = SeedRandom(str(self._seed))
            t2count = [0] * flen
            t2 = [0] * flen
            if (self._hasher is None
                    and all(isinstance(e, (str, bytes)) for e in elements)):
                import pyarrow as pa

                from ..xxh3 import xxh3_64_arrow

                hashes = [int(v) for v in
                          xxh3_64_arrow(pa.array(elements), self._seed)]
            else:
                hashes = [self._hash64(k, self._seed) for k in elements]
            for h in hashes:
                for hi in range(_HASHES):
                    pos = self._create_hx(hi, h, bl) + hi * bl
                    t2[pos] ^= h
                    if t2count[pos] > 120:
                        raise RuntimeError("Probably something wrong with the hash function")
                    t2count[pos] += 1
            alone = [[] for _ in range(_HASHES)]
            for hi in range(_HASHES):
                for i in range(bl):
                    if t2count[hi * bl + i] == 1:
                        alone[hi].append(hi * bl + i)
            pos_out = 0
            while True:
                i, found = -1, -1
                for hi in range(_HASHES):
                    if alone[hi]:
                        i = alone[hi].pop()
                        found = hi
                        break
                if i == -1:
                    break
                if t2count[i] <= 0:
                    continue
                k = t2[i]
                if t2count[i] != 1:
                    raise RuntimeError("At this step, the count must be 1")
                t2count[i] -= 1
                for hi in range(_HASHES):
                    if hi != found:
                        pos = self._create_hx(hi, k, bl) + hi * bl
                        t2count[pos] -= 1
                        if t2count[pos] == 1:
                            alone[hi].append(pos)
                        t2[pos] ^= k
                reverse_order[pos_out] = k
                reverse_h[pos_out] = found
                pos_out += 1
            if pos_out == n:
                break
        else:
            raise RuntimeError("failed to construct the XorFilter within the retry budget")
        for i in range(pos_out - 1, -1, -1):
            k = reverse_order[i]
            found = reverse_h[i]
            change = -1
            x = self._fingerprint(k)
            for hi in range(_HASHES):
                pos = self._create_hx(hi, k, bl) + hi * bl
                if found == hi:
                    change = pos
                else:
                    x ^= self._filter[pos]
            self._filter[change] = x & ((1 << self._bits) - 1)

    def equals(self, other: "XorFilter") -> bool:
        return (self._bits == other._bits and self._size == other._size
                and self._block_length == other._block_length
                and self._filter == other._filter)

    def save_as_json(self) -> dict:
        return {
            "_size": self._size,
            "_bits": self._bits,
            "_blockLength": self._block_length,
            "_filter": [export_bigint(v) for v in self._filter],
            "_seed": export_bigint(self._seed),
        }

    @staticmethod
    def from_json(data: dict) -> "XorFilter":
        f = XorFilter(data["_size"], data["_bits"], import_bigint(data["_seed"]))
        f._block_length = data["_blockLength"]
        f._filter = [import_bigint(v) for v in data["_filter"]]
        return f
