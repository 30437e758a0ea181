"""Shared vectorized element→indexes helpers for the Bloom family.

Integer elements (int64/uint64 numpy or Arrow arrays, and scalar
Python ints via ``int_to_bytes``) hash as their 8-byte little-endian
encoding — ``xxh64_u64`` and ``xxh64(struct.pack('<Q', x))`` agree, so
scalar and vector paths stay consistent.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import (DEFAULT_SEED, get_indexes_vec, xxh64, xxh64_arrow)


def int_to_bytes(x: int) -> bytes:
    """Canonical hashable encoding of a 64-bit int element."""
    return struct.pack("<Q", x & ((1 << 64) - 1))


def hash_twice_batch(elements, seed: int = DEFAULT_SEED) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ``hash_twice`` over a batch of elements.

    *elements* may be a pyarrow string/binary array, a list of str/bytes,
    or a numpy object array. Returns two uint64 arrays.
    """
    if isinstance(elements, np.ndarray) and elements.dtype.kind in "iu":
        w = elements.astype(np.int64).view(np.uint64)  # two's-complement
        from ..hashing import xxh64_u64

        return xxh64_u64(w, seed + 1), xxh64_u64(w, seed + 2)
    try:
        import pyarrow as pa

        if isinstance(elements, (pa.Array, pa.ChunkedArray)):
            if pa.types.is_integer(elements.type):
                w = elements.to_numpy(zero_copy_only=False).astype(np.int64) \
                    .view(np.uint64)
                from ..hashing import xxh64_u64

                return xxh64_u64(w, seed + 1), xxh64_u64(w, seed + 2)
            return xxh64_arrow(elements, seed + 1), xxh64_arrow(elements, seed + 2)
        if isinstance(elements, (list, tuple, np.ndarray)):
            arr = pa.array(
                [e.encode() if isinstance(e, str) else bytes(e) for e in elements],
                type=pa.binary(),
            )
            return xxh64_arrow(arr, seed + 1), xxh64_arrow(arr, seed + 2)
    except ImportError:
        pass
    h1 = np.array([xxh64(e, seed + 1) for e in elements], dtype=np.uint64)
    h2 = np.array([xxh64(e, seed + 2) for e in elements], dtype=np.uint64)
    return h1, h2


def indexes_batch(elements, size: int, k: int, seed: int = DEFAULT_SEED) -> np.ndarray:
    """(n, k) int64 matrix of double-hashed indexes for a batch of
    elements (vectorized parity with ``Hashing.getIndexes``)."""
    h1, h2 = hash_twice_batch(elements, seed)
    return get_indexes_vec(h1, h2, size, k)
