"""Shared vectorized element→indexes helpers for the Bloom family."""

from __future__ import annotations

import numpy as np

from ..hashing import (DEFAULT_SEED, get_indexes_vec, xxh64, xxh64_arrow)


def hash_twice_batch(elements, seed: int = DEFAULT_SEED) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ``hash_twice`` over a batch of elements.

    *elements* may be a pyarrow string/binary array, a list of str/bytes,
    or a numpy object array. Returns two uint64 arrays.
    """
    try:
        import pyarrow as pa

        if isinstance(elements, (pa.Array, pa.ChunkedArray)):
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
