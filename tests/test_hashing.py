"""Kernel conformance: XXH64 published vectors, vectorized==scalar,
double-hashing oracle re-derivation (mirrors reference tests/utils.test.ts)."""

import numpy as np
import pyarrow as pa
import pytest

from bloom_filters_ray.hashing import (DEFAULT_SEED, double_hashing, get_indexes,
                                       get_indexes_vec, hash_twice, xxh64,
                                       xxh64_arrow, xxh64_fixed, xxh64_u64)


def test_xxh64_published_vectors():
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", 0) == 0x44BC2CF5AD770999
    assert xxh64(b"xxhash", 20141025) == 13067679811253438005
    assert xxh64(b"Nobody inspects the spammish repetition", 0) == 0xFBCEA83C8A378BF1


def test_xxh64_str_is_utf8():
    assert xxh64("abc", 7) == xxh64(b"abc", 7)


def test_vectorized_matches_scalar_all_length_paths():
    rng = np.random.default_rng(42)
    lens = list(range(0, 40)) + [63, 64, 65, 100, 255]
    strs = [bytes(rng.integers(0, 256, size=L, dtype=np.uint8)) for L in lens]
    arr = pa.array(strs, type=pa.binary())
    for seed in (0, 1, DEFAULT_SEED):
        got = xxh64_arrow(arr, seed)
        want = np.array([xxh64(s, seed) for s in strs], dtype=np.uint64)
        assert (got == want).all()


def test_xxh64_u64_matches_8byte_scalar():
    rng = np.random.default_rng(1)
    w = rng.integers(0, 2**63, size=64, dtype=np.uint64)
    got = xxh64_u64(w, 99)
    want = np.array([xxh64(int(x).to_bytes(8, "little"), 99) for x in w],
                    dtype=np.uint64)
    assert (got == want).all()


def test_double_hashing_oracle():
    # independent re-derivation, mirrors reference tests/utils.test.ts:35-56
    h1, h2, size = 12345678901234567890, 9876543210987654321, 1000
    for n in range(10):
        expected = (h1 + n * h2 + (n**3 - n // 6)) % size
        assert double_hashing(n, h1, h2, size) == expected


def test_get_indexes_scalar_vs_vectorized():
    elems = [f"elem-{i}".encode() for i in range(100)]
    size, k = 1019, 7
    h1 = np.array([xxh64(e, DEFAULT_SEED + 1) for e in elems], dtype=np.uint64)
    h2 = np.array([xxh64(e, DEFAULT_SEED + 2) for e in elems], dtype=np.uint64)
    mat = get_indexes_vec(h1, h2, size, k)
    for j, e in enumerate(elems):
        assert mat[j].tolist() == get_indexes(e, size, k)
        assert all(0 <= i < size for i in mat[j])


def test_hash_twice_uses_seed_plus_1_and_2():
    first, second = hash_twice(b"foo", 1000)
    assert first == xxh64(b"foo", 1001)
    assert second == xxh64(b"foo", 1002)
