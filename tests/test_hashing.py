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


class TestXXH3Conformance:
    """Offline conformance for the pure-numpy XXH3: published
    empty-input constants + the xsum sanity vectors over the canonical
    PRNG test buffer, covering every length-class code path (0-16,
    17-128, 129-240, long with block scramble + seeded custom secret),
    plus structural and scalar≡vector invariants."""

    @staticmethod
    def _buf(n: int) -> bytes:
        g, out, M = 2654435761, bytearray(), (1 << 64) - 1
        for _ in range(n):
            out.append((g >> 56) & 0xFF)
            g = (g * 11400714785074694797) & M
        return bytes(out)

    def test_empty_constants(self):
        from bloom_filters_ray.xxh3 import xxh3_128, xxh3_64

        assert xxh3_64(b"") == 0x2D06800538D394C2
        h = xxh3_128(b"")
        assert h & ((1 << 64) - 1) == 0x6001C324468D497F
        assert h >> 64 == 0x99AA06D3014798D8

    def test_sanity_vectors_seed0(self):
        from bloom_filters_ray.xxh3 import xxh3_64

        buf = self._buf(2048)
        want = {1: 0xC44BDFF4074EECDB, 6: 0x27B56A84CD2D7325,
                12: 0xA713DAF0DFBB77E7, 24: 0xA3FE70BF9D3510EB,
                48: 0x397DA259ECBA1F11, 80: 0xBCDEFBBB2C47C90A,
                195: 0xCD94217EE362EC3A, 403: 0xCDEB804D65C6DEA4,
                512: 0x617E49599013CB6B, 2048: 0xDD59E2C3A5F038E0}
        for ln, v in want.items():
            assert xxh3_64(buf[:ln], 0) == v, ln

    def test_sanity_vectors_seeded(self):
        from bloom_filters_ray.xxh3 import xxh3_64

        buf = self._buf(2048)
        seed = 11400714785074694797  # the sanity table's PRIME64 seed
        want = {0: 0xA8A6B918B2F0364A, 1: 0x032BE332DD766EF8,
                6: 0x84589C116AB59AB9, 12: 0xE7303E1B2336DE0E,
                2048: 0x66F81670669ABABC}  # short paths + custom secret
        for ln, v in want.items():
            assert xxh3_64(buf[:ln], seed) == v, ln

    def test_128_sanity_len1(self):
        from bloom_filters_ray.xxh3 import xxh3_128

        h = xxh3_128(self._buf(1), 0)
        assert h & ((1 << 64) - 1) == 0xC44BDFF4074EECDB
        assert h >> 64 == 0xA6CD5E9392000F6A

    def test_128_low_equals_64_structural(self):
        """Spec invariant: for len <= 3 and len > 240 the 128-bit low
        half IS the 64-bit hash (shared merge) — cross-validates the
        128 long path against the vector-pinned 64 path."""
        from bloom_filters_ray.xxh3 import xxh3_128, xxh3_64

        M = (1 << 64) - 1
        for ln in (1, 2, 3, 241, 300, 513, 2048):
            data = bytes((i * 7 + 13) & 0xFF for i in range(ln))
            for seed in (0, 42, 11400714785074694797):
                assert xxh3_128(data, seed) & M == xxh3_64(data, seed), \
                    (ln, seed)

    def test_vectorized_matches_scalar(self):
        from bloom_filters_ray.xxh3 import xxh3_64, xxh3_64_arrow

        rng = np.random.default_rng(7)
        vals = [bytes(rng.integers(0, 256, ln, dtype=np.uint8))
                for ln in (0, 1, 2, 3, 4, 5, 8, 9, 15, 16, 17, 31, 32,
                           33, 64, 96, 97, 128, 129, 160, 240, 241, 500)]
        arr = pa.array(vals, type=pa.binary())
        for seed in (0, 0x1234567890):
            got = xxh3_64_arrow(arr, seed)
            want = np.array([xxh3_64(v, seed) for v in vals],
                            dtype=np.uint64)
            assert (got == want).all()

    def test_string_and_bytes_agree(self):
        from bloom_filters_ray.xxh3 import xxh3_128, xxh3_64

        assert xxh3_64("héllo") == xxh3_64("héllo".encode())
        assert xxh3_128("héllo") == xxh3_128("héllo".encode())
