"""Seeded hashing kernel.

Re-implements, from the public XXH64 specification and the reference
library's documented scheme (Callidon/bloom-filters ``src/hashing.ts``),
the hash kernel every sketch in this engine shares:

- ``xxh64``: classic XXH64 (seeded, 64-bit) — pure-Python scalar and a
  numpy-vectorized variant for batches of variable-length byte strings
  (vectorized within equal-length groups, which is the Arrow-friendly
  layout) plus a fast path for fixed 8-byte inputs (hashing uint64s).
- ``hash_twice``: ``(xxh64(v, seed+1), xxh64(v, seed+2))`` — parity with
  ``src/hashing.ts:87-95``.
- ``double_hashing``: enhanced double hashing ``|h1 + n*h2 + (n**3 - n//6)|
  mod size`` with the reference's exact truncating-division floor term
  (``src/hashing.ts:23-33``; *not* the textbook ``(n^3-n)/6``).
- ``get_indexes``: derive k indexes from one element, hashing twice only
  once (``src/hashing.ts:45-60``).

The reference computes in JS bigints; Python ints are arbitrary-precision
so the scalar paths are exact. The vectorized paths use uint64 modular
arithmetic, which matches because every reference operation is mod 2^64
or a final ``% size`` of a non-negative value.

No code is copied from the reference; only the published semantics.
"""

from __future__ import annotations

import numpy as np

DEFAULT_SEED = 0x1234567890  # src/utils.ts:53-55

_MASK64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


# ---------------------------------------------------------------------------
# scalar XXH64 (pure python, exact)
# ---------------------------------------------------------------------------

def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK64
    acc = _rotl(acc, 31)
    return (acc * _P1) & _MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _MASK64


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK64
    h ^= h >> 29
    h = (h * _P3) & _MASK64
    h ^= h >> 32
    return h


def xxh64(data: bytes | str, seed: int = 0) -> int:
    """XXH64 of *data* with *seed*, returning an unsigned 64-bit int."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    seed &= _MASK64
    n = len(data)
    p = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK64
        v2 = (seed + _P2) & _MASK64
        v3 = seed
        v4 = (seed - _P1) & _MASK64
        while p + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[p : p + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[p + 8 : p + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[p + 16 : p + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[p + 24 : p + 32], "little"))
            p += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK64
    h = (h + n) & _MASK64
    while p + 8 <= n:
        h ^= _round(0, int.from_bytes(data[p : p + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK64
        p += 8
    if p + 4 <= n:
        h ^= (int.from_bytes(data[p : p + 4], "little") * _P1) & _MASK64
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK64
        p += 4
    while p < n:
        h ^= (data[p] * _P5) & _MASK64
        h = (_rotl(h, 11) * _P1) & _MASK64
        p += 1
    return _avalanche(h)


# ---------------------------------------------------------------------------
# vectorized XXH64 (numpy uint64 modular arithmetic)
# ---------------------------------------------------------------------------

_U = np.uint64
_P1u, _P2u, _P3u, _P4u, _P5u = _U(_P1), _U(_P2), _U(_P3), _U(_P4), _U(_P5)


def _rotl_v(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U(r)) | (x >> _U(64 - r))


def _round_v(acc: np.ndarray | np.uint64, lane: np.ndarray) -> np.ndarray:
    acc = acc + lane * _P2u
    return _rotl_v(acc, 31) * _P1u


def _avalanche_v(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U(33))
    h = h * _P2u
    h = h ^ (h >> _U(29))
    h = h * _P3u
    h = h ^ (h >> _U(32))
    return h


def xxh64_u64(words: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 of each uint64 in *words*, treated as its
    8-byte little-endian encoding (len==8 fast path). Returns uint64."""
    words = np.ascontiguousarray(words, dtype=np.uint64)
    h = _U((seed + _P5 + 8) & _MASK64)
    k = _round_v(_U(0), words)
    h = h ^ k
    h = _rotl_v(h, 27) * _P1u + _P4u
    return _avalanche_v(h)


def _lane(mat: np.ndarray, off: int) -> np.ndarray:
    """Read an 8-byte little-endian lane at byte offset *off* from each
    row of the (n, L) uint8 matrix."""
    return np.ascontiguousarray(mat[:, off : off + 8]).view("<u8").ravel()


def _lane32(mat: np.ndarray, off: int) -> np.ndarray:
    return np.ascontiguousarray(mat[:, off : off + 4]).view("<u4").ravel().astype(np.uint64)


def xxh64_fixed(mat: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 over the rows of an (n, L) uint8 matrix (each
    row is one L-byte message). Returns uint64 array of length n."""
    n_rows, L = mat.shape
    seed_i = seed & _MASK64
    seed64 = _U(seed_i)
    p = 0
    if L >= 32:
        v1 = np.full(n_rows, _U((seed_i + _P1 + _P2) & _MASK64), dtype=np.uint64)
        v2 = np.full(n_rows, _U((seed_i + _P2) & _MASK64), dtype=np.uint64)
        v3 = np.full(n_rows, seed64, dtype=np.uint64)
        v4 = np.full(n_rows, _U((seed_i - _P1) & _MASK64), dtype=np.uint64)
        while p + 32 <= L:
            v1 = _round_v(v1, _lane(mat, p))
            v2 = _round_v(v2, _lane(mat, p + 8))
            v3 = _round_v(v3, _lane(mat, p + 16))
            v4 = _round_v(v4, _lane(mat, p + 24))
            p += 32
        h = _rotl_v(v1, 1) + _rotl_v(v2, 7) + _rotl_v(v3, 12) + _rotl_v(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ _round_v(_U(0), v)) * _P1u + _P4u
    else:
        h = np.full(n_rows, _U((seed_i + _P5) & _MASK64), dtype=np.uint64)
    h = h + _U(L)
    while p + 8 <= L:
        h = h ^ _round_v(_U(0), _lane(mat, p))
        h = _rotl_v(h, 27) * _P1u + _P4u
        p += 8
    if p + 4 <= L:
        h = h ^ (_lane32(mat, p) * _P1u)
        h = _rotl_v(h, 23) * _P2u + _P3u
        p += 4
    while p < L:
        h = h ^ (mat[:, p].astype(np.uint64) * _P5u)
        h = _rotl_v(h, 11) * _P1u
        p += 1
    return _avalanche_v(h)


def xxh64_bytes_array(data: np.ndarray, offsets: np.ndarray, lengths: np.ndarray,
                      seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 over n variable-length byte strings laid out in a
    flat uint8 buffer (*data*) with per-string *offsets*/*lengths* — the
    Arrow binary/string layout. Vectorizes within equal-length groups.
    """
    n = len(lengths)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    order = np.argsort(lengths, kind="stable")
    sorted_len = lengths[order]
    # group boundaries between distinct lengths
    bounds = np.flatnonzero(np.diff(sorted_len)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [n]))
    for s, e in zip(starts, ends):
        idx = order[s:e]
        L = int(sorted_len[s])
        if L == 0:
            out[idx] = xxh64_fixed(np.empty((len(idx), 0), dtype=np.uint8), seed)
            continue
        pos = offsets[idx].astype(np.int64)[:, None] + np.arange(L, dtype=np.int64)[None, :]
        out[idx] = xxh64_fixed(data[pos], seed)
    return out


def arrow_string_buffers(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract (flat-bytes, offsets, lengths) from a pyarrow string/binary
    array (or ChunkedArray) without per-row Python objects."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    buffers = arr.buffers()
    # buffers: [validity, offsets, data] — empty/all-empty arrays may
    # carry a missing or None buffer where no bytes ever existed
    if len(buffers) < 2 or buffers[1] is None:
        n = len(arr)
        return (np.empty(0, dtype=np.uint8),
                np.zeros(n, dtype=np.int64), np.zeros(n, dtype=np.int64))
    raw_off = np.frombuffer(buffers[1], dtype=off_dtype)
    offs = raw_off[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = (np.frombuffer(buffers[2], dtype=np.uint8)
            if len(buffers) > 2 and buffers[2] is not None
            else np.empty(0, dtype=np.uint8))
    return data, offs[:-1], np.diff(offs)


def xxh64_arrow(arr, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 of every element of a pyarrow string/binary array."""
    data, offsets, lengths = arrow_string_buffers(arr)
    return xxh64_bytes_array(data, offsets, lengths, seed)


# ---------------------------------------------------------------------------
# the reference's double-hashing index kernel (src/hashing.ts)
# ---------------------------------------------------------------------------

def hash_twice(element: bytes | str, seed: int = DEFAULT_SEED) -> tuple[int, int]:
    """Two seeded hashes ``(xxh64(v, seed+1), xxh64(v, seed+2))``
    (parity: src/hashing.ts:87-95)."""
    return xxh64(element, seed + 1), xxh64(element, seed + 2)


def double_hashing(n: int, hash_a: int, hash_b: int, size: int) -> int:
    """Enhanced double hashing with the reference's exact floor term
    ``n**3 - n//6`` in integer arithmetic (parity: src/hashing.ts:23-33).
    For n >= 0 and unsigned hashes the value is non-negative, so the
    reference's abs() is the identity; kept for exactness."""
    value = (hash_a + n * hash_b + (n**3 - n // 6)) % size
    return value if value >= 0 else -value


def get_indexes(element: bytes | str, size: int, hash_count: int,
                seed: int = DEFAULT_SEED) -> list[int]:
    """Derive *hash_count* indexes in [0, size) from one element, hashing
    twice only once (parity: src/hashing.ts:45-60)."""
    h1, h2 = hash_twice(element, seed)
    return [double_hashing(i, h1, h2, size) for i in range(hash_count)]


class Hashing:
    """User-overridable hash provider (parity: the reference README
    "Seeding and Hashing" + src/hashing.ts + tests/utils.test.ts:117-130
    — subclass and override ``serialize`` to inject a custom hash into
    any double-hashed structure). Structures that accept ``hasher=``
    route their per-element index derivation through this object; the
    default instance reproduces the built-in XXH64 kernel exactly, and
    structures keep their vectorized fast path when no custom hasher is
    supplied.
    """

    def serialize(self, element: bytes | str, seed: int = 0) -> int:
        """The single overridable primitive: element + seed → uint64."""
        return xxh64(element, seed)

    def hash_twice(self, element: bytes | str,
                   seed: int = DEFAULT_SEED) -> tuple[int, int]:
        return (self.serialize(element, seed + 1),
                self.serialize(element, seed + 2))

    def double_hashing(self, n: int, hash_a: int, hash_b: int,
                       size: int) -> int:
        return double_hashing(n, hash_a, hash_b, size)

    def get_indexes(self, element: bytes | str, size: int,
                    hash_count: int, seed: int = DEFAULT_SEED) -> list[int]:
        h1, h2 = self.hash_twice(element, seed)
        return [self.double_hashing(i, h1, h2, size)
                for i in range(hash_count)]


# vectorized double hashing: (n_elems,) x (k,) -> (n_elems, k) index matrix
_FLOOR_CACHE: dict[int, np.ndarray] = {}


def _floor_terms(k: int) -> np.ndarray:
    ft = _FLOOR_CACHE.get(k)
    if ft is None:
        i = np.arange(k, dtype=np.uint64)
        ft = i * i * i - i // _U(6)
        _FLOOR_CACHE[k] = ft
    return ft


def get_indexes_vec(h1: np.ndarray, h2: np.ndarray, size: int, k: int) -> np.ndarray:
    """Vectorized enhanced double hashing: given per-element uint64 hash
    pairs, return an (n, k) int64 index matrix in [0, size).

    Matches the scalar kernel exactly: JS bigint arithmetic is arbitrary
    precision, but ``(h1 + i*h2 + floor_i) mod size`` is invariant under
    mod-2^64 wraparound because 2^64 ≡ const mod size is *not* generally
    true — so we compute the sum in Python-int space per unique element
    only when size does not divide 2^64. To stay exact *and* vectorized
    we reduce each term mod size first: (a+b+c) mod s == ((a mod s)+(b
    mod s)+(c mod s)) mod s, with products computed via uint64 modmul.
    """
    s = np.uint64(size)
    h1m = h1 % s  # < size
    h2m = h2 % s
    i = np.arange(k, dtype=np.uint64)
    fl = _floor_terms(k) % s
    # i*h2 mod s: i < k (small), h2m < s. If k*size < 2^64, product is exact.
    if k * size < (1 << 63):
        prod = (i[None, :] * h2m[:, None]) % s
        total = (h1m[:, None] + prod + fl[None, :]) % s
        return total.astype(np.int64)
    # fallback: object-precision (rare; huge filters)
    out = np.empty((len(h1), k), dtype=np.int64)
    for j in range(len(h1)):
        a, b = int(h1[j]), int(h2[j])
        out[j] = [(a + ii * b + (ii**3 - ii // 6)) % size for ii in range(k)]
    return out
