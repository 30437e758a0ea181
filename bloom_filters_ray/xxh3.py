"""Pure-Python/numpy XXH3-64 and XXH3-128 (xxHash family; implemented
from the published algorithm specification — no code copied).

The reference library hashes HyperLogLog and XorFilter elements with
``xxh3.xxh64(value, seed)`` (src/sketch/hyperloglog.ts:96-97,
src/bloom/xor-filter.ts:138-140) and IBLT elements with
``xxh3.xxh128(value, seed)`` (src/iblt/invertible-bloom-lookup-tables.ts:
170-205) via @node-rs/xxhash. The sandbox has no xxhash module (and no
network), so this module provides the family natively:

- ``xxh3_64(data, seed)`` / ``xxh3_128(data, seed)``: scalar reference
  implementations, any length;
- ``xxh3_64_arrow(arr, seed)``: mask-vectorized over an Arrow
  string/binary column for the <=240-byte length classes (the 0-16 /
  17-128 / 129-240 fast paths of the spec), scalar fallback above —
  ids and captions are short, so the hot path stays vectorized.

Offline conformance evidence (tests/test_hashing.py):
- the published empty-input constants
  (XXH3_64("")=0x2D06800538D394C2; XXH3_128("") low/high);
- the xsum sanity vectors over the canonical PRNG-filled test buffer
  for every length class;
- scalar == vectorized across all classes (hypothesis).
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1

_P32_1 = 0x9E3779B1
_P32_2 = 0x85EBCA77
_P32_3 = 0xC2B2AE3D
_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5
_MX1 = 0x165667919E3779F9
_MX2 = 0x9FB21C651E98DF25

# the canonical 192-byte default secret of the XXH3 specification
_KSECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1c"
    "ded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221"
    "b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea3"
    "71644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d"
    "8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb"
    "170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce"
    "45cb3a8f95160428afd7fbcabb4b407e")
assert len(_KSECRET) == 192


def _r64(b, off: int) -> int:
    return int.from_bytes(b[off : off + 8], "little")


def _r32(b, off: int) -> int:
    return int.from_bytes(b[off : off + 4], "little")


def _swap32(x: int) -> int:
    return int.from_bytes((x & _M32).to_bytes(4, "little"), "big")


def _swap64(x: int) -> int:
    return int.from_bytes((x & _M64).to_bytes(8, "little"), "big")


def _rotl32(x: int, r: int) -> int:
    x &= _M32
    return ((x << r) | (x >> (32 - r))) & _M32


def _rotl64(x: int, r: int) -> int:
    x &= _M64
    return ((x << r) | (x >> (64 - r))) & _M64


def _mult64to128(a: int, b: int) -> tuple[int, int]:
    p = a * b
    return p & _M64, (p >> 64) & _M64


def _mul128_fold64(a: int, b: int) -> int:
    p = a * b
    return ((p & _M64) ^ (p >> 64)) & _M64


def _xxh64_avalanche(h: int) -> int:
    h &= _M64
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    return h ^ (h >> 32)


def _xxh3_avalanche(h: int) -> int:
    h &= _M64
    h ^= h >> 37
    h = (h * _MX1) & _M64
    return h ^ (h >> 32)


def _rrmxmx(h: int, length: int) -> int:
    h ^= _rotl64(h, 49) ^ _rotl64(h, 24)
    h = (h * _MX2) & _M64
    h ^= ((h >> 35) + length) & _M64
    h = (h * _MX2) & _M64
    return h ^ (h >> 28)


def _mix16(d, doff: int, sec, soff: int, seed: int) -> int:
    lo = _r64(d, doff) ^ ((_r64(sec, soff) + seed) & _M64)
    hi = _r64(d, doff + 8) ^ ((_r64(sec, soff + 8) - seed) & _M64)
    return _mul128_fold64(lo, hi)


# ---------------------------------------------------------------------------
# XXH3-64 scalar
# ---------------------------------------------------------------------------

def _len_0to16_64(d, n: int, sec, seed: int) -> int:
    if n > 8:
        bitflip1 = ((_r64(sec, 24) ^ _r64(sec, 32)) + seed) & _M64
        bitflip2 = ((_r64(sec, 40) ^ _r64(sec, 48)) - seed) & _M64
        input_lo = _r64(d, 0) ^ bitflip1
        input_hi = _r64(d, n - 8) ^ bitflip2
        acc = (n + _swap64(input_lo) + input_hi
               + _mul128_fold64(input_lo, input_hi)) & _M64
        return _xxh3_avalanche(acc)
    if n >= 4:
        seed ^= (_swap32(seed & _M32) << 32)
        seed &= _M64
        input1 = _r32(d, 0)
        input2 = _r32(d, n - 4)
        bitflip = ((_r64(sec, 8) ^ _r64(sec, 16)) - seed) & _M64
        input64 = (input2 + (input1 << 32)) & _M64
        return _rrmxmx(input64 ^ bitflip, n)
    if n:
        c1, c2, c3 = d[0], d[n >> 1], d[n - 1]
        combined = ((c1 << 16) | (c2 << 24) | c3 | (n << 8)) & _M32
        bitflip = ((_r32(sec, 0) ^ _r32(sec, 4)) + seed) & _M64
        return _xxh64_avalanche(combined ^ bitflip)
    return _xxh64_avalanche(seed ^ _r64(sec, 56) ^ _r64(sec, 64))


def _len_17to128_64(d, n: int, sec, seed: int) -> int:
    acc = (n * _P64_1) & _M64
    if n > 32:
        if n > 64:
            if n > 96:
                acc += _mix16(d, 48, sec, 96, seed)
                acc += _mix16(d, n - 64, sec, 112, seed)
            acc += _mix16(d, 32, sec, 64, seed)
            acc += _mix16(d, n - 48, sec, 80, seed)
        acc += _mix16(d, 16, sec, 32, seed)
        acc += _mix16(d, n - 32, sec, 48, seed)
    acc += _mix16(d, 0, sec, 0, seed)
    acc += _mix16(d, n - 16, sec, 16, seed)
    return _xxh3_avalanche(acc & _M64)


_MIDSIZE_STARTOFFSET = 3
_MIDSIZE_LASTOFFSET = 17


def _len_129to240_64(d, n: int, sec, seed: int) -> int:
    acc = (n * _P64_1) & _M64
    nb = n // 16
    for i in range(8):
        acc = (acc + _mix16(d, 16 * i, sec, 16 * i, seed)) & _M64
    acc = _xxh3_avalanche(acc)
    for i in range(8, nb):
        acc = (acc + _mix16(d, 16 * i, sec,
                            16 * (i - 8) + _MIDSIZE_STARTOFFSET, seed)) & _M64
    acc = (acc + _mix16(d, n - 16, sec, 136 - _MIDSIZE_LASTOFFSET, seed)) & _M64
    return _xxh3_avalanche(acc)


_INIT_ACC = (_P32_3, _P64_1, _P64_2, _P64_3, _P64_4, _P32_2, _P64_5, _P32_1)


def _custom_secret(seed: int) -> bytes:
    if seed == 0:
        return _KSECRET
    out = bytearray(192)
    for i in range(12):
        lo = (_r64(_KSECRET, 16 * i) + seed) & _M64
        hi = (_r64(_KSECRET, 16 * i + 8) - seed) & _M64
        out[16 * i : 16 * i + 8] = lo.to_bytes(8, "little")
        out[16 * i + 8 : 16 * i + 16] = hi.to_bytes(8, "little")
    return bytes(out)


def _accumulate_512(acc: list, d, doff: int, sec, soff: int) -> None:
    for i in range(8):
        dv = _r64(d, doff + 8 * i)
        dk = dv ^ _r64(sec, soff + 8 * i)
        acc[i ^ 1] = (acc[i ^ 1] + dv) & _M64
        acc[i] = (acc[i] + (dk & _M32) * (dk >> 32)) & _M64


def _scramble(acc: list, sec, soff: int) -> None:
    for i in range(8):
        a = acc[i]
        a ^= a >> 47
        a ^= _r64(sec, soff + 8 * i)
        acc[i] = (a * _P32_1) & _M64


def _hash_long_internal(d, n: int, sec) -> list:
    acc = list(_INIT_ACC)
    secret_size = len(sec)
    nb_stripes_per_block = (secret_size - 64) // 8
    block_len = 64 * nb_stripes_per_block
    nb_blocks = (n - 1) // block_len
    for b in range(nb_blocks):
        for s in range(nb_stripes_per_block):
            _accumulate_512(acc, d, b * block_len + 64 * s, sec, 8 * s)
        _scramble(acc, sec, secret_size - 64)
    nb_stripes = ((n - 1) - block_len * nb_blocks) // 64
    for s in range(nb_stripes):
        _accumulate_512(acc, d, nb_blocks * block_len + 64 * s, sec, 8 * s)
    _accumulate_512(acc, d, n - 64, sec, secret_size - 64 - 7)
    return acc


def _merge_accs(acc: list, sec, soff: int, start: int) -> int:
    result = start & _M64
    for i in range(4):
        result = (result + _mul128_fold64(
            acc[2 * i] ^ _r64(sec, soff + 16 * i),
            acc[2 * i + 1] ^ _r64(sec, soff + 16 * i + 8))) & _M64
    return _xxh3_avalanche(result)


def xxh3_64(data: bytes | str, seed: int = 0) -> int:
    """XXH3-64 of *data* with *seed* (default secret family)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    seed &= _M64
    if n <= 16:
        return _len_0to16_64(data, n, _KSECRET, seed)
    if n <= 128:
        return _len_17to128_64(data, n, _KSECRET, seed)
    if n <= 240:
        return _len_129to240_64(data, n, _KSECRET, seed)
    sec = _custom_secret(seed)
    acc = _hash_long_internal(data, n, sec)
    return _merge_accs(acc, sec, 11, (n * _P64_1) & _M64)


# ---------------------------------------------------------------------------
# XXH3-128 scalar
# ---------------------------------------------------------------------------

def _len_0to16_128(d, n: int, sec, seed: int) -> tuple[int, int]:
    if n > 8:
        bitflipl = ((_r64(sec, 32) ^ _r64(sec, 40)) - seed) & _M64
        bitfliph = ((_r64(sec, 48) ^ _r64(sec, 56)) + seed) & _M64
        input_lo = _r64(d, 0)
        input_hi = _r64(d, n - 8)
        m_lo, m_hi = _mult64to128(input_lo ^ input_hi ^ bitflipl, _P64_1)
        m_lo = (m_lo + ((n - 1) << 54)) & _M64
        input_hi ^= bitfliph
        m_hi = (m_hi + input_hi + (input_hi & _M32) * (_P32_2 - 1)) & _M64
        m_lo ^= _swap64(m_hi)
        h_lo, h_hi = _mult64to128(m_lo, _P64_2)
        h_hi = (h_hi + m_hi * _P64_2) & _M64
        return _xxh3_avalanche(h_lo), _xxh3_avalanche(h_hi)
    if n >= 4:
        seed ^= (_swap32(seed & _M32) << 32)
        seed &= _M64
        input_lo = _r32(d, 0)
        input_hi = _r32(d, n - 4)
        input64 = (input_lo + (input_hi << 32)) & _M64
        bitflip = ((_r64(sec, 16) ^ _r64(sec, 24)) + seed) & _M64
        keyed = input64 ^ bitflip
        m_lo, m_hi = _mult64to128(keyed, (_P64_1 + (n << 2)) & _M64)
        m_hi = (m_hi + ((m_lo << 1) & _M64)) & _M64
        m_lo ^= m_hi >> 3
        m_lo ^= m_lo >> 35
        m_lo = (m_lo * _MX2) & _M64
        m_lo ^= m_lo >> 28
        return m_lo, _xxh3_avalanche(m_hi)
    if n:
        c1, c2, c3 = d[0], d[n >> 1], d[n - 1]
        combinedl = ((c1 << 16) | (c2 << 24) | c3 | (n << 8)) & _M32
        combinedh = _rotl32(_swap32(combinedl), 13)
        bitflipl = ((_r32(sec, 0) ^ _r32(sec, 4)) + seed) & _M64
        bitfliph = ((_r32(sec, 8) ^ _r32(sec, 12)) - seed) & _M64
        return (_xxh64_avalanche(combinedl ^ bitflipl),
                _xxh64_avalanche(combinedh ^ bitfliph))
    return (_xxh64_avalanche(seed ^ _r64(sec, 64) ^ _r64(sec, 72)),
            _xxh64_avalanche(seed ^ _r64(sec, 80) ^ _r64(sec, 88)))


def _mix32(accl: int, acch: int, d, a_off: int, b_off: int, sec, soff: int,
           seed: int) -> tuple[int, int]:
    accl = (accl + _mix16(d, a_off, sec, soff, seed)) & _M64
    accl ^= (_r64(d, b_off) + _r64(d, b_off + 8)) & _M64
    acch = (acch + _mix16(d, b_off, sec, soff + 16, seed)) & _M64
    acch ^= (_r64(d, a_off) + _r64(d, a_off + 8)) & _M64
    return accl, acch


def _finalize_mid_128(accl: int, acch: int, n: int, seed: int
                      ) -> tuple[int, int]:
    lo = (accl + acch) & _M64
    hi = (accl * _P64_1 + acch * _P64_4 + ((n - seed) & _M64) * _P64_2) & _M64
    return _xxh3_avalanche(lo), (-_xxh3_avalanche(hi)) & _M64


def _len_17to128_128(d, n: int, sec, seed: int) -> tuple[int, int]:
    accl = (n * _P64_1) & _M64
    acch = 0
    if n > 32:
        if n > 64:
            if n > 96:
                accl, acch = _mix32(accl, acch, d, 48, n - 64, sec, 96, seed)
            accl, acch = _mix32(accl, acch, d, 32, n - 48, sec, 64, seed)
        accl, acch = _mix32(accl, acch, d, 16, n - 32, sec, 32, seed)
    accl, acch = _mix32(accl, acch, d, 0, n - 16, sec, 0, seed)
    return _finalize_mid_128(accl, acch, n, seed)


def _len_129to240_128(d, n: int, sec, seed: int) -> tuple[int, int]:
    accl = (n * _P64_1) & _M64
    acch = 0
    nb = n // 32
    for i in range(4):
        accl, acch = _mix32(accl, acch, d, 32 * i, 32 * i + 16,
                            sec, 32 * i, seed)
    accl = _xxh3_avalanche(accl)
    acch = _xxh3_avalanche(acch)
    for i in range(4, nb):
        accl, acch = _mix32(accl, acch, d, 32 * i, 32 * i + 16,
                            sec, _MIDSIZE_STARTOFFSET + 32 * (i - 4), seed)
    accl, acch = _mix32(accl, acch, d, n - 16, n - 32,
                        sec, 136 - _MIDSIZE_LASTOFFSET - 16, (-seed) & _M64)
    return _finalize_mid_128(accl, acch, n, seed)


def xxh3_128(data: bytes | str, seed: int = 0) -> int:
    """XXH3-128 of *data* with *seed*, returned as the 128-bit integer
    ``(high64 << 64) | low64`` (matching BigInt semantics of the
    reference's binding)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    seed &= _M64
    if n <= 16:
        lo, hi = _len_0to16_128(data, n, _KSECRET, seed)
    elif n <= 128:
        lo, hi = _len_17to128_128(data, n, _KSECRET, seed)
    elif n <= 240:
        lo, hi = _len_129to240_128(data, n, _KSECRET, seed)
    else:
        sec = _custom_secret(seed)
        acc = _hash_long_internal(data, n, sec)
        lo = _merge_accs(acc, sec, 11, (n * _P64_1) & _M64)
        hi = _merge_accs(acc, sec, len(sec) - 64 - 11,
                         (~(n * _P64_2)) & _M64)
    return (hi << 64) | lo


# ---------------------------------------------------------------------------
# XXH3-64 vectorized over Arrow string/binary columns
# ---------------------------------------------------------------------------

_U = np.uint64


def _sec64(sec, off: int) -> np.uint64:
    return _U(_r64(sec, off))


def _g64(data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Little-endian uint64 reads at byte positions *pos*."""
    idx = pos[:, None] + np.arange(8, dtype=np.int64)[None, :]
    return np.ascontiguousarray(data[idx]).view("<u8").ravel()


def _g32(data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    idx = pos[:, None] + np.arange(4, dtype=np.int64)[None, :]
    return np.ascontiguousarray(data[idx]).view("<u4").ravel().astype(np.uint64)


def _swap32_v(x: np.ndarray) -> np.ndarray:
    x = x & _U(_M32)
    return (((x & _U(0xFF)) << _U(24)) | ((x & _U(0xFF00)) << _U(8))
            | ((x >> _U(8)) & _U(0xFF00)) | ((x >> _U(24)) & _U(0xFF)))


def _swap64_v(x: np.ndarray) -> np.ndarray:
    y = x.copy()
    out = np.zeros_like(x)
    for _ in range(8):
        out = (out << _U(8)) | (y & _U(0xFF))
        y >>= _U(8)
    return out


def _xxh64_avalanche_v(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U(33))
    h = h * _U(_P64_2)
    h ^= h >> _U(29)
    h = h * _U(_P64_3)
    return h ^ (h >> _U(32))


def _xxh3_avalanche_v(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U(37))
    h = h * _U(_MX1)
    return h ^ (h >> _U(32))


def _mult64_hi_lo(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(low64, high64) of the 128-bit product, via 32-bit limbs."""
    m = _U(_M32)
    al, ah = a & m, a >> _U(32)
    bl, bh = b & m, b >> _U(32)
    lo_lo = al * bl
    hi_lo = ah * bl
    lo_hi = al * bh
    hi_hi = ah * bh
    cross = (lo_lo >> _U(32)) + (hi_lo & m) + (lo_hi & m)
    high = hi_hi + (hi_lo >> _U(32)) + (lo_hi >> _U(32)) + (cross >> _U(32))
    low = (cross << _U(32)) | (lo_lo & m)
    return low, high


def _mul128_fold64_v(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lo, hi = _mult64_hi_lo(a, b)
    return lo ^ hi


def _rrmxmx_v(h: np.ndarray, length: np.ndarray) -> np.ndarray:
    h = h ^ (((h << _U(49)) | (h >> _U(15))) ^ ((h << _U(24)) | (h >> _U(40))))
    h = h * _U(_MX2)
    h ^= (h >> _U(35)) + length
    h = h * _U(_MX2)
    return h ^ (h >> _U(28))


def _mix16_v(data, dpos: np.ndarray, sec, soff: int, seed: int) -> np.ndarray:
    lo = _g64(data, dpos) ^ _U((_r64(sec, soff) + seed) & _M64)
    hi = _g64(data, dpos + 8) ^ _U((_r64(sec, soff + 8) - seed) & _M64)
    return _mul128_fold64_v(lo, hi)


def xxh3_64_arrow(arr, seed: int = 0) -> np.ndarray:
    """Vectorized XXH3-64 of every element of an Arrow string/binary
    array (or ChunkedArray) → uint64 numpy array. Length classes 0-16 /
    17-128 / 129-240 are fully vectorized; longer rows (rare for
    ids/captions) fall back to the scalar reference."""
    from .hashing import arrow_string_buffers

    data, starts, lens = arrow_string_buffers(arr)
    n_rows = len(lens)
    out = np.zeros(n_rows, dtype=np.uint64)
    if n_rows == 0:
        return out
    seed &= _M64
    sec = _KSECRET
    data = np.concatenate([data, np.zeros(8, dtype=np.uint8)])  # safe reads

    # --- n == 0
    m = lens == 0
    if m.any():
        out[m] = _U(_xxh64_avalanche(seed ^ _r64(sec, 56) ^ _r64(sec, 64)))

    # --- 1..3
    m = (lens >= 1) & (lens <= 3)
    if m.any():
        s, ln = starts[m], lens[m]
        c1 = data[s].astype(np.uint64)
        c2 = data[s + (ln >> 1)].astype(np.uint64)
        c3 = data[s + ln - 1].astype(np.uint64)
        combined = ((c1 << _U(16)) | (c2 << _U(24)) | c3
                    | (ln.astype(np.uint64) << _U(8)))
        bitflip = _U((( _r32(sec, 0) ^ _r32(sec, 4)) + seed) & _M64)
        out[m] = _xxh64_avalanche_v(combined ^ bitflip)

    # --- 4..8
    m = (lens >= 4) & (lens <= 8)
    if m.any():
        s, ln = starts[m], lens[m]
        sseed = (seed ^ ((_swap32(seed & _M32) << 32))) & _M64
        i1 = _g32(data, s)
        i2 = _g32(data, s + ln - 4)
        bitflip = _U((( _r64(sec, 8) ^ _r64(sec, 16)) - sseed) & _M64)
        input64 = i2 + (i1 << _U(32))
        out[m] = _rrmxmx_v(input64 ^ bitflip, ln.astype(np.uint64))

    # --- 9..16
    m = (lens >= 9) & (lens <= 16)
    if m.any():
        s, ln = starts[m], lens[m]
        bf1 = _U((( _r64(sec, 24) ^ _r64(sec, 32)) + seed) & _M64)
        bf2 = _U((( _r64(sec, 40) ^ _r64(sec, 48)) - seed) & _M64)
        ilo = _g64(data, s) ^ bf1
        ihi = _g64(data, s + ln - 8) ^ bf2
        plo, phi = _mult64_hi_lo(ilo, ihi)
        acc = (ln.astype(np.uint64) + _swap64_v(ilo) + ihi + (plo ^ phi))
        out[m] = _xxh3_avalanche_v(acc)

    # --- 17..128
    m = (lens >= 17) & (lens <= 128)
    if m.any():
        s, ln = starts[m], lens[m]
        acc = ln.astype(np.uint64) * _U(_P64_1)
        for lo_off, hi_off, soff_a, soff_b, cond in (
                (48, 64, 96, 112, 96), (32, 48, 64, 80, 64),
                (16, 32, 32, 48, 32), (0, 16, 0, 16, 0)):
            mm = ln > cond
            if mm.any():
                acc[mm] += _mix16_v(data, s[mm] + lo_off, sec, soff_a, seed)
                acc[mm] += _mix16_v(data, s[mm] + ln[mm] - hi_off, sec,
                                    soff_b, seed)
        out[m] = _xxh3_avalanche_v(acc)

    # --- 129..240
    m = (lens >= 129) & (lens <= 240)
    if m.any():
        s, ln = starts[m], lens[m]
        acc = ln.astype(np.uint64) * _U(_P64_1)
        for i in range(8):
            acc += _mix16_v(data, s + 16 * i, sec, 16 * i, seed)
        acc = _xxh3_avalanche_v(acc)
        nb = ln // 16
        for i in range(8, 15):
            mm = nb > i
            if mm.any():
                acc[mm] += _mix16_v(data, s[mm] + 16 * i, sec,
                                    16 * (i - 8) + _MIDSIZE_STARTOFFSET, seed)
        acc += _mix16_v(data, s + ln - 16, sec, 136 - _MIDSIZE_LASTOFFSET,
                        seed)
        out[m] = _xxh3_avalanche_v(acc)

    # --- > 240: scalar fallback
    m = lens > 240
    if m.any():
        raw = data.tobytes()
        for i in np.flatnonzero(m):
            out[i] = _U(xxh3_64(raw[starts[i] : starts[i] + lens[i]], seed))
    return out


# ---------------------------------------------------------------------------
# XXH3-128 vectorized over Arrow string/binary columns
# ---------------------------------------------------------------------------

def _rotl32_v(x: np.ndarray, r: int) -> np.ndarray:
    x = x & _U(_M32)
    return (((x << _U(r)) | (x >> _U(32 - r)))) & _U(_M32)


def _mix32_v(accl: np.ndarray, acch: np.ndarray, data, a_pos: np.ndarray,
             b_pos: np.ndarray, sec, soff: int, seed: int
             ) -> tuple[np.ndarray, np.ndarray]:
    accl = accl + _mix16_v(data, a_pos, sec, soff, seed)
    accl = accl ^ (_g64(data, b_pos) + _g64(data, b_pos + 8))
    acch = acch + _mix16_v(data, b_pos, sec, soff + 16, seed)
    acch = acch ^ (_g64(data, a_pos) + _g64(data, a_pos + 8))
    return accl, acch


def _finalize_mid_128_v(accl: np.ndarray, acch: np.ndarray, ln: np.ndarray,
                        seed: int) -> tuple[np.ndarray, np.ndarray]:
    lo = accl + acch
    hi = (accl * _U(_P64_1) + acch * _U(_P64_4)
          + (ln.astype(np.uint64) - _U(seed)) * _U(_P64_2))
    return _xxh3_avalanche_v(lo), -_xxh3_avalanche_v(hi)


def xxh3_128_arrow(arr, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized XXH3-128 of every element of an Arrow string/binary
    array (or ChunkedArray) → (low64, high64) uint64 numpy arrays.
    Bit-identical to the scalar ``xxh3_128`` (conformance-tested);
    rows over 240 bytes fall back to the scalar reference."""
    from .hashing import arrow_string_buffers

    data, starts, lens = arrow_string_buffers(arr)
    n_rows = len(lens)
    out_lo = np.zeros(n_rows, dtype=np.uint64)
    out_hi = np.zeros(n_rows, dtype=np.uint64)
    if n_rows == 0:
        return out_lo, out_hi
    seed &= _M64
    sec = _KSECRET
    data = np.concatenate([data, np.zeros(8, dtype=np.uint8)])

    # --- n == 0
    m = lens == 0
    if m.any():
        out_lo[m] = _U(_xxh64_avalanche(seed ^ _r64(sec, 64) ^ _r64(sec, 72)))
        out_hi[m] = _U(_xxh64_avalanche(seed ^ _r64(sec, 80) ^ _r64(sec, 88)))

    # --- 1..3
    m = (lens >= 1) & (lens <= 3)
    if m.any():
        s, ln = starts[m], lens[m]
        c1 = data[s].astype(np.uint64)
        c2 = data[s + (ln >> 1)].astype(np.uint64)
        c3 = data[s + ln - 1].astype(np.uint64)
        combinedl = ((c1 << _U(16)) | (c2 << _U(24)) | c3
                     | (ln.astype(np.uint64) << _U(8))) & _U(_M32)
        combinedh = _rotl32_v(_swap32_v(combinedl), 13)
        bitflipl = _U(((_r32(sec, 0) ^ _r32(sec, 4)) + seed) & _M64)
        bitfliph = _U(((_r32(sec, 8) ^ _r32(sec, 12)) - seed) & _M64)
        out_lo[m] = _xxh64_avalanche_v(combinedl ^ bitflipl)
        out_hi[m] = _xxh64_avalanche_v(combinedh ^ bitfliph)

    # --- 4..8
    m = (lens >= 4) & (lens <= 8)
    if m.any():
        s, ln = starts[m], lens[m]
        sseed = (seed ^ (_swap32(seed & _M32) << 32)) & _M64
        i1 = _g32(data, s)
        i2 = _g32(data, s + ln - 4)
        input64 = i1 + (i2 << _U(32))
        bitflip = _U(((_r64(sec, 16) ^ _r64(sec, 24)) + sseed) & _M64)
        keyed = input64 ^ bitflip
        pb = (_U(_P64_1) + (ln.astype(np.uint64) << _U(2)))
        m_lo, m_hi = _mult64_hi_lo(keyed, pb)
        m_hi = m_hi + (m_lo << _U(1))
        m_lo = m_lo ^ (m_hi >> _U(3))
        m_lo ^= m_lo >> _U(35)
        m_lo = m_lo * _U(_MX2)
        m_lo ^= m_lo >> _U(28)
        out_lo[m] = m_lo
        out_hi[m] = _xxh3_avalanche_v(m_hi)

    # --- 9..16
    m = (lens >= 9) & (lens <= 16)
    if m.any():
        s, ln = starts[m], lens[m]
        bitflipl = _U(((_r64(sec, 32) ^ _r64(sec, 40)) - seed) & _M64)
        bitfliph = _U(((_r64(sec, 48) ^ _r64(sec, 56)) + seed) & _M64)
        input_lo = _g64(data, s)
        input_hi = _g64(data, s + ln - 8)
        m_lo, m_hi = _mult64_hi_lo(input_lo ^ input_hi ^ bitflipl,
                                   np.full(len(s), _P64_1, dtype=np.uint64))
        m_lo = m_lo + ((ln.astype(np.uint64) - _U(1)) << _U(54))
        input_hi = input_hi ^ bitfliph
        m_hi = m_hi + input_hi + (input_hi & _U(_M32)) * _U(_P32_2 - 1)
        m_lo = m_lo ^ _swap64_v(m_hi)
        h_lo, h_hi = _mult64_hi_lo(m_lo, np.full(len(s), _P64_2,
                                                 dtype=np.uint64))
        h_hi = h_hi + m_hi * _U(_P64_2)
        out_lo[m] = _xxh3_avalanche_v(h_lo)
        out_hi[m] = _xxh3_avalanche_v(h_hi)

    # --- 17..128
    m = (lens >= 17) & (lens <= 128)
    if m.any():
        s, ln = starts[m], lens[m]
        accl = ln.astype(np.uint64) * _U(_P64_1)
        acch = np.zeros(len(s), dtype=np.uint64)
        for a_off, b_back, soff, cond in ((48, 64, 96, 96),
                                          (32, 48, 64, 64),
                                          (16, 32, 32, 32)):
            mm = ln > cond
            if mm.any():
                al, ah = _mix32_v(accl[mm], acch[mm], data, s[mm] + a_off,
                                  s[mm] + ln[mm] - b_back, sec, soff, seed)
                accl[mm], acch[mm] = al, ah
        accl, acch = _mix32_v(accl, acch, data, s, s + ln - 16, sec, 0, seed)
        out_lo[m], out_hi[m] = _finalize_mid_128_v(accl, acch, ln, seed)

    # --- 129..240
    m = (lens >= 129) & (lens <= 240)
    if m.any():
        s, ln = starts[m], lens[m]
        accl = ln.astype(np.uint64) * _U(_P64_1)
        acch = np.zeros(len(s), dtype=np.uint64)
        for i in range(4):
            accl, acch = _mix32_v(accl, acch, data, s + 32 * i,
                                  s + 32 * i + 16, sec, 32 * i, seed)
        accl = _xxh3_avalanche_v(accl)
        acch = _xxh3_avalanche_v(acch)
        nb = ln // 32
        for i in range(4, 8):
            mm = nb > i
            if mm.any():
                al, ah = _mix32_v(accl[mm], acch[mm], data, s[mm] + 32 * i,
                                  s[mm] + 32 * i + 16, sec,
                                  _MIDSIZE_STARTOFFSET + 32 * (i - 4), seed)
                accl[mm], acch[mm] = al, ah
        accl, acch = _mix32_v(accl, acch, data, s + ln - 16, s + ln - 32,
                              sec, 136 - _MIDSIZE_LASTOFFSET - 16,
                              (-seed) & _M64)
        out_lo[m], out_hi[m] = _finalize_mid_128_v(accl, acch, ln, seed)

    # --- > 240: scalar fallback
    m = lens > 240
    if m.any():
        raw = data.tobytes()
        for i in np.flatnonzero(m):
            v = xxh3_128(raw[starts[i] : starts[i] + lens[i]], seed)
            out_lo[i] = _U(v & _M64)
            out_hi[i] = _U(v >> 64)
    return out_lo, out_hi
