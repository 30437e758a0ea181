"""Invertible Bloom Lookup Table + Cell (parity: reference
``src/iblt/invertible-bloom-lookup-tables.ts`` and ``src/iblt/cell.ts``).

Set-difference sketch: size = ceil(d*alpha) rounded up to a multiple of
hashCount; each element XORs its utf-8 bytes/checksum into hashCount
cells; ``substract`` is cellwise xorm; ``decode`` peels pure cells
(count == ±1 and checksum match) into {additional, missing}.

The byte-XOR replicates the reference's right-aligned XOR with
leading-zero trim (``src/utils.ts:58-90``).

Hashing (parity with invertible-bloom-lookup-tables.ts:170-205): the
checksum is derived from ``xxh3.xxh128(value, 125)`` and cell indexes
from ``xxh3.xxh128(value, salt=0,1,...)`` (the filter's own seed is
unused, as in the reference). The reference converts the 128-bit
BigInt with ``toString(16).match(/../g)`` — an UNPADDED hex string cut
into byte pairs, so leading zero nibbles shorten the digest and a
trailing odd hex char is dropped; out-of-range reads coerce to 0 and
shifts are JS signed-32-bit. All replicated bit-for-bit here via the
pure-numpy ``bloom_filters_ray.xxh3``.
"""

from __future__ import annotations

import math

import numpy as np

from ..hashing import DEFAULT_SEED
from ..xxh3 import xxh3_128, xxh3_128_arrow
from .serde import export_bigint, import_bigint


def _digest128(value: bytes | str, seed: int) -> list[int]:
    """Byte digest exactly as the reference builds it:
    ``xxh128(value, seed).toString(16).match(/../g)`` → int bytes."""
    hexs = format(xxh3_128(value, seed), "x")
    return [int(hexs[i : i + 2], 16) for i in range(0, len(hexs) - 1, 2)]


def _bitlen_u64(x: np.ndarray) -> np.ndarray:
    """Bit length of each uint64 (0 for 0), vectorized."""
    bl = np.zeros(len(x), dtype=np.int64)
    v = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        v[m] >>= np.uint64(s)
    bl[x > 0] += 1
    return bl


def _digest_bytes_many(lo: np.ndarray, hi: np.ndarray
                       ) -> tuple[np.ndarray, np.ndarray]:
    """The reference's unpadded-hex digest, vectorized: for each 128-bit
    value v = (hi<<64)|lo, the bytes of ``format(v, 'x')`` cut into hex
    pairs (leading zero nibbles shorten the digest; a trailing odd hex
    char is dropped). Returns (byte matrix (n, 16) with zeros past each
    row's digest, digest lengths nd (n,))."""
    n = len(lo)
    sig_lo = np.maximum(1, -(-_bitlen_u64(lo) // 4))  # hex('0') == '0'
    sig_hi = -(-_bitlen_u64(hi) // 4)
    nn = np.where(hi > 0, 16 + sig_hi, sig_lo).astype(np.int64)
    nd = nn // 2
    B = np.zeros((n, 16), dtype=np.uint8)
    for j in range(16):
        m = j < nd
        if not m.any():
            break
        k = (4 * nn[m] - 8 * (j + 1)).astype(np.uint64)
        small = k < 64
        byte = np.empty(int(m.sum()), dtype=np.uint64)
        ks = k[small]
        lopart = lo[m][small] >> ks
        # hi << 64 is undefined: cap the shift and mask the k == 0 case
        hipart = np.where(
            ks > 0,
            hi[m][small] << (np.uint64(64) - np.maximum(ks, np.uint64(1))),
            np.uint64(0))
        byte[small] = lopart | hipart
        byte[~small] = hi[m][~small] >> (k[~small] - np.uint64(64))
        B[m, j] = (byte & np.uint64(0xFF)).astype(np.uint8)
    return B, nd


def _window_hashes(B: np.ndarray, w: int) -> np.ndarray:
    """Signed-int32 value of digest bytes [4w, 4w+4) (missing → 0)."""
    b = B[:, 4 * w : 4 * w + 4].astype(np.int64)
    h = (b[:, 0] << 24) | (b[:, 1] << 16) | (b[:, 2] << 8) | b[:, 3]
    return np.where(h >= (1 << 31), h - (1 << 32), h)


def xor_bytes(a: bytes, b: bytes) -> bytes:
    """Right-aligned XOR with leading-zero trim (utils.ts:58-90)."""
    n = max(len(a), len(b))
    a = a.rjust(n, b"\x00")
    b = b.rjust(n, b"\x00")
    out = bytes(x ^ y for x, y in zip(a, b))
    return out.lstrip(b"\x00")


def _int32(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - (1 << 32) if x >= (1 << 31) else x


class Cell:
    def __init__(self, id_sum: bytes, hash_sum: int, count: int):
        self._id_sum = id_sum
        self._hash_sum = hash_sum
        self._count = count

    @staticmethod
    def empty() -> "Cell":
        return Cell(b"", 0, 0)

    def add(self, id_sum: bytes, hash_sum: int) -> None:
        self._id_sum = xor_bytes(self._id_sum, id_sum)
        self._hash_sum = _int32(self._hash_sum ^ hash_sum)
        self._count += 1

    def xorm(self, cell: "Cell") -> "Cell":
        return Cell(xor_bytes(self._id_sum, cell._id_sum),
                    _int32(self._hash_sum ^ cell._hash_sum),
                    self._count - cell._count)

    def is_empty(self) -> bool:
        return self._id_sum == b"" and self._hash_sum == 0 and self._count == 0

    def equals(self, cell: "Cell") -> bool:
        return (self._count == cell._count and self._id_sum == cell._id_sum
                and self._hash_sum == cell._hash_sum)

    def save_as_json(self) -> dict:
        return {"_idSum": list(self._id_sum), "_hashSum": self._hash_sum,
                "_count": self._count}

    @staticmethod
    def from_json(data: dict) -> "Cell":
        return Cell(bytes(data["_idSum"]), data["_hashSum"], data["_count"])


class InvertibleBloomFilter:
    def __init__(self, differences: int, alpha: float = 2, hash_count: int = 6,
                 seed: int = DEFAULT_SEED):
        self._differences = differences
        self._alpha = alpha
        self._hash_count = hash_count
        self._seed = seed
        self._size = math.ceil(differences * alpha)
        self._size += self._hash_count - (self._size % self._hash_count)
        self._elements = [Cell.empty() for _ in range(self._size)]

    @property
    def length(self) -> float:
        return sum(c._count for c in self._elements) / self._hash_count

    def gen_hash(self, element: str) -> int:
        digest = _digest128(element, 125)
        h = 0
        for j in range(4):
            h = _int32(_int32(h << 8) | (digest[j] if j < len(digest) else 0))
        return h

    def gen_indexes(self, element: str) -> list[int]:
        indexes = []
        salt = 0
        while len(indexes) < self._hash_count:
            digest = _digest128(element, salt)
            salt += 1
            i = 0
            while i < len(digest) / 4 and len(indexes) < self._hash_count:
                h = 0
                for j in range(i * 4, i * 4 + 4):
                    h = _int32(_int32(h << 8)
                               | (digest[j] if j < len(digest) else 0))
                indexes.append(abs(h) % self._size)
                i += 1
        return indexes

    def add(self, element: str) -> None:
        value = element.encode("utf-8")
        h = self.gen_hash(element)
        for index in self.gen_indexes(element):
            self._elements[index].add(value, h)

    def gen_hashes_many(self, arr) -> np.ndarray:
        """Vectorized ``gen_hash`` over an Arrow string/binary array
        (first 4 digest bytes of xxh128(value, 125), signed int32)."""
        lo, hi = xxh3_128_arrow(arr, 125)
        B, _ = _digest_bytes_many(lo, hi)
        return _window_hashes(B, 0)

    def gen_indexes_many(self, arr) -> np.ndarray:
        """Vectorized ``gen_indexes``: (n, hash_count) cell indexes via
        batched xxh128 digests per salt — no per-row Python hashing.
        Bit-identical to the scalar path (conformance-tested)."""
        import pyarrow as pa

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        hc = self._hash_count
        out = np.zeros((n, hc), dtype=np.int64)
        counts = np.zeros(n, dtype=np.int64)
        remaining = np.arange(n, dtype=np.int64)
        salt = 0
        while len(remaining):
            sub = arr.take(pa.array(remaining))
            lo, hi = xxh3_128_arrow(sub, salt)
            B, nd = _digest_bytes_many(lo, hi)
            for w in range(4):  # a 16-byte digest has at most 4 windows
                act = (4 * w < nd) & (counts[remaining] < hc)
                if not act.any():
                    continue
                hv = _window_hashes(B[act], w)
                ra = remaining[act]
                out[ra, counts[ra]] = np.abs(hv) % self._size
                counts[ra] += 1
            remaining = remaining[counts[remaining] < hc]
            salt += 1
        return out

    def add_many(self, arr) -> None:
        """Batched ``add`` of every element of an Arrow string array:
        digests are vectorized AND the per-cell updates are batched —
        rows are grouped by target cell (one argsort), the utf-8 bytes
        are right-aligned into a fixed-width u8 matrix (leading-zero
        padding ≡ ``xor_bytes`` right-alignment) and XOR-reduced per
        group via ``np.bitwise_xor.reduceat``; one Python-level update
        per TOUCHED CELL per batch (≤ table size), not per element.
        Bit-identical to a sequence of scalar ``add`` calls (XOR is
        associative/commutative; counts are sums)."""
        import pyarrow as pa

        from ..hashing import arrow_string_buffers

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        if n == 0:
            return
        hs = self.gen_hashes_many(arr)
        idxs = self.gen_indexes_many(arr)  # (n, hc)
        hc = self._hash_count
        data, starts, lengths = arrow_string_buffers(arr)
        m = int(lengths.max()) if n else 0
        pad = np.zeros((n, m), dtype=np.uint8)
        total = int(lengths.sum())
        if total:
            cs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lengths, out=cs[1:])
            within = np.arange(total, dtype=np.int64) \
                - np.repeat(cs[:-1], lengths)
            row = np.repeat(np.arange(n, dtype=np.int64), lengths)
            src = np.repeat(starts.astype(np.int64), lengths) + within
            dst = row * m + (m - lengths[row]) + within
            pad.ravel()[dst] = data[src]
        flat_c = idxs.ravel()
        rows = np.repeat(np.arange(n, dtype=np.int64), hc)
        order = np.argsort(flat_c, kind="stable")
        fc = flat_c[order]
        fr = rows[order]
        gstart = np.flatnonzero(
            np.concatenate(([True], fc[1:] != fc[:-1])))
        gid = np.bitwise_xor.reduceat(pad[fr], gstart, axis=0) if m else \
            np.zeros((len(gstart), 0), dtype=np.uint8)
        hu = (hs.astype(np.int64) & 0xFFFFFFFF).astype(np.uint32)
        ghash = np.bitwise_xor.reduceat(hu[fr], gstart)
        gcount = np.diff(np.concatenate((gstart, [len(fc)])))
        cells = self._elements
        for g, c in enumerate(fc[gstart]):
            cell = cells[int(c)]
            cell._id_sum = xor_bytes(cell._id_sum, gid[g].tobytes())
            cell._hash_sum = _int32(cell._hash_sum ^ int(ghash[g]))
            cell._count += int(gcount[g])

    def remove(self, element: str) -> bool:
        value = element.encode("utf-8")
        h = self.gen_hash(element)
        for index in self.gen_indexes(element):
            self._elements[index] = self._elements[index].xorm(Cell(value, h, 1))
        return True

    def has(self, element: str) -> bool:
        return all(self._elements[i]._count != 0 for i in self.gen_indexes(element))

    def is_cell_pure(self, cell: Cell) -> bool:
        if cell._count not in (1, -1):
            return False
        try:
            value = cell._id_sum.decode("utf-8")
        except UnicodeDecodeError:
            return False
        return self.gen_hash(value) == cell._hash_sum

    def list_entries(self) -> list[str]:
        copy = InvertibleBloomFilter.from_json(self.save_as_json())
        result = []
        while True:
            cell = next((c for c in copy._elements if c._count in (1, -1)), None)
            if cell is None:
                return result
            value = cell._id_sum.decode("utf-8")
            result.append(value)
            copy.remove(value)

    def merge(self, other: "InvertibleBloomFilter") -> None:
        """Engine extension: cellwise union (idSum XOR, hashSum XOR,
        count +) — the mergeable-partial form of ``add``, valid because
        every add only XORs/increments cells (SURVEY.md §2.5: IBLT as a
        distributed written-id ledger built per block and tree-merged).
        """
        if self._size != other._size:
            raise ValueError("The two Invertible Bloom Filters must be of the same size")
        self._elements = [
            Cell(xor_bytes(a._id_sum, b._id_sum), a._hash_sum ^ b._hash_sum,
                 a._count + b._count)
            for a, b in zip(self._elements, other._elements)]

    def substract(self, other: "InvertibleBloomFilter") -> "InvertibleBloomFilter":
        if self._size != other._size:
            raise ValueError("The two Invertible Bloom Filters must be of the same size")
        res = InvertibleBloomFilter(other._differences, other._alpha,
                                    other._hash_count, self._seed)
        res._elements = [a.xorm(b) for a, b in zip(self._elements, other._elements)]
        return res

    def decode(self) -> dict:
        additional: list[str] = []
        missing: list[str] = []
        pure = [i for i, c in enumerate(self._elements) if self.is_cell_pure(c)]
        while pure:
            idx = pure.pop(0)
            cell = self._elements[idx]
            if not self.is_cell_pure(cell):
                continue
            value = cell._id_sum.decode("utf-8")
            c = cell._count
            (additional if c > 0 else missing).append(value)
            h = self.gen_hash(value)
            for index in self.gen_indexes(value):
                self._elements[index] = self._elements[index].xorm(
                    Cell(cell._id_sum, h, c))
                if self.is_cell_pure(self._elements[index]):
                    pure.append(index)
        if any(not c.is_empty() for c in self._elements):
            return {"success": False, "additional": additional, "missing": missing}
        return {"success": True, "additional": additional, "missing": missing}

    def save_as_json(self) -> dict:
        return {
            "_alpha": self._alpha,
            "_differences": self._differences,
            "_elements": [c.save_as_json() for c in self._elements],
            "_size": self._size,
            "_hashCount": self._hash_count,
            "_seed": export_bigint(self._seed),
        }

    @staticmethod
    def from_json(data: dict) -> "InvertibleBloomFilter":
        f = InvertibleBloomFilter(data["_differences"], data["_alpha"],
                                  data["_hashCount"], import_bigint(data["_seed"]))
        f._elements = [Cell.from_json(c) for c in data["_elements"]]
        return f
