"""Cuckoo filter + Bucket (parity: reference ``src/cuckoo/cuckoo-filter.ts``
and ``src/cuckoo/bucket.ts``).

Fingerprint = first ceil(f/8) hex chars of the element's unpadded hex
hash string; candidate buckets ``i1 = hash % size`` and
``i2 = (hash ^ |hash(fp)|) % size``; inserts fall back to <= maxKicks
random kicks with a rollback log (non-destructive by default).

Deviation notes:
- the reference draws kick randomness from the ``seedrandom`` ARC4
  PRNG; this engine uses Python's seeded ``random.Random`` — kick
  selection randomness affects only insertion order internals, never
  the membership contract.
- the reference relocates kicked fingerprints to
  ``(index ^ hash(fp)) % size`` (cuckoo-filter.ts:190-217) while
  lookups probe ``(fullhash ^ hash(fp)) % size`` — these disagree, so
  any kicked element becomes a false negative (reproducible defect in
  the reference). The DEFAULT mode ("standard") restores the standard
  cuckoo partner involution: the table size is rounded up to a power
  of two and ``i2 = i1 ^ (hash(fp) & (size-1))``, making relocation
  and lookup agree (Fan et al., "Cuckoo Filter: Practically Better
  Than Bloom", CoNEXT'14). ``mode="reference"`` opts into the
  bug-compatible layout (modulo indexing, relocation/lookup
  disagreement preserved) so reference-exported cuckoo state can be
  replayed index-for-index; ``from_json`` of a reference export (no
  ``_mode`` field) selects it automatically.
"""

from __future__ import annotations

import math
import random as _random

from ..hashing import DEFAULT_SEED, xxh64
from .serde import export_bigint, import_bigint


def compute_fingerprint_length(size: int, rate: float) -> int:
    f = math.ceil(math.log2(1 / rate) + math.log2(2 * size))
    return math.ceil(f / 8)  # we use 64-bit hashes


class Bucket:
    def __init__(self, size: int):
        self._elements: list[str | None] = [None] * size
        self._size = size
        self._length = 0

    @property
    def size(self) -> int:
        return self._size

    @property
    def length(self) -> int:
        return self._length

    def is_free(self) -> bool:
        return self._length < self._size

    def next_empty_slot(self) -> int:
        return self._elements.index(None)

    def at(self, index: int):
        return self._elements[index]

    def add(self, element) -> bool:
        if element is None or not self.is_free():
            return False
        self.set(self.next_empty_slot(), element)
        self._length += 1
        return True

    def remove(self, element) -> bool:
        try:
            index = self._elements.index(element)
        except ValueError:
            return False
        self.unset(index)
        return True

    def has(self, element) -> bool:
        return element in self._elements

    def set(self, index: int, element) -> None:
        self._elements[index] = element

    def unset(self, index: int) -> None:
        self._elements[index] = None
        self._length -= 1

    def swap(self, index: int, element):
        tmp = self._elements[index]
        self._elements[index] = element
        return tmp

    def equals(self, other: "Bucket") -> bool:
        return (self._size == other._size and self._length == other._length
                and self._elements == other._elements)

    def save_as_json(self) -> dict:
        return {"_size": self._size, "_elements": list(self._elements),
                "_length": self._length}

    @staticmethod
    def from_json(data: dict) -> "Bucket":
        b = Bucket(data["_size"])
        b._elements = list(data["_elements"])
        b._length = data["_length"]
        return b


class CuckooFilter:
    def __init__(self, size: int, f_length: int, bucket_size: int,
                 max_kicks: int = 500, seed: int = DEFAULT_SEED,
                 mode: str = "standard", hasher=None):
        if mode not in ("standard", "reference"):
            raise ValueError(mode)
        self._mode = mode
        # custom Hashing (parity: cuckoo-filter.ts routes every hash
        # through this._hashing.hashAsInt/hashIntAndString); None keeps
        # the built-in XXH64
        self._hasher = hasher
        if mode == "standard":  # power of two (see module note)
            size = 1 << max(1, (size - 1).bit_length())
        self._filter = [Bucket(bucket_size) for _ in range(size)]
        self._size = size
        self._bucket_size = bucket_size
        self._fingerprint_length = f_length
        self._length = 0
        self._max_kicks = max_kicks
        self._seed = seed
        self._snap = None  # lazy has_many probe snapshot
        if mode == "reference":
            # kick-for-kick parity: the reference draws all kick
            # randomness from seedrandom(`${seed}`) (base-filter.ts)
            from .arc4 import SeedRandom

            self._rng = SeedRandom(str(seed))
        else:
            self._rng = _random.Random(seed)

    @classmethod
    def create(cls, size: int, error_rate: float, bucket_size: int = 4,
               max_kicks: int = 500, seed: int = DEFAULT_SEED,
               hasher=None) -> "CuckooFilter":
        fl = compute_fingerprint_length(bucket_size, error_rate)
        capacity = math.ceil(size / bucket_size / 0.955)
        return cls(capacity, fl, bucket_size, max_kicks, seed, hasher=hasher)

    @classmethod
    def from_items(cls, items, error_rate: float, bucket_size: int = 4,
                   max_kicks: int = 500, seed: int = DEFAULT_SEED,
                   hasher=None) -> "CuckooFilter":
        items = list(items)
        f = cls.create(len(items), error_rate, bucket_size, max_kicks, seed,
                       hasher=hasher)
        for item in items:
            f.add(item)
        return f

    def _h64(self, element) -> int:
        if self._hasher is not None:
            return self._hasher.serialize(element, self._seed)
        return xxh64(element, self._seed)

    @property
    def size(self) -> int:
        return self._size

    @property
    def full_size(self) -> int:
        return self._size * self._bucket_size

    @property
    def length(self) -> int:
        return self._length

    @property
    def fingerprint_length(self) -> int:
        return self._fingerprint_length

    @property
    def bucket_size(self) -> int:
        return self._bucket_size

    @property
    def max_kicks(self) -> int:
        return self._max_kicks

    def _locations(self, element) -> tuple[str, int, int]:
        h = self._h64(element)
        hex_str = format(h, "x")  # unpadded, like bigint.toString(16)
        if self._fingerprint_length > len(hex_str):
            raise ValueError(
                f"The fingerprint length ({self._fingerprint_length}) is higher "
                f"than the hash length ({len(hex_str)})")
        fingerprint = hex_str[: self._fingerprint_length]
        if self._mode == "reference":  # cuckoo-filter.ts:319-339 verbatim
            i1 = h % self._size
            i2 = (h ^ self._h64(fingerprint)) % self._size
        else:
            mask = self._size - 1
            i1 = h & mask
            i2 = i1 ^ (self._h64(fingerprint) & mask)
        return fingerprint, i1, i2

    def add(self, element, throw_error: bool = False, destructive: bool = False) -> bool:
        self._snap = None
        fp, i1, i2 = self._locations(element)
        if self._filter[i1].is_free():
            self._filter[i1].add(fp)
        elif self._filter[i2].is_free():
            self._filter[i2].add(fp)
        else:
            index = i1 if self._rng.random() < 0.5 else i2
            moved = fp
            logs: list[tuple[int, int, str | None]] = []
            for _ in range(self._max_kicks):
                rnd_index = self._rng.randint(0, self._filter[index].length - 1)
                tmp = self._filter[index].at(rnd_index)
                logs.append((index, rnd_index, tmp))
                self._filter[index].set(rnd_index, moved)
                moved = tmp
                if self._mode == "reference":
                    # bug-compatible relocation (cuckoo-filter.ts:203-208):
                    # (index ^ hash) % size disagrees with the lookup index
                    index = (index ^ self._h64(moved)) % self._size
                else:
                    index = index ^ (self._h64(moved)
                                     & (self._size - 1))
                if self._filter[index].is_free():
                    self._filter[index].add(moved)
                    self._length += 1
                    return True
            if not destructive:
                for bi, si, val in reversed(logs):
                    self._filter[bi].set(si, val)
            if throw_error:
                raise RuntimeError(
                    f'The Cuckoo Filter is full, cannot insert element "{element}"')
            return False
        self._length += 1
        return True

    def remove(self, element) -> bool:
        self._snap = None
        fp, i1, i2 = self._locations(element)
        if self._filter[i1].has(fp):
            self._filter[i1].remove(fp)
            self._length -= 1
            return True
        if self._filter[i2].has(fp):
            self._filter[i2].remove(fp)
            self._length -= 1
            return True
        return False

    def has(self, element) -> bool:
        fp, i1, i2 = self._locations(element)
        return self._filter[i1].has(fp) or self._filter[i2].has(fp)

    def _locations_many(self, arr):
        """Vectorized ``_locations`` over an Arrow string/binary array
        (or a list): (fp_values u64, i1, i2) — bit-identical to the
        scalar path. Only valid for the built-in XXH64 hash."""
        import numpy as np
        import pyarrow as pa

        from ..hashing import xxh64_arrow

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if not isinstance(arr, pa.Array):
            arr = pa.array(list(arr))
        h = xxh64_arrow(arr, self._seed)  # uint64
        fl = self._fingerprint_length
        # unpadded-hex digit count of h (exact, no float log): 1 + #{j:
        # h >= 16^j}
        ndig = np.ones(len(h), dtype=np.int64)
        for j in range(1, 16):
            ndig += (h >= np.uint64(1) << np.uint64(4 * j)).astype(np.int64)
        if (ndig < fl).any():
            bad = int(ndig[ndig < fl][0])
            raise ValueError(
                f"The fingerprint length ({fl}) is higher "
                f"than the hash length ({bad})")
        # fingerprint = first fl hex chars of the unpadded hex = top fl
        # nibbles below the leading digit
        fpv = h >> (np.uint64(4) * (ndig - fl).astype(np.uint64))
        # the reference hashes the fingerprint STRING; rebuild the
        # fl-char lowercase-hex strings vectorized (no per-row format())
        n = len(h)
        ascii_mat = np.empty((n, fl), dtype=np.uint8)
        for j in range(fl):
            nib = ((fpv >> np.uint64(4 * (fl - 1 - j)))
                   & np.uint64(0xF)).astype(np.uint8)
            ascii_mat[:, j] = nib + np.where(nib < 10, 48, 87).astype(np.uint8)
        offsets = np.arange(0, (n + 1) * fl, fl, dtype=np.int32)
        fp_arr = pa.StringArray.from_buffers(
            n, pa.py_buffer(offsets.tobytes()),
            pa.py_buffer(ascii_mat.tobytes()))
        h2 = xxh64_arrow(fp_arr, self._seed)
        if self._mode == "reference":
            size = np.uint64(self._size)
            i1 = (h % size).astype(np.int64)
            i2 = ((h ^ h2) % size).astype(np.int64)
        else:
            mask = np.uint64(self._size - 1)
            i1 = (h & mask).astype(np.int64)
            i2 = (i1.astype(np.uint64) ^ (h2 & mask)).astype(np.int64)
        return fpv, i1, i2

    def _probe_snapshot(self):
        """(values, valid) matrices of the current table — stored hex
        fingerprints as u64 (same length fl ⇒ int() is injective).
        Rebuilt lazily after any add/remove."""
        import numpy as np

        if getattr(self, "_snap", None) is None:  # getattr: old pickles
            vals = np.zeros((self._size, self._bucket_size), dtype=np.uint64)
            valid = np.zeros((self._size, self._bucket_size), dtype=bool)
            for i, b in enumerate(self._filter):
                for j, e in enumerate(b._elements):
                    if e is not None:
                        vals[i, j] = int(e, 16)
                        valid[i, j] = True
            self._snap = (vals, valid)
        return self._snap

    def has_many(self, arr):
        """Vectorized ``has`` over an Arrow string/binary array (or a
        list) → bool ndarray. Probes are pure gathers against a cached
        table snapshot; inserts stay sequential (kick chains are
        reference semantics)."""
        import numpy as np

        if self._hasher is not None:  # custom hash: per-element path
            import pyarrow as pa

            items = arr.to_pylist() if isinstance(
                arr, (pa.Array, pa.ChunkedArray)) else list(arr)
            return np.array([self.has(x) for x in items], dtype=bool)
        fpv, i1, i2 = self._locations_many(arr)
        if len(fpv) == 0:
            return np.zeros(0, dtype=bool)
        vals, valid = self._probe_snapshot()
        m1 = ((vals[i1] == fpv[:, None]) & valid[i1]).any(axis=1)
        m2 = ((vals[i2] == fpv[:, None]) & valid[i2]).any(axis=1)
        return m1 | m2

    def rate(self) -> float:
        load = self._load()["load"]
        c = self._fingerprint_length / load
        return 2 ** (math.log2(2 * self._bucket_size) - load * c)

    def _load(self) -> dict:
        mx = len(self._filter) * self._bucket_size
        used = sum(b.length for b in self._filter)
        return {"used": used, "free": mx - used, "size": mx, "load": used / mx}

    def equals(self, other: "CuckooFilter") -> bool:
        return (self._size == other._size
                and self._fingerprint_length == other._fingerprint_length
                and self._bucket_size == other._bucket_size
                and all(a.equals(b) for a, b in zip(self._filter, other._filter)))

    def save_as_json(self) -> dict:
        return {
            "_size": self._size,
            "_fingerprintLength": self._fingerprint_length,
            "_length": self._length,
            "_maxKicks": self._max_kicks,
            "_filter": [b.save_as_json() for b in self._filter],
            "_seed": export_bigint(self._seed),
            "_bucketSize": self._bucket_size,
            "_mode": self._mode,  # engine field; absent in reference JSON
        }

    @staticmethod
    def from_json(data: dict) -> "CuckooFilter":
        # a JSON without _mode is a reference export: replay it with
        # bug-compatible reference indexing and its exact table size
        mode = data.get("_mode", "reference")
        f = CuckooFilter(data["_size"], data["_fingerprintLength"],
                         data["_bucketSize"], data["_maxKicks"],
                         import_bigint(data["_seed"]), mode=mode)
        f._size = data["_size"]
        f._length = data["_length"]
        f._filter = [Bucket.from_json(b) for b in data["_filter"]]
        return f
