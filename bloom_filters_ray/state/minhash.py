"""MinHash + MinHashFactory (parity: reference ``src/sketch/min-hash.ts``
and ``src/sketch/min-hash-factory.ts``).

Signature of k mins: ``sig[i] = min over inserted x of (a_i*x + b_i) % c_i``
computed in IEEE-754 float64 in the reference. Here the permutation is
computed in int64, which is bit-identical to float64 as long as
``a*x + b < 2^53`` — guaranteed by capping maxValue at 2^26 in the
engine config (reference-scale maxValue≈20,000 is far below that).

``compare_with`` is the positional-equality fraction (duplicates
counted — min-hash.ts:117-132); raises on an empty MinHash.

The reference factory draws (a, b) from an *unseeded* lodash RNG
(min-hash-factory.ts:59-66) — nondeterministic by design, with the
drawn table serialized alongside each MinHash. This factory draws from
a seeded numpy Generator so distributed stages can reconstruct the
exact table from (nb_hashes, max_value, seed) alone; an explicit table
can be injected for reference-parity tests.

``closest_prime`` replicates the reference's primality test verbatim,
including its ``i < sqrt(x)`` loop bound (min-hash-factory.ts:9-38),
so the generated ``c`` agrees with the reference for any maxValue.
"""

from __future__ import annotations

import math

import numpy as np

from ..hashing import DEFAULT_SEED
from .serde import export_bigint, import_bigint

_INF = float("inf")


def is_prime(x: int) -> bool:
    """Reference-parity primality test (same boundary semantics as
    min-hash-factory.ts:9-19, e.g. odd prime squares pass)."""
    if x != 2 and x % 2 == 0:
        return False
    i = 2
    while i < math.sqrt(x):
        if x % i == 0:
            return False
        i += 1
    return True


def closest_prime(x: int) -> int:
    """First value >= x accepted by ``is_prime`` (min-hash-factory.ts:21-38)."""
    i = 0
    while True:
        if is_prime(x + i):
            return x + i
        i += 1


class MinHash:
    def __init__(self, nb_hashes: int, hash_functions: np.ndarray,
                 seed: int = DEFAULT_SEED):
        """*hash_functions* is an (nb_hashes, 3) int64 array of rows (a, b, c)."""
        self._nb_hashes = nb_hashes
        self._hash_functions = np.asarray(hash_functions, dtype=np.int64)
        self._seed = seed
        self._signature = np.full(nb_hashes, _INF)

    @property
    def nb_hashes(self) -> int:
        return self._nb_hashes

    def is_empty(self) -> bool:
        return self._signature[0] == _INF

    def add(self, value: int) -> None:
        a, b, c = (self._hash_functions[:, 0], self._hash_functions[:, 1],
                   self._hash_functions[:, 2])
        self._signature = np.minimum(self._signature, (a * value + b) % c)

    def bulk_load(self, values) -> None:
        values = np.asarray(values, dtype=np.int64)
        if len(values) == 0:
            return
        a, b, c = (self._hash_functions[:, 0], self._hash_functions[:, 1],
                   self._hash_functions[:, 2])
        hv = (values[:, None] * a[None, :] + b[None, :]) % c[None, :]
        self._signature = np.minimum(self._signature, hv.min(axis=0))

    def compare_with(self, other: "MinHash") -> float:
        if self.is_empty() or other.is_empty():
            raise ValueError(
                "Cannot compute a Jaccard similarity with a MinHash that contains no values")
        return float(np.mean(self._signature == other._signature))

    def save_as_json(self) -> dict:
        return {
            "_hashFunctions": [{"a": int(a), "b": int(b), "c": int(c)}
                               for a, b, c in self._hash_functions],
            "_nbHashes": self._nb_hashes,
            "_signature": [s if s == _INF else float(s) for s in self._signature],
            "_seed": export_bigint(self._seed),
        }

    @staticmethod
    def from_json(data: dict) -> "MinHash":
        fns = np.array([[f["a"], f["b"], f["c"]] for f in data["_hashFunctions"]],
                       dtype=np.int64)
        mh = MinHash(data["_nbHashes"], fns, import_bigint(data["_seed"]))
        mh._signature = np.array(data["_signature"], dtype=np.float64)
        return mh


class MinHashFactory:
    """Generates MinHash sketches sharing one (a, b, c) permutation table.

    Deterministic given (nb_hashes, max_value, seed); pass *table* to
    inject an externally generated (e.g. reference-exported) table.
    """

    def __init__(self, nb_hashes: int, max_value: int, seed: int = DEFAULT_SEED,
                 table: np.ndarray | None = None):
        if max_value > (1 << 26):
            raise ValueError("max_value above 2^26 breaks float64/int64 arithmetic parity")
        self._nb_hashes = nb_hashes
        self._max_value = max_value
        self._seed = seed
        if table is not None:
            self._hash_functions = np.asarray(table, dtype=np.int64)
        else:
            c = closest_prime(max_value)
            rng = np.random.default_rng(seed & ((1 << 63) - 1))
            ab = rng.integers(0, max_value + 1, size=(nb_hashes, 2), dtype=np.int64)
            self._hash_functions = np.column_stack(
                [ab, np.full(nb_hashes, c, dtype=np.int64)])

    @property
    def table(self) -> np.ndarray:
        return self._hash_functions

    def create(self) -> MinHash:
        return MinHash(self._nb_hashes, self._hash_functions, self._seed)

    def signatures(self, flat_values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Vectorized batch signatures: *flat_values* is the concatenation
        of each row's value set, *offsets* (len n+1) delimits rows — the
        Arrow list layout. Returns an (n, nb_hashes) int64 signature
        matrix; empty rows get sentinel -1 (the reference raises on
        comparing empties; engine stages filter them out).

        Memory-bounded and allocation-free in the hot loop: a
        preallocated (chunk, k) buffer is reused across chunks with
        in-place ufuncs — large fresh numpy temporaries are first-touch
        page-fault bound on some kernels, so the buffer reuse is
        load-bearing for throughput, not just neatness.
        """
        n = len(offsets) - 1
        k = self._nb_hashes
        a = self._hash_functions[:, 0][None, :]
        b = self._hash_functions[:, 1][None, :]
        c = self._hash_functions[:, 2][None, :]
        out = np.full((n, k), -1, dtype=np.int64)
        flat_values = np.asarray(flat_values, dtype=np.int64)
        offsets = np.asarray(offsets, dtype=np.int64)
        chunk_target = 1 << 14
        buf = np.empty((chunk_target, k), dtype=np.int64)
        row = 0
        while row < n:
            end_row = row
            while end_row < n and (offsets[end_row + 1] - offsets[row]) <= chunk_target:
                end_row += 1
            if end_row == row:  # single huge row
                end_row = row + 1
            lo, hi = offsets[row], offsets[end_row]
            vals = flat_values[lo:hi]
            if len(vals):
                if len(vals) <= chunk_target:
                    hv = buf[: len(vals)]
                    np.multiply(vals[:, None], a, out=hv)
                else:  # single row larger than the buffer
                    hv = vals[:, None] * a
                np.add(hv, b, out=hv)
                np.remainder(hv, c, out=hv)
                starts = (offsets[row:end_row] - lo)
                lens = np.diff(offsets[row : end_row + 1])
                nonempty = lens > 0
                if nonempty.any():
                    mins = np.minimum.reduceat(hv, starts[nonempty], axis=0)
                    out[row:end_row][nonempty] = mins
            row = end_row
        return out
