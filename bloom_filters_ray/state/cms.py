"""Count-Min Sketch (parity: reference ``src/sketch/count-min-sketch.ts``).

rows x columns int64 counter matrix; ``update`` adds the count at one
double-hashed column per row (indexes derived with size=columns,
hashCount=rows — count-min-sketch.ts:112-126); ``count`` = min over
rows; ``merge`` = elementwise + (same dims required). ``create(eps,
delta=0.999)``: columns = ceil(e/eps), rows = ceil(ln(1/delta)) —
replicated verbatim (for delta=0.999 this yields 1 row, as in the
reference).
"""

from __future__ import annotations

import math

import numpy as np

from ..hashing import DEFAULT_SEED, Hashing, get_indexes
from ._batch import indexes_batch
from .serde import export_bigint, import_bigint


class CountMinSketch:
    def __init__(self, columns: int, rows: int, seed: int = DEFAULT_SEED,
                 hasher: Hashing | None = None):
        self._columns = columns
        self._rows = rows
        self._seed = seed
        self._hasher = hasher
        self._matrix = np.zeros((rows, columns), dtype=np.int64)
        self._all_sums = 0

    @classmethod
    def create(cls, error_rate: float, accuracy: float = 0.999,
               seed: int = DEFAULT_SEED,
               hasher: Hashing | None = None) -> "CountMinSketch":
        columns = math.ceil(math.e / error_rate)
        rows = math.ceil(math.log(1 / accuracy))
        return cls(columns, rows, seed, hasher)

    @classmethod
    def from_items(cls, items, error_rate: float, accuracy: float = 0.999,
                   seed: int = DEFAULT_SEED) -> "CountMinSketch":
        f = cls.create(error_rate, accuracy, seed)
        for item in items:
            f.update(item)
        return f

    @property
    def columns(self) -> int:
        return self._columns

    @property
    def rows(self) -> int:
        return self._rows

    @property
    def sum(self) -> int:
        return self._all_sums

    def update(self, element, count: int = 1) -> None:
        if isinstance(element, (int, np.integer)):
            from ._batch import int_to_bytes

            element = int_to_bytes(int(element))
        self._all_sums += count
        idx = (self._hasher.get_indexes(element, self._columns, self._rows,
                                        self._seed)
               if self._hasher is not None else
               get_indexes(element, self._columns, self._rows, self._seed))
        for i in range(self._rows):
            self._matrix[i, idx[i]] += count

    def count(self, element) -> int:
        if isinstance(element, (int, np.integer)):
            from ._batch import int_to_bytes

            element = int_to_bytes(int(element))
        idx = (self._hasher.get_indexes(element, self._columns, self._rows,
                                        self._seed)
               if self._hasher is not None else
               get_indexes(element, self._columns, self._rows, self._seed))
        return int(min(self._matrix[i, idx[i]] for i in range(self._rows)))

    def update_many(self, elements, counts: np.ndarray | None = None) -> None:
        """Vectorized bulk update (engine extension)."""
        if len(elements) == 0:
            return
        if counts is None:
            counts = np.ones(len(elements), dtype=np.int64)
        else:
            counts = np.asarray(counts, dtype=np.int64)
        idx = indexes_batch(elements, self._columns, self._rows, self._seed)
        for i in range(self._rows):
            np.add.at(self._matrix[i], idx[:, i], counts)
        self._all_sums += int(counts.sum())

    def count_many(self, elements) -> np.ndarray:
        if len(elements) == 0:
            return np.zeros(0, dtype=np.int64)
        idx = indexes_batch(elements, self._columns, self._rows, self._seed)
        ests = np.stack([self._matrix[i][idx[:, i]] for i in range(self._rows)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> None:
        if self._columns != other._columns:
            raise ValueError("Cannot merge two sketches with different number of columns")
        if self._rows != other._rows:
            raise ValueError("Cannot merge two sketches with different number of rows")
        self._matrix += other._matrix
        self._all_sums += other._all_sums

    def clone(self) -> "CountMinSketch":
        c = CountMinSketch(self._columns, self._rows, self._seed)
        c.merge(self)
        return c

    def equals(self, other: "CountMinSketch") -> bool:
        return (self._columns == other._columns and self._rows == other._rows
                and np.array_equal(self._matrix, other._matrix))

    def save_as_json(self) -> dict:
        return {
            "_allSums": self._all_sums,
            "_matrix": self._matrix.tolist(),
            "_rows": self._rows,
            "_columns": self._columns,
            "_seed": export_bigint(self._seed),
        }

    @staticmethod
    def from_json(data: dict) -> "CountMinSketch":
        f = CountMinSketch(data["_columns"], data["_rows"], import_bigint(data["_seed"]))
        f._matrix = np.asarray(data["_matrix"], dtype=np.int64)
        f._all_sums = data["_allSums"]
        return f
