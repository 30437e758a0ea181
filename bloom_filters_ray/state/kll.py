"""KLL streaming quantile sketch (Karnin, Lang & Liberty, "Optimal
Quantile Approximation in Streams", FOCS 2016 — public algorithm).

Engine-side addition (no counterpart in the reference library, which
has no quantile sketch): the mergeable-partial complement of
``stages/quantiles.py`` — exact histograms need a bounded value
domain; KLL handles unbounded/float columns (score percentiles over
100 TB) with a fixed-size state whose rank error is O(1/k), at the
cost of approximation.

Structure: a stack of levels; level ``i`` holds values of weight
``2**i``. Values stream into level 0; when the sketch exceeds its
size budget, the lowest over-capacity level is sorted and every other
element (random even/odd offset — the unbiasing coin) is promoted to
the next level. ``merge`` concatenates levels pairwise then
re-compresses — associative and commutative in distribution, which is
what lets it run as an ``AggregateFnV2`` partial/final under Ray
Data's aggregate operator (see ``stages/sketch_aggs.KLLAgg``).

Vectorized throughout: compaction is one ``np.sort`` + strided slice;
quantile evaluation is one concatenate + argsort + cumsum over the
(tiny) retained values.
"""

from __future__ import annotations

import numpy as np

from ..hashing import DEFAULT_SEED

_C = 2.0 / 3.0  # geometric capacity decay from the paper


class KLLSketch:
    """Mergeable quantile sketch over float64 values.

    *k* controls accuracy: with the standard c=2/3 geometry the
    normalized rank error is ~1.65/k w.h.p. (k=200 → <1%). NaNs are
    ignored; n tracks ingested (non-NaN) count exactly.
    """

    def __init__(self, k: int = 200, seed: int = DEFAULT_SEED):
        if k < 8:
            raise ValueError(f"k must be >= 8, got {k}")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._rng = np.random.default_rng(seed)

    # -- geometry ----------------------------------------------------------

    def _capacity(self, level: int) -> int:
        """Capacity of *level* given the current height: the TOP level
        gets k, lower levels decay geometrically (floor 2)."""
        depth = len(self.levels) - 1 - level
        return max(int(np.ceil(self.k * (_C ** depth))), 2)

    def _budget(self) -> int:
        return sum(self._capacity(i) for i in range(len(self.levels)))

    def _size(self) -> int:
        return sum(len(lv) for lv in self.levels)

    # -- ingest ------------------------------------------------------------

    def update_many(self, values) -> "KLLSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return self
        self.n += int(len(v))
        self.levels[0] = np.concatenate((self.levels[0], v))
        self._compress()
        return self

    def update(self, value: float) -> "KLLSketch":
        return self.update_many([value])

    def _compress(self) -> None:
        # total > budget implies at least one level over its cap (all
        # within cap would sum to <= budget), so each pass compacts the
        # lowest such level and strictly shrinks the total.
        while self._size() > self._budget():
            for i in range(len(self.levels)):
                if len(self.levels[i]) > self._capacity(i):
                    self._compact_level(i)
                    break
            else:  # pragma: no cover — unreachable by the argument above
                break

    def _compact_level(self, i: int) -> None:
        lv = np.sort(self.levels[i])
        off = int(self._rng.integers(0, 2))  # unbiasing coin
        promoted = lv[off::2]
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[i + 1] = np.concatenate((self.levels[i + 1], promoted))
        # survivors are DISCARDED (their weight moved up); keep none
        self.levels[i] = np.empty(0, dtype=np.float64)

    # -- merge -------------------------------------------------------------

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if other.k != self.k:
            raise ValueError(f"cannot merge KLL k={other.k} into k={self.k}")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, lv in enumerate(other.levels):
            if len(lv):
                self.levels[i] = np.concatenate((self.levels[i], lv))
        self.n += other.n
        self._compress()
        return self

    # -- query -------------------------------------------------------------

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = [lv for lv in self.levels if len(lv)]
        wts = [np.full(len(lv), 1 << i, dtype=np.int64)
               for i, lv in enumerate(self.levels) if len(lv)]
        if not vals:
            return (np.empty(0, dtype=np.float64),
                    np.empty(0, dtype=np.int64))
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantiles(self, pcts) -> np.ndarray:
        """Value estimates at integer percentiles *pcts* — same
        threshold convention as stages/quantiles.py: smallest retained
        v whose cumulative weight reaches ceil(p*n/100)."""
        v, w = self._weighted()
        if not len(v):
            return np.full(len(list(pcts)), np.nan)
        cum = np.cumsum(w)
        n = cum[-1]
        targets = np.asarray([(p * n + 99) // 100 for p in pcts],
                             dtype=np.int64)
        idx = np.minimum(np.searchsorted(cum, np.maximum(targets, 1),
                                         side="left"), len(v) - 1)
        return v[idx]

    def quantile(self, pct: int) -> float:
        return float(self.quantiles([pct])[0])

    def rank(self, value: float) -> int:
        """Estimated number of ingested values <= *value* (scaled to
        n exactly via the retained total weight)."""
        v, w = self._weighted()
        if not len(v):
            return 0
        cum = np.cumsum(w)
        idx = int(np.searchsorted(v, value, side="right"))
        return int(cum[idx - 1]) if idx else 0
