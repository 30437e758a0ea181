"""TopK = CountMinSketch + sorted-array min-heap (parity: reference
``src/sketch/topk.ts``).

``add``: update the CMS, re-query the estimated frequency, then insert/
replace in the heap when it isn't full or the frequency reaches the
current minimum; evict the minimum when the heap exceeds k.
``values()``: descending frequency with 1-based ranks.
"""

from __future__ import annotations

import bisect

from ..hashing import DEFAULT_SEED
from .cms import CountMinSketch
from .serde import export_bigint, import_bigint


class MinHeap:
    """Sorted-by-ascending-frequency array (topk.ts:32-120)."""

    def __init__(self):
        self._content: list[dict] = []  # {"value": str, "frequency": int}

    def __len__(self) -> int:
        return len(self._content)

    @property
    def content(self) -> list[dict]:
        return self._content

    def get(self, index: int):
        return self._content[index] if 0 <= index < len(self._content) else None

    def add(self, element: dict) -> None:
        keys = [e["frequency"] for e in self._content]
        i = bisect.bisect_left(keys, element["frequency"])
        self._content.insert(i, element)

    def remove(self, index: int) -> None:
        del self._content[index]

    def pop_min(self):
        return self._content.pop(0) if self._content else None

    def index_of(self, value: str) -> int:
        for i, e in enumerate(self._content):
            if e["value"] == value:
                return i
        return -1

    def clear(self) -> None:
        self._content = []

    def save_as_json(self) -> dict:
        return {"_content": list(self._content)}

    @staticmethod
    def from_json(data: dict) -> "MinHeap":
        h = MinHeap()
        h._content = list(data["_content"])
        return h


class TopK:
    def __init__(self, k: int, error_rate: float, accuracy: float,
                 seed: int = DEFAULT_SEED, hasher=None):
        self._k = k
        self._error_rate = error_rate
        self._accuracy = accuracy
        self._seed = seed
        # custom Hashing flows into the internal CMS (the reference
        # TopK's only hash consumer is its CountMinSketch)
        self._hasher = hasher
        self._sketch = CountMinSketch.create(error_rate, accuracy, seed,
                                             hasher=hasher)
        self._heap = MinHeap()

    def add(self, element: str, count: int = 1) -> None:
        if count <= 0:
            raise ValueError(f"count must be > 0 (was {count})")
        self._sketch.update(element, count)
        frequency = self._sketch.count(element)
        if len(self._heap) < self._k or frequency >= self._heap.get(0)["frequency"]:
            idx = self._heap.index_of(element)
            if idx > -1:
                self._heap.remove(idx)
            self._heap.add({"value": element, "frequency": frequency})
            if len(self._heap) > self._k:
                self._heap.pop_min()

    def clear(self) -> None:
        self._sketch = CountMinSketch.create(self._error_rate, self._accuracy,
                                             self._seed,
                                             hasher=getattr(self, "_hasher", None))
        self._heap.clear()

    def values(self) -> list[dict]:
        res = []
        n = len(self._heap)
        for i in range(n - 1, -1, -1):
            e = self._heap.get(i)
            res.append({"value": e["value"], "frequency": e["frequency"], "rank": n - i})
        return res

    def __iter__(self):
        return iter(self.values())

    def save_as_json(self) -> dict:
        return {
            "_seed": export_bigint(self._seed),
            "_accuracy": self._accuracy,
            "_errorRate": self._error_rate,
            "_heap": self._heap.save_as_json(),
            "_k": self._k,
            "_sketch": self._sketch.save_as_json(),
        }

    @staticmethod
    def from_json(data: dict) -> "TopK":
        t = TopK(data["_k"], data["_errorRate"], data["_accuracy"],
                 import_bigint(data["_seed"]))
        t._heap = MinHeap.from_json(data["_heap"])
        t._sketch = CountMinSketch.from_json(data["_sketch"])
        return t
