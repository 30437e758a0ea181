"""Distributed sketch construction as Ray Data aggregations.

Each sketch with a mergeable partial (SURVEY.md §2.4/§4.1 — CMS
``merge`` = elementwise +, HLL ``merge`` = register max, Bloom-family
bit arrays = bitwise OR) becomes an ``AggregateFnV2``: per-block
vectorized build (``aggregate_block``), tree ``combine`` inside Ray
Data's aggregate operator, tiny final artifact on the driver. This is
the canonical partial/final pattern — no shuffle of row data, only
fixed-size sketch partials move.

Usage::

    cms = ds.aggregate(CMSAgg(on="caption", error_rate=1e-4))["cms"]
    est = cms.count("some caption")
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

from ..hashing import DEFAULT_SEED
from ..state.bloom import BloomFilter
from ..state.cms import CountMinSketch
from ..state.hyperloglog import HyperLogLog

try:  # Ray is optional at import time (pure-library use)
    from ray.data.aggregate import AggregateFnV2
except ImportError:  # pragma: no cover
    AggregateFnV2 = object  # type: ignore


def _column(block, name: str) -> pa.Array:
    """Extract *name* from an Arrow or pandas block as a pyarrow Array."""
    if isinstance(block, pa.Table):
        col = block[name]
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pa.array(block[name])


class CMSAgg(AggregateFnV2):
    """Count-Min Sketch of a string column (reference merge semantics:
    count-min-sketch.ts:168-183). Finalized value: a CountMinSketch."""

    def __init__(self, on: str, error_rate: float = 1e-4,
                 accuracy: float = 0.999, seed: int = DEFAULT_SEED,
                 name: str = "cms"):
        self._on = on
        self._error_rate = error_rate
        self._accuracy = accuracy
        self._seed = seed
        super().__init__(name, lambda: None, on=on, ignore_nulls=True)

    def _new(self) -> CountMinSketch:
        return CountMinSketch.create(self._error_rate, self._accuracy, self._seed)

    def aggregate_block(self, block):
        sk = self._new()
        sk.update_many(_column(block, self._on))
        return sk

    def combine(self, cur, new):
        if cur is None:
            return new
        if new is None:
            return cur
        cur.merge(new)
        return cur

    def finalize(self, acc):
        return pickle.dumps(acc if acc is not None else self._new())


class HLLAgg(AggregateFnV2):
    """HyperLogLog of a string column (register max merge,
    hyperloglog.ts:175-189). Finalized value: a HyperLogLog."""

    def __init__(self, on: str, nb_registers: int = 4096,
                 seed: int = DEFAULT_SEED, mode: str = "standard",
                 name: str = "hll"):
        self._on = on
        self._m = nb_registers
        self._seed = seed
        self._mode = mode  # engine default: textbook estimator (see state/hyperloglog.py)
        super().__init__(name, lambda: None, on=on, ignore_nulls=True)

    def _new(self) -> HyperLogLog:
        return HyperLogLog(self._m, self._seed, self._mode)

    def aggregate_block(self, block):
        sk = self._new()
        sk.update_many(_column(block, self._on))
        return sk

    def combine(self, cur, new):
        if cur is None:
            return new
        if new is None:
            return cur
        return cur.merge(new)  # HLL.merge returns a new merged sketch

    def finalize(self, acc):
        return pickle.dumps(acc if acc is not None else self._new())


class BloomAgg(AggregateFnV2):
    """Fixed-config Bloom filter of a string column, built by per-block
    add + bitwise-OR combine (valid because bit positions depend only on
    the element and the shared (size, k, seed) — bloom-filter.ts:113-123).

    Pass explicit (size, nb_hashes) or (capacity, error_rate) to derive
    them; the config must be identical across all partials, so it is
    fixed up front, *not* from per-block counts.
    """

    def __init__(self, on: str, capacity: int, error_rate: float = 0.01,
                 seed: int = DEFAULT_SEED, name: str = "bloom"):
        self._on = on
        self._capacity = capacity
        self._error_rate = error_rate
        self._seed = seed
        super().__init__(name, lambda: None, on=on, ignore_nulls=True)

    def _new(self) -> BloomFilter:
        return BloomFilter.create(self._capacity, self._error_rate, self._seed)

    def aggregate_block(self, block):
        f = self._new()
        f.add_many(_column(block, self._on))
        return f

    def combine(self, cur, new):
        if cur is None:
            return new
        if new is None:
            return cur
        cur.union_inplace(new)
        return cur

    def finalize(self, acc):
        return pickle.dumps(acc if acc is not None else self._new())


class TopKAgg(AggregateFnV2):
    """Distributed TopK with the reference's CMS+heap semantics
    (topk.ts:138-262): frequencies are CMS estimates (count >= true),
    the candidate heavy-hitter set is the union of per-block exact
    top candidates. Finalized value: list of {value, frequency, rank}
    descending — pickled, like the other sketch aggregates.

    Exactness note: a key can only miss the final top-k if it failed to
    reach any block's local candidate cap — keep ``candidates_per_block
    >> k`` (default 8k) so heavy keys always surface.
    """

    def __init__(self, on: str, k: int = 10, error_rate: float = 1e-4,
                 accuracy: float = 0.999, candidates_per_block: int | None = None,
                 seed: int = DEFAULT_SEED, name: str = "topk"):
        self._on = on
        self._k = k
        self._cand = candidates_per_block or max(8 * k, 64)
        self._error_rate = error_rate
        self._accuracy = accuracy
        self._seed = seed
        super().__init__(name, lambda: None, on=on, ignore_nulls=True)

    def _new_cms(self) -> CountMinSketch:
        return CountMinSketch.create(self._error_rate, self._accuracy, self._seed)

    def aggregate_block(self, block):
        col = _column(block, self._on)
        cms = self._new_cms()
        cms.update_many(col)
        import pyarrow.compute as pc

        vc = pc.value_counts(col)
        vals = vc.field("values").to_pylist()
        counts = np.asarray(vc.field("counts"))
        top = np.argsort(-counts, kind="stable")[: self._cand]
        cand = {vals[i]: int(counts[i]) for i in top}
        return (cms, cand)

    def combine(self, cur, new):
        if cur is None:
            return new
        if new is None:
            return cur
        cms, cand = cur
        cms2, cand2 = new
        cms.merge(cms2)
        for v, c in cand2.items():
            cand[v] = cand.get(v, 0) + c
        if len(cand) > 4 * self._cand:  # cap combined candidate set
            keep = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))
            cand = dict(keep[: 2 * self._cand])
        return (cms, cand)

    def finalize(self, acc):
        if acc is None:
            return pickle.dumps([])
        cms, cand = acc
        est = [(v, int(cms.count(v))) for v in cand]
        est.sort(key=lambda kv: (-kv[1], kv[0]))
        out = [{"value": v, "frequency": f, "rank": i + 1}
               for i, (v, f) in enumerate(est[: self._k])]
        return pickle.dumps(out)


class KLLAgg(AggregateFnV2):
    """KLL quantile sketch of a numeric column (state/kll.py — Karnin/
    Lang/Liberty FOCS'16): per-block vectorized build, level-concat
    merge in combine, fixed-size state on the wire. The sketch-partial
    complement of the exact-histogram path in stages/quantiles.py for
    UNBOUNDED/float domains. Finalized value: a pickled KLLSketch."""

    def __init__(self, on: str, k: int = 200, seed: int = DEFAULT_SEED,
                 name: str = "kll"):
        self._on = on
        self._k = k
        self._seed = seed
        super().__init__(name, lambda: None, on=on, ignore_nulls=True)

    def _new(self):
        from ..state.kll import KLLSketch

        return KLLSketch(self._k, self._seed)

    def aggregate_block(self, block):
        col = _column(block, self._on)
        return self._new().update_many(
            col.to_numpy(zero_copy_only=False).astype(np.float64))

    def combine(self, cur, new):
        if cur is None:
            return new
        if new is None:
            return cur
        return cur.merge(new)

    def finalize(self, acc):
        return pickle.dumps(acc if acc is not None else self._new())


def build_kll(ds, on: str, k: int = 200, seed: int = DEFAULT_SEED):
    """Distributed KLL build → the merged KLLSketch."""
    return pickle.loads(ds.aggregate(KLLAgg(on=on, k=k, seed=seed))["kll"])


def build_topk(ds, on: str, k: int = 10, error_rate: float = 1e-4,
               accuracy: float = 0.999,
               candidates_per_block: int | None = None,
               seed: int = DEFAULT_SEED) -> list[dict]:
    """NOTE the reference's accuracy→depth formula is
    ``rows = ceil(ln(1/accuracy))`` (count-min-sketch.ts create), so
    the 0.999 default yields a ONE-row CMS — pass ``accuracy=e^-d``
    for a d-row sketch when estimates must be (near-)exact."""
    return pickle.loads(ds.aggregate(TopKAgg(
        on=on, k=k, error_rate=error_rate, accuracy=accuracy,
        candidates_per_block=candidates_per_block, seed=seed))["topk"])


def build_bloom(ds, on: str, capacity: int, error_rate: float = 0.01,
                seed: int = DEFAULT_SEED) -> BloomFilter:
    return pickle.loads(ds.aggregate(BloomAgg(
        on=on, capacity=capacity, error_rate=error_rate, seed=seed))["bloom"])


def build_cms(ds, on: str, error_rate: float = 1e-4, accuracy: float = 0.999,
              seed: int = DEFAULT_SEED) -> CountMinSketch:
    return pickle.loads(ds.aggregate(CMSAgg(
        on=on, error_rate=error_rate, accuracy=accuracy, seed=seed))["cms"])


def build_hll(ds, on: str, nb_registers: int = 4096,
              seed: int = DEFAULT_SEED, mode: str = "standard") -> HyperLogLog:
    return pickle.loads(ds.aggregate(HLLAgg(
        on=on, nb_registers=nb_registers, seed=seed, mode=mode))["hll"])


def make_bloom_probe_fn(filter_ref, on: str, out_col: str = "present"):
    """map_batches fn probing a broadcast BloomFilter (``ray.put`` once;
    fetched zero-copy-ish per worker): adds a boolean *out_col*."""
    def fn(batch: pa.Table) -> pa.Table:
        f = _plain_fetch(filter_ref)
        col = batch[on]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return batch.append_column(out_col, pa.array(f.has_many(col)))

    return fn


from collections import OrderedDict

_REF_CACHE: OrderedDict = OrderedDict()


def _plain_fetch(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _REF_CACHE:
        import ray

        # bounded multi-slot LRU: stages that fetch SEVERAL broadcast
        # refs per batch (PQ: codebooks + queries [+ rotation]) must not
        # evict each other every call; evict only the coldest slot so
        # the hot refs of the current stage stay pinned
        while len(_REF_CACHE) >= 16:
            _REF_CACHE.popitem(last=False)
        _REF_CACHE[key] = ray.get(ref)
    else:
        _REF_CACHE.move_to_end(key)
    return _REF_CACHE[key]
