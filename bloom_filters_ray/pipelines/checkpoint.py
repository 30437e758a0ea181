"""Checkpoint / resume / delta-verification utilities.

Three layers (north_rule: "resumable from checkpoint with
per-partition lineage + metrics"):

1. **Stage checkpoints** — ``pipelines.dedup._ckpt`` writes each
   materialized stage to partitioned parquet with a ``_SUCCESS``
   marker; a resumed run reads the parquet back instead of
   recomputing (exercised by tests/test_stateful.py).
2. **Sketch state checkpoints** — every sketch serializes via
   ``save_as_json`` (the reference JSON layout); actor shards
   (stages/seenset.py) save/load through the same path.
3. **IBLT delta verification** (the reference's own set-reconciliation
   workflow, invertible-bloom-lookup-tables.ts:152-283): build an
   IBLT ledger of the ids actually written and one of the ids
   expected, ``substract`` + ``decode`` to list exactly which rows
   are missing after a crash — O(d) work instead of a full rescan.

``IBLTAgg`` builds the ledger distributedly: per-block ``add`` of
every id, tree ``merge`` (cellwise XOR/+, state/iblt.py) — only
fixed-size cell arrays move, never row data.
"""

from __future__ import annotations

import json
import pickle

import pyarrow as pa

from ..hashing import DEFAULT_SEED
from ..state.iblt import InvertibleBloomFilter

try:
    from ray.data.aggregate import AggregateFnV2
except ImportError:  # pragma: no cover
    AggregateFnV2 = object  # type: ignore


class IBLTAgg(AggregateFnV2):
    """Distributed IBLT of a string column (differences budget d =
    max decodable set difference)."""

    def __init__(self, on: str, differences: int = 100, alpha: float = 2,
                 hash_count: int = 6, seed: int = DEFAULT_SEED,
                 name: str = "iblt"):
        self._on = on
        self._d = differences
        self._alpha = alpha
        self._hc = hash_count
        self._seed = seed
        super().__init__(name, lambda: None, on=on, ignore_nulls=True)

    def _new(self) -> InvertibleBloomFilter:
        return InvertibleBloomFilter(self._d, self._alpha, self._hc, self._seed)

    def aggregate_block(self, block):
        from ..stages.sketch_aggs import _column

        f = self._new()
        f.add_many(_column(block, self._on))  # vectorized digest path
        return f

    def combine(self, cur, new):
        if cur is None:
            return new
        if new is None:
            return cur
        cur.merge(new)
        return cur

    def finalize(self, acc):
        return pickle.dumps(acc if acc is not None else self._new())


def build_iblt(ds, on: str, differences: int = 100,
               seed: int = DEFAULT_SEED) -> InvertibleBloomFilter:
    return pickle.loads(ds.aggregate(IBLTAgg(on=on, differences=differences,
                                             seed=seed))["iblt"])


def delta_verify(expected_ds, written_ds, on: str, differences: int = 100,
                 seed: int = DEFAULT_SEED) -> dict:
    """Compare expected vs written id sets in O(d): returns the decode
    dict {success, additional (=written but unexpected), missing
    (=expected but unwritten)}."""
    expected = build_iblt(expected_ds, on, differences, seed)
    written = build_iblt(written_ds, on, differences, seed)
    return written.substract(expected).decode()


def save_sketch_json(path: str, sketch) -> None:
    with open(path, "w") as f:
        json.dump(sketch.save_as_json(), f)


def load_sketch_json(path: str, cls):
    with open(path) as f:
        return cls.from_json(json.load(f))
