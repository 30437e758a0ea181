"""Seen-set pruning: sharded stateful membership filters for
streaming/incremental dedup (north_star: "scalable/partitioned Bloom
filters for seen-set pruning").

Why raw actors (the documented exception, SURVEY.md §4.3): a seen-set
is a SHARED MUTABLE index — rows arriving in any batch, on any worker,
must observe insertions made by earlier batches. Ray Data's map tasks
are stateless and its actor pools don't pin partitions to actors, so
the index lives in P ``ShardActor``s, each owning the keys with
``xxh64(key) % P == shard`` (disjoint ownership is what makes the
NON-mergeable ScalableBloomFilter cascade safe to use —
scalable-bloom-filter.ts filter lists diverge and cannot be OR-merged,
SURVEY.md §2.2).

The ``mark_new`` map stage routes each batch's keys to their shards
(one ``check_and_add`` round-trip per (batch, shard) — vectorized
inside the actor, serialized per shard, so each key has exactly one
"first" arrival). False-positive rate ε of the filter translates to
dropping a genuinely-new key with probability ≤ ε — the standard
seen-set trade.

Shard state checkpoints via ``save_as_json`` (reference JSON layout)
and restores with ``load``, so a resumed job continues the same
seen-set (north_rule resumability).

Task-retry semantics (SURVEY.md §7 hard part f): actor state is NOT
rebuilt by Ray lineage. If a ``mark_new`` map task retries, its keys
are already inserted, so the retried batch reports them as seen —
first-arrival marking is at-most-once under retries (never
duplicated). Pipelines needing exactly-once winners use the
deterministic exact tier (min-id per key) instead; the seen-set is
the STREAMING prune, where at-most-once is the standard contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import DEFAULT_SEED
from ..state.counting_bloom import CountingBloomFilter
from ..state.cuckoo import CuckooFilter
from ..state.scalable_bloom import ScalableBloomFilter

_KINDS = ("scalable", "cuckoo", "counting")


def _new_filter(kind: str, capacity: int, error_rate: float, seed: int):
    if kind == "scalable":
        return ScalableBloomFilter(initial_size=max(capacity // 16, 128),
                                   initial_error_rate=error_rate, seed=seed)
    if kind == "cuckoo":
        return CuckooFilter.create(capacity, error_rate, seed=seed)
    if kind == "counting":
        return CountingBloomFilter.create(capacity, error_rate, seed=seed)
    raise ValueError(f"unknown seen-set kind {kind!r}; one of {_KINDS}")


class _Shard:
    """One shard's filter + vectorized check-and-add (plain object;
    wrapped in a Ray actor by SeenSet)."""

    def __init__(self, kind: str, capacity: int, error_rate: float,
                 seed: int):
        self._kind = kind
        self._filter = _new_filter(kind, capacity, error_rate, seed)
        self._n_added = 0

    def check_and_add(self, keys) -> np.ndarray:
        """For each key IN ORDER: True if new (and insert), False if
        already present. In-batch duplicates: only the first is new.
        *keys* is an Arrow string/binary array (preferred — zero-copy
        from the routing stage) or a list of bytes/str."""
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if not isinstance(keys, pa.Array):
            keys = pa.array([_as_bytes(k) for k in keys],
                            type=pa.binary())
        f = self._filter
        # first-occurrence mask without per-row Python objects
        codes = keys.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        first = np.zeros(len(keys), dtype=bool)
        first[np.unique(codes, return_index=True)[1]] = True
        # every filter kind has a vectorized probe
        present = np.asarray(f.has_many(keys), dtype=bool)
        is_new = (~present) & first
        if is_new.any():
            new_keys = keys.take(pa.array(np.flatnonzero(is_new)))
            if hasattr(f, "add_many"):
                f.add_many(new_keys)
            else:  # cuckoo: kick chains are inherently sequential
                for k in new_keys:
                    f.add(k.as_py())
        self._n_added += int(is_new.sum())
        return is_new

    def remove(self, keys: list[bytes]) -> int:
        if not hasattr(self._filter, "remove"):
            raise TypeError(f"{self._kind} filters do not support remove")
        n = 0
        for k in keys:
            n += bool(self._filter.remove(k))
            self._n_added -= 1
        return n

    def stats(self) -> dict:
        return {"kind": self._kind, "n_added": self._n_added}

    def save(self) -> dict:
        return self._filter.save_as_json()

    def load(self, state: dict) -> None:
        cls = type(self._filter)
        self._filter = cls.from_json(state)


class SeenSet:
    """P filter shards as Ray actors, keyed by ``xxh64(key) % P``.

    ``mark_new(ds, key_col)`` appends a boolean ``is_new`` column;
    ``save()``/``load()`` round-trip all shard states (JSON) for
    checkpoint/resume.
    """

    def __init__(self, num_shards: int = 8, kind: str = "scalable",
                 capacity: int = 1 << 16, error_rate: float = 0.001,
                 seed: int = DEFAULT_SEED):
        import ray

        self.num_shards = num_shards
        self.seed = seed
        actor = ray.remote(num_cpus=0.25)(_Shard)
        self._shards = [actor.remote(kind, capacity, error_rate, seed + i)
                        for i in range(num_shards)]

    def _route(self, keys_arr) -> np.ndarray:
        from ..hashing import xxh64_arrow

        return (xxh64_arrow(keys_arr, self.seed) % np.uint64(self.num_shards)) \
            .astype(np.int64)

    def mark_new_fn(self, key_col: str):
        """map_batches fn (captures the actor handles by value)."""
        shards = self._shards
        num = self.num_shards
        seed = self.seed

        def fn(batch: pa.Table) -> pa.Table:
            import ray

            from ..hashing import xxh64_arrow

            col = batch[key_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            shard_of = (xxh64_arrow(col, seed) % np.uint64(num)).astype(np.int64)
            if pa.types.is_string(col.type) or \
                    pa.types.is_large_string(col.type):
                col = col.cast(pa.binary())  # same utf-8 bytes
            refs, idxs = [], []
            for s in range(num):
                idx = np.flatnonzero(shard_of == s)
                if len(idx):  # zero-copy-ish Arrow slice per shard
                    refs.append(shards[s].check_and_add.remote(
                        col.take(pa.array(idx))))
                    idxs.append(idx)
            out = np.zeros(len(col), dtype=bool)
            for idx, res in zip(idxs, ray.get(refs)):
                out[idx] = res
            return batch.append_column("is_new", pa.array(out))

        return fn

    def mark_new(self, ds, key_col: str, batch_size: int = 32768):
        """Each map batch costs one check_and_add round-trip per shard
        (a ray.get barrier on the slowest shard), so larger batches
        amortize RPC rounds — the 32k default measured 1.39x the
        throughput of 4k with bit-identical results on the matched
        A/B in BASELINE.md; shrink it only if key payloads are
        huge."""
        return ds.map_batches(self.mark_new_fn(key_col),
                              batch_format="pyarrow",
                              batch_size=batch_size)

    def stats(self) -> list[dict]:
        import ray

        return ray.get([s.stats.remote() for s in self._shards])

    def save(self) -> list[dict]:
        import ray

        return ray.get([s.save.remote() for s in self._shards])

    def load(self, states: list[dict]) -> None:
        import ray

        ray.get([s.load.remote(st) for s, st in zip(self._shards, states)])

    def shutdown(self) -> None:
        import ray

        for s in self._shards:
            ray.kill(s)
        self._shards = []


def _as_bytes(k) -> bytes:
    return k.encode("utf-8") if isinstance(k, str) else bytes(k)
