"""Distributed connected components over an edge Dataset:
alternating large-star / small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public
algorithm), expressed as keyed repartitions + whole-block vectorized
group processing.

This is the scale path for cluster labeling (SURVEY.md §2.7): the
driver union-find (stages/neardup.py) holds one entry per id touched
by an edge, which is fine while the duplicate set fits on the driver;
star contraction keeps everything as (u, v) edge rows with per-round
shuffles and converges in O(log n) rounds to edges (node, root) where
root = min id of the component — the same deterministic labels the
union-find produces. Prefer ``DedupConfig(cc="distributed")`` whenever
the verified edge set may outgrow one driver.

Rounds:
- large-star: group BOTH orientations by u; m = min(N(u) ∪ {u});
  emit (v, m) for v ∈ N(u) with v > u.
- small-star: group the v<u orientation by u; m = min(N(u) ∪ {u});
  emit (v, m) for v ∈ N(u) ∪ {u}, v ≠ m.

Vectorization: ids are dictionary-encoded to int64 codes PER BLOCK
(sorted-rank codes, so code order == value order within the block);
group mins are ``np.minimum.reduceat`` over the sorted code array and
emission is boolean masking — no Python loop touches rows. Codes
decode back to values on emit, so blocks stay self-contained and no
global dictionary (itself a shuffle) is needed.

Convergence test: the (count, xor-of-pair-hashes) fingerprint of the
edge set is stable across a round — an order-insensitive O(1)-state
``AggregateFnV2``, so no driver materialization of edges anywhere.
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import xxh64_arrow, xxh64_u64

try:  # Ray is optional at import time (pure-library use)
    from ray.data.aggregate import AggregateFnV2
except ImportError:  # pragma: no cover
    AggregateFnV2 = object  # type: ignore


def _combine(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _no_nulls(col: pa.Array, where: str) -> pa.Array:
    """Edge columns must be null-free: a null integer id silently
    becomes NaN→undefined int64 downstream (corrupting fingerprints
    and min-id ranks). Fail loudly instead."""
    if col.null_count:
        raise ValueError(
            f"{where}: edge id column contains {col.null_count} null(s); "
            "connected-components edges must be null-free")
    return col


def _id_hash(col: pa.Array, seed: int) -> np.ndarray:
    """Per-element hash of an id column — string/binary via the Arrow
    buffer path, integer ids (e.g. emb_id) via the word kernel."""
    _no_nulls(col, "_id_hash")
    if pa.types.is_integer(col.type):
        w = col.to_numpy(zero_copy_only=False).astype(np.int64) \
            .view(np.uint64)
        return xxh64_u64(w, seed)
    return xxh64_arrow(col, seed)


def _pair_fingerprint(batch: pa.Table) -> tuple[int, int]:
    a = _combine(batch["a"])
    b = _combine(batch["b"])
    ha = _id_hash(a, 11)
    hb = _id_hash(b, 23)
    mixed = ha * np.uint64(0x9E3779B185EBCA87) ^ hb
    x = np.bitwise_xor.reduce(mixed) if len(mixed) else np.uint64(0)
    # two's-complement signed view: keeps the partial-state tuple
    # inside int64 so the shuffle stores it as a native Arrow block
    # (an unsigned value >= 2^63 overflows Arrow's int inference and
    # forces a pickled-object fallback per state block). The signed
    # view is an XOR-preserving bijection, so combine() is unchanged.
    return len(batch), int(x.astype(np.int64))


class EdgeFingerprintAgg(AggregateFnV2):
    """Order-insensitive (count, xor-of-pair-hashes) fingerprint of an
    (a, b) edge Dataset: O(1) state per block, tree combine — the
    convergence probe runs without streaming edges to the driver."""

    def __init__(self, name: str = "fp"):
        super().__init__(name, lambda: None, on=None, ignore_nulls=False)

    def aggregate_block(self, block):
        if not isinstance(block, pa.Table):
            block = pa.table(block)
        return _pair_fingerprint(block)

    def combine(self, cur, new):
        if cur is None:
            return new
        if new is None:
            return cur
        return (cur[0] + new[0], cur[1] ^ new[1])

    def finalize(self, acc):
        return pickle.dumps(acc if acc is not None else (0, 0))


def edge_fingerprint(edges_ds) -> tuple[int, int]:
    res = edges_ds.aggregate(EdgeFingerprintAgg())
    val = res.get("fp") if res else None
    return pickle.loads(val) if val is not None else (0, 0)


def _encode_pair(u: pa.Array, v: pa.Array):
    """Block-local dictionary encoding of two same-typed id columns →
    (ucodes, vcodes, sorted_dictionary). Codes are sorted ranks, so
    ``code_x < code_y  ⟺  x < y`` within the block — min-id semantics
    survive the encoding. Integer ids pass through (dictionary None)."""
    _no_nulls(u, "_encode_ids")
    _no_nulls(v, "_encode_ids")
    if pa.types.is_integer(u.type):
        return (u.to_numpy(zero_copy_only=False).astype(np.int64),
                v.to_numpy(zero_copy_only=False).astype(np.int64), None)
    combined = pa.concat_arrays([u, v])
    denc = combined.dictionary_encode()
    codes = np.asarray(denc.indices).astype(np.int64)
    dvals = denc.dictionary
    sort_idx = np.asarray(pc.array_sort_indices(dvals)).astype(np.int64)
    rank = np.empty(len(dvals), dtype=np.int64)
    rank[sort_idx] = np.arange(len(dvals), dtype=np.int64)
    rcodes = rank[codes]
    n = len(u)
    return rcodes[:n], rcodes[n:], dvals.take(pa.array(sort_idx))


def _decode(svals, codes: np.ndarray) -> pa.Array:
    if svals is None:
        return pa.array(codes)
    return svals.take(pa.array(codes))


def _star_block(mode: str):
    """Whole-block fn over rows (u, v) hash-partitioned by u — fully
    vectorized: sorted-rank codes, reduceat group mins, mask emission."""

    def fn(batch: pa.Table) -> pa.Table:
        u = _combine(batch["u"])
        v = _combine(batch["v"])
        n = len(u)
        if n == 0:
            return pa.Table.from_arrays([u, v], names=["a", "b"])
        ucodes, vcodes, svals = _encode_pair(u, v)
        order = np.argsort(ucodes, kind="stable")
        us, vs = ucodes[order], vcodes[order]
        first = np.ones(n, dtype=bool)
        first[1:] = us[1:] != us[:-1]
        starts = np.flatnonzero(first)
        gid = np.cumsum(first) - 1
        u_g = us[starts]
        m_g = np.minimum(np.minimum.reduceat(vs, starts), u_g)
        m_row = m_g[gid]
        if mode == "large":
            keep = vs > us
            a, b = vs[keep], m_row[keep]
        else:  # small-star: neighbors all < u by construction
            keep = vs != m_row
            extra = u_g != m_g
            a = np.concatenate([vs[keep], u_g[extra]])
            b = np.concatenate([m_row[keep], m_g[extra]])
        mask = a != b  # self-loops
        a, b = a[mask], b[mask]
        if len(a):  # block-local dedupe
            o = np.lexsort((b, a))
            a, b = a[o], b[o]
            new = np.ones(len(a), dtype=bool)
            new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            a, b = a[new], b[new]
        return pa.Table.from_arrays(
            [_decode(svals, a), _decode(svals, b)], names=["a", "b"])

    return fn


def _directed(both: bool):
    """(a, b) edges → (u, v) rows: both orientations (large-star) or
    only the larger-endpoint orientation (small-star). Arrow kernels
    only — no Python per-row work."""

    def fn(batch: pa.Table) -> pa.Table:
        a = _combine(batch["a"])
        b = _combine(batch["b"])
        if both:
            u = pa.concat_arrays([a, b])
            v = pa.concat_arrays([b, a])
        else:
            swap = pc.greater(b, a)  # orient so u = max endpoint
            u = pc.if_else(swap, b, a)
            v = pc.if_else(swap, a, b)
        return pa.Table.from_arrays([u, v], names=["u", "v"])

    return fn


def connected_components_distributed(edges_ds, num_partitions: int = 8,
                                     max_rounds: int = 32):
    """Edge Dataset (a, b) → Dataset (image_id, cluster_id) for every
    node in an edge, cluster_id = min id of the component."""
    edges = edges_ds.select_columns(["a", "b"]).materialize()
    prev_fp = None
    for _ in range(max_rounds):
        # large-star
        d = edges.map_batches(_directed(both=True), batch_format="pyarrow")
        d = d.repartition(num_partitions, keys=["u"])
        edges = d.map_batches(_star_block("large"), batch_format="pyarrow",
                              batch_size=None)
        # small-star
        d = edges.map_batches(_directed(both=False), batch_format="pyarrow")
        d = d.repartition(num_partitions, keys=["u"])
        edges = d.map_batches(_star_block("small"), batch_format="pyarrow",
                              batch_size=None).materialize()
        fp = edge_fingerprint(edges)
        if fp == prev_fp:
            break
        prev_fp = fp
    # converged: every edge is (node, root); emit roots as their own
    # cluster members too
    members = edges.map_batches(
        lambda t: pa.Table.from_arrays([t["a"], t["b"]],
                                       names=["image_id", "cluster_id"]),
        batch_format="pyarrow")
    roots = edges.select_columns(["b"]) \
        .map_batches(lambda t: pa.Table.from_arrays(
            [t["b"], t["b"]], names=["image_id", "cluster_id"]),
            batch_format="pyarrow")
    out = members.union(roots)
    # dedupe (roots repeat): keyed repartition + vectorized block dedupe
    out = out.repartition(num_partitions, keys=["image_id"])

    def dedupe(batch: pa.Table) -> pa.Table:
        ids = _combine(batch["image_id"])
        cl = _combine(batch["cluster_id"])
        n = len(ids)
        if n == 0:
            return batch
        icodes, ccodes, svals = _encode_pair(ids, cl)
        o = np.lexsort((ccodes, icodes))
        i_s, c_s = icodes[o], ccodes[o]
        new = np.ones(n, dtype=bool)
        new[1:] = i_s[1:] != i_s[:-1]
        return pa.Table.from_arrays(
            [_decode(svals, i_s[new]), _decode(svals, c_s[new])],
            names=["image_id", "cluster_id"])

    return out.map_batches(dedupe, batch_format="pyarrow", batch_size=None)
