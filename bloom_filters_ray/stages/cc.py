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
union-find produces.

Rounds:
- large-star: group BOTH orientations by u; m = min(N(u) ∪ {u});
  emit (v, m) for v ∈ N(u) with v > u.
- small-star: group the v<u orientation by u; m = min(N(u) ∪ {u});
  emit (v, m) for v ∈ N(u) ∪ {u}, v ≠ m.

Convergence test: the (count, xor-of-pair-hashes) fingerprint of the
edge set is stable across a round — an order-insensitive O(1)-state
aggregate, no driver materialization of edges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import xxh64_arrow


def _pair_fingerprint(batch: pa.Table) -> tuple[int, int]:
    a = batch["a"]
    b = batch["b"]
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    ha = xxh64_arrow(a, 11)
    hb = xxh64_arrow(b, 23)
    mixed = ha * np.uint64(0x9E3779B185EBCA87) ^ hb
    x = np.bitwise_xor.reduce(mixed) if len(mixed) else np.uint64(0)
    return len(batch), int(x)


def _star_block(mode: str):
    """Whole-block fn over rows (u, v) hash-partitioned by u."""

    def fn(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["u"].to_pylist(), dtype=object)
        v = np.asarray(batch["v"].to_pylist(), dtype=object)
        if len(u) == 0:
            t = pa.array([], type=pa.string())
            return pa.Table.from_arrays([t, t], names=["a", "b"])
        order = np.argsort(u, kind="stable")
        us, vs = u[order], v[order]
        bounds = np.flatnonzero(us[1:] != us[:-1]) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(us)]))
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            uu = us[s]
            nbrs = vs[s:e]
            m = min(nbrs.min(), uu)
            if mode == "large":
                big = nbrs[nbrs > uu]
                out_a.append(big)
                out_b.append(np.full(len(big), m, dtype=object))
            else:  # small-star: neighbors all < u by construction
                keep = nbrs[nbrs != m]
                out_a.append(keep)
                out_b.append(np.full(len(keep), m, dtype=object))
                if uu != m:
                    out_a.append(np.array([uu], dtype=object))
                    out_b.append(np.array([m], dtype=object))
        a = np.concatenate(out_a) if out_a else np.array([], dtype=object)
        b = np.concatenate(out_b) if out_b else np.array([], dtype=object)
        # drop self-loops and block-local duplicates
        if len(a):
            mask = a != b
            a, b = a[mask], b[mask]
        if len(a):
            order = np.lexsort((b, a))
            a, b = a[order], b[order]
            new = np.ones(len(a), dtype=bool)
            new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            a, b = a[new], b[new]
        return pa.Table.from_arrays(
            [pa.array(list(a), type=pa.string()),
             pa.array(list(b), type=pa.string())], names=["a", "b"])

    return fn


def _directed(both: bool):
    """(a, b) edges → (u, v) rows: both orientations (large-star) or
    only the larger-endpoint orientation (small-star)."""

    def fn(batch: pa.Table) -> pa.Table:
        a = batch["a"]
        b = batch["b"]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        if both:
            u = pa.concat_arrays([a, b])
            v = pa.concat_arrays([b, a])
        else:
            an = np.asarray(a.to_pylist(), dtype=object)
            bn = np.asarray(b.to_pylist(), dtype=object)
            swap = bn > an  # orient so u = max endpoint, v = min
            uu = np.where(swap, bn, an)
            vv = np.where(swap, an, bn)
            u = pa.array(list(uu), type=pa.string())
            v = pa.array(list(vv), type=pa.string())
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
        n, x = 0, 0
        for batch in edges.iter_batches(batch_size=1 << 16,
                                        batch_format="pyarrow"):
            c, h = _pair_fingerprint(batch)
            n += c
            x ^= h
        fp = (n, x)
        if fp == prev_fp:
            break
        prev_fp = fp
    # converged: every edge is (node, root); emit roots as their own
    # cluster members too
    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch["a"], batch["b"]], names=["image_id", "cluster_id"])

    members = edges.map_batches(finalize, batch_format="pyarrow")
    roots = edges.select_columns(["b"]) \
        .map_batches(lambda t: pa.Table.from_arrays(
            [t["b"], t["b"]], names=["image_id", "cluster_id"]),
            batch_format="pyarrow")
    out = members.union(roots)
    # dedupe (roots repeat): keyed repartition + block dedupe
    out = out.repartition(num_partitions, keys=["image_id"])

    def dedupe(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["image_id"].to_pylist(), dtype=object)
        cl = np.asarray(batch["cluster_id"].to_pylist(), dtype=object)
        order = np.lexsort((cl, ids))
        ids, cl = ids[order], cl[order]
        new = np.ones(len(ids), dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        return pa.Table.from_arrays(
            [pa.array(list(ids[new]), type=pa.string()),
             pa.array(list(cl[new]), type=pa.string())],
            names=["image_id", "cluster_id"])

    return out.map_batches(dedupe, batch_format="pyarrow", batch_size=None)
