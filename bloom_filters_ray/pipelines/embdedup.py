"""Embedding-cosine near-duplicate detection: signed-random-projection
LSH codes → Hamming band buckets → exact cosine verification →
connected components.

Same skeleton and shuffle discipline as the phash tier
(pipelines/imagededup.py): only (band_key, id) rows shuffle; the
verification side data is a broadcast (id, normalized-vector) lookup
below ``broadcast_limit`` and a two-sided hash join of the candidate
pairs against the (id, normalized-vec binary) table above it, so the
driver never materializes the embedding table. Final assignment is a
distributed map with a broadcast component map (bounded by the
verified-duplicate set, not the corpus).

Angular LSH property: cos(v, w) = c ⇒ each of the 64 projection bits
flips with probability arccos(c)/π, so near-dups (c ≥ 0.99 ⇒ p ≈
0.045) land within Hamming ≤ 7 of each other w.p. ≈ 1-3e-3 and the
8-band pigeonhole then guarantees a shared bucket — banding recall
~0.997+ before exact verification.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa

from ..hashing import DEFAULT_SEED
from ..stages.ann import (embedding_matrix, make_cosine_verifier,
                          make_projection_code_fn, normalize_rows)
from ..stages.neardup import UnionFind, dedupe_pairs_block, make_pair_emitter
from ..stages.simhash import make_code_band_rows
from ..util import ensure_hash_shuffle


@dataclasses.dataclass
class EmbDedupConfig:
    id_col: str = "emb_id"
    emb_col: str = "embedding"
    dim: int = 64
    n_bits: int = 64
    bits_per_band: int = 8
    threshold: float = 0.99          # exact-cosine verification
    max_bucket: int = 128
    seed: int = DEFAULT_SEED
    num_partitions: int | None = None
    # rows; above this, verification switches from the broadcast
    # normalized-matrix fast path to a two-sided hash join against the
    # (id, normalized-vec binary) table — no driver collect
    broadcast_limit: int = 2_000_000
    cc: str = "driver"  # "driver" union-find | "distributed" star contraction

    def partitions(self) -> int:
        if self.num_partitions is not None:
            return self.num_partitions
        from ..util import cluster_cpus

        return max(8, cluster_cpus())


def embedding_dedup_pipeline(ds, cfg: EmbDedupConfig | None = None):
    """(id, embedding) → (id, cluster_id) for ids in near-dup
    components; returns (assignments pyarrow.Table, stats)."""
    import ray

    cfg = cfg or EmbDedupConfig()
    ensure_hash_shuffle()

    ds = ds.select_columns([cfg.id_col, cfg.emb_col]).materialize()

    codes = ds.map_batches(
        make_projection_code_fn(cfg.dim, cfg.id_col, cfg.emb_col,
                                cfg.n_bits, cfg.seed),
        batch_format="pyarrow")
    bands = codes.map_batches(
        make_code_band_rows("simcode", cfg.id_col, cfg.bits_per_band, cfg.seed),
        batch_format="pyarrow")
    bands = bands.repartition(cfg.partitions(), keys=["band_key"])
    pairs = bands.map_batches(make_pair_emitter(cfg.id_col, cfg.max_bucket),
                              batch_format="pyarrow", batch_size=None)
    pairs = pairs.map_batches(dedupe_pairs_block, batch_format="pyarrow",
                              batch_size=None)

    n_input = ds.count()
    if n_input <= cfg.broadcast_limit:
        # broadcast normalized embedding lookup (small-side fast path)
        tbl = pa.concat_tables([b for b in ds.iter_batches(
            batch_size=1 << 16, batch_format="pyarrow")])
        En = normalize_rows(embedding_matrix(tbl[cfg.emb_col], cfg.dim))
        ref = ray.put((tbl[cfg.id_col].to_pylist(), En))
        edges = pairs.map_batches(
            make_cosine_verifier(ref, cfg.threshold, cfg.id_col),
            batch_format="pyarrow", batch_size=1 << 16)
    else:
        # scale path: two-sided hash join pairs ⋈ (id, normalized-vec
        # binary) — the driver never holds the embedding table
        from ..stages.ann import make_norm_vec_binary_fn, verify_cosine_block

        vecs = ds.map_batches(
            make_norm_vec_binary_fn(cfg.id_col, cfg.emb_col, cfg.dim),
            batch_format="pyarrow")
        j1 = pairs.join(vecs, "inner", cfg.partitions(),
                        on=("a",), right_on=(cfg.id_col,)) \
            .rename_columns({"vec": "vec_a"})
        j2 = j1.join(vecs, "inner", cfg.partitions(),
                     on=("b",), right_on=(cfg.id_col,)) \
            .rename_columns({"vec": "vec_b"})
        edges = j2.map_batches(
            lambda t: verify_cosine_block(t, cfg.threshold),
            batch_format="pyarrow")

    if cfg.cc == "distributed":
        # scale path: star-contraction labels + join assignment —
        # nothing driver-side. The embedding tier has no exact tier, so
        # every id is its own representative in the join shape
        # assign_clusters_distributed expects.
        from .dedup import DedupConfig, assign_clusters_distributed

        def as_exact(batch: pa.Table) -> pa.Table:
            ids = batch[cfg.id_col]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            return pa.Table.from_arrays(
                [ids, ids, pa.array(np.ones(len(ids), dtype=bool))],
                names=[cfg.id_col, "rep_id", "is_rep"])

        pseudo_exact = ds.select_columns([cfg.id_col]).map_batches(
            as_exact, batch_format="pyarrow")
        acfg = DedupConfig(id_col=cfg.id_col,
                           num_partitions=cfg.num_partitions)
        labelled, cc_stats = assign_clusters_distributed(
            pseudo_exact, edges.select_columns(["a", "b"]), acfg)
        assignments = labelled.select_columns([cfg.id_col, "cluster_id"])
        stats = {
            "n_input": n_input,
            "n_edges": -1,  # not counted on this path
            **cc_stats,
        }
        return assignments, stats

    # union-find state is bounded by the verified-duplicate set
    uf = UnionFind()
    n_edges = 0
    for batch in edges.select_columns(["a", "b"]).iter_batches(
            batch_size=1 << 16, batch_format="pyarrow"):
        n_edges += len(batch)
        uf.union_many(batch["a"], batch["b"])
    comp = uf.components()

    # distributed assignment: broadcast the (small) component map and
    # label the id column per batch — no driver-held embedding table
    from .dedup import _get_cached_map

    ref2 = ray.put((list(comp.keys()), list(comp.values())))

    def assign(batch: pa.Table) -> pa.Table:
        mp = _get_cached_map(ref2)
        ids = batch[cfg.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.Table.from_arrays(
            [ids, mp(ids)], names=[cfg.id_col, "cluster_id"])

    assignments = ds.select_columns([cfg.id_col]).map_batches(
        assign, batch_format="pyarrow")
    stats = {
        "n_input": n_input,
        "n_edges": n_edges,
        "n_dup_ids_in_components": len(comp),
        "n_components": len(set(comp.values())),
    }
    return assignments, stats
