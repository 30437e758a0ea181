"""Embedding-cosine near-duplicate detection: signed-random-projection
LSH codes → Hamming band buckets → exact cosine verification →
connected components.

Same skeleton and shuffle discipline as the phash tier
(pipelines/imagededup.py): only (band_key, id) rows shuffle; the
verification side data is a broadcast (id, normalized-vector) lookup
(scale path: hash join against the embedding table instead).

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

    # broadcast normalized embedding lookup (sandbox-scale side data)
    tbl = pa.concat_tables([b for b in ds.iter_batches(
        batch_size=1 << 16, batch_format="pyarrow")])
    En = normalize_rows(embedding_matrix(tbl[cfg.emb_col], cfg.dim))
    ref = ray.put((tbl[cfg.id_col].to_pylist(), En))

    edges = pairs.map_batches(
        make_cosine_verifier(ref, cfg.threshold, cfg.id_col),
        batch_format="pyarrow", batch_size=1 << 16)

    uf = UnionFind()
    n_edges = 0
    for batch in edges.select_columns(["a", "b"]).iter_batches(
            batch_size=1 << 16, batch_format="pyarrow"):
        n_edges += len(batch)
        for x, y in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            uf.union(x, y)
    comp = uf.components()

    ids = tbl[cfg.id_col].to_pylist()
    cluster = [comp.get(i, i) for i in ids]
    assignments = pa.table({
        cfg.id_col: tbl[cfg.id_col],
        "cluster_id": pa.array(cluster, type=tbl[cfg.id_col].type),
    })
    stats = {
        "n_input": len(ids),
        "n_edges": n_edges,
        "n_dup_ids_in_components": len(comp),
        "n_components": len(set(comp.values())),
    }
    return assignments, stats
