"""Image-side near-duplicate detection: exact byte-dedup tier +
phash/SimHash Hamming-band clustering.

    input (image_id, bytes, phash)
      │ map: content_hash = xxh64(bytes); DROP bytes   ← bytes never
      ▼                                                  enter a shuffle
    exact tier (keyed shuffle on content_hash, min-id rep)
      │ reps (image_id, phash)
      ▼
    Hamming band rows (B chunks of the 64-bit code) ──► keyed shuffle
      ▼ band buckets → candidate pairs (capped) → block dedupe
    Hamming verification (broadcast id→code) → edges (dist ≤ t)
      ▼
    driver union-find → cluster_id = min member id

Pigeonhole guarantee: with B = 64/bits_per_band bands, every pair
within Hamming distance ≤ B-1 shares a band bucket, so candidate
recall is exactly 1.0 for the verification threshold t ≤ B-1 (default
t=4 < B=8). The scale caveats and shuffle discipline follow the
caption pipeline (pipelines/dedup.py); only (band_key, id) rows and
(id, phash int64) move.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa

from ..hashing import DEFAULT_SEED, xxh64_arrow
from ..stages.neardup import UnionFind, make_rep_block
from ..stages.simhash import (make_bucket_hamming_emitter,
                              make_code_band_rows_with_code)
from ..util import ensure_hash_shuffle


@dataclasses.dataclass
class ImageDedupConfig:
    id_col: str = "image_id"
    bytes_col: str = "bytes"
    code_col: str = "phash"
    bits_per_band: int = 8           # B = 64/bits bands; recall=1 for t <= B-1
    max_distance: int = 4            # Hamming verification threshold
    max_bucket: int = 128
    seed: int = DEFAULT_SEED
    num_partitions: int | None = None
    cc: str = "driver"  # "driver" union-find | "distributed" star contraction

    def partitions(self) -> int:
        if self.num_partitions is not None:
            return self.num_partitions
        from ..util import cluster_cpus

        return max(8, cluster_cpus())


def content_hash_project(cfg: ImageDedupConfig):
    """Hash the payload bytes and drop them before any shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[cfg.bytes_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = xxh64_arrow(col, cfg.seed).astype(np.int64)
        return pa.Table.from_arrays(
            [batch[cfg.id_col], pa.array(h), batch[cfg.code_col]],
            names=[cfg.id_col, "content_hash", cfg.code_col])

    return fn


def image_exact_tier(ds, cfg: ImageDedupConfig):
    """(id, bytes, phash) → (id, content_hash, phash, rep_id, is_rep)."""
    ds = ds.map_batches(content_hash_project(cfg), batch_format="pyarrow")
    ds = ds.repartition(cfg.partitions(), keys=["content_hash"])
    return ds.map_batches(make_rep_block(cfg.id_col, "content_hash"),
                          batch_format="pyarrow", batch_size=None)


def image_edges(reps_ds, cfg: ImageDedupConfig):
    """reps → verified Hamming edges: codes travel with the band rows,
    verification happens inside each bucket (stages/simhash.py)."""
    bands = reps_ds.map_batches(
        make_code_band_rows_with_code(cfg.code_col, cfg.id_col,
                                      cfg.bits_per_band, cfg.seed),
        batch_format="pyarrow")
    bands = bands.repartition(cfg.partitions(), keys=["band_key"])
    return bands.map_batches(
        make_bucket_hamming_emitter(cfg.id_col, cfg.max_distance),
        batch_format="pyarrow", batch_size=None)


def image_dedup_pipeline(ds, cfg: ImageDedupConfig | None = None):
    """Full image-tier pipeline; returns (assignments_ds, stats).

    *ds* needs columns [id_col, bytes_col, code_col]."""
    import ray

    cfg = cfg or ImageDedupConfig()
    ensure_hash_shuffle()

    exact = image_exact_tier(ds, cfg).materialize()
    n_input = exact.count()
    reps = exact.filter(expr="is_rep == True") \
        .select_columns([cfg.id_col, cfg.code_col]).materialize()

    edges = image_edges(reps, cfg)

    if cfg.cc == "distributed":
        from .dedup import DedupConfig, assign_clusters_distributed

        acfg = DedupConfig(id_col=cfg.id_col,
                           num_partitions=cfg.num_partitions)
        assignments, cc_stats = assign_clusters_distributed(
            exact, edges.select_columns(["a", "b"]), acfg)
        stats = {
            "n_input": n_input,
            "n_unique_payloads": reps.count(),
            "n_edges": -1,  # not counted on this path
            **cc_stats,
        }
        return assignments, stats

    uf = UnionFind()
    n_edges = 0
    for batch in edges.select_columns(["a", "b"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        n_edges += len(batch)
        uf.union_many(batch["a"], batch["b"])
    comp = uf.components()

    from .dedup import DedupConfig, assign_clusters

    acfg = DedupConfig(id_col=cfg.id_col)
    assignments = assign_clusters(exact, comp, acfg)
    stats = {
        "n_input": n_input,
        "n_unique_payloads": reps.count(),
        "n_edges": n_edges,
        "n_dup_ids_in_components": len(comp),
        "n_components": len(set(comp.values())),
    }
    return assignments, stats
