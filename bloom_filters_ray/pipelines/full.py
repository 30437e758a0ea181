"""The north-star flagship: combined image+caption near-duplicate
detection and clustering over (image_id, bytes, w, h, fmt, caption,
phash) rows (BASELINE.json:input_hint).

    input ─ map: content_hash=xxh64(bytes), caption_hash=xxh64(caption),
            exact_key=mix(content_hash, caption_hash); DROP bytes
      ▼
    exact tier: keyed shuffle on exact_key → min-id rep per identical
                (payload, caption) pair
      ▼ reps (filtered inline from the materialized exact tier)
    signature stage: shingle → MinHash sigs, phash carried through
      ▼ sigs (image_id, sig, phash) — ONE materialization; caption
      │       verification side data is broadcast below
      │       broadcast_limit, a two-sided hash join above it
      ├─ caption tier: LSH band shuffle → pairs → positional-Jaccard
      │     verify ≥ τ → edges
      └─ image tier: phash Hamming bands → band shuffle → pairs →
            Hamming verify ≤ t → edges
      ▼
    edges = caption ∪ image (single consuming execution) → union-find
      ▼
    assignment map over the exact tier (broadcast component map)

Scale discipline (SURVEY.md §4): three keyed shuffles total
(exact_key, caption band_key, phash band_key), none of which carries
image bytes, captions beyond the signature stage, or signatures
(band rows are (band_key, id) only); verification side-data is
broadcast below ``broadcast_limit`` and a hash join above it; hot
buckets capped to O(s) spanning edges. Dataset executions are fused
to five — per-execution executor/actor startup is a *serial* cost
that caps scaling efficiency long before compute does.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa

from ..hashing import xxh64_arrow
from ..stages.neardup import UnionFind, make_rep_block, make_signature_fn
from ..stages.simhash import (make_bucket_hamming_emitter,
                              make_code_band_rows_with_code)
from ..util import ensure_hash_shuffle
from .dedup import (DedupConfig, _ckpt, assign_clusters, candidate_pairs,
                    verify_pairs_broadcast, verify_pairs_join)


@dataclasses.dataclass
class FullDedupConfig:
    caption: DedupConfig = dataclasses.field(default_factory=DedupConfig)
    phash_bits_per_band: int = 8
    phash_max_distance: int = 4
    checkpoint_dir: str | None = None

    def __post_init__(self):
        if self.checkpoint_dir:
            self.caption.checkpoint_dir = self.checkpoint_dir


def _project_hashes(cfg: DedupConfig):
    """One pass over the raw corpus: exact_key from payload+caption,
    bytes dropped before anything shuffles."""

    def fn(batch: pa.Table) -> pa.Table:
        by = batch["bytes"]
        if isinstance(by, pa.ChunkedArray):
            by = by.combine_chunks()
        cap = batch[cfg.text_col]
        if isinstance(cap, pa.ChunkedArray):
            cap = cap.combine_chunks()
        ch = xxh64_arrow(by, cfg.seed)
        th = xxh64_arrow(cap, cfg.seed + 7)
        # 64-bit mix of the two (multiply-xor avalanche)
        key = (ch * np.uint64(0x9E3779B185EBCA87)) ^ th
        key ^= key >> np.uint64(33)
        return pa.Table.from_arrays(
            [batch[cfg.id_col], cap, batch["phash"],
             pa.array(key.astype(np.int64))],
            names=[cfg.id_col, cfg.text_col, "phash", "exact_key"])

    return fn


def _sig_with_phash(cfg: DedupConfig):
    """Signature map that carries phash through, so one table feeds
    both the caption and image tiers."""
    base = make_signature_fn(cfg.id_col, cfg.text_col, cfg.nb_hashes,
                             cfg.shingle_k, cfg.seed)

    def fn(batch: pa.Table) -> pa.Table:
        out = base(batch)
        return out.append_column("phash", batch["phash"])

    return fn


def full_dedup_pipeline(ds, cfg: FullDedupConfig | None = None):
    """Returns (assignments Dataset, stats dict). *ds* needs columns
    [image_id, bytes, caption, phash]."""
    cfg = cfg or FullDedupConfig()
    ccfg = cfg.caption
    ensure_hash_shuffle()

    # execution 1 (shuffle 1): exact (payload, caption) tier
    proj = ds.map_batches(_project_hashes(ccfg), batch_format="pyarrow")
    proj = proj.repartition(ccfg.partitions(), keys=["exact_key"])
    exact = proj.map_batches(make_rep_block(ccfg.id_col, "exact_key"),
                             batch_format="pyarrow", batch_size=None)
    exact = _ckpt(exact, ccfg, "full_exact", ledger_col=ccfg.id_col)
    n_input = exact.count()

    # execution 2: signatures (+phash) of the reps
    reps = exact.filter(expr="is_rep == True") \
        .select_columns([ccfg.id_col, ccfg.text_col, "phash"])
    sigs = reps.map_batches(_sig_with_phash(ccfg), batch_format="pyarrow",
                            batch_size=8192)
    sigs = _ckpt(sigs, ccfg, "full_sigs")
    n_reps = sigs.count()

    # caption tier (shuffle 2): bands → pairs → verify → edges.
    # Verification side data is broadcast while the signature table is
    # small (one driver collect + ray.put, worker-cached) and an
    # explicit two-sided hash join above broadcast_limit — the driver
    # never holds an unbounded table.
    pairs = candidate_pairs(sigs, ccfg)
    if n_reps <= ccfg.broadcast_limit:
        sig_table = pa.concat_tables(
            [b for b in sigs.select_columns([ccfg.id_col, "sig"])
             .iter_batches(batch_size=1 << 16, batch_format="pyarrow")])
        cap_edges = verify_pairs_broadcast(pairs, sig_table, ccfg) \
            .select_columns(["a", "b"])
    else:
        cap_edges = verify_pairs_join(pairs, sigs, ccfg) \
            .select_columns(["a", "b"])
    # image tier (shuffle 3): codes travel WITH the band rows (8
    # bytes/row) and Hamming is verified inside each bucket — no
    # candidate-pair blowup, no broadcast, no separate verify stage
    img_bands = sigs.map_batches(
        make_code_band_rows_with_code("phash", ccfg.id_col,
                                      cfg.phash_bits_per_band, ccfg.seed),
        batch_format="pyarrow")
    img_bands = img_bands.repartition(ccfg.partitions(), keys=["band_key"])
    img_edges = img_bands.map_batches(
        make_bucket_hamming_emitter(ccfg.id_col, cfg.phash_max_distance),
        batch_format="pyarrow", batch_size=None) \
        .select_columns(["a", "b"])

    if ccfg.cc == "distributed":
        # scale path: materialize each edge tier SEQUENTIALLY (one
        # hash-shuffle operator per execution), then star-contract the
        # union and assign via hash join — no driver state at all
        from .dedup import assign_clusters_distributed

        cap_m = cap_edges.materialize()
        img_m = img_edges.materialize()
        assignments, cc_stats = assign_clusters_distributed(
            exact, cap_m.union(img_m), ccfg)
        stats = {
            "n_input": n_input,
            "n_unique_pairs": n_reps,
            "n_edges": -1,  # not counted on this path
            **cc_stats,
        }
        return assignments, stats

    # executions 4+5: stream both edge tiers into the union-find.
    # Consumed sequentially, NOT as .union(...): one execution holding
    # two concurrent HashShuffleOperators deadlocks on aggregator-actor
    # resource reservation at small CPU counts.
    uf = UnionFind()
    n_edges = 0
    for edge_ds in (cap_edges, img_edges):
        for batch in edge_ds.iter_batches(batch_size=1 << 16,
                                          batch_format="pyarrow"):
            n_edges += len(batch)
            uf.union_many(batch["a"], batch["b"])
    comp = uf.components()

    # execution 5 (lazy): final assignment
    assignments = assign_clusters(exact, comp, ccfg)
    stats = {
        "n_input": n_input,
        "n_unique_pairs": n_reps,
        "n_edges": n_edges,
        "n_dup_ids_in_components": len(comp),
        "n_components": len(set(comp.values())),
    }
    return assignments, stats
