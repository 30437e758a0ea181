"""The flagship pipeline: exact + near-duplicate detection and
clustering over an (id, caption) corpus.

    input ──h──► exact tier (hash-partitioned groupby, min-id rep)
          │                        │
          │   reps ──► MinHash sigs ──► LSH band rows ──► hash-partitioned
          │                  │             buckets ──► candidate pairs
          │                  └──────────► verification (broadcast or hash join)
          │                                   │ edges (sim ≥ τ)
          └──────────► assignment ◄── union-find (driver) ◄──┘

Cluster id = min id of the connected component (deterministic).

Scale properties:
- the only all-to-all exchanges move (hash, id, caption) or
  (band_key, id) rows — image bytes never enter a shuffle;
- exactly TWO keyed shuffles end to end (exact tier, band buckets);
  candidate pairs are deduped block-locally instead of globally —
  cross-block duplicates only cost a re-verification and the
  union-find is idempotent;
- candidate generation is block-vectorized after key-hash
  repartitioning, never per-group ``map_groups`` calls;
- hot buckets are capped to O(s) spanning edges (stages/neardup.py);
- the union-find state is bounded by the verified-duplicate set, not
  the corpus;
- verification broadcasts the signature table while it fits
  (``ray.put`` once, worker-local cache), and switches to an explicit
  two-sided hash join above ``broadcast_limit`` rows.

Intermediates (exact map, signatures, edges) can be checkpointed to
parquet via ``checkpoint_dir``; a resumed run skips any stage whose
``_SUCCESS`` marker exists.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import pyarrow as pa

from ..hashing import DEFAULT_SEED, xxh64_arrow
from ..stages.neardup import (UnionFind, dedupe_pairs_block,
                              make_band_rows, make_broadcast_verifier,
                              make_pair_emitter, make_signature_fn,
                              sig_matrix, verify_block)
from ..util import ensure_hash_shuffle


@dataclasses.dataclass
class DedupConfig:
    id_col: str = "image_id"
    text_col: str = "caption"
    nb_hashes: int = 128
    bands: int = 32
    rows_per_band: int = 4
    shingle_k: int = 3
    threshold: float = 0.8
    max_bucket: int = 128
    seed: int = DEFAULT_SEED
    num_partitions: int | None = None  # None: ~1 per cluster CPU
    # hot-band salting: buckets whose CMS/TopK-estimated size exceeds
    # this are split into n_salt sub-buckets (None disables; "auto"
    # derives the threshold from the band-row count via
    # stages.neardup.auto_hot_threshold; the pair emitter's max_bucket
    # cap still bounds worst-case work either way)
    hot_threshold: int | str | None = None
    n_salt: int = 16
    broadcast_limit: int = 2_000_000  # sig rows; above this use the hash join
    cc: str = "driver"  # "driver" union-find | "distributed" star contraction
    checkpoint_dir: str | None = None

    def __post_init__(self):
        assert self.bands * self.rows_per_band == self.nb_hashes, \
            "bands * rows_per_band must equal nb_hashes"

    def partitions(self) -> int:
        if self.num_partitions is not None:
            return self.num_partitions
        from ..util import cluster_cpus

        return max(8, cluster_cpus())


def _add_caption_hash(cfg: DedupConfig):
    def fn(batch: pa.Table) -> pa.Table:
        h = xxh64_arrow(batch[cfg.text_col], cfg.seed).astype(np.int64)
        return batch.append_column("caption_hash", pa.array(h))
    return fn


def _exact_rep_block(cfg: DedupConfig):
    from ..stages.neardup import make_rep_block

    return make_rep_block(cfg.id_col, "caption_hash")


def exact_tier(ds, cfg: DedupConfig):
    """input → (id, caption, caption_hash, rep_id, is_rep): exact-dup
    groups resolved to min-id representatives. One keyed shuffle."""
    ds = ds.map_batches(_add_caption_hash(cfg), batch_format="pyarrow")
    ds = ds.repartition(cfg.partitions(), keys=["caption_hash"])
    return ds.map_batches(_exact_rep_block(cfg), batch_format="pyarrow",
                          batch_size=None)


def signatures(reps_ds, cfg: DedupConfig):
    return reps_ds.map_batches(
        make_signature_fn(cfg.id_col, cfg.text_col, cfg.nb_hashes,
                          cfg.shingle_k, cfg.seed),
        batch_format="pyarrow", batch_size=8192)


def _salt_hot_bands(bands_ds, cfg: DedupConfig,
                    preserve_top_bit: bool = False,
                    diag: dict | None = None):
    """Skew diagnostic + salting over a (band_key, id) stream: one
    TopK sketch pass finds hot buckets, then ``make_salt_fn`` splits
    them into n_salt sub-buckets. ``hot_threshold="auto"`` derives the
    cut from the measured band-row count (2× partition fair share);
    *preserve_top_bit* keeps the merged band tier's tag bit so the
    flagship's single shuffle composes with salting. Materializes the
    band stream (needed anyway — the sketch pass and the shuffle both
    consume it). *diag*, when given, receives the effective threshold
    and hot-bucket count (surfaced in pipeline stats)."""
    from ..stages.neardup import auto_hot_threshold, make_salt_fn
    from ..stages.sketch_aggs import build_topk

    bands_ds = bands_ds.materialize()
    thr = cfg.hot_threshold
    if thr == "auto":
        thr = auto_hot_threshold(bands_ds.count(), cfg.partitions(),
                                 cfg.max_bucket)
    top = build_topk(bands_ds, on="band_key", k=512, error_rate=1e-5,
                     seed=cfg.seed)
    hot = [t["value"] for t in top if t["frequency"] > thr]
    if diag is not None:
        diag["hot_threshold_effective"] = int(thr)
        diag["n_hot_bands"] = len(hot)
    if hot:
        bands_ds = bands_ds.map_batches(
            make_salt_fn(hot, cfg.n_salt, cfg.id_col, cfg.seed,
                         preserve_top_bit=preserve_top_bit),
            batch_format="pyarrow")
    return bands_ds


def candidate_pairs(sigs_ds, cfg: DedupConfig, diag: dict | None = None):
    """sigs → band rows → (optional hot-band salting) →
    hash-partitioned buckets → pairs (block-local dedupe). One keyed
    shuffle; emitted pairs may repeat across blocks."""
    bands_ds = sigs_ds.map_batches(
        make_band_rows(cfg.id_col, cfg.bands, cfg.rows_per_band, cfg.seed),
        batch_format="pyarrow")
    if cfg.hot_threshold is not None:
        bands_ds = _salt_hot_bands(bands_ds, cfg, diag=diag)
    bands_ds = bands_ds.repartition(cfg.partitions(), keys=["band_key"])
    pairs = bands_ds.map_batches(
        make_pair_emitter(cfg.id_col, cfg.max_bucket),
        batch_format="pyarrow", batch_size=None)
    return pairs.map_batches(dedupe_pairs_block, batch_format="pyarrow",
                             batch_size=None)


def verify_pairs_broadcast(pairs_ds, sig_table: pa.Table, cfg: DedupConfig):
    """Small-side fast path: ship the signature matrix once via
    ``ray.put``; workers cache it locally."""
    import ray

    ref = ray.put((sig_table[cfg.id_col].to_pylist(), sig_matrix(sig_table)))
    return pairs_ds.map_batches(
        make_broadcast_verifier(ref, cfg.threshold),
        batch_format="pyarrow", batch_size=65536)


def verify_pairs_join(pairs_ds, sigs_ds, cfg: DedupConfig):
    """Scale path: two hash joins pairs⋈sigs (on a, then on b).
    Signatures ride as fixed-width binary payloads (Arrow acero joins
    reject fixed_size_list non-key fields)."""
    from ..stages.neardup import sig_to_binary_fn

    sigs = sigs_ds.select_columns([cfg.id_col, "sig"]).map_batches(
        sig_to_binary_fn(), batch_format="pyarrow")
    j1 = pairs_ds.join(sigs, "inner", cfg.partitions(),
                       on=("a",), right_on=(cfg.id_col,))
    j1 = _rename(j1, "sig", "sig_a")
    j2 = j1.join(sigs, "inner", cfg.partitions(),
                 on=("b",), right_on=(cfg.id_col,))
    j2 = _rename(j2, "sig", "sig_b")
    return j2.map_batches(lambda t: verify_block(t, cfg.threshold),
                          batch_format="pyarrow")


def _rename(ds, old: str, new: str):
    return ds.rename_columns({old: new})


def connected_components(edges_iter) -> dict:
    """Stream verified (a, b) edge batches into a driver union-find
    (batch-contracted ingestion); returns {id: cluster_id} for every id
    in a non-trivial component."""
    uf = UnionFind()
    for batch in edges_iter:
        uf.union_many(batch["a"], batch["b"])
    return uf.components()


def assign_clusters(exact_ds, comp_map: dict, cfg: DedupConfig):
    """exact-tier output + component map → (id, rep_id, is_rep, cluster_id)."""
    import ray

    ref = ray.put((list(comp_map.keys()), list(comp_map.values())))

    def fn(batch: pa.Table) -> pa.Table:
        mp = _get_cached_map(ref)
        reps = batch["rep_id"]
        if isinstance(reps, pa.ChunkedArray):
            reps = reps.combine_chunks()
        out = batch.select([cfg.id_col, "rep_id", "is_rep"])
        return out.append_column("cluster_id", mp(reps))

    return exact_ds.map_batches(fn, batch_format="pyarrow")


_MAP_CACHE: dict = {}


def _get_cached_map(ref):
    """Worker-cached MapWithIdentity built from a broadcast
    (keys, values) pair (hashed-key Arrow lookup, identity default)."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _MAP_CACHE:
        import ray

        from ..stages.neardup import MapWithIdentity

        ks, vs = ray.get(ref)
        _MAP_CACHE.clear()
        _MAP_CACHE[key] = MapWithIdentity(ks, vs)
    return _MAP_CACHE[key]


def assign_clusters_distributed(exact_ds, edges_ds, cfg: DedupConfig):
    """Scale-path clustering + assignment: large/small-star contraction
    keeps components as edge rows; assignment is a left-outer hash join
    of the exact tier against the label Dataset — nothing lands on the
    driver. Returns (assignments_ds, stats dict)."""
    import pyarrow.compute as pc

    from ..stages.cc import connected_components_distributed

    labels = connected_components_distributed(edges_ds, cfg.partitions()) \
        .rename_columns({"image_id": "cc_node",
                         "cluster_id": "cc_root"}).materialize()
    n_dup = labels.count()
    n_components = labels.map_batches(
        lambda t: pa.table({"n": pa.array(
            [int(pc.sum(pc.cast(pc.equal(t["cc_node"], t["cc_root"]),
                                pa.int64())).as_py() or 0)])}),
        batch_format="pyarrow").sum("n") or 0
    joined = exact_ds.select_columns([cfg.id_col, "rep_id", "is_rep"]) \
        .join(labels, "left_outer", cfg.partitions(),
              on=("rep_id",), right_on=("cc_node",))

    def finalize_assign(batch: pa.Table) -> pa.Table:
        root = pc.coalesce(batch["cc_root"], batch["rep_id"])
        out = batch.select([cfg.id_col, "rep_id", "is_rep"])
        return out.append_column("cluster_id", root)

    assignments = joined.map_batches(finalize_assign, batch_format="pyarrow")
    return assignments, {
        "n_dup_ids_in_components": n_dup,
        "n_components": n_components,
    }


def _ckpt(ds, cfg: DedupConfig, name: str, ledger_col: str | None = None):
    """Materialize a stage — through a parquet checkpoint when
    configured (a resumed run reads it back instead of recomputing),
    else in the object store.

    Alongside the parquet, each completed stage records (north_rule
    "per-partition lineage + metrics"):
    - ``_METRICS.json``: rows, blocks, wall seconds, config snapshot;
    - ``_LEDGER.json`` (when *ledger_col* is set): an IBLT of the
      written ids — ``pipelines.checkpoint.delta_verify`` can then
      list exactly which rows a crashed writer missed in O(d) without
      rescanning the data.
    """
    if cfg.checkpoint_dir:
        import json
        import shutil
        import time as _time

        import ray.data

        path = os.path.join(cfg.checkpoint_dir, name)
        done = os.path.join(path, "_SUCCESS")
        snapshot = {k: v for k, v in dataclasses.asdict(cfg).items()
                    if isinstance(v, (int, float, str, bool, type(None)))}
        if os.path.exists(done):
            # resume guard: a checkpoint written under a DIFFERENT config
            # (threshold, bands, seed, ...) must not be silently reused
            try:
                with open(os.path.join(path, "_METRICS.json")) as f:
                    stored = json.load(f).get("config")
            except (OSError, ValueError):
                stored = None
            if stored is not None and stored != snapshot:
                shutil.rmtree(path)
        if not os.path.exists(done):
            # a dir without _SUCCESS is a crashed mid-write: clear it so
            # recomputed files don't sit beside stale partial ones
            if os.path.isdir(path):
                shutil.rmtree(path)
            t0 = _time.perf_counter()
            ds = ds.materialize()
            ds.write_parquet(path)
            n = ds.count()
            try:  # per-partition lineage: rows per written block
                partition_rows = [
                    int(m.num_rows) for bundle in
                    ds.iter_internal_ref_bundles() for m in bundle.metadata
                    if m.num_rows is not None]
            except Exception:  # noqa: BLE001 - metadata probe only
                partition_rows = None
            metrics = {
                "stage": name,
                "rows": n,
                "blocks": ds.num_blocks(),
                "partition_rows": partition_rows,
                "wall_seconds": round(_time.perf_counter() - t0, 3),
                "config": snapshot,
            }
            with open(os.path.join(path, "_METRICS.json"), "w") as f:
                json.dump(metrics, f)
            if ledger_col is not None:
                from .checkpoint import build_iblt

                ledger = build_iblt(ds.select_columns([ledger_col]),
                                    on=ledger_col, differences=128,
                                    seed=cfg.seed)
                with open(os.path.join(path, "_LEDGER.json"), "w") as f:
                    json.dump(ledger.save_as_json(), f)
            with open(done, "w") as f:
                f.write("ok")
        return ray.data.read_parquet(path)
    return ds.materialize()


def dedup_pipeline(ds, cfg: DedupConfig | None = None):
    """Full pipeline; returns (assignments_ds, stats dict).

    *ds* must have columns [cfg.id_col, cfg.text_col].
    """
    cfg = cfg or DedupConfig()
    ensure_hash_shuffle()

    # execution 1 (shuffle 1): exact tier
    exact = _ckpt(exact_tier(ds, cfg), cfg, "exact", ledger_col=cfg.id_col)
    n_input = exact.count()

    # execution 2 (no shuffle): signatures of unique captions, collected
    # to one Arrow table while under broadcast_limit
    reps = exact.filter(expr="is_rep == True").select_columns(
        [cfg.id_col, cfg.text_col])
    sigs = _ckpt(signatures(reps, cfg), cfg, "sigs")
    n_sigs = sigs.count()

    # execution 3 (shuffle 2): bands → pairs → verify → edges
    salt_diag: dict = {}
    pairs = candidate_pairs(sigs, cfg, diag=salt_diag)
    if n_sigs <= cfg.broadcast_limit:
        sig_table = pa.concat_tables(
            [b for b in sigs.select_columns([cfg.id_col, "sig"])
             .iter_batches(batch_size=65536, batch_format="pyarrow")])
        edges = verify_pairs_broadcast(pairs, sig_table, cfg)
    else:
        edges = verify_pairs_join(pairs, sigs, cfg)
    if cfg.cc == "distributed":
        assignments, cc_stats = assign_clusters_distributed(
            exact, edges.select_columns(["a", "b"]), cfg)
        stats = {
            "n_input": n_input,
            "n_unique_captions": n_sigs,
            "n_edges": -1,  # not counted on this path
            **cc_stats,
            **salt_diag,
        }
        return assignments, stats

    n_edges = 0
    comp_uf = UnionFind()
    for batch in edges.select_columns(["a", "b"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        n_edges += len(batch)
        comp_uf.union_many(batch["a"], batch["b"])
    comp = comp_uf.components()

    # execution 4 (no shuffle): final assignment
    assignments = assign_clusters(exact, comp, cfg)
    stats = {
        "n_input": n_input,
        "n_unique_captions": n_sigs,
        "n_edges": n_edges,
        "n_dup_ids_in_components": len(comp),
        "n_components": len(set(comp.values())),
        **salt_diag,
    }
    return assignments, stats
