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
      ▼ sigs (image_id, sig, phash) — ONE materialization; the
      │       (ids, sig matrix, phash codes) side table is broadcast
      │       once below broadcast_limit
      ▼
    MERGED band tier (default, broadcast path): ONE (band_key, id)
    stream carrying BOTH tiers — caption LSH band keys with the top
    bit cleared, phash Hamming-chunk keys with the top bit set — one
    keyed shuffle, then an in-block emitter that splits buckets by
    key sign and emits already-VERIFIED edges for both tiers
    (positional-Jaccard ≥ τ against the broadcast sig matrix; in-
    bucket vectorized Hamming ≤ t with codes fetched from the same
    broadcast side table, never shuffled)
      ▼
    edges → union-find (driver) or star contraction (distributed)
      ▼
    assignment map over the exact tier (broadcast component map)

Scale discipline (SURVEY.md §4): TWO keyed shuffles total on the
default path (exact_key, merged band_key), neither of which carries
image bytes, captions beyond the signature stage, signatures or
phash codes (band rows are (band_key, id) only). Dataset executions
are fused to FOUR — per-execution executor/actor startup is a
*serial* cost that caps scaling efficiency long before compute does
(the round-3 scaling runs put the serial floor at ~6-9 s of a 16-CPU
leg, most of it executor+shuffle-aggregator spin-up).

Hot-band salting composes with the merged tier: when
``hot_threshold`` is set (int, or "auto" to derive it from the band-
row count), a TopK skew pass runs over the merged (band_key, id)
stream and hot buckets are rescattered into n_salt sub-buckets with
the tier tag bit preserved (salt entropy stays below bit 63), so both
tiers keep routing through the SAME single keyed shuffle and the
in-block emitter still separates them by key sign.

Above ``broadcast_limit`` the pipeline falls back to the split-tier
structure: caption pairs verified by an explicit two-sided hash join,
the phash tier shuffling its codes with the band rows — one more
shuffle + execution, but no driver-side collection of the signature
table.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa

from ..hashing import xxh64_arrow
from ..stages.neardup import (UnionFind, _BroadcastLookup,
                              dedupe_pairs_block, make_band_rows,
                              make_pair_emitter, make_rep_block,
                              make_signature_fn, sig_matrix)
from ..stages.simhash import (make_bucket_hamming_emitter,
                              make_code_band_rows,
                              make_code_band_rows_with_code)
from ..util import ensure_hash_shuffle
from .dedup import (DedupConfig, _ckpt, _salt_hot_bands, assign_clusters,
                    candidate_pairs, verify_pairs_broadcast,
                    verify_pairs_join)


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


_TOP_BIT = np.uint64(1) << np.uint64(63)
_LOW_63 = ~_TOP_BIT


def _unified_band_rows(ccfg: DedupConfig, bits_per_band: int):
    """One pass over the signature table emitting BOTH tiers' band
    rows as a single (band_key, id) stream: caption LSH keys get the
    top bit cleared, phash Hamming-chunk keys get it set, so one keyed
    shuffle co-locates both tiers' buckets and the emitter separates
    them by key sign. Neither signatures nor codes ride along — the
    emitter reads both from the broadcast side table."""
    cap_fn = make_band_rows(ccfg.id_col, ccfg.bands, ccfg.rows_per_band,
                            ccfg.seed)
    img_fn = make_code_band_rows("phash", ccfg.id_col, bits_per_band,
                                 ccfg.seed)

    def _retag(table: pa.Table, set_top: bool) -> pa.Table:
        k = table["band_key"].to_numpy(zero_copy_only=False).view(np.uint64)
        k = (k | _TOP_BIT) if set_top else (k & _LOW_63)
        return table.set_column(0, "band_key", pa.array(k.view(np.int64)))

    def fn(batch: pa.Table) -> pa.Table:
        return pa.concat_tables([_retag(cap_fn(batch), False),
                                 _retag(img_fn(batch), True)])

    return fn


_SIDE_CACHE: dict = {}


def _cached_side(ref):
    """Worker-cached (sig lookup, phash code vector) built once from
    the broadcast side table (plasma shared memory, fetched per
    worker, not per batch)."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    hit = _SIDE_CACHE.get(key)
    if hit is None:
        import ray

        ids, sigs, codes = ray.get(ref)
        hit = (_BroadcastLookup(ids, sigs), codes)
        _SIDE_CACHE.clear()
        _SIDE_CACHE[key] = hit
    return hit


def make_unified_edge_emitter(id_col: str, side_ref, threshold: float,
                              max_bucket: int, max_distance: int):
    """Whole-block fn over the hash-partitioned merged band rows:
    image buckets (band_key < 0) run the in-bucket vectorized Hamming
    emitter with codes gathered from the broadcast side table; caption
    buckets run the capped pair emitter + block dedupe + positional-
    Jaccard verification against the broadcast signature matrix.
    Output: verified (a, b) edges from both tiers."""
    pair_fn = make_pair_emitter(id_col, max_bucket)
    ham_fn = make_bucket_hamming_emitter(id_col, max_distance)

    def fn(batch: pa.Table) -> pa.Table:
        lk, codes = _cached_side(side_ref)
        keys = batch["band_key"].to_numpy(zero_copy_only=False)
        img_mask = keys < 0
        outs = []
        if not img_mask.all():
            pairs = dedupe_pairs_block(
                pair_fn(batch.filter(pa.array(~img_mask))))
            if len(pairs):
                sim = (lk.rows(pairs["a"]) == lk.rows(pairs["b"])) \
                    .mean(axis=1)
                outs.append(pairs.select(["a", "b"])
                            .filter(pa.array(sim >= threshold)))
        if img_mask.any():
            img_rows = batch.filter(pa.array(img_mask))
            code_col = pa.array(
                codes[lk.positions(img_rows[id_col])].view(np.int64))
            edges = ham_fn(img_rows.append_column("code", code_col))
            outs.append(edges.select(["a", "b"]))
        outs = [t for t in outs if len(t)]
        if not outs:
            empty = pa.array([], type=batch.schema.field(id_col).type)
            return pa.Table.from_arrays([empty, empty], names=["a", "b"])
        return pa.concat_tables(outs)

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

    if n_reps <= ccfg.broadcast_limit:
        # MERGED band tier (default): one shuffle, one execution for
        # both tiers; edges come out already verified. Side data (sig
        # matrix + phash codes) is broadcast once via ray.put.
        import ray

        side = pa.concat_tables(
            [b for b in sigs.select_columns([ccfg.id_col, "sig", "phash"])
             .iter_batches(batch_size=1 << 16, batch_format="pyarrow")])
        side_ref = ray.put((
            side[ccfg.id_col].to_pylist(), sig_matrix(side),
            side["phash"].to_numpy(zero_copy_only=False)
            .astype(np.uint64)))
        bands = sigs.map_batches(
            _unified_band_rows(ccfg, cfg.phash_bits_per_band),
            batch_format="pyarrow")
        salt_diag: dict = {}
        if ccfg.hot_threshold is not None:
            # hot-band guard stays on the single merged shuffle: the
            # TopK skew pass runs over the combined stream and salted
            # keys keep their tier tag bit (preserve_top_bit), so the
            # emitter's key-sign routing survives salting.
            bands = _salt_hot_bands(bands, ccfg, preserve_top_bit=True,
                                    diag=salt_diag)
        bands = bands.repartition(ccfg.partitions(), keys=["band_key"])
        edges = bands.map_batches(
            make_unified_edge_emitter(ccfg.id_col, side_ref,
                                      ccfg.threshold, ccfg.max_bucket,
                                      cfg.phash_max_distance),
            batch_format="pyarrow", batch_size=None)
        if ccfg.checkpoint_dir:
            # checkpoint the verified-edge stage so a crash during/after
            # the band shuffle resumes without recomputing it. The phash
            # tier's params live in FullDedupConfig (outside the ccfg
            # snapshot _ckpt compares), so they go into the stage NAME —
            # changed params land in a fresh directory instead of
            # silently reusing mismatched edges.
            edges = _ckpt(
                edges, ccfg,
                f"full_edges_b{cfg.phash_bits_per_band}"
                f"_d{cfg.phash_max_distance}")
        if ccfg.cc == "distributed":
            from .dedup import assign_clusters_distributed

            edges_m = edges.materialize()
            assignments, cc_stats = assign_clusters_distributed(
                exact, edges_m, ccfg)
            return assignments, {
                "n_input": n_input,
                "n_unique_pairs": n_reps,
                "n_edges": edges_m.count(),
                **cc_stats,
                **salt_diag,
            }
        # execution 3: band shuffle → verified edges → union-find
        uf = UnionFind()
        n_edges = 0
        for batch in edges.iter_batches(batch_size=1 << 16,
                                        batch_format="pyarrow"):
            n_edges += len(batch)
            uf.union_many(batch["a"], batch["b"])
        comp = uf.components()
        # execution 4 (lazy): final assignment
        assignments = assign_clusters(exact, comp, ccfg)
        return assignments, {
            "n_input": n_input,
            "n_unique_pairs": n_reps,
            "n_edges": n_edges,
            "n_dup_ids_in_components": len(comp),
            "n_components": len(set(comp.values())),
            **salt_diag,
        }

    # SPLIT-TIER fallback (above broadcast_limit): caption pairs
    # verified by an explicit two-sided hash join — the driver never
    # holds the signature table; phash codes travel WITH the image
    # band rows (8 bytes/row) for in-bucket Hamming. One extra shuffle
    # + execution vs the merged path. candidate_pairs() applies the
    # same hot-band salting on this path when hot_threshold is set.
    salt_diag = {}
    pairs = candidate_pairs(sigs, ccfg, diag=salt_diag)
    if n_reps <= ccfg.broadcast_limit:
        sig_table = pa.concat_tables(
            [b for b in sigs.select_columns([ccfg.id_col, "sig"])
             .iter_batches(batch_size=1 << 16, batch_format="pyarrow")])
        cap_edges = verify_pairs_broadcast(pairs, sig_table, ccfg) \
            .select_columns(["a", "b"])
    else:
        cap_edges = verify_pairs_join(pairs, sigs, ccfg) \
            .select_columns(["a", "b"])
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
            **salt_diag,
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
        **salt_diag,
    }
    return assignments, stats
