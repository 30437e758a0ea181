"""Exact set-similarity join: all document pairs whose k-shingle sets
have Jaccard ≥ τ, computed EXACTLY via an inverted-index shuffle — the
hard-verification counterpart of the MinHash/LSH pipeline (which
approximates this operator at scale).

    (doc_id, text) ── map: distinct shingle hashes per doc, each row
       │              carrying the doc's set size ──► (tok, doc_id, n)
       ▼
    keyed shuffle on tok → per-token co-occurrence pairs
       │   (a < b, na, nb); tokens with df > max_df emit nothing
       ▼   (skew guard: bounds per-token fan-out at max_df²)
    keyed shuffle on (a, b) → group count = |A∩B|,
       |A∪B| = na + nb − |A∩B|, keep τ_den·i ≥ τ_num·u

Scale discipline: only (int64 tok, int64 doc, int64 n) rows and
(a, b, na, nb) pair rows shuffle — never text; per-token work is
bounded by ``max_df``; the threshold is an integer cross-multiply so
distributed results are bit-stable (no float accumulation order
issues). Hot-shingle semantics: shingles with document frequency >
``max_df`` are excluded from intersection counting while set sizes
stay full — exact Jaccard whenever no shingle exceeds the cap, a
documented downward-biased similarity when one does (boilerplate
shingles shared by everything carry no near-dup signal). The DuckDB
oracle twin mirrors this definition exactly (pipelines/queries.py:
jaccard_dup_pairs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import DEFAULT_SEED
from .shingle import shingle_hashes


def make_shingle_token_rows(id_col: str = "doc_id", text_col: str = "text",
                            k: int = 3, seed: int = DEFAULT_SEED):
    """map_batches fn: (id, text) → (tok, doc_id, n) rows, one per
    DISTINCT k-word-shingle hash per document; ``n`` is the document's
    distinct-shingle count, riding with every row so the final reducer
    needs no side join for |A|/|B|."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, offsets = shingle_hashes(batch[text_col], k, seed)
        n_rows = len(batch)
        row_of = np.repeat(np.arange(n_rows), np.diff(offsets))
        order = np.lexsort((flat, row_of))
        r, h = row_of[order], flat[order]
        keep = np.ones(len(h), dtype=bool)
        keep[1:] = (r[1:] != r[:-1]) | (h[1:] != h[:-1])
        r, h = r[keep], h[keep]
        counts = np.bincount(r, minlength=n_rows)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "tok": pa.array(h.view(np.int64)),
            "doc_id": pa.array(ids[r]),
            "n": pa.array(counts[r].astype(np.int64)),
        })

    return fn


def make_cooccur_pair_emitter(max_df: int = 1024):
    """Whole-block fn over tok-partitioned rows: per token (the keyed
    repartition co-locates a token's full posting list, so the block-
    local group size IS the global df) emit every doc pair (a < b)
    with both set sizes; skip tokens with df > max_df."""

    def fn(batch: pa.Table) -> pa.Table:
        tok = batch["tok"].to_numpy(zero_copy_only=False)
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        nn = batch["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, tok))
        t, d, sz = tok[order], doc[order], nn[order]
        bounds = np.flatnonzero(np.diff(t)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(t)]))
        a_p, b_p, na_p, nb_p = [], [], [], []
        for s, e in zip(starts, ends):
            size = e - s
            if size < 2 or size > max_df:
                continue
            m, mn = d[s:e], sz[s:e]  # already doc-sorted within token
            iu, ju = np.triu_indices(size, k=1)
            a_p.append(m[iu])
            b_p.append(m[ju])
            na_p.append(mn[iu])
            nb_p.append(mn[ju])
        if not a_p:
            e64 = pa.array([], type=pa.int64())
            return pa.Table.from_arrays([e64] * 4,
                                        names=["a", "b", "na", "nb"])
        return pa.table({
            "a": pa.array(np.concatenate(a_p)),
            "b": pa.array(np.concatenate(b_p)),
            "na": pa.array(np.concatenate(na_p)),
            "nb": pa.array(np.concatenate(nb_p)),
        })

    return fn


def make_jaccard_reducer(tau_num: int, tau_den: int):
    """Whole-block fn over (a, b)-partitioned pair rows: group count =
    intersection size, union = na + nb − i, keep pairs with
    i/u ≥ tau_num/tau_den (integer cross-multiply — no float)."""

    def fn(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        na = batch["na"].to_numpy(zero_copy_only=False)
        nb = batch["nb"].to_numpy(zero_copy_only=False)
        out_names = ["a", "b", "inter", "uni"]
        if len(a) == 0:
            e64 = pa.array([], type=pa.int64())
            return pa.Table.from_arrays([e64] * 4, names=out_names)
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        new = np.ones(len(a_s), dtype=bool)
        new[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        idx = np.flatnonzero(new)
        i_cnt = np.diff(np.concatenate((idx, [len(a_s)])))
        u = na[order][idx] + nb[order][idx] - i_cnt
        keep = tau_den * i_cnt >= tau_num * u
        return pa.table({
            "a": pa.array(a_s[idx][keep]),
            "b": pa.array(b_s[idx][keep]),
            "inter": pa.array(i_cnt[keep].astype(np.int64)),
            "uni": pa.array(u[keep].astype(np.int64)),
        })

    return fn


def jaccard_pairs(ds, tau_num: int = 4, tau_den: int = 5,
                  id_col: str = "doc_id", text_col: str = "text",
                  k: int = 3, max_df: int = 1024,
                  num_partitions: int | None = None,
                  seed: int = DEFAULT_SEED):
    """(id, text) Dataset → (a, b, inter, uni) pairs with exact
    shingle-set Jaccard ≥ tau_num/tau_den. Two keyed shuffles
    (tok, then (a, b)); see module docstring for the max_df skew
    guard's semantics."""
    from ..util import cluster_cpus, ensure_hash_shuffle

    ensure_hash_shuffle()
    p = num_partitions or max(8, cluster_cpus())
    toks = ds.map_batches(
        make_shingle_token_rows(id_col, text_col, k, seed),
        batch_format="pyarrow")
    toks = toks.repartition(p, keys=["tok"])
    pairs = toks.map_batches(make_cooccur_pair_emitter(max_df),
                             batch_format="pyarrow", batch_size=None)
    # two HashShuffleOperators in ONE execution deadlock/serialize at
    # small CPU counts (see CLAUDE.md) — split the executions here
    pairs = pairs.materialize()
    pairs = pairs.repartition(p, keys=["a", "b"])
    return pairs.map_batches(make_jaccard_reducer(tau_num, tau_den),
                             batch_format="pyarrow", batch_size=None)
