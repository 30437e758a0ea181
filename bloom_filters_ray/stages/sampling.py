"""Deterministic sampling operators for training-data pipelines.

Two shapes a 100-TB corpus job needs constantly:

1. ``hash_split`` — stable train/val/test split assignment:
   ``split = h(key) % n_splits`` with a seeded multiply-shift
   (Fibonacci) hash over integer keys. Pure per-row arithmetic —
   embarrassingly parallel, NO shuffle — and the assignment is a
   function of row CONTENT (never partition/batch position), so it is
   stable under any repartitioning, stable across reruns (a doc keeps
   its split when the corpus grows), and reproducible in ANSI SQL:
   the doc_splits oracle twin runs the identical integer arithmetic
   in DuckDB (one INT128 multiply mod 2^64 + xor-shift — the product
   (key + seed) * PHI64 stays inside INT128 for any int64 key, which
   is exactly why the split hash is multiply-shift and not xxh64).
   For string/binary keys — or when statistical independence matters
   more than SQL reproducibility — use ``hasher="xxh64"`` (same
   contract, engine-side vectorized XXH64 over utf-8 bytes or the
   8-byte integer word; not SQL-twinnable).

2. ``weighted_sample_k`` — distributed weighted sampling WITHOUT
   replacement (Efraimidis & Spirakis, "Weighted random sampling with
   a reservoir", Inf. Proc. Letters 97(5), 2006 — the A-ES scheme):
   each row draws u = uniform01(xxh64(id, seed)) and is ranked by
   key = u^(1/w); the global top-k by key IS a weighted sample
   without replacement. Distributed shape: block-local top-k partials
   (one vectorized argpartition per block) → tiny driver merge — at
   most k rows per block move, never the data, no shuffle at all.
   Exactness law pinned in tests: for k=1, P(i sampled) = w_i / Σw;
   the sample is invariant to partitioning and reproducible from
   (seed, k) alone.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import xxh64_u64

# 2^64 / golden ratio, odd (Knuth multiplicative / Fibonacci hashing)
PHI64 = 0x9E3779B97F4B9479
_MASK64 = (1 << 64) - 1


def fib64(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """Seeded multiply-shift hash of int64/uint64 *keys* → uint64:
    ``z = (key + seed) * PHI64 mod 2^64; z ^ (z >> 32)``. Universal
    multiply-shift family (Dietzfelbinger et al.); chosen over xxh64
    for split assignment because the identical arithmetic runs in
    DuckDB HUGEINT SQL (see module docstring)."""
    if not 0 <= seed < (1 << 32):
        raise ValueError(f"fib64 seed must be in [0, 2^32): {seed}")
    x = np.ascontiguousarray(keys).astype(np.int64).astype(np.uint64)
    z = (x + np.uint64(seed)) * np.uint64(PHI64)  # wraps mod 2^64
    return z ^ (z >> np.uint64(32))


def make_hash_split_fn(key_col: str, n_splits: int, seed: int = 0,
                       out_col: str = "split", hasher: str = "fib64"):
    """map_batches fn appending int64 *out_col* in [0, n_splits):
    the row's deterministic split id."""
    if n_splits <= 0:
        raise ValueError(f"n_splits must be positive: {n_splits}")
    if hasher not in ("fib64", "xxh64"):
        raise ValueError(f"unknown hasher {hasher!r} (fib64|xxh64)")

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        if hasher == "fib64":
            h = fib64(keys.to_numpy(zero_copy_only=False), seed)
        elif pa.types.is_integer(keys.type):
            # xxh64 of the key's 8-byte little-endian word
            h = xxh64_u64(keys.to_numpy(zero_copy_only=False)
                          .astype(np.int64).astype(np.uint64), seed=seed)
        else:  # string/binary keys hash their utf-8 bytes
            from ..hashing import xxh64_arrow
            arr = keys.combine_chunks() if isinstance(
                keys, pa.ChunkedArray) else keys
            h = xxh64_arrow(arr, seed=seed)
        split = (h % np.uint64(n_splits)).astype(np.int64)
        return batch.append_column(out_col, pa.array(split))

    return fn


def hash_split(ds, key_col: str, n_splits: int, seed: int = 0,
               out_col: str = "split", hasher: str = "fib64"):
    """Dataset → Dataset with a deterministic split-id column. Pure
    map_batches: streams, no shuffle, 100-TB-safe by construction."""
    return ds.map_batches(
        make_hash_split_fn(key_col, n_splits, seed, out_col, hasher),
        batch_format="pyarrow")


def _aes_keys(ids: np.ndarray, w: np.ndarray, seed: int,
              hasher: str = "xxh64") -> np.ndarray:
    """A-ES ranking key per row, computed as ln(u)/w (monotone in
    u^(1/w), overflow-free): u = ((h(id, seed) >> 11) + 0.5) * 2^-53
    ∈ (0, 1). Rows with w <= 0 get -inf (never sampled).

    ``hasher="fib64"`` swaps xxh64 for the multiply-shift hash so the
    ENTIRE sample is reproducible in DuckDB SQL (the weighted_sample
    oracle twin). numpy's log and DuckDB's ln may differ in the last
    ulp (~2e-16 abs), but adjacent A-ES keys are separated by ~1e-10
    even at 20k rows — five orders of magnitude of ordering margin,
    so the two sides' top-k ranks agree (measured; pinned in tests).

    Statistical caveat: fib64 is only pairwise-uniform — for
    SEQUENTIAL ids, (id + seed) values collide across seeds, so the
    u_i are not independent and cross-seed inclusion probabilities
    deviate from w_i/sum(w) (measured in tests). xxh64 (the default)
    has no such structure and is what the k=1 exactness law is pinned
    against; use fib64 only where SQL reproducibility is the point."""
    if hasher == "fib64":
        h = fib64(ids, seed)
    else:
        h = xxh64_u64(ids.astype(np.int64).astype(np.uint64), seed=seed)
    u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) * 2.0 ** -53
    with np.errstate(divide="ignore", invalid="ignore"):
        key = np.log(u) / w
    return np.where(w > 0, key, -np.inf)


def make_weighted_partial_fn(id_col: str, weight_col: str, k: int,
                             seed: int = 0, hasher: str = "xxh64"):
    """map_batches fn: emit the block's top-k rows by A-ES key as
    (id, weight, sample_key) — at most k rows leave each block."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch[weight_col].to_numpy(
            zero_copy_only=False).astype(np.float64)
        key = _aes_keys(ids, w, seed, hasher)
        if len(ids) > k:
            top = np.argpartition(-key, k - 1)[:k]
        else:
            top = np.arange(len(ids))
        return pa.table({
            id_col: pa.array(ids[top], type=pa.int64()),
            weight_col: pa.array(w[top], type=pa.float64()),
            "sample_key": pa.array(key[top], type=pa.float64()),
        })

    return fn


def _group_topk_block_fn(group_col: str, id_col: str, weight_col: str,
                         k: int, seed: int, hasher: str, final: bool):
    """Whole-block per-group A-ES top-k ranker. Vectorized: the group
    column is dictionary-encoded per block (codes, not strings, get
    lexsorted), segment-relative positions give the in-group rank.
    Partial pass emits (group, id, weight) of each block's per-group
    top-k; the final pass (after the keyed repartition co-locates each
    group) adds the 1-based ``rank``. Correct because the global
    per-group top-k is a subset of the union of block-local ones."""

    def fn(batch: pa.Table) -> pa.Table:
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        # group type taken from the input (never hardcoded), so an
        # empty block keeps the schema stable for any group key type
        out_schema = pa.schema(
            [(group_col, g.type), (id_col, pa.int64()),
             (weight_col, pa.float64())]
            + ([("rank", pa.int64())] if final else []))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch[weight_col].to_numpy(
            zero_copy_only=False).astype(np.float64)
        key = _aes_keys(ids, w, seed, hasher)
        pos_w = key > -np.inf
        if not pos_w.all():
            g, ids, w, key = (g.filter(pa.array(pos_w)), ids[pos_w],
                              w[pos_w], key[pos_w])
        if len(ids) == 0:
            return out_schema.empty_table()
        denc = g.dictionary_encode()
        gcodes = np.asarray(denc.indices).astype(np.int64)
        order = np.lexsort((ids, -key, gcodes))
        gs = gcodes[order]
        pos = np.arange(len(gs), dtype=np.int64)
        new_g = np.ones(len(gs), dtype=bool)
        new_g[1:] = gs[1:] != gs[:-1]
        seg_start = np.maximum.accumulate(np.where(new_g, pos, 0))
        rk = pos - seg_start + 1
        keep = rk <= k
        sel = order[keep]
        cols = {group_col: g.take(pa.array(sel)),
                id_col: pa.array(ids[sel], type=pa.int64()),
                weight_col: pa.array(w[sel], type=pa.float64())}
        if final:
            cols["rank"] = pa.array(rk[keep], type=pa.int64())
        return pa.table(cols)

    return fn


def stratified_sample_k(ds, group_col: str, id_col: str, weight_col: str,
                        k: int, seed: int = 0, hasher: str = "xxh64",
                        num_partitions: int | None = None):
    """Per-GROUP weighted sample without replacement (stratified
    A-ES): the top-k rows by ln(u)/w within every group — e.g. a
    balanced 20-docs-per-language training sample. Distributed shape:
    block-local per-group top-k partials (at most k rows per group
    leave each block) → ONE keyed repartition of those partials →
    the same ranker finalizes per-group ranks. The raw dataset never
    shuffles; with G groups the exchange moves at most k·G·blocks
    rows. Same determinism contract as weighted_sample_k, and the
    fib64 hasher makes it DuckDB-reproducible (row_number() OVER
    (PARTITION BY group ORDER BY key DESC) <= k)."""
    from ..util import cluster_cpus, ensure_hash_shuffle

    ensure_hash_shuffle()
    p = num_partitions or max(8, cluster_cpus())
    partials = ds.map_batches(
        _group_topk_block_fn(group_col, id_col, weight_col, k, seed,
                             hasher, final=False),
        batch_format="pyarrow")
    co = partials.repartition(p, keys=[group_col])
    return co.map_batches(
        _group_topk_block_fn(group_col, id_col, weight_col, k, seed,
                             hasher, final=True),
        batch_format="pyarrow", batch_size=None)


def weighted_sample_k(ds, id_col: str, weight_col: str, k: int,
                      seed: int = 0, hasher: str = "xxh64") -> pa.Table:
    """Distributed A-ES weighted sample without replacement: global
    top-k rows by ln(u)/w. Returns (rank, id, weight) sorted by rank;
    fewer than k rows iff the dataset has fewer positive-weight rows.
    Ties in sample_key (measure-zero for distinct ids) break by id
    asc, so the result is a pure function of (dataset contents, seed,
    k) — partitioning-invariant, pinned in tests."""
    partials = ds.map_batches(
        make_weighted_partial_fn(id_col, weight_col, k, seed, hasher),
        batch_format="pyarrow")
    parts = [b for b in partials.iter_batches(batch_size=1 << 16,
                                              batch_format="pyarrow")]
    if not parts:
        return pa.table({"rank": pa.array([], type=pa.int64()),
                         id_col: pa.array([], type=pa.int64()),
                         weight_col: pa.array([], type=pa.float64())})
    tbl = pa.concat_tables(parts)
    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    w = tbl[weight_col].to_numpy(zero_copy_only=False)
    key = tbl["sample_key"].to_numpy(zero_copy_only=False)
    finite = key > -np.inf
    ids, w, key = ids[finite], w[finite], key[finite]
    order = np.lexsort((ids, -key))[:k]
    return pa.table({
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        id_col: pa.array(ids[order], type=pa.int64()),
        weight_col: pa.array(w[order], type=pa.float64()),
    })
