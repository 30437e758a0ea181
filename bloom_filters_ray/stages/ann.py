"""Similarity search over embedding columns: brute-force cosine top-k
(baseline) and LSH-bucketed candidate generation (scale path).

- ``brute_force_topk``: the exact baseline — broadcast the (small)
  query matrix once (``ray.put``), each block computes a vectorized
  (block × queries) cosine matrix and emits only its block-local top-k
  rows per query (k·q rows per block, never the full similarity
  matrix); the driver merges the tiny partials. numpy matmul per batch
  against the broadcast query matrix.
- ``make_projection_code_fn``: signed-random-projection LSH (Charikar
  hyperplane SimHash) mapping each embedding to a 64-bit code whose
  Hamming distance approximates angular distance; the code column
  feeds the same Hamming banding machinery as phash
  (stages/simhash.py), giving the embedding-cosine near-dup tier:
  code bands → band-bucket shuffle → candidate pairs → exact cosine
  verification against a broadcast (id, normalized-vector) lookup.

At 10^12-row scale the verification broadcast becomes a hash join of
pair rows against the embedding table (same switch as
pipelines/dedup.verify_pairs_join); band rows carry only
(band_key, id) either way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import DEFAULT_SEED
from .neardup import _cached_broadcast, sig_matrix


def embedding_matrix(col, dim: int | None = None) -> np.ndarray:
    """(n, d) float64 matrix from an Arrow list<float> column, zero-copy
    from the flat values buffer."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = np.asarray(col.values)
    offs = np.asarray(col.offsets, dtype=np.int64)
    lens = np.diff(offs)
    if dim is None:
        dim = int(lens[0]) if len(lens) else 0
    if not (lens == dim).all():
        raise ValueError("ragged embedding column")
    start = offs[0]
    return vals[start : start + len(lens) * dim].astype(np.float64) \
        .reshape(len(lens), dim)


def normalize_rows(E: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(E, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return E / n


def make_block_pair_fn(corpus_ref, threshold: float,
                       id_col: str = "vec_id", emb_col: str = "embedding"):
    """map_batches fn: score the block's rows against the broadcast
    normalized corpus matrix and emit (a, b) id pairs with cosine ≥
    *threshold*. Each unordered pair comes out exactly once — only
    from the block holding its smaller id."""

    def fn(batch: pa.Table) -> pa.Table:
        from .sketch_aggs import _plain_fetch

        ids_all, M = _plain_fetch(corpus_ref)
        E = normalize_rows(embedding_matrix(batch[emb_col]))
        bid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = E @ M.T  # (b, n)
        ii, jj = np.nonzero(sims >= threshold)
        a, b = bid[ii], ids_all[jj]
        keep = a < b
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    return fn


def exact_cosine_pairs(ds, threshold: float, id_col: str = "vec_id",
                       emb_col: str = "embedding",
                       broadcast_limit: int = 2_000_000):
    """Exact cosine-threshold duplicate-pair extraction: blocked
    matmul of every dataset block against the broadcast normalized
    corpus matrix (``ray.put`` once, fetched once per worker). This is
    the brute-force verification baseline — O(n·corpus) FLOPs spread
    across blocks, valid while the corpus matrix fits the object
    store; beyond that, the LSH-banded ``embedding_neardup`` pipeline
    is the scale path and this function is its recall oracle.

    *ds* is materialized internally (it is consumed twice — the corpus
    collect and the pair scan — and a lazy input would silently
    re-execute its whole upstream lineage on the second pass).
    Returns a Dataset of (a, b) int64 pairs, each unordered pair
    exactly once. Corpora beyond *broadcast_limit* rows fail LOUDLY —
    use the LSH-banded ``embedding_neardup`` pipeline there; silent
    driver OOM is worse than a ValueError."""
    import ray

    ds = ds.materialize()  # consumed twice; no-op if already material
    tbl = pa.concat_tables(
        [b for b in ds.select_columns([id_col, emb_col])
         .iter_batches(batch_size=1 << 16, batch_format="pyarrow")])
    if len(tbl) > broadcast_limit:
        raise ValueError(
            f"exact_cosine_pairs is the brute-force broadcast baseline: "
            f"corpus has {len(tbl)} rows > broadcast_limit="
            f"{broadcast_limit}; use pipelines.embdedup (LSH-banded) "
            f"at this scale")
    ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ref = ray.put((ids, normalize_rows(embedding_matrix(tbl[emb_col]))))
    return ds.map_batches(
        make_block_pair_fn(ref, threshold, id_col, emb_col),
        batch_format="pyarrow")


def make_block_topk_fn(query_ref, k: int, id_col: str = "vec_id",
                       emb_col: str = "embedding", exclude_self: bool = True):
    """map_batches fn emitting each block's top-k neighbors per query:
    (query_id, neighbor_id, sim) rows, k·n_queries per block max."""

    def fn(batch: pa.Table) -> pa.Table:
        from .sketch_aggs import _plain_fetch

        q_ids, Q = _plain_fetch(query_ref)  # Q: (q, d) normalized
        q_id_arr = np.asarray(q_ids, dtype=np.int64)
        E = normalize_rows(embedding_matrix(batch[emb_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = E @ Q.T  # (b, q)
        if exclude_self:
            sims[ids[:, None] == q_id_arr[None, :]] = -np.inf
        kk = min(k, sims.shape[0])
        # block-local top-k rows per query column
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, q)
        out_q = np.repeat(q_id_arr, kk)
        out_n = ids[part.T.ravel()]
        out_s = np.take_along_axis(sims, part, axis=0).T.ravel()
        keep = np.isfinite(out_s)
        return pa.Table.from_arrays(
            [pa.array(out_q[keep]), pa.array(out_n[keep]),
             pa.array(out_s[keep])],
            names=["query_id", "neighbor_id", "sim"])

    return fn


def _rank_topk(qf: np.ndarray, nf: np.ndarray, sf: np.ndarray, k: int):
    """THE shared ANN tie-break: lexsort by (query, sim desc, neighbor
    asc), rank 1..k within each query, drop the rest. Used identically
    by the block-local emitters (IVF / IVF-PQ) and the driver merge so
    block-local pruning can never disagree with the global merge.
    Returns (query, neighbor, sim, rank) filtered arrays."""
    order = np.lexsort((nf, -sf, qf))
    qf, nf, sf = qf[order], nf[order], sf[order]
    first = np.ones(len(qf), dtype=bool)
    first[1:] = qf[1:] != qf[:-1]
    gstart = np.maximum.accumulate(np.where(first, np.arange(len(qf)), 0))
    rank = np.arange(len(qf)) - gstart + 1
    keep = rank <= k
    return qf[keep], nf[keep], sf[keep], rank[keep].astype(np.int64)


def merge_topk_partials(partials, k: int) -> pa.Table:
    """Driver-side merge of block-local (query_id, neighbor_id, sim)
    top-k partials — tiny by construction (≤ k rows per query per
    block): global (sim desc, neighbor_id asc) order within each
    query, rank 1..k via the shared ``_rank_topk`` tie-break."""
    tbl = partials if isinstance(partials, pa.Table) else pa.concat_tables(
        [b for b in partials.iter_batches(batch_size=1 << 16,
                                          batch_format="pyarrow")])
    qi = tbl["query_id"].to_numpy(zero_copy_only=False)
    ni = tbl["neighbor_id"].to_numpy(zero_copy_only=False)
    si = tbl["sim"].to_numpy(zero_copy_only=False)
    qi, ni, _, rank = _rank_topk(qi, ni, si, k)
    return pa.table({
        "query_id": pa.array(qi),
        "neighbor_id": pa.array(ni),
        "rank": pa.array(rank),
    })


def brute_force_topk(ds, query_ids: np.ndarray, Q: np.ndarray, k: int,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     exclude_self: bool = True) -> pa.Table:
    """Exact cosine top-k of each query row against every dataset row.
    Returns (query_id, neighbor_id, rank) sorted, rank 1..k, ties
    broken by neighbor_id (deterministic)."""
    import ray

    ref = ray.put((list(np.asarray(query_ids, dtype=np.int64)),
                   normalize_rows(np.asarray(Q, dtype=np.float64))))
    partials = ds.map_batches(
        make_block_topk_fn(ref, k, id_col, emb_col, exclude_self),
        batch_format="pyarrow")
    return merge_topk_partials(partials, k)


def make_projection_code_fn(dim: int, id_col: str = "vec_id",
                            emb_col: str = "embedding", n_bits: int = 64,
                            seed: int = DEFAULT_SEED):
    """map_batches fn: embedding → 64-bit signed-random-projection code
    (column ``simcode`` int64). The (dim, n_bits) Gaussian hyperplane
    matrix is derived deterministically from the seed, so every worker
    builds the identical projection."""
    assert n_bits <= 64

    def fn(batch: pa.Table) -> pa.Table:
        H = _hyperplanes(dim, n_bits, seed)
        E = embedding_matrix(batch[emb_col], dim)
        bits = (E @ H) > 0  # (n, n_bits)
        shifts = np.arange(n_bits, dtype=np.uint64)
        codes = (bits.astype(np.uint64) << shifts[None, :]).sum(
            axis=1, dtype=np.uint64)
        return pa.Table.from_arrays(
            [batch[id_col], pa.array(codes.astype(np.int64))],
            names=[id_col, "simcode"])

    return fn


_PLANES: dict = {}


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    key = (dim, n_bits, seed)
    if key not in _PLANES:
        rng = np.random.default_rng(seed & ((1 << 63) - 1))
        _PLANES[key] = rng.standard_normal((dim, n_bits))
    return _PLANES[key]


def train_centroids(ds, n_centroids: int, dim: int | None = None,
                    emb_col: str = "embedding", sample_rows: int = 65536,
                    iters: int = 10, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Coarse IVF quantizer: k-means on a bounded SAMPLE of the
    dataset (Lloyd iterations on the driver over ≤ sample_rows rows —
    the classic IVF training recipe; the full corpus never leaves the
    cluster). Returns a row-normalized (k, d) centroid matrix."""
    sample = ds.limit(sample_rows)
    tbl = pa.concat_tables(list(sample.iter_batches(
        batch_size=1 << 16, batch_format="pyarrow")))
    X = normalize_rows(embedding_matrix(tbl[emb_col], dim))
    rng = np.random.default_rng(seed & ((1 << 63) - 1))
    k = min(n_centroids, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)  # cosine on normalized rows
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = normalize_rows(C)
    return C


def make_ivf_assign_fn(centroid_ref, id_col: str = "vec_id",
                       emb_col: str = "embedding",
                       dim: int | None = None):
    """map_batches fn: (id, embedding) → (list_id, id, embedding) rows,
    list_id = nearest centroid (broadcast matrix, one matmul/batch).
    The list_id keys the IVF inverted-list repartition."""
    from .sketch_aggs import _plain_fetch

    def fn(batch: pa.Table) -> pa.Table:
        C = _plain_fetch(centroid_ref)
        E = normalize_rows(embedding_matrix(batch[emb_col], dim))
        lists = np.argmax(E @ C.T, axis=1).astype(np.int64)
        out = batch.select([id_col, emb_col])
        return out.add_column(0, "list_id", pa.array(lists))

    return fn


def make_ivf_probe_fn(centroid_ref, query_ref, k: int, nprobe: int,
                      id_col: str = "vec_id", emb_col: str = "embedding",
                      dim: int | None = None, exclude_self: bool = True):
    """Whole-block fn over list_id-partitioned rows: for each query,
    scan ONLY the rows of its *nprobe* nearest inverted lists present
    in this block and emit block-local top-k partials — the IVF
    approximate-search recipe (probe a few lists, not the corpus)."""
    from .sketch_aggs import _plain_fetch

    def fn(batch: pa.Table) -> pa.Table:
        C = _plain_fetch(centroid_ref)
        q_ids, Q = _plain_fetch(query_ref)  # Q normalized (q, d)
        q_id_arr = np.asarray(q_ids, dtype=np.int64)
        probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (q, nprobe)
        lists = batch["list_id"].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        E = normalize_rows(embedding_matrix(batch[emb_col], dim))

        def empty() -> pa.Table:
            e = pa.array([], type=pa.int64())
            return pa.Table.from_arrays(
                [e, e, pa.array([], type=pa.float64())],
                names=["query_id", "neighbor_id", "sim"])

        if len(ids) == 0 or len(q_id_arr) == 0:
            return empty()
        # group block rows by list once; then one searchsorted of the
        # whole (q, nprobe) probe matrix against the present lists —
        # ALL queries resolved at once, no per-query block scan. The
        # work loop below is over DISTINCT lists in this block (bounded
        # by lists/partition, a structural constant), one BLAS matmul
        # (segment x probing-queries) each.
        order = np.argsort(lists, kind="stable")
        ls, ids_s, E_s = lists[order], ids[order], E[order]
        ulists, ustarts = np.unique(ls, return_index=True)
        bounds = np.append(ustarts, len(ls))
        pos = np.searchsorted(ulists, probe)
        pos_c = np.minimum(pos, len(ulists) - 1)
        hit = ulists[pos_c] == probe           # (q, nprobe) membership
        pq, _ = np.nonzero(hit)
        pl = pos_c[hit]
        if not len(pq):
            return empty()
        g = np.argsort(pl, kind="stable")
        pl_s, pq_s = pl[g], pq[g]
        gb = np.append(
            np.searchsorted(pl_s, np.arange(len(ulists)), side="left"),
            len(pl_s))
        out_q, out_n, out_s = [], [], []
        for li in range(len(ulists)):
            qs = pq_s[gb[li] : gb[li + 1]]
            if not len(qs):
                continue
            seg = slice(int(bounds[li]), int(bounds[li + 1]))
            S = E_s[seg] @ Q[qs].T             # (m, q_hit)
            m, qh = S.shape
            out_q.append(np.tile(q_id_arr[qs], m))
            out_n.append(np.repeat(ids_s[seg], qh))
            out_s.append(S.ravel())
        qf = np.concatenate(out_q)
        nf = np.concatenate(out_n)
        sf = np.concatenate(out_s)
        if exclude_self:
            keep = nf != qf
            qf, nf, sf = qf[keep], nf[keep], sf[keep]
        if not len(qf):
            return empty()
        qf, nf, sf, _ = _rank_topk(qf, nf, sf, k)
        return pa.Table.from_arrays(
            [pa.array(qf), pa.array(nf), pa.array(sf)],
            names=["query_id", "neighbor_id", "sim"])

    return fn


def _fit_subspace_books(X: np.ndarray, m: int, n_codes: int, iters: int,
                        rng) -> np.ndarray:
    """Per-subspace Lloyd k-means over the (already rotated/normalized)
    sample matrix → (m, n_codes, d/m) codebook tensor."""
    n, d = X.shape
    assert d % m == 0, (d, m)
    sub = d // m
    ks = min(n_codes, n)
    books = np.empty((m, n_codes, sub), dtype=np.float64)
    for j in range(m):
        Xj = X[:, j * sub : (j + 1) * sub]
        C = Xj[rng.choice(n, size=ks, replace=False)].copy()
        for _ in range(iters):
            d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (Xj @ C.T)
            assign = np.argmin(d2, axis=1)
            for c in range(ks):
                mem = Xj[assign == c]
                if len(mem):
                    C[c] = mem.mean(axis=0)
        books[j, :ks] = C
        if ks < n_codes:  # tiny sample: pad with the first centroid
            books[j, ks:] = C[0]
    return books


def _sample_matrix(ds, emb_col: str, dim: int | None,
                   sample_rows: int) -> np.ndarray:
    sample = ds.limit(sample_rows)
    tbl = pa.concat_tables(list(sample.iter_batches(
        batch_size=1 << 16, batch_format="pyarrow")))
    return normalize_rows(embedding_matrix(tbl[emb_col], dim))


def train_pq_codebooks(ds, m: int = 8, n_codes: int = 256,
                       dim: int | None = None,
                       emb_col: str = "embedding",
                       sample_rows: int = 65536, iters: int = 10,
                       seed: int = DEFAULT_SEED) -> np.ndarray:
    """Product-quantization codebooks (Jégou, Douze, Schmid, "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): the
    sample's L2-normalized rows are split into *m* contiguous
    subspaces and Lloyd k-means runs per subspace on the driver —
    training touches ≤ sample_rows rows, never the corpus. Returns a
    (m, n_codes, d/m) float64 codebook tensor."""
    X = _sample_matrix(ds, emb_col, dim, sample_rows)
    rng = np.random.default_rng(seed & ((1 << 63) - 1))
    return _fit_subspace_books(X, m, n_codes, iters, rng)


def _pq_reconstruct(Z: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Encode-then-decode Z against the codebooks (training helper)."""
    m, _, sub = books.shape
    out = np.empty_like(Z)
    for j in range(m):
        Zj = Z[:, j * sub : (j + 1) * sub]
        d2 = (books[j] * books[j]).sum(axis=1)[None, :] \
            - 2.0 * (Zj @ books[j].T)
        out[:, j * sub : (j + 1) * sub] = books[j][np.argmin(d2, axis=1)]
    return out


def train_opq_codebooks(ds, m: int = 8, n_codes: int = 256,
                        dim: int | None = None,
                        emb_col: str = "embedding",
                        sample_rows: int = 65536, iters: int = 10,
                        opq_iters: int = 8,
                        seed: int = DEFAULT_SEED):
    """OPQ: PQ with a learned orthogonal rotation (Ge, He, Ke, Sun,
    "Optimized Product Quantization", CVPR 2013, non-parametric
    variant): alternate (fit codebooks on X·R) with (Procrustes update
    R = U·Vᵀ from svd(Xᵀ·X̂) minimizing ‖X·R − X̂‖_F over orthogonal
    R). Rotating before the subspace split rebalances variance across
    subspaces, cutting quantization error where coordinates are
    correlated; R is orthogonal so inner products are preserved —
    q·x = (q·R)·(x·R) — and the whole ADC machinery is reused
    unchanged on rotated vectors. Returns (R (d, d), books
    (m, n_codes, d/m)); opq_iters=0 yields R = I and exact flat-PQ
    behavior (pinned in tests)."""
    X = _sample_matrix(ds, emb_col, dim, sample_rows)
    d = X.shape[1]
    rng = np.random.default_rng(seed & ((1 << 63) - 1))
    R = np.eye(d)
    for _ in range(max(opq_iters, 0)):
        Z = X @ R
        books = _fit_subspace_books(Z, m, n_codes, max(iters // 2, 2), rng)
        Zhat = _pq_reconstruct(Z, books)
        U, _, Vt = np.linalg.svd(X.T @ Zhat)
        R = U @ Vt
    books = _fit_subspace_books(X @ R, m, n_codes, iters, rng)
    return R, books


def make_pq_encode_fn(book_ref, id_col: str = "vec_id",
                      emb_col: str = "embedding",
                      dim: int | None = None, rot_ref=None):
    """map_batches fn: (id, embedding) → (id, pq_code binary[m]) —
    one byte per subspace (nearest codebook entry by L2), 8 bytes/row
    at m=8 instead of 8·d — the representation that lets a 10^12-row
    corpus sit in RAM-scale storage for ANN scans. *rot_ref* (OPQ):
    broadcast orthogonal rotation applied after normalization."""
    from .sketch_aggs import _plain_fetch

    def fn(batch: pa.Table) -> pa.Table:
        B = _plain_fetch(book_ref)  # (m, ks, sub)
        m, ks, sub = B.shape
        E = normalize_rows(embedding_matrix(batch[emb_col], dim))
        if rot_ref is not None:
            E = E @ _plain_fetch(rot_ref)
        n = len(E)
        codes = np.empty((n, m), dtype=np.uint8)
        for j in range(m):
            Xj = E[:, j * sub : (j + 1) * sub]
            d2 = (B[j] * B[j]).sum(axis=1)[None, :] - 2.0 * (Xj @ B[j].T)
            codes[:, j] = np.argmin(d2, axis=1)
        data = pa.py_buffer(np.ascontiguousarray(codes).tobytes())
        offsets = pa.py_buffer(
            (np.arange(n + 1, dtype=np.int32) * m).tobytes())
        arr = pa.Array.from_buffers(pa.binary(), n, [None, offsets, data])
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.Table.from_arrays([ids, arr], names=[id_col, "pq_code"])

    return fn


def make_pq_adc_topk_fn(book_ref, query_ref, k: int,
                        id_col: str = "vec_id",
                        exclude_self: bool = True, rot_ref=None):
    """Whole-block ADC (asymmetric distance computation) scan over PQ
    codes: per block, ONE (q, m, ks) inner-product table against the
    codebooks, then the approximate similarity of every row is m
    byte-indexed gathers — no per-dimension float math against the
    corpus. Emits block-local top-k partials like the brute-force
    scanner. *rot_ref* (OPQ): queries are rotated by the same
    orthogonal R the codes were encoded under (q·x = (q·R)·(x·R))."""
    from .sketch_aggs import _plain_fetch

    def fn(batch: pa.Table) -> pa.Table:
        B = _plain_fetch(book_ref)          # (m, ks, sub)
        q_ids, Q = _plain_fetch(query_ref)  # Q normalized (q, d)
        if rot_ref is not None:
            Q = Q @ _plain_fetch(rot_ref)
        q_id_arr = np.asarray(q_ids, dtype=np.int64)
        m, ks, sub = B.shape
        codes = sig_matrix(batch, "pq_code", dtype="u1")  # (n, m)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        nq = len(q_id_arr)
        if n == 0 or nq == 0:
            e = pa.array([], type=pa.int64())
            return pa.Table.from_arrays(
                [e, e, pa.array([], type=pa.float64())],
                names=["query_id", "neighbor_id", "sim"])
        sims = np.zeros((nq, n), dtype=np.float64)
        for j in range(m):
            T = Q[:, j * sub : (j + 1) * sub] @ B[j].T  # (q, ks)
            sims += T[:, codes[:, j]]
        if exclude_self:
            sims[q_id_arr[:, None] == ids[None, :]] = -np.inf
        kk = min(k, n)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]  # (q, kk)
        out_q = np.repeat(q_id_arr, kk)
        out_n = ids[part.ravel()]
        out_s = np.take_along_axis(sims, part, axis=1).ravel()
        keep = np.isfinite(out_s)
        return pa.Table.from_arrays(
            [pa.array(out_q[keep]), pa.array(out_n[keep]),
             pa.array(out_s[keep])],
            names=["query_id", "neighbor_id", "sim"])

    return fn


def pq_topk(ds, query_ids: np.ndarray, Q: np.ndarray, k: int,
            m: int = 8, n_codes: int = 256,
            id_col: str = "vec_id", emb_col: str = "embedding",
            exclude_self: bool = True,
            seed: int = DEFAULT_SEED) -> pa.Table:
    """PQ-compressed approximate cosine top-k: train per-subspace
    codebooks on a sample, encode the corpus to m-byte codes
    (streaming map), ADC-scan the codes per block, merge tiny
    partials on the driver. Approximate by construction; recall vs
    the exact brute force is pinned in tests. Returns (query_id,
    neighbor_id, rank) with the same deterministic tie-break as
    ``brute_force_topk``."""
    import ray

    books = train_pq_codebooks(ds, m=m, n_codes=n_codes,
                               emb_col=emb_col, seed=seed)
    book_ref = ray.put(books)
    codes = ds.map_batches(
        make_pq_encode_fn(book_ref, id_col, emb_col),
        batch_format="pyarrow")
    query_ref = ray.put((list(np.asarray(query_ids, dtype=np.int64)),
                         normalize_rows(np.asarray(Q, dtype=np.float64))))
    partials = codes.map_batches(
        make_pq_adc_topk_fn(book_ref, query_ref, k, id_col,
                            exclude_self),
        batch_format="pyarrow")
    return merge_topk_partials(partials, k)


def opq_topk(ds, query_ids: np.ndarray, Q: np.ndarray, k: int,
             m: int = 8, n_codes: int = 256, opq_iters: int = 8,
             id_col: str = "vec_id", emb_col: str = "embedding",
             exclude_self: bool = True,
             seed: int = DEFAULT_SEED) -> pa.Table:
    """OPQ approximate cosine top-k: flat PQ with the learned
    orthogonal pre-rotation (train_opq_codebooks). Identical pipeline
    shape to ``pq_topk`` — rotation is a broadcast (d, d) matrix
    applied inside the encode and ADC stages; with opq_iters=0 the
    result is bit-equal to flat PQ."""
    import ray

    R, books = train_opq_codebooks(ds, m=m, n_codes=n_codes,
                                   emb_col=emb_col, opq_iters=opq_iters,
                                   seed=seed)
    book_ref = ray.put(books)
    rot_ref = ray.put(R)
    codes = ds.map_batches(
        make_pq_encode_fn(book_ref, id_col, emb_col, rot_ref=rot_ref),
        batch_format="pyarrow")
    query_ref = ray.put((list(np.asarray(query_ids, dtype=np.int64)),
                         normalize_rows(np.asarray(Q, dtype=np.float64))))
    partials = codes.map_batches(
        make_pq_adc_topk_fn(book_ref, query_ref, k, id_col,
                            exclude_self, rot_ref=rot_ref),
        batch_format="pyarrow")
    return merge_topk_partials(partials, k)


def _lloyd(X: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """Plain L2 Lloyd k-means on the driver (training samples only)."""
    C = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].copy()
    for _ in range(iters):
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        assign = np.argmin(d2, axis=1)
        for c in range(len(C)):
            mem = X[assign == c]
            if len(mem):
                C[c] = mem.mean(axis=0)
    return C


def train_ivf_pq(ds, n_centroids: int = 64, m: int = 8,
                 n_codes: int = 256, dim: int | None = None,
                 emb_col: str = "embedding", sample_rows: int = 65536,
                 iters: int = 10, seed: int = DEFAULT_SEED):
    """IVFADC training (Jégou et al., TPAMI 2011): coarse centroids on
    a normalized sample, then per-subspace PQ codebooks on the
    RESIDUALS x − c(x) — the residual energy is what the fine
    quantizer must cover, which is why IVF-PQ beats flat PQ at equal
    code budget. Driver-side over ≤ sample_rows rows. Returns
    (centroids (K, d), codebooks (m, n_codes, d/m))."""
    sample = ds.limit(sample_rows)
    tbl = pa.concat_tables(list(sample.iter_batches(
        batch_size=1 << 16, batch_format="pyarrow")))
    X = normalize_rows(embedding_matrix(tbl[emb_col], dim))
    n, d = X.shape
    assert d % m == 0, (d, m)
    sub = d // m
    rng = np.random.default_rng(seed & ((1 << 63) - 1))
    C = normalize_rows(_lloyd(X, n_centroids, iters, rng))
    R = X - C[np.argmax(X @ C.T, axis=1)]
    ks = min(n_codes, n)
    books = np.empty((m, n_codes, sub), dtype=np.float64)
    for j in range(m):
        Cj = _lloyd(R[:, j * sub : (j + 1) * sub], ks, iters, rng)
        books[j, :len(Cj)] = Cj
        if len(Cj) < n_codes:
            books[j, len(Cj):] = Cj[0]
    return C, books


def make_ivf_pq_encode_fn(centroid_ref, book_ref, id_col: str = "vec_id",
                          emb_col: str = "embedding",
                          dim: int | None = None):
    """map_batches fn: (id, embedding) → (list_id, id, pq_code):
    nearest coarse centroid, then the RESIDUAL encoded to m bytes."""
    from .sketch_aggs import _plain_fetch

    def fn(batch: pa.Table) -> pa.Table:
        C = _plain_fetch(centroid_ref)
        B = _plain_fetch(book_ref)
        m, ks, sub = B.shape
        E = normalize_rows(embedding_matrix(batch[emb_col], dim))
        lists = np.argmax(E @ C.T, axis=1)
        R = E - C[lists]
        n = len(E)
        codes = np.empty((n, m), dtype=np.uint8)
        for j in range(m):
            Rj = R[:, j * sub : (j + 1) * sub]
            d2 = (B[j] * B[j]).sum(axis=1)[None, :] - 2.0 * (Rj @ B[j].T)
            codes[:, j] = np.argmin(d2, axis=1)
        data = pa.py_buffer(np.ascontiguousarray(codes).tobytes())
        offsets = pa.py_buffer(
            (np.arange(n + 1, dtype=np.int32) * m).tobytes())
        arr = pa.Array.from_buffers(pa.binary(), n, [None, offsets, data])
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.Table.from_arrays(
            [pa.array(lists.astype(np.int64)), ids, arr],
            names=["list_id", id_col, "pq_code"])

    return fn


def make_ivf_pq_probe_fn(centroid_ref, book_ref, query_ref, k: int,
                         nprobe: int, id_col: str = "vec_id",
                         exclude_self: bool = True):
    """Whole-block fn over list_id-partitioned PQ codes: per query,
    scan only its nprobe nearest lists; the approximate inner product
    is q·c(list) + Σ_j T_j[code_j] with T_j = q·codebook_j — since
    q·x = q·c + q·r̂, the tables are LIST-INDEPENDENT and built once
    per block; per list only the q·c offset changes. Byte gathers
    against the corpus, float math only against codebooks."""
    from .sketch_aggs import _plain_fetch

    def fn(batch: pa.Table) -> pa.Table:
        C = _plain_fetch(centroid_ref)
        B = _plain_fetch(book_ref)
        q_ids, Q = _plain_fetch(query_ref)
        q_id_arr = np.asarray(q_ids, dtype=np.int64)
        m, ks, sub = B.shape

        def empty() -> pa.Table:
            e = pa.array([], type=pa.int64())
            return pa.Table.from_arrays(
                [e, e, pa.array([], type=pa.float64())],
                names=["query_id", "neighbor_id", "sim"])

        n = batch.num_rows
        if n == 0 or len(q_id_arr) == 0:
            return empty()
        codes = sig_matrix(batch, "pq_code", dtype="u1")
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lists = batch["list_id"].to_numpy(zero_copy_only=False)
        qc = Q @ C.T  # (q, K)
        probe = np.argsort(-qc, axis=1)[:, :nprobe]
        order = np.argsort(lists, kind="stable")
        ls, ids_s, codes_s = lists[order], ids[order], codes[order]
        ulists, ustarts = np.unique(ls, return_index=True)
        bounds = np.append(ustarts, n)
        pos = np.minimum(np.searchsorted(ulists, probe), len(ulists) - 1)
        hit = ulists[pos] == probe
        pq_, _ = np.nonzero(hit)
        pl = pos[hit]
        if not len(pq_):
            return empty()
        g = np.argsort(pl, kind="stable")
        pl_s, pq_s = pl[g], pq_[g]
        gb = np.append(
            np.searchsorted(pl_s, np.arange(len(ulists)), side="left"),
            len(pl_s))
        # list-independent ADC tables: T[j] = q · codebook_j, (q, ks)
        T = [Q[:, j * sub : (j + 1) * sub] @ B[j].T for j in range(m)]
        out_q, out_n, out_s = [], [], []
        for li in range(len(ulists)):
            qs = pq_s[gb[li] : gb[li + 1]]
            if not len(qs):
                continue
            seg = slice(int(bounds[li]), int(bounds[li + 1]))
            cid = int(ulists[li])
            seg_codes = codes_s[seg]        # (ms, m)
            sims = np.broadcast_to(qc[qs, cid][:, None],
                                   (len(qs), seg_codes.shape[0])).copy()
            for j in range(m):
                sims += T[j][qs][:, seg_codes[:, j]]
            qh, ms = sims.shape
            out_q.append(np.repeat(q_id_arr[qs], ms))
            out_n.append(np.tile(ids_s[seg], qh))
            out_s.append(sims.ravel())
        qf = np.concatenate(out_q)
        nf = np.concatenate(out_n)
        sf = np.concatenate(out_s)
        if exclude_self:
            keep = nf != qf
            qf, nf, sf = qf[keep], nf[keep], sf[keep]
        if not len(qf):
            return empty()
        qf, nf, sf, _ = _rank_topk(qf, nf, sf, k)
        return pa.Table.from_arrays(
            [pa.array(qf), pa.array(nf), pa.array(sf)],
            names=["query_id", "neighbor_id", "sim"])

    return fn


def ivf_pq_topk(ds, query_ids: np.ndarray, Q: np.ndarray, k: int,
                n_centroids: int = 64, nprobe: int = 8, m: int = 8,
                n_codes: int = 256, id_col: str = "vec_id",
                emb_col: str = "embedding",
                num_partitions: int = 8, exclude_self: bool = True,
                seed: int = DEFAULT_SEED) -> pa.Table:
    """IVFADC end to end: residual-PQ training on a sample, streaming
    encode to (list_id, id, m bytes), inverted-list repartition,
    nprobe ADC scans per block, driver merge of tiny partials. The
    trillion-row recipe: the corpus is touched once to encode, search
    reads only m-byte codes from nprobe lists."""
    import ray

    C, books = train_ivf_pq(ds, n_centroids, m, n_codes,
                            emb_col=emb_col, seed=seed)
    cref, bref = ray.put(C), ray.put(books)
    codes = ds.map_batches(
        make_ivf_pq_encode_fn(cref, bref, id_col, emb_col),
        batch_format="pyarrow")
    codes = codes.repartition(num_partitions, keys=["list_id"])
    query_ref = ray.put((list(np.asarray(query_ids, dtype=np.int64)),
                         normalize_rows(np.asarray(Q, dtype=np.float64))))
    partials = codes.map_batches(
        make_ivf_pq_probe_fn(cref, bref, query_ref, k, nprobe, id_col,
                             exclude_self),
        batch_format="pyarrow", batch_size=None)
    return merge_topk_partials(partials, k)


def pq_topk_reranked(ds, query_ids: np.ndarray, Q: np.ndarray, k: int,
                     k_candidates: int | None = None, m: int = 8,
                     n_codes: int = 256, id_col: str = "vec_id",
                     emb_col: str = "embedding",
                     exclude_self: bool = True,
                     seed: int = DEFAULT_SEED) -> pa.Table:
    """Two-stage retrieval (the production PQ pattern): a cheap ADC
    pass shortlists ``k_candidates`` (default 5k) per query, then a
    second streaming pass over the corpus computes EXACT cosine for
    shortlisted (query, candidate) pairs only — the candidate set
    (q × k' ids) broadcasts, true vectors never leave their blocks,
    and the final top-k order is exact over the shortlist. Recall is
    bounded by the ADC shortlist's recall@k_candidates (pinned in
    tests); the rerank fixes every ordering error quantization
    introduced within it."""
    import ray

    kc = k_candidates or 5 * k
    cand = pq_topk(ds, query_ids, Q, kc, m=m, n_codes=n_codes,
                   id_col=id_col, emb_col=emb_col,
                   exclude_self=exclude_self, seed=seed)
    q_id_arr = np.asarray(query_ids, dtype=np.int64)
    qpos = {int(q): i for i, q in enumerate(q_id_arr)}
    c_n = cand["neighbor_id"].to_numpy()
    c_q = np.array([qpos[int(q)] for q in cand["query_id"].to_numpy()],
                   dtype=np.int64)
    order = np.argsort(c_n, kind="stable")
    Qn = normalize_rows(np.asarray(Q, dtype=np.float64))
    ref = ray.put((c_n[order], c_q[order], q_id_arr, Qn))

    def rerank(batch: pa.Table) -> pa.Table:
        from .sketch_aggs import _plain_fetch

        nbr_s, qrow_s, qids, Qm = _plain_fetch(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lo = np.searchsorted(nbr_s, ids, side="left")
        hi = np.searchsorted(nbr_s, ids, side="right")
        cnt = hi - lo
        hit_rows = np.flatnonzero(cnt)
        if not len(hit_rows):
            e = pa.array([], type=pa.int64())
            return pa.Table.from_arrays(
                [e, e, pa.array([], type=pa.float64())],
                names=["query_id", "neighbor_id", "sim"])
        E = normalize_rows(embedding_matrix(batch[emb_col]))
        row_rep = np.repeat(hit_rows, cnt[hit_rows])
        within = np.arange(len(row_rep)) - np.repeat(
            np.concatenate(([0], np.cumsum(cnt[hit_rows])[:-1])),
            cnt[hit_rows])
        cand_idx = lo[row_rep] + within
        qrows = qrow_s[cand_idx]
        sims = np.einsum("ij,ij->i", E[row_rep], Qm[qrows])
        return pa.Table.from_arrays(
            [pa.array(qids[qrows]), pa.array(ids[row_rep]),
             pa.array(sims)],
            names=["query_id", "neighbor_id", "sim"])

    partials = ds.map_batches(rerank, batch_format="pyarrow")
    return merge_topk_partials(partials, k)


def ivf_topk(ds, query_ids: np.ndarray, Q: np.ndarray, k: int,
             n_centroids: int = 64, nprobe: int = 8,
             id_col: str = "vec_id", emb_col: str = "embedding",
             num_partitions: int = 8, exclude_self: bool = True,
             seed: int = DEFAULT_SEED) -> pa.Table:
    """IVF approximate top-k: train a coarse quantizer on a sample,
    partition the corpus into centroid-keyed inverted lists (one keyed
    shuffle — at scale each list is a persistent partition reused
    across query batches), probe each query's nprobe nearest lists per
    block, merge tiny partials on the driver. Recall is tunable via
    nprobe (nprobe == n_centroids degenerates to exact brute force).
    """
    import ray

    from ..util import ensure_hash_shuffle

    ensure_hash_shuffle()
    C = train_centroids(ds, n_centroids, emb_col=emb_col, seed=seed)
    cref = ray.put(C)
    qref = ray.put((list(np.asarray(query_ids, dtype=np.int64)),
                    normalize_rows(np.asarray(Q, dtype=np.float64))))
    lists = ds.map_batches(
        make_ivf_assign_fn(cref, id_col, emb_col), batch_format="pyarrow")
    lists = lists.repartition(num_partitions, keys=["list_id"])
    partials = lists.map_batches(
        make_ivf_probe_fn(cref, qref, k, nprobe, id_col, emb_col,
                          exclude_self=exclude_self),
        batch_format="pyarrow", batch_size=None)
    return merge_topk_partials(partials, k)


def make_norm_vec_binary_fn(id_col: str = "vec_id",
                            emb_col: str = "embedding",
                            dim: int | None = None):
    """map_batches fn: (id, embedding list<float>) → (id, vec binary):
    row-normalized float64 vectors as fixed-width binary payloads (8d
    bytes/row) that ride through Arrow hash joins — the scale-path twin
    of the broadcast matrix (acero joins reject list non-key fields)."""

    def fn(batch: pa.Table) -> pa.Table:
        En = normalize_rows(embedding_matrix(batch[emb_col], dim))
        n, d = En.shape
        data = pa.py_buffer(np.ascontiguousarray(En, dtype="<f8").tobytes())
        offsets = pa.py_buffer(
            (np.arange(n + 1, dtype=np.int32) * (d * 8)).tobytes())
        arr = pa.Array.from_buffers(pa.binary(), n, [None, offsets, data])
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.Table.from_arrays([ids, arr], names=[id_col, "vec"])

    return fn


def verify_cosine_block(batch: pa.Table, threshold: float) -> pa.Table:
    """Verify candidate pairs when both sides' normalized vectors are
    already columns (post-join layout: vec_a, vec_b binary)."""
    from .neardup import sig_matrix

    va = sig_matrix(batch, "vec_a", dtype="<f8")
    vb = sig_matrix(batch, "vec_b", dtype="<f8")
    sim = np.einsum("ij,ij->i", va, vb) if len(va) else np.empty(0)
    keep = sim >= threshold
    out = batch.select(["a", "b"]).filter(pa.array(keep))
    return out.append_column("sim", pa.array(sim[keep]))


def make_cosine_verifier(emb_ref, threshold: float, id_col: str = "vec_id"):
    """map_batches fn over candidate (a, b) pairs: keep pairs with
    exact cosine >= threshold, via broadcast (ids, normalized matrix)."""

    def fn(batch: pa.Table) -> pa.Table:
        lk = _cached_broadcast(emb_ref)
        sim = np.einsum("ij,ij->i", lk.rows(batch["a"]), lk.rows(batch["b"]))
        keep = sim >= threshold
        out = batch.filter(pa.array(keep))
        return out.append_column("sim", pa.array(sim[keep]))

    return fn
