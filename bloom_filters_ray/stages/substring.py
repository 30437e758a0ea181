"""Exact-substring dedup of captions via a suffix-array pass
(north_star: "a suffix-array pass for exact substring dedup of
captions"; engine-side operator, SURVEY.md §2.7).

Semantics: over a set of UNIQUE captions (run it on the exact tier's
representatives), caption A is a *substring duplicate* iff A occurs
verbatim inside some other caption B != A.

Method (per partition, vectorized):
1. concatenate captions' utf-8 bytes into one int32 text with a
   DISTINCT sentinel (256+i) after caption i — distinct sentinels keep
   suffix comparisons from crossing caption boundaries and make all
   suffixes distinct;
2. suffix array by prefix doubling (O(log n) ``np.lexsort`` rounds);
3. LCP array (Kasai); 4. caption i is contained in another caption
   iff the LCP of its full suffix with either suffix-array neighbour
   is >= len(i) — suffixes sharing the full prefix A sit adjacent in
   SA order, and no proper suffix of A can have prefix A (strictly
   shorter), so such a neighbour always lies in a different caption.

Scale path (``substring_flags_sharded``): character-level winnowing
fingerprints (Schleimer et al., SIGMOD'03) bucket the captions by
content locality — any caption of length >= t = k + window - 1 bytes
contained in another caption is GUARANTEED to share at least one
selected fingerprint with its container (the winnowing theorem: every
match of length >= t selects a common fingerprint in both texts), so
a fingerprint-keyed repartition co-locates every (containee,
container) pair and the per-partition suffix-array pass finds exactly
the global containments. Captions shorter than t form a tiny
broadcast side set probed against every block. Result is bit-equal to
the single-partition pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import DEFAULT_SEED, xxh64_u64

# rolling-hash parameters shared by the containment kernel and the
# short-caption probe: window hash h(s, L) = sum_u text[s+u] * Binv^u
# (position-independent; uint64 wraparound is the modulus)
_B = np.uint64(0x9E3779B97F4A7C15)
_BINV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))

# Per-worker grow-only caches. Pow tables are pure functions of the
# index and scratch is overwritten every call, so both amortize to zero
# fresh pages across blocks — first-touch page faults are the dominant
# kernel cost on this class of host (BASELINE.md), and a cumprod per
# block re-faults the whole table every time. Ray workers run one task
# at a time per process, so module state needs no locking.
_POW_CACHE: dict[str, np.ndarray] = {}
_SCRATCH: dict[str, np.ndarray] = {}


def _pow_table(key: str, n: int) -> np.ndarray:
    """First *n* powers of _B ("b") or _BINV ("binv"), cached grow-only
    (doubling) per worker process."""
    arr = _POW_CACHE.get(key)
    if arr is None or len(arr) < n:
        m = max(n, 1 << 16, 0 if arr is None else 2 * len(arr))
        base = _B if key == "b" else _BINV
        new = np.empty(m, dtype=np.uint64)
        new[0] = 1
        if m > 1:
            np.cumprod(np.full(m - 1, base, dtype=np.uint64), out=new[1:])
        _POW_CACHE[key] = new
        arr = new
    return arr[:n]


def _scratch_buf(name: str, n: int, dtype) -> np.ndarray:
    """Reused uninitialized scratch of at least *n* elements."""
    arr = _SCRATCH.get(name)
    if arr is None or len(arr) < n or arr.dtype != dtype:
        m = max(n, 1 << 16, 0 if arr is None else 2 * len(arr))
        arr = np.empty(m, dtype=dtype)
        _SCRATCH[name] = arr
    return arr[:n]


def suffix_array(text: np.ndarray) -> np.ndarray:
    """Suffix array of an int array by prefix doubling."""
    n = len(text)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # Initial rank: pack 4 symbols (16 bits each; alphabet = bytes +
    # per-caption sentinels stays < 2^16 for < 65k captions/partition)
    # into one int64 4-gram key so doubling starts at k=4, and copy —
    # the doubling loop swaps `rank` into the scratch buffer and writes
    # it, so aliasing the caller's array would corrupt it.
    t = np.array(text, dtype=np.int64, copy=True)
    if n >= 4 and t.max() < (1 << 16):
        padded = np.concatenate([t, np.full(3, -1, dtype=np.int64)])
        key = (((padded[:n] + 1) << 48) | ((padded[1 : n + 1] + 1) << 32)
               | ((padded[2 : n + 2] + 1) << 16) | (padded[3 : n + 3] + 1))
        _, rank = np.unique(key, return_inverse=True)
        k = 4
    else:
        rank = t
        k = 1
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    while True:
        # sort by (rank[i], rank[i+k]) with out-of-range rank = -1
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        sa = np.lexsort((second, rank))
        # re-rank
        r_sa = rank[sa]
        s_sa = second[sa]
        new = np.ones(n, dtype=np.int64)
        new[0] = 0
        new[1:] = (r_sa[1:] != r_sa[:-1]) | (s_sa[1:] != s_sa[:-1])
        tmp[sa] = np.cumsum(new)
        rank, tmp = tmp, rank
        if rank[sa[-1]] == n - 1:  # all ranks distinct → fully sorted
            break
        k <<= 1
        if k >= n:
            break
    return sa


def _hash_match_candidates(ww: np.ndarray, qh: np.ndarray
                           ) -> tuple[np.ndarray, np.ndarray]:
    """All (position, query) pairs where window hash ``ww[pos]`` equals
    a query hash ``qh[q]`` — one sorted-side binary search over the
    (small) query set per position, never a per-query scan of ``ww``.
    Returns (positions, query indices), expanded for hash multiplicity.

    Small query sets (the common shape: a handful of shorts per
    length) take an equality-scan fast path — one reused 1-byte mask
    per query instead of two searchsorted passes materializing three
    8-byte arrays over every window position.
    """
    if len(qh) <= 16:
        tmp = _scratch_buf("hmc_mask", len(ww), np.bool_)
        outp: list[np.ndarray] = []
        outq: list[np.ndarray] = []
        for qi in range(len(qh)):
            np.equal(ww, qh[qi], out=tmp)
            p = np.flatnonzero(tmp)
            if len(p):
                outp.append(p)
                outq.append(np.full(len(p), qi, dtype=np.int64))
        if not outp:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        return np.concatenate(outp), np.concatenate(outq)
    order = np.argsort(qh, kind="stable")
    qs = qh[order]
    lo = np.searchsorted(qs, ww, side="left")
    hi = np.searchsorted(qs, ww, side="right")
    cnt = hi - lo
    pos = np.flatnonzero(cnt > 0)
    if not len(pos):
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    c = cnt[pos]
    tot = int(c.sum())
    posr = np.repeat(pos, c)
    first = np.concatenate(([0], np.cumsum(c)[:-1]))
    within = np.arange(tot, dtype=np.int64) - np.repeat(first, c)
    qsel = order[np.repeat(lo[pos], c) + within]
    return posr, qsel


def substring_contained_flags(captions: list[bytes]) -> np.ndarray:
    """For each (unique) caption, True iff it occurs as a substring of
    some other caption in the set.

    Rarest-anchor algorithm (the hot path; bit-equal to the
    suffix-array reference ``substring_contained_flags_sa``, kept for
    cross-validation). One hashed 32-byte-gram code per text position
    (polynomial rolling hash, computed CHUNKED with reused scratch so
    the kernel touches ~15 bytes of fresh memory per text byte — fresh
    pages are the dominant cost on page-fault-bound hosts); each
    caption >= 32 bytes is anchored at its globally rarest gram (any
    gram works for correctness since candidates are found by hash
    lookup; rarity only bounds candidate volume on repetitive text),
    candidate positions come from one sorted (hash32, pos) array, and
    every candidate is byte-verified (collision-proof). Captions under
    32 bytes fall back to per-length rolling scans (rare rows).
    """
    m = len(captions)
    if m == 0:
        return np.zeros(0, dtype=bool)
    A = 32  # anchor gram length
    lens0 = np.array([len(c) for c in captions], dtype=np.int64)
    contained = np.zeros(m, dtype=bool)
    contained[lens0 == 0] = m > 1
    perm = np.argsort(-lens0, kind="stable")  # length-desc layout
    lens = lens0[perm]
    if not (lens > 0).any():
        return contained
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    ends = starts + lens
    total = int(lens.sum())
    if total >= (1 << 32):
        # candidate combos pack (hash32 << 32 | position) into uint64
        # and freq32 indexes positions with uint32 — a partition this
        # large would silently corrupt positions. Fail loud; the caller
        # must raise the partition count (substring_flags_sharded sizes
        # partitions well below this, but key skew could breach it).
        raise ValueError(
            f"substring partition holds {total} caption bytes >= 2^32; "
            "increase the partition count (positions pack into 32 bits)")
    text = np.empty(total, dtype=np.uint8)
    for j, i in enumerate(perm):
        text[starts[j] : starts[j] + lens[j]] = \
            np.frombuffer(captions[i], dtype=np.uint8)

    B, Binv = _B, _BINV

    def row_at(pos: np.ndarray) -> np.ndarray:
        return np.searchsorted(ends, pos, side="right")

    def direct_hash(s: np.ndarray, L: int) -> np.ndarray:
        """h(s, L) by direct evaluation — for small position sets.
        Binv powers come from the cached table (mod-2^64 wraparound is
        intentional; scalar uint64 multiplies would spam
        RuntimeWarnings and cost time in a hot per-task kernel)."""
        pows = _pow_table("binv", max(L, 1))
        acc = np.zeros(len(s), dtype=np.uint64)
        for u in range(L):
            acc += text[s + u].astype(np.uint64) * pows[u]
        return acc

    cand_pos: list[np.ndarray] = []
    cand_row: list[np.ndarray] = []

    long_rows = np.flatnonzero(lens >= A)
    if len(long_rows):
        lend = int(ends[long_rows[-1]])
        nw = lend - A + 1
        # validity: gram must not cross a row boundary — mark the last
        # A-1 positions of every row invalid (m*(A-1) indices, tiny)
        valid = np.ones(nw, dtype=bool)
        tail = (ends[:, None] - np.arange(A - 1, 0, -1)[None, :]).ravel()
        tail = tail[(tail >= 0) & (tail < nw)]
        valid[tail] = False
        # chunked rolling hashes -> (hash32 << 32 | pos) combo entries
        # for valid positions; scratch buffers are reused across chunks
        chunk = 1 << 18
        combo = np.empty(nw, dtype=np.uint64)
        freq32 = np.full(total, np.uint32(0xFFFFFFFF), dtype=np.uint32)
        nv = 0
        maxspan = chunk + A - 1
        binv_pows = _pow_table("binv", maxspan)          # Binv^0..
        b_pows = _pow_table("b", chunk)                  # B^0..
        tb = _scratch_buf("kern_tb", maxspan, np.uint64)
        hh = _scratch_buf("kern_hh", chunk, np.uint64)
        for c0 in range(0, nw, chunk):
            c1 = min(c0 + chunk, nw)
            span = c1 - c0 + A - 1  # text bytes needed: [c0, c1-1+A)
            # local prefix C'[i+1] = sum_{j<=i} text[c0+j] * Binv^j
            tbs = tb[:span]
            np.multiply(text[c0 : c0 + span], binv_pows[:span], out=tbs)
            np.cumsum(tbs, out=tbs)
            # h(c0+d, A) = (C'[d+A] - C'[d]) * B^d
            nloc = c1 - c0
            hs = hh[:nloc]
            hs[0] = tbs[A - 1]
            if nloc > 1:
                np.subtract(tbs[A : A + nloc - 1], tbs[: nloc - 1],
                            out=hs[1:])
            hs *= b_pows[:nloc]
            vm = valid[c0:c1]
            nn = int(vm.sum())
            if nn:
                combo[nv : nv + nn] = ((hs[vm] >> np.uint64(32))
                                       << np.uint64(32)) \
                    | (np.flatnonzero(vm) + c0).astype(np.uint64)
                nv += nn
        combo = combo[:nv]
        combo.sort()
        h32 = combo >> np.uint64(32)
        newr = np.ones(nv, dtype=bool)
        newr[1:] = h32[1:] != h32[:-1]
        run_id = np.cumsum(newr) - 1
        run_len = np.bincount(run_id).astype(np.uint32)
        freq32[(combo & np.uint64(0xFFFFFFFF)).astype(np.int64)] = \
            run_len[run_id]
        # per-row rarest anchor (freq argmin; invalid positions = MAX)
        anchor = np.empty(len(long_rows), dtype=np.int64)
        for j, r in enumerate(long_rows):
            seg = freq32[starts[r] : ends[r] - A + 1]
            anchor[j] = starts[r] + int(np.argmin(seg))
        ah32 = (direct_hash(anchor, A) >> np.uint64(32)).astype(np.uint64)
        # h32 is nondecreasing (combo is sorted, h32 is its top field) —
        # search it directly: packing (ah32+1)<<32 would wrap to 0 for
        # ah32 == 0xFFFFFFFF and make hi < lo (negative repeat counts)
        lo = np.searchsorted(h32, ah32, side="left")
        hi = np.searchsorted(h32, ah32, side="right")
        cnt = hi - lo
        rowidx = np.repeat(np.arange(len(long_rows)), cnt)
        first = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        within = np.arange(int(cnt.sum()), dtype=np.int64) - first[rowidx]
        pos = (combo[lo[rowidx] + within]
               & np.uint64(0xFFFFFFFF)).astype(np.int64)
        rows = long_rows[rowidx]
        p = pos - (anchor[rowidx] - starts[rows])
        L = lens[rows]
        ok = (p >= 0) & (p + L <= total)
        pc_ = np.minimum(np.maximum(p, 0), total - 1)
        prow = row_at(pc_)
        ok &= (prow != rows) & (p + L <= ends[prow])
        ok &= p >= starts[prow]
        cand_pos.append(p[ok])
        cand_row.append(rows[ok])

    # short rows (1..31 bytes): per-length rolling scans. One pass over
    # the window hashes per DISTINCT length (<= 31 passes), candidates
    # via a sorted-query-hash binary search — never an O(n_short *
    # corpus) per-row scan (final byte-verify stays collision-proof).
    short_lens = np.unique(lens[(lens > 0) & (lens < A)])
    if len(short_lens):
        powBinv_full = _pow_table("binv", total)
        powB_full = _pow_table("b", total)
        C = np.zeros(total + 1, dtype=np.uint64)
        np.cumsum(text.astype(np.uint64) * powBinv_full, out=C[1:])
        cum_desc = ends
        for L in short_lens:
            L = int(L)
            rows_L = np.flatnonzero(lens == L)
            end = int(cum_desc[np.searchsorted(-lens, -L, side="right") - 1])
            if end < L:
                continue
            nwL = end - L + 1
            ww = (C[L : L + nwL] - C[:nwL]) * powB_full[:nwL]
            hvals = (C[starts[rows_L] + L] - C[starts[rows_L]]) \
                * powB_full[starts[rows_L]]
            posr, qsel = _hash_match_candidates(ww, hvals)
            if not len(posr):
                continue
            r = rows_L[qsel]
            rr_ = row_at(posr)
            keep = (rr_ != r) & (posr >= starts[rr_]) \
                & (posr + L <= ends[rr_])
            if keep.any():
                cand_pos.append(posr[keep])
                cand_row.append(r[keep])

    if cand_pos:
        p = np.concatenate(cand_pos)
        r = np.concatenate(cand_row)
        L = lens[r]
        # segmented byte-verify of every candidate (collision-proof);
        # chunked to bound memory. Rows are in length-desc space — map
        # verified flags back through perm.
        step = 1 << 20
        for c0 in range(0, len(p), step):
            pp = p[c0 : c0 + step]
            rr = r[c0 : c0 + step]
            ll = L[c0 : c0 + step]
            tot = int(ll.sum())
            if tot == 0:
                continue
            cidx = np.repeat(np.arange(len(pp)), ll)
            seg0 = np.concatenate(([0], np.cumsum(ll)))
            off = np.arange(tot, dtype=np.int64) - seg0[cidx]
            eq = (text[pp[cidx] + off]
                  == text[starts[rr][cidx] + off]).astype(np.int8)
            good = np.minimum.reduceat(eq, seg0[:-1]).astype(bool)
            contained[perm[rr[good]]] = True
    return contained


def substring_contained_flags_sa(captions: list[bytes]) -> np.ndarray:
    """Suffix-array reference implementation (prefix doubling + LCP
    neighbour compare) — the oracle twin of the anchor-gram hot path.

    Only the LCPs between each caption's full suffix and its two
    suffix-array neighbours are needed (the prefix-A run is contiguous
    and contains the full suffix), so instead of a Kasai pass over the
    whole text the check is a vectorized byte-compare of m neighbour
    pairs — O(sum of caption lengths), no Python loop over positions.
    """
    m = len(captions)
    if m == 0:
        return np.zeros(0, dtype=bool)
    lens = np.array([len(c) for c in captions], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens + 1)))[:-1]
    total = int((lens + 1).sum())
    text = np.empty(total, dtype=np.int64)
    for i, c in enumerate(captions):
        text[starts[i] : starts[i] + lens[i]] = np.frombuffer(c, dtype=np.uint8)
        text[starts[i] + lens[i]] = 256 + i  # distinct sentinel
    sa = suffix_array(text)
    rank = np.empty(total, dtype=np.int64)
    rank[sa] = np.arange(total)
    r = rank[starts]  # rank of each caption's full suffix

    def neighbour_has_prefix(nbr_rank: np.ndarray) -> np.ndarray:
        valid = (nbr_rank >= 0) & (nbr_rank < total)
        nbr = np.where(valid, sa[np.clip(nbr_rank, 0, total - 1)], 0)
        valid &= nbr + lens <= total
        # segmented byte compare: caption i's bytes vs text[nbr_i:...]
        row_of = np.repeat(np.arange(m), lens)
        seg0 = np.concatenate(([0], np.cumsum(lens)))
        off = np.arange(int(lens.sum()), dtype=np.int64) - seg0[row_of]
        src = starts[row_of] + off
        tgt = np.clip(nbr[row_of] + off, 0, total - 1)
        eq = (text[src] == text[tgt]).astype(np.int8)
        out = np.ones(m, dtype=bool)
        nonempty = np.flatnonzero(lens > 0)
        if len(nonempty):
            out[nonempty] = np.minimum.reduceat(
                eq, seg0[:-1][nonempty]).astype(bool)
        else:
            out[:] = True
        return out & valid

    contained = neighbour_has_prefix(r - 1) | neighbour_has_prefix(r + 1)
    # empty captions are substrings of any other caption
    contained[lens == 0] = m > 1
    return contained


def _combine(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _string_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat utf-8 byte buffer, int64 per-row offsets) of a string
    array, honoring the array offset."""
    n = len(arr)
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset : arr.offset + n + 1].astype(np.int64)
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return buf, offs


def _window_min(a: np.ndarray, w: int) -> np.ndarray:
    """Minimum of every length-*w* window of *a* (van Herk/Gil-Werman
    erosion: two block-cummin passes, O(n) memory — no (n, w) gather,
    which is pathological on page-fault-bound hosts)."""
    n = len(a)
    if n < w:
        return np.empty(0, dtype=a.dtype)
    pad = (-n) % w
    maxv = np.iinfo(a.dtype).max if a.dtype.kind in "ui" else np.inf
    big = np.concatenate([a, np.full(pad, maxv, dtype=a.dtype)])
    blocks = big.reshape(-1, w)
    L = np.minimum.accumulate(blocks, axis=1).ravel()
    R = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].ravel()
    return np.minimum(R[: n - w + 1], L[w - 1 : n])


def char_winnow_fingerprints(captions: pa.Array, k: int = 8,
                             window: int = 32, seed: int = DEFAULT_SEED,
                             ) -> tuple[np.ndarray, np.ndarray]:
    """Character-level winnowing fingerprints per caption: XXH64 of
    every k-byte gram of the utf-8 text, min of every *window*-length
    gram window, distinct per row → (flat uint64 fps, int64 offsets).

    Rows shorter than the guarantee threshold t = k + window - 1 bytes
    emit nothing — they take the broadcast short path instead. k is
    fixed at 8 so each gram is one little-endian uint64 word. Expected
    distinct fingerprints per row ≈ 2·len/(window+1) (winnowing
    density) — *window* is the replication/recall-threshold knob.
    """
    assert k == 8, "char grams are one uint64 word (k=8)"
    from .shingle import unique_per_row

    captions = _combine(captions)
    n = len(captions)
    buf, offs = _string_bytes(captions)
    base = int(offs[0])
    lens = np.diff(offs)
    t = k + window - 1
    nbytes = int(offs[-1] - base)
    if nbytes < t or not (lens >= t).any():
        return np.empty(0, dtype=np.uint64), np.zeros(n + 1, dtype=np.int64)
    flat = buf[base : base + nbytes]
    # gram codes at EVERY byte position via 8 shifted adds (no gather);
    # windows crossing row boundaries are computed but never selected
    padded = np.concatenate([flat, np.zeros(k - 1, dtype=np.uint8)]) \
        .astype(np.uint64)
    codes = np.zeros(nbytes, dtype=np.uint64)
    for j in range(k):
        codes |= padded[j : j + nbytes] << np.uint64(8 * j)
    gh = xxh64_u64(codes, seed)
    wmins_all = _window_min(gh, window)  # min of gram-window at pos i
    # per-row selected window starts: [offs[i], offs[i] + len - t]
    counts = np.where(lens >= t, lens - t + 1, 0)
    total = int(counts.sum())
    row_of = np.repeat(np.arange(n), counts)
    first = np.concatenate(([0], np.cumsum(counts)[:-1]))
    within = np.arange(total, dtype=np.int64) - first[row_of]
    pos = (offs[:-1] - base)[row_of] + within
    wmins = wmins_all[pos]
    w_off = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    return unique_per_row(wmins, w_off)


def make_bucket_rows_fn(id_col: str = "image_id", text_col: str = "caption",
                        k: int = 8, window: int = 32,
                        seed: int = DEFAULT_SEED):
    """map_batches fn: (id, caption) → (fingerprint int64, id, caption)
    rows, one per distinct winnow fingerprint (~len/(window/2) per
    caption — the caption text is replicated into its buckets; that
    replication factor is the price of content-locality partitioning)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = _combine(batch[id_col])
        caps = _combine(batch[text_col])
        fps, off = char_winnow_fingerprints(caps, k, window, seed)
        take = pa.array(np.repeat(np.arange(len(ids)), np.diff(off)))
        return pa.Table.from_arrays(
            [pa.array(fps.astype(np.int64)), ids.take(take), caps.take(take)],
            names=["fingerprint", id_col, text_col])

    return fn


def make_bucket_flags_fn(id_col: str = "image_id",
                         text_col: str = "caption"):
    """Whole-block fn over fingerprint-partitioned (fp, id, caption)
    rows: dedupe rows by id, run the suffix-array containment pass over
    the block's captions, emit (id, contained_i=1) for positives only."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = _combine(batch[id_col])
        caps = _combine(batch[text_col])
        if len(ids) == 0:
            return pa.Table.from_arrays(
                [ids, pa.array([], type=pa.int8())],
                names=[id_col, "contained_i"])
        codes = np.asarray(ids.dictionary_encode().indices).astype(np.int64)
        _, first_idx = np.unique(codes, return_index=True)
        sel = pa.array(np.sort(first_idx))
        ids_u = ids.take(sel)
        caps_u = caps.take(sel)
        caps_b = [c.encode("utf-8") for c in caps_u.to_pylist()]
        flags = substring_contained_flags(caps_b)
        keep = pa.array(flags)
        pos = ids_u.filter(keep)
        return pa.Table.from_arrays(
            [pos, pa.array(np.ones(len(pos), dtype=np.int8))],
            names=[id_col, "contained_i"])

    return fn


def _short_side(shorts: pa.Table, id_col: str, text_col: str):
    """Broadcast payload for the short-caption probe: ids, the shorts'
    concatenated utf-8 bytes, and per-distinct-length groups of
    (L, short indices, rolling hashes, byte starts) — hashes are
    precomputed ONCE here, not per probed block."""
    sids = [str(s) for s in shorts[id_col].to_pylist()]
    caps = [str(c).encode("utf-8") for c in shorts[text_col].to_pylist()]
    slens = np.array([len(c) for c in caps], dtype=np.int64)
    sstarts = np.concatenate(([0], np.cumsum(slens)))[:-1]
    sbuf = (np.frombuffer(b"".join(caps), dtype=np.uint8)
            if caps else np.empty(0, dtype=np.uint8))
    groups: list[tuple[int, np.ndarray, np.ndarray, np.ndarray]] = []
    maxL = int(slens.max()) if len(slens) else 0
    if maxL:
        pows = _pow_table("binv", maxL)
        for L in np.unique(slens[slens > 0]):
            L = int(L)
            idx = np.flatnonzero(slens == L)
            st = sstarts[idx]
            acc = np.zeros(len(idx), dtype=np.uint64)
            for u in range(L):
                acc += sbuf[st + u].astype(np.uint64) * pows[u]
            groups.append((L, idx, acc, st))
    empty_idx = np.flatnonzero(slens == 0)
    return sids, sbuf, groups, empty_idx


def make_short_probe_fn(short_ref, id_col: str = "image_id",
                        text_col: str = "caption"):
    """map_batches fn over the full unique-caption table: for each
    broadcast short caption (below the winnowing guarantee threshold),
    emit (short_id, 1) if it occurs inside any OTHER caption in this
    block.

    One rolling-hash pass over the block text per DISTINCT short length
    (< 39 of them), candidates via a sorted-query-hash binary search,
    then byte-verify — O(block_bytes * n_lengths + candidates), never
    O(n_short * block_bytes). A verified full-row match needs an id
    check (it is the short's own row unless captions repeat); anything
    else is a proper containment in a different caption."""
    from .sketch_aggs import _plain_fetch

    def fn(batch: pa.Table) -> pa.Table:
        sids, sbuf, groups, empty_idx = _plain_fetch(short_ref)
        ids = _combine(batch[id_col])
        n = len(ids)
        hit = np.zeros(len(sids), dtype=bool)
        if n:
            caps = _combine(batch[text_col])
            buf, offs = _string_bytes(caps)
            base = int(offs[0])
            rel = offs - base
            total = int(rel[-1])
            text = buf[base : base + total]
            # empty shorts occur in every caption: hit iff any OTHER id
            if len(empty_idx):
                if n >= 2:
                    hit[empty_idx] = True
                else:
                    one = ids[0].as_py()
                    hit[empty_idx] = np.array(
                        [sids[int(j)] != one for j in empty_idx])
            if groups and total > 0:
                powBinv = _pow_table("binv", total)
                powB = _pow_table("b", total)
                tmp = _scratch_buf("probe_tmp", total, np.uint64)
                tmp[:] = text          # uint8 -> uint64 widening copy
                np.multiply(tmp, powBinv, out=tmp)
                C = _scratch_buf("probe_C", total + 1, np.uint64)
                C[0] = 0
                np.cumsum(tmp, out=C[1:])
                starts_r, ends_r = rel[:-1], rel[1:]
                for L, idx, qh, qst in groups:
                    if total < L:
                        continue
                    nw = total - L + 1
                    ww = _scratch_buf("probe_ww", nw, np.uint64)
                    np.subtract(C[L : L + nw], C[:nw], out=ww)
                    np.multiply(ww, powB[:nw], out=ww)
                    posr, qsel = _hash_match_candidates(ww, qh)
                    if not len(posr):
                        continue
                    rr = np.searchsorted(ends_r, posr, side="right")
                    ok = (posr >= starts_r[rr]) & (posr + L <= ends_r[rr])
                    posr, qsel, rr = posr[ok], qsel[ok], rr[ok]
                    okb = np.ones(len(posr), dtype=bool)
                    st = qst[qsel]
                    for u in range(L):
                        okb &= text[posr + u] == sbuf[st + u]
                    posr, qsel, rr = posr[okb], qsel[okb], rr[okb]
                    if not len(posr):
                        continue
                    gidx = idx[qsel]
                    full = (ends_r[rr] - starts_r[rr] == L) \
                        & (posr == starts_r[rr])
                    hit[gidx[~full]] = True
                    for t_ in np.flatnonzero(full):  # rare: exact-equal rows
                        if ids[int(rr[t_])].as_py() != sids[int(gidx[t_])]:
                            hit[gidx[t_]] = True
        out = [sids[int(j)] for j in np.flatnonzero(hit)]
        return pa.Table.from_arrays(
            [pa.array(out, type=pa.string()),
             pa.array(np.ones(len(out), dtype=np.int8))],
            names=[id_col, "contained_i"])

    return fn


def substring_flags_sharded(uniq_ds, id_col: str = "image_id",
                            text_col: str = "caption",
                            num_partitions: int = 16, k: int = 8,
                            window: int = 32, seed: int = DEFAULT_SEED,
                            short_limit: int = 100_000,
                            target_partition_bytes: int = 32 << 20):
    """Distributed exact substring-containment flags over a UNIQUE
    caption Dataset → Dataset (id, contained), bit-equal to the
    single-partition suffix-array pass.

    Graph: bucket rows (fingerprint, id, caption) → fingerprint-keyed
    repartition → per-partition SA pass (positives only), plus the
    broadcast short-caption probe; positives ∪ all-ids-False → id-keyed
    repartition → block max. Two keyed shuffles, consumed sequentially
    (two concurrent hash-shuffle operators deadlock small clusters).

    Cost model: each caption lands in min(its ~2·len/(window+1)
    fingerprints, P) partitions after per-block dedupe, so total
    containment-check text ≈ that factor × corpus bytes — *window* sets
    the fingerprint density (guarantee threshold t = window + 7 bytes).
    The effective partition count is SIZE-adaptive (like Ray block
    sizing): P = clamp(ceil(corpus_bytes / target_partition_bytes), 1,
    num_partitions), because bucketing only divides work once P exceeds
    the per-caption fingerprint count — at small corpus sizes one
    content partition (still a worker task, nothing driver-side) is
    both exact and fastest, while a 100 TB corpus gets thousands of
    partitions.
    """
    import ray

    t = k + window - 1
    uniq = uniq_ds.select_columns([id_col, text_col]).materialize()
    size = uniq.size_bytes() or 0
    p_eff = max(1, min(num_partitions,
                       -(-size // max(target_partition_bytes, 1))))
    if p_eff == 1:
        # single content partition: the per-partition pass IS global —
        # no bucket replication, no short side set needed. The tiny
        # materialize decouples the reduce from the flag task (fusing
        # them serializes the whole execution behind one worker).
        one = uniq.repartition(1).materialize()
        return one.map_batches(
            make_substring_flag_fn(id_col, text_col),
            batch_format="pyarrow", batch_size=None)
    # size-adaptive growth is UNCAPPED above num_partitions: partitions
    # are sized so no partition's concatenated text approaches the
    # kernel's 2^32-byte position-packing limit even after fingerprint
    # replication (the kernel raises loudly as the skew backstop)
    num_partitions = max(p_eff, int(-(-size // (256 << 20))))

    # short side set: captions below the guarantee threshold
    def keep_short(batch: pa.Table) -> pa.Table:
        caps = _combine(batch[text_col])
        _, offs = _string_bytes(caps)
        return batch.filter(pa.array(np.diff(offs) < t))

    short_batches = [b for b in
                     uniq.map_batches(keep_short, batch_format="pyarrow")
                     .iter_batches(batch_size=1 << 16,
                                   batch_format="pyarrow")]
    shorts = pa.concat_tables(short_batches) if short_batches else \
        pa.table({id_col: pa.array([], type=pa.string()),
                  text_col: pa.array([], type=pa.string())})
    if len(shorts) > short_limit:
        raise ValueError(
            f"{len(shorts)} captions below {t} bytes exceed short_limit; "
            "raise the limit or pre-filter degenerate captions")

    # bucket pass (shuffle 1), materialized so the final shuffle is the
    # only hash-shuffle operator in its execution
    bucket_pos = uniq.map_batches(
        make_bucket_rows_fn(id_col, text_col, k, window, seed),
        batch_format="pyarrow") \
        .repartition(num_partitions, keys=["fingerprint"]) \
        .map_batches(make_bucket_flags_fn(id_col, text_col),
                     batch_format="pyarrow", batch_size=None).materialize()

    streams = [bucket_pos]
    if len(shorts):
        ref = ray.put(_short_side(shorts, id_col, text_col))
        short_pos = uniq.map_batches(
            make_short_probe_fn(ref, id_col, text_col),
            batch_format="pyarrow").materialize()
        streams.append(short_pos)

    base = uniq.map_batches(
        lambda b: pa.Table.from_arrays(
            [_combine(b[id_col]),
             pa.array(np.zeros(len(b), dtype=np.int8))],
            names=[id_col, "contained_i"]),
        batch_format="pyarrow")
    unioned = base.union(*streams)
    unioned = unioned.repartition(num_partitions, keys=[id_col])

    def flag_max(batch: pa.Table) -> pa.Table:
        ids = _combine(batch[id_col])
        fl = _combine(batch["contained_i"]).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.Table.from_arrays(
                [ids, pa.array([], type=pa.bool_())],
                names=[id_col, "contained"])
        codes = np.asarray(ids.dictionary_encode().indices).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        cs, fs = codes[order], fl[order]
        first = np.ones(len(cs), dtype=bool)
        first[1:] = cs[1:] != cs[:-1]
        starts = np.flatnonzero(first)
        gmax = np.maximum.reduceat(fs, starts)
        sel = pa.array(order[starts])
        return pa.Table.from_arrays(
            [ids.take(sel), pa.array(gmax > 0)],
            names=[id_col, "contained"])

    return unioned.map_batches(flag_max, batch_format="pyarrow",
                               batch_size=None)


def make_substring_flag_fn(id_col: str = "image_id",
                           text_col: str = "caption"):
    """map_batches fn over a block of unique captions → (id, contained).
    Block == partition scope (batch_size=None after any repartition)."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        caps = [c.encode("utf-8") if isinstance(c, str) else bytes(c)
                for c in col.to_pylist()]
        flags = substring_contained_flags(caps)
        return pa.Table.from_arrays(
            [batch[id_col], pa.array(flags)],
            names=[id_col, "contained"])

    return fn
