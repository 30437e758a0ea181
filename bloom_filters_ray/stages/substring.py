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

Partitioning assumption at scale: containment is only detected within
a partition. Run after the exact tier (dedup on equality), partition
by a content-locality key (e.g. winnowing fingerprint buckets from
stages/textstats.py) or accept per-shard semantics; the sandbox
oracle uses one partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


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


def lcp_array(text: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = LCP(suffix sa[i-1], suffix sa[i]); lcp[0]=0.

    O(n) with a Python loop over positions — adequate for per-partition
    caption blocks; swap in a compiled SA/LCP for very large shards.
    """
    n = len(text)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    t = text
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            m = n - max(i, j)
            while h < m and t[i + h] == t[j + h]:
                h += 1
            lcp[r] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def substring_contained_flags(captions: list[bytes]) -> np.ndarray:
    """For each (unique) caption, True iff it occurs as a substring of
    some other caption in the set.

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
