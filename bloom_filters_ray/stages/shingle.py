"""Caption shingling: text → set of k-word-shingle hashes, fully
vectorized over Arrow batches.

Tokens come from ``pyarrow.compute.utf8_split_whitespace(utf8_lower(text))``
(zero-copy list layout); each token is hashed with seeded XXH64 and
consecutive k-windows are mixed into one 64-bit shingle hash. MinHash
consumes the low ``SHINGLE_BITS`` bits (2^26 keeps the reference's
``(a*x+b) % c`` permutation exact in float64/int64 — see
state/minhash.py); exact-Jaccard verification uses the full 64 bits.

Engine-defined semantics (the reference's MinHash ingests opaque
integers and leaves the text→int mapping to the caller —
src/sketch/min-hash.ts:47-110).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import DEFAULT_SEED, xxh64_arrow

SHINGLE_BITS = 26
SHINGLE_MASK = np.uint64((1 << SHINGLE_BITS) - 1)

_U = np.uint64
_M1 = _U(0x9E3779B185EBCA87)
_M2 = _U(0xC2B2AE3D27D4EB4F)
_M3 = _U(0x165667B19E3779F9)


def _mix3(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Avalanche three uint64 token hashes into one shingle hash."""
    h = a * _M1 + b * _M2 + c * _M3
    h ^= h >> _U(33)
    h *= _M2
    h ^= h >> _U(29)
    h *= _M3
    h ^= h >> _U(32)
    return h


def _segmented_window_starts(offsets: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """For rows delimited by *offsets* (len n+1) return the flat start
    index of every full k-window plus the per-row window counts."""
    lens = np.diff(offsets)
    counts = np.maximum(lens - (k - 1), 0)
    counts[lens == 0] = 0
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), counts
    row_of = np.repeat(np.arange(len(counts)), counts)
    first = np.concatenate(([0], np.cumsum(counts)[:-1]))
    within = np.arange(total, dtype=np.int64) - first[row_of]
    return offsets[:-1][row_of] + within, counts


def shingle_hashes(texts, k: int = 3, seed: int = DEFAULT_SEED,
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Compute per-row shingle-hash lists for a pyarrow string array.

    Returns (flat uint64 shingle hashes, int64 offsets of length n+1).
    Rows with 1..k-1 tokens yield one shingle (their tokens mixed with
    zero padding); empty/null rows yield none.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat_tokens = toks.values
    tok_offsets = np.asarray(toks.offsets, dtype=np.int64)
    n_rows = len(tok_offsets) - 1
    if len(flat_tokens):
        th = xxh64_arrow(flat_tokens, seed)
        # drop empty tokens (split_whitespace emits them for leading/
        # trailing whitespace and for empty strings)
        str_off = np.frombuffer(flat_tokens.buffers()[1], dtype=np.int32)
        str_off = str_off[flat_tokens.offset : flat_tokens.offset + len(flat_tokens) + 1]
        keep = np.diff(str_off.astype(np.int64)) > 0
        if not keep.all():
            row_of_token = np.repeat(np.arange(n_rows), np.diff(tok_offsets))
            th = th[keep]
            new_counts = np.bincount(row_of_token[keep], minlength=n_rows)
            tok_offsets = np.concatenate(([0], np.cumsum(new_counts))).astype(np.int64)
    else:
        th = np.empty(0, dtype=np.uint64)

    lens = np.diff(tok_offsets)
    if k <= 1:
        return th.copy(), tok_offsets.copy()

    starts, counts = _segmented_window_starts(tok_offsets, k)
    padded = np.concatenate([th, np.zeros(k - 1, dtype=np.uint64)])
    args = [padded[starts + j] for j in range(k)] if len(starts) else \
        [np.empty(0, dtype=np.uint64)] * k
    full = _mix3(*args[:3]) if k == 3 else _mix_any(args)

    # short rows (0 < n < k): one shingle mixing the available tokens
    short = np.flatnonzero((lens > 0) & (lens < k))
    if len(short):
        s_starts = tok_offsets[:-1][short]
        s_args = []
        for j in range(k):
            v = np.zeros(len(short), dtype=np.uint64)
            ok = j < lens[short]
            v[ok] = th[(s_starts + j)[ok]]
            s_args.append(v)
        short_hashes = _mix3(*s_args[:3]) if k == 3 else _mix_any(s_args)
        counts = counts.copy()
        counts[short] = 1
    else:
        short_hashes = np.empty(0, dtype=np.uint64)

    out_offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    out = np.empty(out_offsets[-1], dtype=np.uint64)
    # full windows and short-row singletons are each generated in row
    # order, so a boolean scatter reassembles them without a row loop
    row_of_out = np.repeat(np.arange(len(counts)), counts)
    is_full = (lens >= k)[row_of_out]
    out[is_full] = full
    out[~is_full] = short_hashes
    return out, out_offsets


def _mix_any(args: list[np.ndarray]) -> np.ndarray:
    h = args[0] * _M1
    for j, a in enumerate(args[1:], start=1):
        h = h + a * (_M2 if j % 2 else _M3) * _U(2 * j + 1)
    h ^= h >> _U(33)
    h *= _M2
    h ^= h >> _U(29)
    h *= _M3
    h ^= h >> _U(32)
    return h


def unique_per_row(flat: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deduplicate values within each row segment (sorted output).

    Vectorized: sort each segment, drop equal neighbours.
    """
    n = len(offsets) - 1
    if len(flat) == 0:
        return flat, offsets.copy()
    row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    order = np.lexsort((flat, row_of))
    fs = flat[order]
    rs = row_of[order]
    keep = np.ones(len(fs), dtype=bool)
    keep[1:] = (fs[1:] != fs[:-1]) | (rs[1:] != rs[:-1])
    fs = fs[keep]
    rs = rs[keep]
    counts = np.bincount(rs, minlength=n)
    return fs, np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
