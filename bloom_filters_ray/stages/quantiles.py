"""Exact distributed quantiles for integer-valued columns.

The shape: per-block value histograms (groupby count over a
low-cardinality int column — token counts, lengths, small scores) →
one tiny (value, count) table → driver cumsum + threshold scan. This
is the classic exact-quantile-via-histogram reduction: the shuffle
carries one row per DISTINCT value (dozens for token counts), never
the data, so it is 100-TB-safe whenever the value domain is bounded —
the complement to sketch quantiles (t-digest/KLL) for unbounded
domains.

Quantile definition (mirrored EXACTLY by the SQL twin, integer
arithmetic only): q(p) = smallest v with cum_count(v) >= ceil(p*n/100)
= (p*n + 99) // 100.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def exact_int_quantiles(ds, col: str, pcts: list[int],
                        out_pct: str = "pct", out_q: str = "q") -> pa.Table:
    """Exact percentiles of integer column *col* of *ds* → one-row-per
    -percentile Table (pct int64, q int64). Distributed histogram +
    driver threshold scan; only (distinct_value, count) rows leave the
    workers."""
    hist = ds.groupby(col).count()
    vals, counts = [], []
    for b in hist.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        vals.append(b[col].to_numpy(zero_copy_only=False).astype(np.int64))
        counts.append(b["count()"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
    v = np.concatenate(vals) if vals else np.empty(0, dtype=np.int64)
    c = np.concatenate(counts) if counts else np.empty(0, dtype=np.int64)
    order = np.argsort(v)
    v, c = v[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(cum) else 0
    out_p, out_v = [], []
    for p in pcts:
        if n == 0:
            continue
        k = (p * n + 99) // 100  # ceil(p*n/100), integer-exact
        idx = int(np.searchsorted(cum, k, side="left"))
        out_p.append(int(p))
        out_v.append(int(v[min(idx, len(v) - 1)]))
    return pa.table({out_pct: pa.array(out_p, type=pa.int64()),
                     out_q: pa.array(out_v, type=pa.int64())})


def exact_int_quantiles_by(ds, key_col: str, col: str, pcts: list[int],
                           out_pct: str = "pct",
                           out_q: str = "q") -> pa.Table:
    """Per-GROUP exact percentiles of integer column *col*: one
    (key, value, count) histogram shuffle — rows bounded by
    groups × distinct values, never the data — then a vectorized
    driver scan (lexsort by (key, value), per-segment cumsum,
    searchsorted threshold per (group, pct)). Same integer-exact
    definition as ``exact_int_quantiles``. Output: (key, pct, q),
    key column type preserved."""
    hist = ds.groupby([key_col, col]).count()
    parts = [b for b in hist.iter_batches(batch_size=1 << 16,
                                          batch_format="pyarrow")]
    if not parts:
        return pa.table({key_col: pa.array([], type=pa.string()),
                         out_pct: pa.array([], type=pa.int64()),
                         out_q: pa.array([], type=pa.int64())})
    tbl = pa.concat_tables(parts)
    keys = tbl[key_col].combine_chunks() if isinstance(
        tbl[key_col], pa.ChunkedArray) else tbl[key_col]
    v = tbl[col].to_numpy(zero_copy_only=False).astype(np.int64)
    c = tbl["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
    kcodes = keys.dictionary_encode().indices \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((v, kcodes))
    kc, vs, cs = kcodes[order], v[order], c[order]
    new = np.ones(len(kc), dtype=bool)
    new[1:] = kc[1:] != kc[:-1]
    starts = np.flatnonzero(new)
    ends = np.concatenate((starts[1:], [len(kc)]))
    cum = np.cumsum(cs)
    out_k, out_p, out_v = [], [], []
    for s, e in zip(starts, ends):
        base = cum[s - 1] if s else 0
        n_g = int(cum[e - 1] - base)
        for p in pcts:
            k = (p * n_g + 99) // 100
            idx = s + int(np.searchsorted(cum[s:e] - base, k, side="left"))
            out_k.append(int(order[s]))  # any row index of this group
            out_p.append(int(p))
            out_v.append(int(vs[min(idx, e - 1)]))
    key_out = keys.take(pa.array(out_k, type=pa.int64()))
    return pa.table({key_col: key_out,
                     out_pct: pa.array(out_p, type=pa.int64()),
                     out_q: pa.array(out_v, type=pa.int64())})
