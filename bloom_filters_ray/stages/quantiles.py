"""Exact distributed quantiles for integer-valued columns.

The shape: per-block value histograms (groupby count over a
low-cardinality int column — token counts, lengths, small scores) →
one tiny (value, count) table → driver cumsum + threshold scan. This
is the classic exact-quantile-via-histogram reduction: the shuffle
carries one row per DISTINCT value (dozens for token counts), never
the data, so it is 100-TB-safe whenever the value domain is bounded —
the complement to sketch quantiles (KLL, state/kll.py) for unbounded
domains.

Quantile definition (mirrored EXACTLY by the SQL twin, integer
arithmetic only): q(p) = smallest v with cum_count(v) >= ceil(p*n/100)
= (p*n + 99) // 100.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# The histogram collect is driver-side by design (it is TINY for
# bounded domains); this gate turns a silent OOM on a high-cardinality
# column into a loud, actionable error (same pattern as
# exact_cosine_pairs' broadcast gate in stages/ann.py).
DEFAULT_MAX_HIST_ROWS = 2_000_000


def _collect_hist(hist, limit: int, what: str) -> pa.Table | None:
    parts, total = [], 0
    for b in hist.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        total += b.num_rows
        if total > limit:
            raise ValueError(
                f"exact quantile histogram for {what} exceeds "
                f"max_hist_rows={limit} distinct rows — the value domain "
                f"is not bounded enough for the exact-histogram path; "
                f"use KLL sketch quantiles (state/kll.py) or raise the "
                f"gate explicitly")
        parts.append(b)
    return pa.concat_tables(parts) if parts else None


def exact_int_quantiles(ds, col: str, pcts: list[int],
                        out_pct: str = "pct", out_q: str = "q",
                        max_hist_rows: int = DEFAULT_MAX_HIST_ROWS
                        ) -> pa.Table:
    """Exact percentiles of integer column *col* of *ds* → one-row-per
    -percentile Table (pct int64, q int64). Distributed histogram +
    driver threshold scan; only (distinct_value, count) rows leave the
    workers."""
    tbl = _collect_hist(ds.groupby(col).count(), max_hist_rows,
                        f"column {col!r}")
    if tbl is None:
        return pa.table({out_pct: pa.array([], type=pa.int64()),
                         out_q: pa.array([], type=pa.int64())})
    v = tbl[col].to_numpy(zero_copy_only=False).astype(np.int64)
    c = tbl["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
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
                           out_pct: str = "pct", out_q: str = "q",
                           max_hist_rows: int = DEFAULT_MAX_HIST_ROWS
                           ) -> pa.Table:
    """Per-GROUP exact percentiles of integer column *col*: one
    (key, value, count) histogram shuffle — rows bounded by
    groups × distinct values (gated by *max_hist_rows*, loud error
    past it), never the data — then a fully vectorized driver scan:
    lexsort by (key, value), one global cumsum, and ONE searchsorted
    over all (group, pct) targets at once (the global cumsum is
    strictly increasing, so per-group targets base_g + k_g land inside
    their own segment; p=0 clamps k to 1, which selects the group min
    exactly like the per-segment scan did). Same integer-exact
    definition as ``exact_int_quantiles``. Output: (key, pct, q),
    key column type preserved (also on empty input, derived from the
    dataset schema)."""
    tbl = _collect_hist(ds.groupby([key_col, col]).count(), max_hist_rows,
                        f"({key_col!r}, {col!r})")
    if tbl is None:
        schema = ds.schema()
        key_type = getattr(schema, "base_schema", schema).field(key_col).type
        return pa.table({key_col: pa.array([], type=key_type),
                         out_pct: pa.array([], type=pa.int64()),
                         out_q: pa.array([], type=pa.int64())})
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
    bases = np.where(starts > 0, cum[starts - 1], 0)
    n_g = cum[ends - 1] - bases
    P = np.asarray(pcts, dtype=np.int64)
    k = np.maximum((n_g[:, None] * P[None, :] + 99) // 100, 1)  # (G, |P|)
    idx = np.searchsorted(cum, (bases[:, None] + k).ravel(), side="left")
    idx = np.minimum(idx, np.repeat(ends - 1, len(P)))
    key_rows = np.repeat(order[starts], len(P))  # any row of each group
    key_out = keys.take(pa.array(key_rows, type=pa.int64()))
    return pa.table({key_col: key_out,
                     out_pct: pa.array(np.tile(P, len(starts))),
                     out_q: pa.array(vs[idx].astype(np.int64))})
