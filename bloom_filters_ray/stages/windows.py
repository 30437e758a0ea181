"""Event-stream windowing operators beyond the tumbling aggregate
(pipelines/queries.py: q_events_window): gap-based sessionization —
the standard training-data/eventlog primitive Ray Data has no builtin
for.

Design: one keyed repartition on the session key (user_id) co-locates
each user's whole event stream in one block, then a whole-block
vectorized pass (lexsort by (user, ts, event_id) → gap splits →
reduceat-style segment stats) sessionizes with NO per-user Python
loop. Timestamps are compared as raw int64 microseconds, so the gap
predicate is integer-exact and the DuckDB oracle twin (lag + interval
comparison) reproduces it bit-for-bit.

Scale notes: the shuffle moves only the projected event columns; a
single user's events must fit one block (true for any real user; a
pathological single-key skew would need the same salting treatment as
hot LSH bands, at the cost of sessions spanning the salt boundary).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def make_block_sessionizer(gap_us: int, user_col: str = "user_id",
                           ts_col: str = "ts", id_col: str = "event_id"):
    """Whole-block fn over user-partitioned events: one output row per
    session — (user_id, session_idx, n_events, start_ts, end_ts). A
    new session starts when the gap to the previous event (per user,
    ordered by (ts, event_id)) strictly exceeds *gap_us*."""

    def fn(batch: pa.Table) -> pa.Table:
        u = batch[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_arr = batch[ts_col]
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        t = ts_arr.to_numpy(zero_copy_only=False).view(np.int64)
        eid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(u) == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "session_idx": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "start_ts": pa.array([], type=ts_arr.type),
                "end_ts": pa.array([], type=ts_arr.type),
            })
        order = np.lexsort((eid, t, u))
        us, tss = u[order], t[order]
        new = np.ones(len(us), dtype=bool)
        new[1:] = (us[1:] != us[:-1]) | (tss[1:] - tss[:-1] > gap_us)
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [len(us)]))
        user_s = us[starts]
        first = np.ones(len(starts), dtype=bool)
        first[1:] = user_s[1:] != user_s[:-1]
        run_start = np.maximum.accumulate(
            np.where(first, np.arange(len(starts)), 0))
        sess_idx = np.arange(len(starts)) - run_start
        take = pa.array(order.astype(np.int64))
        return pa.table({
            "user_id": pa.array(user_s),
            "session_idx": pa.array(sess_idx.astype(np.int64)),
            "n_events": pa.array((ends - starts).astype(np.int64)),
            "start_ts": ts_arr.take(take.take(pa.array(starts))),
            "end_ts": ts_arr.take(take.take(pa.array(ends - 1))),
        })

    return fn


def sessionize(ds, gap_us: int, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               num_partitions: int | None = None):
    """Events Dataset → one row per (user, session): keyed repartition
    on *user_col*, then the whole-block vectorized sessionizer."""
    from ..util import cluster_cpus, ensure_hash_shuffle

    ensure_hash_shuffle()
    p = num_partitions or max(8, cluster_cpus())
    ds = ds.select_columns([user_col, ts_col, id_col])
    ds = ds.repartition(p, keys=[user_col])
    return ds.map_batches(
        make_block_sessionizer(gap_us, user_col, ts_col, id_col),
        batch_format="pyarrow", batch_size=None)
