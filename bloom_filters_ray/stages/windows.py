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


def make_asof_block_fn(key_col: str = "user_id", ts_col: str = "ts",
                       id_col: str = "event_id"):
    """Whole-block fn over key-partitioned TAGGED rows (side=0 right /
    build, side=1 left / probe): for each left row, the right row of
    the same key with the greatest ts <= left.ts (ties impossible when
    (key, ts) is unique; at ts equality the right row qualifies).
    Vectorized: lexsort by (key, ts, side) puts each left row after
    every right row it may match; a running maximum.accumulate of
    right positions + per-key segment starts resolves every match with
    no per-key Python. Unmatched left rows are dropped (inner as-of).
    Output: (id, prev_id, gap_us)."""

    def fn(batch: pa.Table) -> pa.Table:
        u = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_arr = batch[ts_col]
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        t = ts_arr.to_numpy(zero_copy_only=False).view(np.int64)
        side = batch["side"].to_numpy(zero_copy_only=False)
        eid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(u)
        empty = pa.table({
            "event_id": pa.array([], type=pa.int64()),
            "prev_id": pa.array([], type=pa.int64()),
            "gap_us": pa.array([], type=pa.int64()),
        })
        if n == 0:
            return empty
        order = np.lexsort((side, t, u))  # right (0) before left at == ts
        us, tss, ss, es = u[order], t[order], side[order], eid[order]
        pos = np.arange(n, dtype=np.int64)
        last_right = np.maximum.accumulate(np.where(ss == 0, pos, -1))
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = us[1:] != us[:-1]
        seg_start = np.maximum.accumulate(np.where(new_key, pos, 0))
        matched = (ss == 1) & (last_right >= seg_start)
        li = np.flatnonzero(matched)
        if not len(li):
            return empty
        ri = last_right[li]
        return pa.table({
            "event_id": pa.array(es[li]),
            "prev_id": pa.array(es[ri]),
            "gap_us": pa.array(tss[li] - tss[ri]),
        })

    return fn


def _tag_union(left_ds, right_ds, key_col: str, ts_col: str, id_col: str):
    """Two datasets → one tagged stream (side=0 right / 1 left): two
    UNSHUFFLED map streams unioned, for the one-keyed-shuffle joins."""

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                key_col: batch[key_col],
                ts_col: batch[ts_col],
                id_col: batch[id_col],
                "side": pa.array(
                    np.full(len(batch), side, dtype=np.int8)),
            })
        return fn

    cols = [key_col, ts_col, id_col]
    return right_ds.select_columns(cols) \
        .map_batches(tag(0), batch_format="pyarrow") \
        .union(left_ds.select_columns(cols)
               .map_batches(tag(1), batch_format="pyarrow"))


def make_type_tag_fn(left_pred: str, right_pred: str,
                     type_col: str = "event_type",
                     key_col: str = "user_id", ts_col: str = "ts",
                     id_col: str = "event_id"):
    """map_batches fn tagging BOTH join sides out of ONE stream: rows
    whose *type_col* equals *left_pred* become side=1, *right_pred*
    side=0, everything else is dropped — one pass over the source
    instead of two filtered reads (half the read I/O at 100 TB)."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        et = batch[type_col]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        is_l = pc.equal(et, pa.scalar(left_pred))
        is_r = pc.equal(et, pa.scalar(right_pred))
        keep = pc.or_(is_l, is_r)
        kept = batch.filter(keep)
        side = pc.if_else(pc.equal(kept[type_col], pa.scalar(left_pred)),
                          pa.scalar(1, type=pa.int8()),
                          pa.scalar(0, type=pa.int8()))
        return pa.table({
            key_col: kept[key_col],
            ts_col: kept[ts_col],
            id_col: kept[id_col],
            "side": side,
        })

    return fn


def asof_join_tagged(tagged_ds, key_col: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id",
                     num_partitions: int | None = None):
    """As-of join over a pre-tagged (side=0 right / 1 left) stream:
    ONE keyed repartition + the whole-block vectorized matcher."""
    from ..util import cluster_cpus, ensure_hash_shuffle

    ensure_hash_shuffle()
    p = num_partitions or max(8, cluster_cpus())
    tagged = tagged_ds.repartition(p, keys=[key_col])
    return tagged.map_batches(make_asof_block_fn(key_col, ts_col, id_col),
                              batch_format="pyarrow", batch_size=None)


def asof_join(left_ds, right_ds, key_col: str = "user_id",
              ts_col: str = "ts", id_col: str = "event_id",
              num_partitions: int | None = None):
    """Distributed AS-OF join (an operator Ray Data has no builtin
    for): for each left row, the most recent right row of the same key
    at-or-before its timestamp. Shape: tag both sides (side=0/1) into
    one schema, union the two UNSHUFFLED map streams, then ONE keyed
    repartition co-locates each key's full timeline — a single
    shuffle, never two concurrent shuffle operators (the documented
    small-cluster deadlock) — and the whole-block vectorized matcher
    runs per partition. Same single-shuffle/partitioning contract as
    ``sessionize``: one key's rows must fit a block. When both sides
    come from ONE source, tag with ``make_type_tag_fn`` and call
    ``asof_join_tagged`` instead — one read pass, not two.
    Returns (event_id, prev_id, gap_us) for matched left rows; the
    DuckDB twin is ``ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts``.
    """
    return asof_join_tagged(
        _tag_union(left_ds, right_ds, key_col, ts_col, id_col),
        key_col, ts_col, id_col, num_partitions)


def make_range_count_block_fn(window_us: int, key_col: str = "user_id",
                              ts_col: str = "ts", id_col: str = "event_id"):
    """Whole-block fn over key-partitioned TAGGED rows: for each left
    row (side=1), the COUNT of right rows (side=0) of the same key in
    the half-open window [ts - window_us, ts). Vectorized via the
    two-probe prefix trick: sort (key, ts, side-order with probes
    before ties), one global cumsum of the right indicator, and each
    left row's count is prefix(ts probe) − prefix(ts − window probe) —
    the per-key segment base cancels in the difference, so no segment
    bookkeeping at all. Output: (event_id, n_prior) for every left
    row (0 when none)."""

    def fn(batch: pa.Table) -> pa.Table:
        u = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_arr = batch[ts_col]
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        t = ts_arr.to_numpy(zero_copy_only=False).view(np.int64)
        side = batch["side"].to_numpy(zero_copy_only=False)
        eid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        left = side == 1
        nl = int(left.sum())
        if nl == 0:
            return pa.table({"event_id": pa.array([], type=pa.int64()),
                             "n_prior": pa.array([], type=pa.int64())})
        lu, lt, le = u[left], t[left], eid[left]
        ru, rt = u[~left], t[~left]
        # probe stream: per left row a LO probe at ts-window and a HI
        # probe at ts; order=0 puts probes before rights at equal ts,
        # so prefix counts are strictly-before counts (exclusive ends)
        pu = np.concatenate((ru, lu, lu))
        pt = np.concatenate((rt, lt - window_us, lt))
        is_right = np.zeros(len(pu), dtype=np.int64)
        is_right[: len(ru)] = 1
        order = np.lexsort((is_right, pt, pu))
        prefix = np.cumsum(is_right[order])
        rank = np.empty(len(order), dtype=np.int64)
        rank[order] = np.arange(len(order))
        before = prefix[rank] - is_right  # count strictly before self
        lo = before[len(ru) : len(ru) + nl]
        hi = before[len(ru) + nl :]
        return pa.table({"event_id": pa.array(le),
                         "n_prior": pa.array(hi - lo)})

    return fn


def range_count_join_tagged(tagged_ds, window_us: int,
                            key_col: str = "user_id", ts_col: str = "ts",
                            id_col: str = "event_id",
                            num_partitions: int | None = None):
    """Range-count join over a pre-tagged (side=0/1) stream: ONE keyed
    repartition + the sort/cumsum block kernel."""
    from ..util import cluster_cpus, ensure_hash_shuffle

    ensure_hash_shuffle()
    p = num_partitions or max(8, cluster_cpus())
    tagged = tagged_ds.repartition(p, keys=[key_col])
    return tagged.map_batches(
        make_range_count_block_fn(window_us, key_col, ts_col, id_col),
        batch_format="pyarrow", batch_size=None)


def range_count_join(left_ds, right_ds, window_us: int,
                     key_col: str = "user_id", ts_col: str = "ts",
                     id_col: str = "event_id",
                     num_partitions: int | None = None):
    """Distributed RANGE-count join: per left row, how many right rows
    of the same key fall in [left.ts − window_us, left.ts). Same
    single-shuffle tag-union shape as ``asof_join`` (same one-read
    ``make_type_tag_fn`` + ``range_count_join_tagged`` option); the
    block kernel is two searchsorted-style probes folded into one
    sort + cumsum."""
    return range_count_join_tagged(
        _tag_union(left_ds, right_ds, key_col, ts_col, id_col),
        window_us, key_col, ts_col, id_col, num_partitions)


def make_topn_block_fn(n: int, key_col: str = "user_id",
                       ts_col: str = "ts", id_col: str = "event_id"):
    """Whole-block fn over key-partitioned rows: the *n* most recent
    rows per key with 1-based recency rank — (key, id, rk). Vectorized
    lexsort by (key, -ts) + segment-relative positions; deterministic
    whenever (key, ts) is unique (the events corpus contract)."""

    def fn(batch: pa.Table) -> pa.Table:
        u = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_arr = batch[ts_col]
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        t = ts_arr.to_numpy(zero_copy_only=False).view(np.int64)
        eid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(u) == 0:
            return pa.table({
                key_col: pa.array([], type=pa.int64()),
                id_col: pa.array([], type=pa.int64()),
                "rk": pa.array([], type=pa.int64()),
            })
        order = np.lexsort((-t, u))
        us, es = u[order], eid[order]
        pos = np.arange(len(us), dtype=np.int64)
        new_key = np.ones(len(us), dtype=bool)
        new_key[1:] = us[1:] != us[:-1]
        seg_start = np.maximum.accumulate(np.where(new_key, pos, 0))
        rk = pos - seg_start + 1
        keep = rk <= n
        return pa.table({
            key_col: pa.array(us[keep]),
            id_col: pa.array(es[keep]),
            "rk": pa.array(rk[keep]),
        })

    return fn


def top_n_per_key(ds, n: int, key_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  num_partitions: int | None = None):
    """Distributed top-N-most-recent per key (the SQL
    ``row_number() OVER (PARTITION BY key ORDER BY ts DESC) <= n``
    pattern): one keyed repartition, then the whole-block vectorized
    ranker — no sort of the full dataset, no per-key Python."""
    from ..util import cluster_cpus, ensure_hash_shuffle

    ensure_hash_shuffle()
    p = num_partitions or max(8, cluster_cpus())
    ds = ds.select_columns([key_col, ts_col, id_col])
    ds = ds.repartition(p, keys=[key_col])
    return ds.map_batches(make_topn_block_fn(n, key_col, ts_col, id_col),
                          batch_format="pyarrow", batch_size=None)
