"""Path-equivalence tests for the analytics queries' scale switches:
the distributed fallbacks must be bit-equal to the broadcast paths
they replace above the gate (north_rule: partitioning/shuffle handled
explicitly — both sides of every gate produce the same answer)."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _sorted_pandas(res):
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    return df.sort_values(list(df.columns)).reset_index(drop=True)


class TestUrgentSegmentsPaths:
    def test_join_path_matches_broadcast_bit_for_bit(self, ray_session):
        from bloom_filters_ray.pipelines.queries import \
            q_urgent_customer_segments

        broadcast = _sorted_pandas(
            q_urgent_customer_segments(SF).to_pandas())
        # broadcast_limit=0 forces the distributed hash-join residue
        # check (nothing collected to the driver)
        joined = _sorted_pandas(
            q_urgent_customer_segments(SF, broadcast_limit=0).to_pandas())
        assert list(broadcast.columns) == list(joined.columns)
        assert broadcast.equals(joined)
        assert broadcast["n_customers"].sum() > 0


class TestCuckooHasMany:
    def test_vectorized_probe_matches_scalar(self):
        from bloom_filters_ray.state.cuckoo import CuckooFilter

        for mode in ("standard", "reference"):
            f = CuckooFilter.create(800, error_rate=0.01)
            if mode == "reference":
                f = CuckooFilter(200, f.fingerprint_length, 4,
                                 mode="reference")
            members = [f"item-{i:04d}" for i in range(600)]
            for x in members:
                f.add(x)
            probe = members + [f"absent-{i}" for i in range(800)]
            scalar = np.array([f.has(x) for x in probe])
            vec = f.has_many(pa.array(probe))
            assert (scalar == vec).all()

    def test_snapshot_invalidated_by_add_and_remove(self):
        from bloom_filters_ray.state.cuckoo import CuckooFilter

        f = CuckooFilter.create(100, error_rate=0.01)
        f.add("a")
        assert f.has_many(pa.array(["a", "b"])).tolist() == [True, False]
        f.add("b")
        assert f.has_many(pa.array(["a", "b"])).tolist() == [True, True]
        f.remove("a")
        assert f.has_many(pa.array(["a", "b"])).tolist() == [False, True]

    def test_fingerprint_too_long_raises_like_scalar(self):
        from bloom_filters_ray.state.cuckoo import CuckooFilter

        f = CuckooFilter(64, 17, 4)  # 17 hex chars > any 64-bit hash
        with pytest.raises(ValueError, match="fingerprint length"):
            f.has("x")
        with pytest.raises(ValueError, match="fingerprint length"):
            f.has_many(pa.array(["x", "y"]))


class TestIBLTAddManyBatched:
    def test_bit_equal_to_scalar_adds(self):
        from bloom_filters_ray.state.iblt import InvertibleBloomFilter

        items = [f"item-{i}" for i in range(300)] + ["dup"] * 3 + ["", "x"]
        a = InvertibleBloomFilter(60)
        for it in items:
            a.add(it)
        b = InvertibleBloomFilter(60)
        b.add_many(pa.chunked_array([items[:100], items[100:]]))
        assert all(x.equals(y) for x, y in zip(a._elements, b._elements))

    def test_sliced_input(self):
        from bloom_filters_ray.state.iblt import InvertibleBloomFilter

        items = [f"k{i}" for i in range(50)]
        a = InvertibleBloomFilter(20)
        for it in items:
            a.add(it)
        b = InvertibleBloomFilter(20)
        b.add_many(pa.array(["pad"] + items).slice(1))
        assert all(x.equals(y) for x, y in zip(a._elements, b._elements))


class TestAsofTopnBlocks:
    """Block-level contracts of the as-of matcher and per-key ranker
    (the distributed paths are hard-oracled vs DuckDB ASOF JOIN /
    row_number at sf0.01)."""

    def _tagged(self, rows):
        u, t, e, s = zip(*rows)
        return pa.table({
            "user_id": pa.array(u, type=pa.int64()),
            "ts": pa.array(t, type=pa.timestamp("us")),
            "event_id": pa.array(e, type=pa.int64()),
            "side": pa.array(s, type=pa.int8()),
        })

    def test_asof_matches_brute_force(self):
        from bloom_filters_ray.stages.windows import make_asof_block_fn

        rng = np.random.default_rng(11)
        rows = []
        for u in range(5):
            ts = rng.choice(10_000, size=40, replace=False)
            for i, t in enumerate(ts):
                rows.append((u, int(t), u * 1000 + i, int(i % 3 == 0)))
        out = make_asof_block_fn()(self._tagged(rows))
        got = {(int(e), int(p), int(g)) for e, p, g in
               zip(out["event_id"].to_pylist(), out["prev_id"].to_pylist(),
                   out["gap_us"].to_pylist())}
        want = set()
        for u, t, e, s in rows:
            if s != 1:
                continue
            cands = [(tr, er) for ur, tr, er, sr in rows
                     if sr == 0 and ur == u and tr <= t]
            if cands:
                tr, er = max(cands)
                want.add((e, er, t - tr))
        assert got == want and len(want) > 0

    def test_asof_equal_ts_matches(self):
        from bloom_filters_ray.stages.windows import make_asof_block_fn

        out = make_asof_block_fn()(self._tagged(
            [(1, 100, 7, 0), (1, 100, 8, 1), (1, 99, 9, 1)]))
        # l.ts >= r.ts: the ts-equal left row matches; the earlier one
        # has no preceding right row and drops (inner as-of)
        assert out.to_pydict() == {
            "event_id": [8], "prev_id": [7], "gap_us": [0]}

    def test_range_count_matches_brute_force(self):
        from bloom_filters_ray.stages.windows import \
            make_range_count_block_fn

        rng = np.random.default_rng(23)
        rows = []
        for u in range(6):
            ts = rng.choice(500, size=60, replace=False)
            for i, t in enumerate(ts):
                rows.append((u, int(t), u * 1000 + i, int(i % 2)))
        out = make_range_count_block_fn(window_us=50)(self._tagged(rows))
        got = dict(zip(out["event_id"].to_pylist(),
                       out["n_prior"].to_pylist()))
        want = {}
        for u, t, e, s in rows:
            if s == 1:
                want[e] = sum(1 for ur, tr, _, sr in rows
                              if sr == 0 and ur == u
                              and t - 50 <= tr < t)
        assert got == want and sum(want.values()) > 0

    def test_range_count_boundaries(self):
        from bloom_filters_ray.stages.windows import \
            make_range_count_block_fn

        # rights at exactly ts-window (in) and ts (out)
        out = make_range_count_block_fn(window_us=10)(self._tagged(
            [(1, 90, 1, 0), (1, 100, 2, 0), (1, 100, 3, 1),
             (1, 89, 4, 0)]))
        assert out.to_pydict() == {"event_id": [3], "n_prior": [1]}

    def test_topn_ranks(self):
        from bloom_filters_ray.stages.windows import make_topn_block_fn

        tbl = pa.table({
            "user_id": pa.array([2, 2, 2, 2, 5], type=pa.int64()),
            "ts": pa.array([10, 40, 20, 30, 1], type=pa.timestamp("us")),
            "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        })
        out = make_topn_block_fn(3)(tbl).to_pydict()
        assert out == {"user_id": [2, 2, 2, 5],
                       "event_id": [2, 4, 3, 5], "rk": [1, 2, 3, 1]}

    def test_empty_blocks(self):
        from bloom_filters_ray.stages.windows import (make_asof_block_fn,
                                                      make_topn_block_fn)

        empty = pa.table({
            "user_id": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.timestamp("us")),
            "event_id": pa.array([], type=pa.int64()),
            "side": pa.array([], type=pa.int8()),
        })
        assert len(make_asof_block_fn()(empty)) == 0
        assert len(make_topn_block_fn(3)(
            empty.select(["user_id", "ts", "event_id"]))) == 0


class TestExactIntQuantiles:
    def test_matches_definition_bruteforce(self, ray_session):
        import ray.data

        from bloom_filters_ray.stages.quantiles import exact_int_quantiles
        from bloom_filters_ray.util import ensure_hash_shuffle

        ensure_hash_shuffle()
        rng = np.random.default_rng(5)
        vals = rng.integers(0, 40, size=5000).tolist()
        ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)}))
        out = exact_int_quantiles(ds, "v", [1, 25, 50, 75, 99, 100])
        got = dict(zip(out["pct"].to_pylist(), out["q"].to_pylist()))
        s = sorted(vals)
        n = len(s)
        for p in (1, 25, 50, 75, 99, 100):
            k = (p * n + 99) // 100
            assert got[p] == s[k - 1], p

    def test_empty(self, ray_session):
        import ray.data

        from bloom_filters_ray.stages.quantiles import exact_int_quantiles
        from bloom_filters_ray.util import ensure_hash_shuffle

        ensure_hash_shuffle()
        ds = ray.data.from_arrow(
            pa.table({"v": pa.array([], type=pa.int64())}))
        assert len(exact_int_quantiles(ds, "v", [50])) == 0

    def test_grouped_matches_definition(self, ray_session):
        import ray.data

        from bloom_filters_ray.stages.quantiles import \
            exact_int_quantiles_by
        from bloom_filters_ray.util import ensure_hash_shuffle

        ensure_hash_shuffle()
        rng = np.random.default_rng(9)
        ks = rng.choice(["a", "b", "c"], size=3000).tolist()
        vs = rng.integers(0, 30, size=3000).tolist()
        ds = ray.data.from_arrow(pa.table({"k": ks, "v": vs}))
        out = exact_int_quantiles_by(ds, "k", "v", [10, 50, 95])
        got = {(k, p): q for k, p, q in
               zip(out["k"].to_pylist(), out["pct"].to_pylist(),
                   out["q"].to_pylist())}
        for key in ("a", "b", "c"):
            s = sorted(v for k, v in zip(ks, vs) if k == key)
            for p in (10, 50, 95):
                want = s[(p * len(s) + 99) // 100 - 1]
                assert got[(key, p)] == want, (key, p)

    def test_high_cardinality_hits_gate(self, ray_session):
        """A key×value domain wider than max_hist_rows must fail LOUD
        (ValueError pointing at KLL), never silently materialize the
        histogram on the driver."""
        import pytest
        import ray.data

        from bloom_filters_ray.stages.quantiles import \
            exact_int_quantiles_by
        from bloom_filters_ray.util import ensure_hash_shuffle

        ensure_hash_shuffle()
        # 2000 distinct (k, v) rows vs a gate of 100
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array([f"k{i % 50}" for i in range(2000)]),
            "v": pa.array(list(range(2000))),
        }))
        with pytest.raises(ValueError, match="max_hist_rows"):
            exact_int_quantiles_by(ds, "k", "v", [50], max_hist_rows=100)

    def test_grouped_empty_preserves_key_type(self, ray_session):
        """Empty input: key column type must come from the dataset
        schema (int64 here), not default to string."""
        import ray.data

        from bloom_filters_ray.stages.quantiles import \
            exact_int_quantiles_by
        from bloom_filters_ray.util import ensure_hash_shuffle

        ensure_hash_shuffle()
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array([], type=pa.int32()),
            "v": pa.array([], type=pa.int64()),
        }))
        out = exact_int_quantiles_by(ds, "k", "v", [50])
        assert len(out) == 0
        assert out.schema.field("k").type == pa.int32()


class TestGroupedHLL:
    def test_per_group_estimates_track_exact(self, ray_session):
        """Sketch-per-group: groupby(lang).aggregate(HLLAgg) estimates
        stay within the HLL error envelope of the exact per-group
        distinct counts (small groups sit in the linear-counting
        regime, so the tolerance is comfortably met)."""
        from bloom_filters_ray.pipelines.queries import (
            q_lang_distinct_docs, q_lang_distinct_hll)

        exact = q_lang_distinct_docs(SF).to_pandas() \
            .set_index("lang")["n_unique"]
        est = q_lang_distinct_hll(SF).to_pandas() \
            .set_index("lang")["n_unique_est"]
        assert set(exact.index) == set(est.index)
        for lang in exact.index:
            rel = abs(est[lang] - exact[lang]) / max(exact[lang], 1)
            assert rel <= 0.05, (lang, est[lang], exact[lang])


class TestCCNullGuards:
    def test_null_edge_ids_raise(self):
        from bloom_filters_ray.stages.cc import _id_hash

        with pytest.raises(ValueError, match="null"):
            _id_hash(pa.array([1, None, 3], type=pa.int64()), 7)


class TestHLLLegacyGuard:
    def test_ambiguous_legacy_export_raises(self):
        from bloom_filters_ray.state.hyperloglog import HyperLogLog

        h = HyperLogLog(16, mode="standard")
        data = h.save_as_json()
        assert data["_hashFamily"] == "xxh3"  # engine exports carry it
        del data["_hashFamily"]  # simulate a pre-xxh3 legacy file
        with pytest.raises(ValueError, match="legacy"):
            HyperLogLog.from_json(data)

    def test_reference_layout_roundtrip_still_clean(self):
        from bloom_filters_ray.state.hyperloglog import HyperLogLog

        h = HyperLogLog(16)  # reference mode: pure reference layout
        data = h.save_as_json()
        assert "_mode" not in data and "_hashFamily" not in data
        g = HyperLogLog.from_json(data)
        assert g.equals(h)


class TestKLLAgg:
    def test_distributed_kll_tracks_exact_histogram(self, ray_session):
        """Twin-gate pattern (lang_distinct_hll vs lang_distinct_docs★):
        the KLLAgg sketch quantiles must track the exact histogram
        quantiles within the rank-error envelope on the same data."""
        import ray.data

        from bloom_filters_ray.stages.quantiles import exact_int_quantiles
        from bloom_filters_ray.stages.sketch_aggs import build_kll
        from bloom_filters_ray.util import ensure_hash_shuffle

        ensure_hash_shuffle()
        rng = np.random.default_rng(11)
        vals = rng.geometric(0.01, size=40_000).astype(np.int64)
        ds = ray.data.from_arrow(
            pa.table({"v": pa.array(vals)})).repartition(8).materialize()
        pcts = [25, 50, 75, 95, 99]
        exact = dict(zip(*[c.to_pylist() for c in
                           exact_int_quantiles(ds, "v", pcts).columns]))
        sk = build_kll(ds, on="v", k=200)
        sv = np.sort(vals)
        for p, est in zip(pcts, sk.quantiles(pcts)):
            r_est = np.searchsorted(sv, est, side="right") / len(sv)
            assert abs(r_est - p / 100) <= 0.02, (p, est, exact[p])

    def test_grouped_kll_equals_exact_twin_at_small_scale(self,
                                                          ray_session):
        """Per-group KLL vs the exact per-group histogram: at sf0.001
        every language group is far smaller than k=200, so the sketch
        never compacts and its threshold-rule quantiles must equal the
        exact twin EXACTLY — a bit-level twin gate, not just an error
        envelope."""
        from bloom_filters_ray.pipelines.queries import (
            q_lang_token_quantiles, q_lang_token_quantiles_kll)

        exact = q_lang_token_quantiles(SF).to_pandas() \
            .sort_values(["lang", "pct"]).reset_index(drop=True)
        est = q_lang_token_quantiles_kll(SF).to_pandas() \
            .sort_values(["lang", "pct"]).reset_index(drop=True)
        assert exact["lang"].tolist() == est["lang"].tolist()
        assert exact["pct"].tolist() == est["pct"].tolist()
        assert (exact["q"].to_numpy(dtype=np.float64)
                == est["q_est"].to_numpy()).all()

    def test_registry_invariant_every_oracle_has_a_query(self):
        # a dangling ORACLES key would silently never be gate-checked
        from bloom_filters_ray.pipelines.queries import ORACLES, QUERIES

        assert not set(ORACLES) - set(QUERIES)

    def test_query_registered_rows_only(self, ray_session):
        from bloom_filters_ray.pipelines.queries import ORACLES, QUERIES

        assert "token_quantiles_kll" in QUERIES
        assert "token_quantiles_kll" not in ORACLES  # approximate by nature
        out = QUERIES["token_quantiles_kll"](SF)
        tbl = out if isinstance(out, pa.Table) else pa.Table.from_pandas(out)
        assert tbl.num_rows == 5
        assert tbl.schema.field("q_est").type == pa.float64()
