"""Sampling operators (stages/sampling.py): deterministic hash
splits and Efraimidis-Spirakis weighted sampling.

Pinned laws:
- fib64 is bit-equal to its DuckDB HUGEINT SQL twin (the doc_splits
  oracle's arithmetic) for any non-negative BIGINT key.
- hash_split is a pure function of row content: stable under
  repartitioning, roughly uniform across splits.
- weighted_sample_k is a pure function of (contents, seed, k):
  partitioning-invariant, excludes non-positive weights, and for k=1
  samples row i with probability w_i / sum(w) (the A-ES exactness
  law, checked empirically across seeds).
"""

import numpy as np
import pyarrow as pa
import pytest

from bloom_filters_ray.stages.sampling import (PHI64, _aes_keys, fib64,
                                               hash_split,
                                               make_weighted_partial_fn,
                                               weighted_sample_k)

SF = "/root/testdata/sf0.001"


class TestFib64:
    def test_matches_duckdb_hugeint_twin(self):
        import duckdb

        rng = np.random.default_rng(11)
        keys = rng.integers(0, 1 << 62, size=5000).astype(np.int64)
        for seed in (0, 42, (1 << 32) - 1):
            ours = fib64(keys, seed)
            con = duckdb.connect()
            con.register("t", pa.table({"k": keys}))
            got = con.execute(f"""
                SELECT xor(z, z >> 32) AS h FROM (
                  SELECT (((k::HUGEINT + {seed}) * {PHI64}::HUGEINT)
                          % 18446744073709551616::HUGEINT)::UBIGINT AS z
                  FROM t)""").fetchnumpy()["h"]
            assert np.array_equal(ours, got.astype(np.uint64))

    def test_seed_changes_hash_and_range_checked(self):
        keys = np.arange(100, dtype=np.int64)
        assert not np.array_equal(fib64(keys, 0), fib64(keys, 1))
        with pytest.raises(ValueError):
            fib64(keys, -1)
        with pytest.raises(ValueError):
            fib64(keys, 1 << 32)


class TestHashSplit:
    def test_stable_under_repartition_and_uniform(self, ray_session):
        import ray.data

        ids = np.arange(20000, dtype=np.int64)
        ds = ray.data.from_arrow(pa.table({"doc_id": ids}))
        out = hash_split(ds, "doc_id", n_splits=10, seed=7).to_pandas()
        out2 = hash_split(ds.repartition(13), "doc_id", n_splits=10,
                          seed=7).to_pandas()
        m1 = out.set_index("doc_id")["split"].sort_index()
        m2 = out2.set_index("doc_id")["split"].sort_index()
        assert m1.equals(m2)
        counts = m1.value_counts()
        assert len(counts) == 10
        # binomial 3-sigma band around n/10
        sigma = np.sqrt(20000 * 0.1 * 0.9)
        assert (np.abs(counts.to_numpy() - 2000) < 4 * sigma).all()

    def test_xxh64_hasher_int_keys(self, ray_session):
        import ray.data

        from bloom_filters_ray.hashing import xxh64_u64

        ids = np.arange(500, dtype=np.int64)
        ds = ray.data.from_arrow(pa.table({"doc_id": ids}))
        out = hash_split(ds, "doc_id", 4, seed=3,
                         hasher="xxh64").to_pandas().set_index("doc_id")
        expect = xxh64_u64(ids.astype(np.uint64), seed=3) % np.uint64(4)
        assert (out["split"].sort_index().to_numpy()
                == expect.astype(np.int64)).all()

    def test_xxh64_hasher_string_keys(self, ray_session):
        import ray.data

        from bloom_filters_ray.hashing import xxh64_arrow

        keys = pa.array([f"doc-{i}" for i in range(300)])
        ds = ray.data.from_arrow(pa.table({"k": keys}))
        out = hash_split(ds, "k", 4, seed=3, hasher="xxh64").to_pandas()
        expect = (xxh64_arrow(keys, seed=3) % np.uint64(4)).astype(np.int64)
        got = out.set_index("k")["split"]
        assert (got.loc[keys.to_pylist()].to_numpy() == expect).all()

    def test_bad_args(self):
        from bloom_filters_ray.stages.sampling import make_hash_split_fn

        with pytest.raises(ValueError):
            make_hash_split_fn("doc_id", 0)
        with pytest.raises(ValueError):
            make_hash_split_fn("doc_id", 4, hasher="md5")


class TestWeightedSample:
    def test_partitioning_invariant(self, ray_session):
        import ray.data

        rng = np.random.default_rng(3)
        ids = rng.permutation(4000).astype(np.int64)
        w = rng.integers(1, 100, size=4000).astype(np.float64)
        tbl = pa.table({"doc_id": ids, "weight": w})
        a = weighted_sample_k(ray.data.from_arrow(tbl), "doc_id",
                              "weight", k=37, seed=5)
        b = weighted_sample_k(
            ray.data.from_arrow(tbl).repartition(17), "doc_id",
            "weight", k=37, seed=5)
        assert a.equals(b)
        assert a.num_rows == 37
        assert a["rank"].to_pylist() == list(range(1, 38))

    def test_block_partial_caps_rows(self):
        fn = make_weighted_partial_fn("doc_id", "weight", k=5, seed=1)
        batch = pa.table({
            "doc_id": pa.array(np.arange(100, dtype=np.int64)),
            "weight": pa.array(np.ones(100))})
        assert fn(batch).num_rows == 5

    def test_nonpositive_weights_never_sampled(self, ray_session):
        import ray.data

        ids = np.arange(10, dtype=np.int64)
        w = np.where(ids < 3, -1.0, 1.0)
        w[3] = 0.0
        out = weighted_sample_k(
            ray.data.from_arrow(pa.table({"doc_id": ids, "weight": w})),
            "doc_id", "weight", k=10, seed=2)
        got = set(out["doc_id"].to_pylist())
        assert got == set(range(4, 10))  # only the 6 positive-weight rows

    def test_k1_inclusion_probability_law(self):
        # A-ES exactness for k=1: P(argmax key = i) == w_i / sum(w).
        # Pure driver-side check over 4000 seeds (no Ray). Uses the
        # default xxh64 hasher: the u_i must be independent across
        # rows, which multiply-shift fib64 does NOT give for
        # sequential ids ((id+seed) pairs collide across seeds) —
        # that's exactly why xxh64 is the default and fib64 exists
        # only for the SQL-twin path (see sampling.py docstring).
        ids = np.arange(6, dtype=np.int64)
        w = np.array([1.0, 1.0, 2.0, 4.0, 8.0, 16.0])
        n = 4000
        wins = np.zeros(6)
        for seed in range(n):
            wins[np.argmax(_aes_keys(ids, w, seed, "xxh64"))] += 1
        p = w / w.sum()
        sigma = np.sqrt(n * p * (1 - p))
        assert (np.abs(wins - n * p) < 4 * sigma).all()

    def test_stratified_matches_brute_force(self, ray_session):
        import ray.data

        from bloom_filters_ray.stages.sampling import stratified_sample_k
        from bloom_filters_ray.util import ensure_hash_shuffle

        # BEFORE from_arrow: each Dataset snapshots the DataContext
        ensure_hash_shuffle()
        rng = np.random.default_rng(13)
        n = 3000
        groups = rng.choice(["en", "fr", "de", "ja"], size=n)
        ids = rng.permutation(n).astype(np.int64)
        w = rng.integers(1, 50, size=n).astype(np.float64)
        tbl = pa.table({"g": groups, "doc_id": ids, "weight": w})
        out = stratified_sample_k(
            ray.data.from_arrow(tbl).repartition(9), "g", "doc_id",
            "weight", k=7, seed=4).to_pandas()
        key = _aes_keys(ids, w, 4, "xxh64")
        for gname in ("en", "fr", "de", "ja"):
            m = groups == gname
            order = np.lexsort((ids[m], -key[m]))[:7]
            expect = ids[m][order]
            got = out[out["g"] == gname].sort_values("rank")
            assert got["doc_id"].to_numpy().tolist() == expect.tolist()
            assert got["rank"].tolist() == list(range(1, len(expect) + 1))

    def test_stratified_partitioning_invariant(self, ray_session):
        import ray.data

        from bloom_filters_ray.stages.sampling import stratified_sample_k
        from bloom_filters_ray.util import ensure_hash_shuffle

        ensure_hash_shuffle()
        rng = np.random.default_rng(21)
        tbl = pa.table({
            "g": rng.choice(["a", "b"], size=1000),
            "doc_id": np.arange(1000, dtype=np.int64),
            "weight": rng.integers(1, 9, size=1000).astype(np.float64)})

        def run(parts):
            df = stratified_sample_k(
                ray.data.from_arrow(tbl).repartition(parts), "g",
                "doc_id", "weight", k=5, seed=8).to_pandas()
            return df.sort_values(["g", "rank"]).reset_index(drop=True)

        assert run(3).equals(run(11))

    def test_fib64_hasher_matches_duckdb_topk(self):
        # the full weighted_sample oracle-twin law, driver-side
        import duckdb

        rng = np.random.default_rng(9)
        ids = rng.integers(0, 1 << 40, size=8000).astype(np.int64)
        w = rng.integers(1, 400, size=8000).astype(np.float64)
        key = _aes_keys(ids, w, 42, "fib64")
        order = np.lexsort((ids, -key))[:50]
        con = duckdb.connect()
        con.register("t", pa.table({"doc_id": ids, "w": w}))
        got = con.execute(f"""
            WITH keyed AS (
              SELECT doc_id,
                     ln(((xor(z, z >> 32) >> 11)::DOUBLE + 0.5)
                        * pow(2.0, -53)) / w AS skey
              FROM (SELECT doc_id, w,
                           (((doc_id::HUGEINT + 42) * {PHI64}::HUGEINT)
                            % 18446744073709551616::HUGEINT)::UBIGINT AS z
                    FROM t))
            SELECT doc_id FROM keyed
            ORDER BY skey DESC, doc_id LIMIT 50""").fetchnumpy()["doc_id"]
        assert np.array_equal(ids[order], got)
