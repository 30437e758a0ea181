"""Statistical contracts for MinHash / CMS / HLL / TopK / Cuckoo / Xor /
IBLT at the reference suite's scales (SURVEY.md §5.3)."""

import json
import math

import numpy as np
import pytest

from bloom_filters_ray.state import (Cell, CountMinSketch, CuckooFilter,
                                     HyperLogLog, InvertibleBloomFilter, MinHash,
                                     MinHashFactory, TopK, XorFilter,
                                     closest_prime, is_prime)
from bloom_filters_ray.state.iblt import xor_bytes


class TestMinHash:
    def test_closest_prime_reference_semantics(self):
        assert closest_prime(2) == 2
        assert closest_prime(14) == 17
        # the reference's isPrime loop bound admits odd prime squares
        assert is_prime(9) is True
        assert is_prime(15) is False

    def test_jaccard_estimate(self):
        # reference scale: k=50, sets of ~10k ints, maxValue ~20k
        # (tests/min-hash.test.ts:18-75)
        rng = np.random.default_rng(7)
        max_value = 20000
        A = set(rng.choice(max_value, size=10000, replace=False).tolist())
        B = set(rng.choice(max_value, size=10000, replace=False).tolist())
        exact = len(A & B) / len(A | B)
        factory = MinHashFactory(50, max_value, seed=42)
        ma, mb = factory.create(), factory.create()
        ma.bulk_load(list(A))
        mb.bulk_load(list(B))
        est = ma.compare_with(mb)
        assert abs(est - exact) < 0.15

    def test_identical_sets_estimate_1(self):
        factory = MinHashFactory(50, 1000, seed=1)
        a, b = factory.create(), factory.create()
        vals = list(range(500))
        a.bulk_load(vals)
        b.bulk_load(vals)
        assert a.compare_with(b) == 1.0

    def test_empty_raises(self):
        factory = MinHashFactory(10, 100, seed=1)
        a, b = factory.create(), factory.create()
        b.bulk_load([1, 2, 3])
        with pytest.raises(ValueError):
            a.compare_with(b)

    def test_add_matches_bulk_load(self):
        factory = MinHashFactory(32, 5000, seed=3)
        a, b = factory.create(), factory.create()
        vals = [5, 900, 4212, 17]
        for v in vals:
            a.add(v)
        b.bulk_load(vals)
        assert (a._signature == b._signature).all()

    def test_batch_signatures_match_bulk_load(self):
        factory = MinHashFactory(16, 1 << 20, seed=9)
        rng = np.random.default_rng(0)
        rows = [rng.integers(0, 1 << 20, size=int(n)).tolist()
                for n in rng.integers(0, 50, size=30)]
        flat = np.array([v for r in rows for v in r], dtype=np.int64)
        offsets = np.cumsum([0] + [len(r) for r in rows])
        sigs = factory.signatures(flat, offsets)
        for i, r in enumerate(rows):
            if not r:
                assert (sigs[i] == -1).all()
                continue
            mh = factory.create()
            mh.bulk_load(r)
            assert (sigs[i] == mh._signature.astype(np.int64)).all()

    def test_json_roundtrip(self):
        factory = MinHashFactory(8, 100, seed=5)
        m = factory.create()
        m.bulk_load([1, 5, 9])
        g = MinHash.from_json(json.loads(json.dumps(m.save_as_json())))
        assert (g._signature == m._signature).all()
        assert g.compare_with(m) == 1.0


class TestCountMinSketch:
    def test_create_dims_verbatim(self):
        s = CountMinSketch.create(0.001, 0.999)
        assert s.columns == math.ceil(math.e / 0.001)
        assert s.rows == math.ceil(math.log(1 / 0.999))  # == 1, as in the reference

    def test_update_count_bound_100k(self):
        # reference scale: 100,000 updates (count-min-sketch.test.ts:94-130)
        eps = 1e-5
        s = CountMinSketch(math.ceil(math.e / eps), 2, seed=42)
        rng = np.random.default_rng(11)
        keys = [f"key-{i}" for i in range(1000)]
        draws = rng.integers(0, 1000, size=100000)
        elems = [keys[i] for i in draws]
        s.update_many(elems)
        true_counts = np.bincount(draws, minlength=1000)
        est = s.count_many(keys)
        assert (est >= true_counts).all()
        assert (est <= true_counts + eps * s.sum).all()

    def test_update_scalar_matches_vectorized(self):
        a = CountMinSketch(100, 3, seed=1)
        b = CountMinSketch(100, 3, seed=1)
        elems = [f"e{i}" for i in range(50)]
        for e in elems:
            a.update(e)
        b.update_many(elems)
        assert a.equals(b)
        assert a.count("e1") == b.count_many(["e1"])[0]

    def test_merge(self):
        a = CountMinSketch(100, 2, seed=1)
        b = CountMinSketch(100, 2, seed=1)
        a.update_many(["x"] * 5)
        b.update_many(["x"] * 3 + ["y"] * 2)
        a.merge(b)
        assert a.count("x") >= 8 and a.sum == 10

    def test_json_roundtrip(self):
        a = CountMinSketch(50, 2, seed=9)
        a.update_many(["p", "q", "p"])
        g = CountMinSketch.from_json(json.loads(json.dumps(a.save_as_json())))
        assert a.equals(g) and g.sum == 3


class TestHyperLogLog:
    def test_accuracy_1e5(self):
        # reference scale: m=256, n=1e5, within 3 sigma (hyperloglog.test.ts:5-46)
        h = HyperLogLog(256)
        n = 100000
        h.update_many([f"elem-{i}" for i in range(n)])
        sigma = h.relative_error()
        assert abs(h.count() - n) < 3 * sigma * n

    def test_update_scalar_matches_vectorized(self):
        a, b = HyperLogLog(64), HyperLogLog(64)
        elems = [f"e{i}" for i in range(500)]
        for e in elems:
            a.update(e)
        b.update_many(elems)
        assert a.equals(b)

    def test_merge_is_union(self):
        a, b = HyperLogLog(128), HyperLogLog(128)
        a.update_many([f"a{i}" for i in range(1000)])
        b.update_many([f"b{i}" for i in range(1000)])
        u = a.merge(b)
        assert u.count() > max(a.count(), b.count())

    def test_power_of_two_required(self):
        with pytest.raises(ValueError):
            HyperLogLog(100)

    def test_json_roundtrip(self):
        a = HyperLogLog(32)
        a.update_many(["x", "y", "z"])
        g = HyperLogLog.from_json(json.loads(json.dumps(a.save_as_json())))
        assert a.equals(g) and g.count() == a.count()


class TestTopK:
    def test_ranking(self):
        t = TopK(3, 0.001, 0.999, seed=42)
        for word, n in [("alice", 10), ("bob", 7), ("carl", 5), ("dave", 2)]:
            for _ in range(n):
                t.add(word)
        vals = t.values()
        assert [v["value"] for v in vals] == ["alice", "bob", "carl"]
        assert [v["rank"] for v in vals] == [1, 2, 3]
        assert vals[0]["frequency"] >= 10

    def test_json_roundtrip(self):
        t = TopK(2, 0.001, 0.999, seed=42)
        for w in ["a", "a", "b", "c", "a", "b"]:
            t.add(w)
        g = TopK.from_json(json.loads(json.dumps(t.save_as_json())))
        assert [v["value"] for v in g.values()] == [v["value"] for v in t.values()]


class TestCuckooFilter:
    def test_small_extreme(self):
        # reference scale: 20 inserts, eps=1e-18, bucketSize=1, 500 kicks
        # (cuckoo-filter.test.ts:239-268)
        f = CuckooFilter.create(20, 1e-18, bucket_size=1, max_kicks=500)
        items = [f"https://example.com/page/{i}" for i in range(20)]
        for it in items:
            assert f.add(it) is True
        assert all(f.has(it) for it in items)

    def test_add_has_remove(self):
        f = CuckooFilter.create(100, 0.01)
        f.add("alice")
        f.add("bob")
        assert f.has("alice") and f.has("bob")
        assert f.remove("alice") is True
        assert not f.has("alice")
        assert f.length == 1

    def test_fp_rate(self):
        n = 1000
        f = CuckooFilter.create(n, 0.01)
        for i in range(n):
            f.add(f"present-{i}")
        fp = sum(f.has(f"absent-{i}") for i in range(n))
        assert fp / n < 0.03

    def test_json_roundtrip(self):
        f = CuckooFilter.create(50, 0.01)
        for i in range(30):
            f.add(f"x{i}")
        g = CuckooFilter.from_json(json.loads(json.dumps(f.save_as_json())))
        assert f.equals(g) and g.has("x3")


class TestXorFilter:
    @pytest.mark.parametrize("bits", [8, 16, 32, 64])
    def test_tp_tn_rates(self, bits):
        # reference scale: 1,000 elements, TP/TN > 0.99 (xor-filter.test.ts:5-43)
        n = 1000
        items = [f"element-{i}" for i in range(n)]
        f = XorFilter.create(items, bits)
        tp = sum(f.has(it) for it in items)
        tn = sum(not f.has(f"other-{i}") for i in range(n))
        assert tp == n
        assert tn / n > 0.99

    def test_json_roundtrip(self):
        items = [f"e{i}" for i in range(100)]
        f = XorFilter.create(items, 16)
        g = XorFilter.from_json(json.loads(json.dumps(f.save_as_json())))
        assert f.equals(g) and all(g.has(it) for it in items)


class TestIBLT:
    def test_xor_bytes_trim(self):
        assert xor_bytes(b"\x01\x02", b"\x01\x02") == b""
        # right-aligned xor: 0x0001 ^ 0x01 = 0x0000 -> leading zeros trimmed
        assert xor_bytes(b"\x00\x01", b"\x01") == b""
        assert xor_bytes(b"\x00\xff", b"\x01") == b"\xfe"
        assert xor_bytes(b"abc", b"") == b"abc"

    def test_add_has_listing(self):
        iblt = InvertibleBloomFilter(50, alpha=3, hash_count=4, seed=42)
        for i in range(20):
            iblt.add(f"item-{i}")
        assert all(iblt.has(f"item-{i}") for i in range(20))
        assert abs(iblt.length - 20) < 1e-9
        assert sorted(iblt.list_entries()) == sorted(f"item-{i}" for i in range(20))

    def test_substract_decode_100_of_1000(self):
        # reference scale: d=100 differences out of 1,000 keys, exact recovery
        # (iblt.test.ts:120-160); multiple seeds
        for seed in (1, 7, 42):
            d = 100
            local = InvertibleBloomFilter(d, alpha=2, hash_count=4, seed=seed)
            remote = InvertibleBloomFilter(d, alpha=2, hash_count=4, seed=seed)
            common = [f"common-{i}" for i in range(900)]
            only_local = [f"local-{i}" for i in range(50)]
            only_remote = [f"remote-{i}" for i in range(50)]
            for e in common + only_local:
                local.add(e)
            for e in common + only_remote:
                remote.add(e)
            res = local.substract(remote).decode()
            assert res["success"] is True
            assert sorted(res["additional"]) == sorted(only_local)
            assert sorted(res["missing"]) == sorted(only_remote)

    def test_json_roundtrip(self):
        iblt = InvertibleBloomFilter(10, seed=3)
        iblt.add("hello")
        g = InvertibleBloomFilter.from_json(json.loads(json.dumps(iblt.save_as_json())))
        assert g.has("hello")
        assert g._elements[0].equals(iblt._elements[0])

    def test_add_many_bit_equal_to_scalar(self):
        """Vectorized digest path (gen_hashes_many / gen_indexes_many /
        add_many) must be bit-identical to per-element add — including
        the unpadded-hex digest quirks (short digests, odd nibbles)."""
        import numpy as np
        import pyarrow as pa

        items = ([f"item-{i}" for i in range(200)]
                 + ["", "a", "héllo wörld", "x" * 300, "éß世"]
                 + [f"id{i:06d}" for i in range(50)])
        a = InvertibleBloomFilter(40, alpha=2, hash_count=6, seed=9)
        b = InvertibleBloomFilter(40, alpha=2, hash_count=6, seed=9)
        for e in items:
            a.add(e)
        arr = pa.array(items, type=pa.string())
        b.add_many(arr)
        assert a.save_as_json() == b.save_as_json()
        # per-element hash/index conformance
        hs = b.gen_hashes_many(arr)
        idxs = b.gen_indexes_many(arr)
        for i, e in enumerate(items):
            assert int(hs[i]) == a.gen_hash(e), e
            assert list(idxs[i]) == a.gen_indexes(e), e


class TestKLL:
    """KLL quantile sketch (state/kll.py): rank-error contract, merge
    semantics, and edge cases — the unbounded-domain complement of the
    exact histogram quantiles."""

    def test_rank_error_bound_after_sharded_merge(self):
        import numpy as np

        from bloom_filters_ray.state.kll import KLLSketch

        rng = np.random.default_rng(0)
        data = np.exp(rng.normal(0.0, 2.0, size=120_000))  # heavy tail
        shards = []
        for si, part in enumerate(np.array_split(data, 12)):
            s = KLLSketch(200, seed=1000 + si)
            for chunk in np.array_split(part, 3):  # streamed ingest
                s.update_many(chunk)
            shards.append(s)
        m = shards[0]
        for s in shards[1:]:
            m.merge(s)
        assert m.n == len(data)
        # state stays bounded regardless of n
        assert m._size() <= m._budget() <= 3 * 200
        sd = np.sort(data)
        for p in (1, 10, 25, 50, 75, 90, 99):
            est = m.quantile(p)
            r = np.searchsorted(sd, est, side="right") / len(sd)
            # paper bound ~1.65/k = 0.825%; allow 2% slack for the
            # 12-way merge + streamed ingest
            assert abs(r - p / 100) <= 0.02, (p, est, r)

    def test_exact_below_capacity(self):
        """Under k items nothing ever compacts: quantiles are exact
        under the shared ceil(p*n/100) threshold definition."""
        import numpy as np

        from bloom_filters_ray.state.kll import KLLSketch

        vals = [5.0, 1.0, 9.0, 3.0, 7.0]
        s = KLLSketch(200, seed=1).update_many(vals)
        sv = sorted(vals)
        for p in (1, 20, 40, 60, 80, 100):
            k = (p * len(vals) + 99) // 100
            assert s.quantile(p) == sv[max(k, 1) - 1], p

    def test_nan_and_empty(self):
        import numpy as np

        from bloom_filters_ray.state.kll import KLLSketch

        s = KLLSketch(64, seed=2)
        assert np.isnan(s.quantile(50))
        s.update_many([np.nan, np.nan, 4.0])
        assert s.n == 1 and s.quantile(50) == 4.0

    def test_merge_rejects_mismatched_k(self):
        import pytest

        from bloom_filters_ray.state.kll import KLLSketch

        with pytest.raises(ValueError):
            KLLSketch(64).merge(KLLSketch(128))

    def test_rank_scales_to_n(self):
        import numpy as np

        from bloom_filters_ray.state.kll import KLLSketch

        data = np.arange(50_000, dtype=np.float64)
        s = KLLSketch(200, seed=3).update_many(data)
        # retained weight equals n within odd-compaction drift (<1%)
        v, w = s._weighted()
        assert abs(int(w.sum()) - s.n) <= s.n * 0.01
        assert abs(s.rank(25_000.0) - 25_000) <= 1_500
