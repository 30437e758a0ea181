"""Statistical + serialization contracts for the Bloom family, at the
reference suite's scales (tests/bloom-filter.test.ts,
counting-bloom-filter.test.ts, partitioned-bloom-filter.test.ts,
scalable-bloom-filter.test.ts)."""

import json

import numpy as np
import pytest

from bloom_filters_ray.formulas import optimal_filter_size, optimal_hashes
from bloom_filters_ray.state import (BloomFilter, CountingBloomFilter,
                                     PartitionedBloomFilter, ScalableBloomFilter)


def test_optimal_formulas():
    import math
    n, eps = 1000, 0.001
    m = optimal_filter_size(n, eps)
    assert m == math.ceil(-((n * math.log(eps)) / math.log(2) ** 2))
    assert optimal_hashes(m, n) == math.ceil((m / n) * math.log(2))


class TestBloomFilter:
    def test_add_has(self):
        f = BloomFilter.create(100, 0.01)
        for w in ("alice", "bob", "carl"):
            f.add(w)
        assert f.has("alice") and f.has("bob") and f.has("carl")

    def test_vectorized_matches_scalar(self):
        f1 = BloomFilter.create(500, 0.01)
        f2 = BloomFilter.create(500, 0.01)
        items = [f"item-{i}" for i in range(500)]
        for it in items:
            f1.add(it)
        f2.add_many(items)
        assert f1.equals(f2)
        probes = items[:50] + [f"other-{i}" for i in range(50)]
        got = f2.has_many(probes)
        want = np.array([f1.has(p) for p in probes])
        assert (got == want).all()

    def test_fp_rate_10k(self):
        # reference scale: 10,000 inserts at eps=0.01 (bloom-filter.test.ts:113-134)
        n, eps = 10000, 0.01
        f = BloomFilter.create(n, eps)
        f.add_many([f"present-{i}" for i in range(n)])
        probes = [f"absent-{i}" for i in range(n)]
        fp = int(f.has_many(probes).sum())
        assert fp / n < eps * 3

    def test_union_merge_equals_single_build(self):
        items = [f"x-{i}" for i in range(1000)]
        full = BloomFilter.create(1000, 0.01)
        full.add_many(items)
        a = BloomFilter.create(1000, 0.01)
        b = BloomFilter.create(1000, 0.01)
        a.add_many(items[:500])
        b.add_many(items[500:])
        a.union_inplace(b)
        assert a.equals(full)

    def test_json_roundtrip(self):
        f = BloomFilter.from_items(["alice", "bob"], 0.01)
        j = json.loads(json.dumps(f.save_as_json()))
        g = BloomFilter.from_json(j)
        assert f.equals(g) and g.has("alice") and g.seed == f.seed


class TestCountingBloomFilter:
    def test_add_remove(self):
        f = CountingBloomFilter.create(100, 0.01)
        f.add("alice")
        f.add("bob")
        assert f.has("alice") and f.has("bob")
        assert f.remove("bob") is True
        assert not f.has("bob")
        assert f.length == 1

    def test_fp_rate_1k(self):
        n, eps = 1000, 0.01
        f = CountingBloomFilter.create(n, eps)
        f.add_many([f"present-{i}" for i in range(n)])
        fp = int(f.has_many([f"absent-{i}" for i in range(n)]).sum())
        assert fp / n < eps * 3

    def test_merge(self):
        items = [f"x-{i}" for i in range(200)]
        full = CountingBloomFilter.create(200, 0.01)
        full.add_many(items)
        a = CountingBloomFilter.create(200, 0.01)
        b = CountingBloomFilter.create(200, 0.01)
        a.add_many(items[:100])
        b.add_many(items[100:])
        a.merge_inplace(b)
        assert a.equals(full)

    def test_json_roundtrip(self):
        f = CountingBloomFilter.from_items(["alice", "bob"], 0.01)
        g = CountingBloomFilter.from_json(json.loads(json.dumps(f.save_as_json())))
        assert f.equals(g)


class TestPartitionedBloomFilter:
    def test_fp_rate_10k(self):
        # reference scale: 10,000 inserts at rate 0.1 (partitioned test:78-99)
        n, eps = 10000, 0.1
        f = PartitionedBloomFilter.create(n, eps)
        f.add_many([f"present-{i}" for i in range(n)])
        assert all(f.has_many([f"present-{i}" for i in range(n)]))
        fp = int(f.has_many([f"absent-{i}" for i in range(n)]).sum())
        assert fp / n < eps * 3

    def test_json_roundtrip(self):
        f = PartitionedBloomFilter.from_items(["alice", "bob", "carl"], 0.1)
        g = PartitionedBloomFilter.from_json(json.loads(json.dumps(f.save_as_json())))
        assert f.equals(g) and g.has("alice")


class TestScalableBloomFilter:
    def test_growth_10240(self):
        # reference scale: 10,240 adds at eps=1e-4 (scalable test:29-55)
        f = ScalableBloomFilter.create(128, 0.0001)
        items = [f"item-{i}" for i in range(10240)]
        for it in items:
            f.add(it)
        assert f.nb_filters > 1
        assert all(f.has(it) for it in items[::97])

    def test_bulk_matches_membership(self):
        f = ScalableBloomFilter.create(128, 0.0001)
        items = [f"item-{i}" for i in range(5000)]
        f.add_many(items)
        assert f.has_many(items).all()
        fp = int(f.has_many([f"no-{i}" for i in range(5000)]).sum())
        assert fp / 5000 < 0.01

    def test_json_roundtrip(self):
        f = ScalableBloomFilter.create(128, 0.001)
        f.add_many([f"i{i}" for i in range(500)])
        g = ScalableBloomFilter.from_json(json.loads(json.dumps(f.save_as_json())))
        assert g.nb_filters == f.nb_filters
        assert g.has_many([f"i{i}" for i in range(500)]).all()


class TestXorHasMany:
    def test_has_many_matches_scalar(self):
        import numpy as np
        import pyarrow as pa

        from bloom_filters_ray.state.xor_filter import XorFilter

        members = [f"member-{i}" for i in range(500)]
        others = [f"other-{i}" for i in range(500)]
        xf = XorFilter.create(members, bits_per_fingerprint=16)
        col = pa.array(members + others)
        got = xf.has_many(col)
        want = np.array([xf.has(v) for v in members + others])
        assert (got == want).all()
        assert got[:500].all()  # no false negatives on the build set
