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


class TestCustomHashing:
    """Reference README "Seeding and Hashing" / tests/utils.test.ts:
    117-130 — a user-supplied Hashing object (overridden serialize)
    plugs into the double-hashed structures end-to-end."""

    class OneHashing:
        def __getattr__(self, name):  # defer to the base for the rest
            from bloom_filters_ray.hashing import Hashing
            return getattr(Hashing, name).__get__(self)

        def serialize(self, element, seed=0):
            from bloom_filters_ray.hashing import xxh64
            return xxh64(element, (seed or 0) + 1)  # shifted family

    def test_bloom_counting_partitioned_cms(self):
        import numpy as np

        from bloom_filters_ray.hashing import Hashing
        from bloom_filters_ray.state.bloom import BloomFilter
        from bloom_filters_ray.state.cms import CountMinSketch
        from bloom_filters_ray.state.counting_bloom import \
            CountingBloomFilter
        from bloom_filters_ray.state.partitioned_bloom import \
            PartitionedBloomFilter

        items = [f"item-{i}" for i in range(300)]
        h = self.OneHashing()
        default = Hashing()

        bf = BloomFilter(4096, 4, hasher=h)
        bf.add_many(items)
        assert bf.has_many(items).all()  # no false negatives, custom path
        # the custom family produces different index sets
        assert (h.get_indexes("item-0", 4096, 4)
                != default.get_indexes("item-0", 4096, 4))
        bf2 = BloomFilter(4096, 4)
        bf2.add_many(items)
        assert not bf.equals(bf2)  # different bit patterns

        cb = CountingBloomFilter(4096, 4, hasher=h)
        for it in items:
            cb.add(it)
        assert all(cb.has(it) for it in items)
        cb.remove(items[0])

        pb = PartitionedBloomFilter.create(300, 0.01)
        pb._hasher = h
        for it in items:
            pb.add(it)
        assert all(pb.has(it) for it in items)

        cms = CountMinSketch.create(1e-3, hasher=h)
        for it in items:
            cms.update(it)
        assert all(cms.count(it) >= 1 for it in items)

    def test_default_hashing_matches_module_kernel(self):
        from bloom_filters_ray.hashing import Hashing, get_indexes

        h = Hashing()
        assert h.get_indexes("abc", 1000, 7) == get_indexes("abc", 1000, 7)

    def test_cuckoo_scalable_xor_hll_topk(self):
        """hasher= now reaches every remaining structure: Cuckoo
        (routes _locations and kick relocation), Scalable (handed to
        each cascade member), Xor (replaces _hash64 in build and both
        probe paths), HLL (element hash), TopK (internal CMS)."""
        import numpy as np
        import pyarrow as pa

        from bloom_filters_ray.state.cuckoo import CuckooFilter
        from bloom_filters_ray.state.hyperloglog import HyperLogLog
        from bloom_filters_ray.state.scalable_bloom import \
            ScalableBloomFilter
        from bloom_filters_ray.state.topk import TopK
        from bloom_filters_ray.state.xor_filter import XorFilter

        items = [f"item-{i}" for i in range(300)]
        h = self.OneHashing()

        cf = CuckooFilter.create(500, 0.01, hasher=h)
        for it in items:
            assert cf.add(it)
        assert all(cf.has(it) for it in items)
        cf2 = CuckooFilter.create(500, 0.01)
        assert cf._locations("item-0") != cf2._locations("item-0")

        sb = ScalableBloomFilter(128, 0.01, hasher=h)
        sb.add_many(items)
        assert sb.has_many(items).all()
        assert all(f._hasher is h for f in sb._filters)

        xf = XorFilter.create(items, bits_per_fingerprint=16, hasher=h)
        assert all(xf.has(it) for it in items)
        assert xf.has_many(pa.array(items)).all()
        xf2 = XorFilter(len(items), 16, seed=xf._seed)
        assert xf._hash64("item-0", 7) != xf2._hash64("item-0", 7)

        # "standard" mode: the reference estimator is biased in the
        # sparse regime (n << m, documented in hyperloglog.py), which
        # would mask a real hash problem here
        hl = HyperLogLog(1024, mode="standard", hasher=h)
        hl.update_many(items)
        hl2 = HyperLogLog(1024, mode="standard")
        hl2.update_many(items)
        est = hl.count()
        assert abs(est - 300) < 100  # same accuracy contract
        assert not np.array_equal(hl._registers, hl2._registers)

        tk = TopK(5, 1e-3, 0.999, hasher=h)
        for it in items + ["hot"] * 50:
            tk.add(it)
        vals = tk.values()
        assert vals[0]["value"] == "hot" and vals[0]["frequency"] >= 50
        assert tk._sketch._hasher is h


class TestCuckooReferenceMode:
    def test_reference_indexing_verbatim(self):
        """mode='reference' replays cuckoo-filter.ts:319-339 index
        derivation: i1 = h % size, i2 = (h ^ hash(fp)) % size over the
        exact (non power-of-two) table size."""
        from bloom_filters_ray.hashing import xxh64
        from bloom_filters_ray.state.cuckoo import CuckooFilter

        f = CuckooFilter(15, 3, 2, mode="reference")
        assert f.size == 15  # no power-of-two rounding
        for e in ("alice", "bob", "carl"):
            fp, i1, i2 = f._locations(e)
            h = xxh64(e, f._seed)
            assert fp == format(h, "x")[:3]
            assert i1 == h % 15
            assert i2 == (h ^ xxh64(fp, f._seed)) % 15
            f.add(e)
            assert f.has(e)

    def test_reference_json_replays_in_reference_mode(self):
        from bloom_filters_ray.state.cuckoo import CuckooFilter

        f = CuckooFilter(15, 3, 2, mode="reference")
        for e in ("alice", "bob", "carl", "dave"):
            f.add(e)
        data = f.save_as_json()
        del data["_mode"]  # simulate a reference-library export
        g = CuckooFilter.from_json(data)
        assert g._mode == "reference"
        assert g.size == 15
        assert g.equals(f)
        assert all(g.has(e) for e in ("alice", "bob", "carl", "dave"))

    def test_standard_mode_unchanged(self):
        from bloom_filters_ray.state.cuckoo import CuckooFilter

        f = CuckooFilter(15, 3, 2)
        assert f.size == 16  # rounded up, involution indexing
        back = CuckooFilter.from_json(f.save_as_json())
        assert back._mode == "standard"
        assert back.equals(f)


class TestSeedRandomARC4:
    """seedrandom-ARC4 parity (base-filter.ts:11-53): the RC4 core is
    pinned to the published RC4 keystream vectors; the seedrandom
    wrapper (mixkey, 256-discard, 48→53-bit double generation, int32)
    follows David Bau's seedrandom v3.0.5 published source."""

    def test_rc4_published_vectors(self):
        from bloom_filters_ray.state.arc4 import _ARC4

        for key, want in ((b"Key", "eb9f7781b734ca72a719"),
                          (b"Wiki", "6044db6d41b7"),
                          (b"Secret", "04d46b053ca87b59")):
            a = _ARC4(list(key), discard=False)
            got = bytes(a.g(1) for _ in range(len(want) // 2)).hex()
            assert got == want, key

    def test_mixkey_short_seed_is_charcodes(self):
        from bloom_filters_ray.state.arc4 import mixkey

        s = "78187493520"  # str(0x1234567890), the default seed string
        assert mixkey(s) == [ord(c) for c in s]

    def test_double_and_int32_properties(self):
        from bloom_filters_ray.state.arc4 import SeedRandom

        r = SeedRandom("42")
        xs = [r.random() for _ in range(2000)]
        assert all(0.0 <= x < 1.0 for x in xs)
        assert abs(sum(xs) / len(xs) - 0.5) < 0.03
        r2 = SeedRandom("42")
        assert [r2.random() for _ in range(2000)] == xs  # deterministic
        assert SeedRandom("43").random() != xs[0]
        i = SeedRandom("42").int32()
        assert -(1 << 31) <= i < (1 << 31)

    def test_cuckoo_reference_kicks_deterministic(self):
        """mode='reference' kick order comes from the ARC4 stream:
        overfilled inserts replay identically across instances."""
        from bloom_filters_ray.state.cuckoo import CuckooFilter

        def build():
            f = CuckooFilter(8, 3, 2, max_kicks=50, mode="reference")
            results = [f.add(f"e{i}") for i in range(40)]
            return results, f.save_as_json()

        r1, s1 = build()
        r2, s2 = build()
        assert r1 == r2 and s1 == s2
        assert not all(r1)  # table of 16 slots overflows at 40 adds

    def test_xor_seed_chain_reference_exact(self):
        """XorFilter construction must use the reference chain: first
        retry seed = int32 of seedrandom('0'); the chosen seed is
        stored in the filter."""
        from bloom_filters_ray.state.arc4 import SeedRandom
        from bloom_filters_ray.state.xor_filter import XorFilter

        first = SeedRandom("0").int32()
        xf = XorFilter.create([f"k{i}" for i in range(100)],
                              bits_per_fingerprint=16)
        # peeling virtually always succeeds on the first try at n=100
        assert xf._seed == first
