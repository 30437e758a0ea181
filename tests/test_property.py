"""Property-based conformance tests (hypothesis): the vectorized
kernels must agree with their exact scalar counterparts on arbitrary
inputs — including unicode, empty strings, and binary payloads."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from bloom_filters_ray.hashing import (DEFAULT_SEED, get_indexes,
                                       get_indexes_vec, xxh64, xxh64_arrow,
                                       xxh64_u64)
from bloom_filters_ray.state._batch import hash_twice_batch
from bloom_filters_ray.state.minhash import MinHash, MinHashFactory
from bloom_filters_ray.stages.substring import suffix_array

SETTINGS = settings(max_examples=40, deadline=None)


class TestHashConformance:
    @SETTINGS
    @given(st.lists(st.binary(min_size=0, max_size=100), min_size=1,
                    max_size=30),
           st.integers(min_value=0, max_value=2**32))
    def test_xxh64_arrow_matches_scalar(self, payloads, seed):
        arr = pa.array(payloads, type=pa.binary())
        got = xxh64_arrow(arr, seed)
        want = [xxh64(p, seed) for p in payloads]
        assert list(got) == want

    @SETTINGS
    @given(st.lists(st.text(min_size=0, max_size=40), min_size=1,
                    max_size=20))
    def test_xxh64_arrow_unicode(self, texts):
        arr = pa.array(texts, type=pa.string())
        got = xxh64_arrow(arr, DEFAULT_SEED)
        want = [xxh64(t.encode("utf-8"), DEFAULT_SEED) for t in texts]
        assert list(got) == want

    @SETTINGS
    @given(st.integers(min_value=0, max_value=2**64 - 1),
           st.integers(min_value=0, max_value=2**32))
    def test_xxh64_u64_is_8byte_fast_path(self, word, seed):
        got = int(xxh64_u64(np.array([word], dtype=np.uint64), seed)[0])
        want = xxh64(word.to_bytes(8, "little"), seed)
        assert got == want

    @SETTINGS
    @given(st.binary(min_size=0, max_size=60),
           st.integers(min_value=8, max_value=10_000),
           st.integers(min_value=1, max_value=12))
    def test_get_indexes_vec_matches_scalar(self, elem, size, k):
        want = get_indexes(elem, size, k)
        h1, h2 = hash_twice_batch([elem])
        got = get_indexes_vec(h1, h2, size, k)[0]
        assert list(got) == want


class TestMinHashConformance:
    @SETTINGS
    @given(st.lists(st.integers(min_value=0, max_value=(1 << 26) - 1),
                    min_size=1, max_size=200),
           st.integers(min_value=1, max_value=64))
    def test_vectorized_signatures_match_scalar(self, values, k):
        factory = MinHashFactory(k, 1 << 26, seed=42)
        scalar = factory.create()
        scalar.bulk_load(values)
        flat = np.array(values, dtype=np.int64)
        offs = np.array([0, len(values)], dtype=np.int64)
        vec = factory.signatures(flat, offs)[0]
        assert list(vec) == [int(s) for s in scalar._signature]

    @SETTINGS
    @given(st.lists(st.integers(min_value=0, max_value=(1 << 26) - 1),
                    min_size=1, max_size=50))
    def test_compare_with_self_is_one(self, values):
        factory = MinHashFactory(32, 1 << 26, seed=7)
        a, b = factory.create(), factory.create()
        a.bulk_load(values)
        b.bulk_load(list(reversed(values)))
        assert a.compare_with(b) == 1.0


class TestSuffixArrayProperty:
    @SETTINGS
    @given(st.lists(st.integers(min_value=0, max_value=6), min_size=1,
                    max_size=120))
    def test_matches_naive(self, symbols):
        s = np.array(symbols)
        sa = suffix_array(s)
        want = sorted(range(len(s)), key=lambda i: tuple(s[i:]))
        assert list(sa) == want
