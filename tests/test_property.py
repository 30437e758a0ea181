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


class TestSetSimProperty:
    @given(st.lists(st.lists(st.sampled_from("abcdefgh"), min_size=0,
                              max_size=12), min_size=1, max_size=12),
           st.integers(min_value=1, max_value=5))
    @SETTINGS
    def test_block_pipeline_equals_set_math(self, docs, tau_num):
        """token rows → pair emit → reduce over ONE block must equal
        brute-force Jaccard over python sets (k=2 shingles)."""
        from bloom_filters_ray.stages.setsim import (
            make_cooccur_pair_emitter, make_jaccard_reducer,
            make_shingle_token_rows)

        texts = [" ".join(d) for d in docs]
        tbl = pa.table({"doc_id": pa.array(range(len(texts)),
                                           type=pa.int64()),
                        "text": pa.array(texts)})
        toks = make_shingle_token_rows(k=2)(tbl)
        pairs = make_cooccur_pair_emitter(max_df=10_000)(toks)
        got = make_jaccard_reducer(tau_num, 5)(pairs)
        got_set = {(r["a"], r["b"]): (r["inter"], r["uni"])
                   for r in got.to_pylist()}

        def shingles(d):
            # shingle_hashes emits ONE zero-padded shingle for rows
            # with 1..k-1 tokens (stages/shingle.py docstring)
            if 0 < len(d) < 2:
                return {(d[0],)}
            return {tuple(d[i:i + 2]) for i in range(len(d) - 1)}

        want = {}
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                si, sj = shingles(docs[i]), shingles(docs[j])
                inter = len(si & sj)
                uni = len(si | sj)
                if inter and 5 * inter >= tau_num * uni:
                    want[(i, j)] = (inter, uni)
        assert got_set == want

    @given(st.lists(st.tuples(st.integers(0, 3),        # user
                              st.integers(0, 1000),     # ts (us)
                              ), min_size=0, max_size=40),
           st.integers(min_value=0, max_value=200))
    @SETTINGS
    def test_sessionizer_equals_python_reference(self, events, gap):
        from bloom_filters_ray.stages.windows import make_block_sessionizer

        tbl = pa.table({
            "user_id": pa.array([u for u, _ in events], type=pa.int64()),
            "ts": pa.array([t for _, t in events], type=pa.timestamp("us")),
            "event_id": pa.array(range(len(events)), type=pa.int64()),
        })
        got = make_block_sessionizer(gap)(tbl).to_pylist()
        got_set = {(r["user_id"], r["session_idx"]):
                   (r["n_events"], r["start_ts"], r["end_ts"])
                   for r in got}
        # python reference
        byu: dict = {}
        for eid, (u, t) in enumerate(events):
            byu.setdefault(u, []).append((t, eid))
        want = {}
        for u, evs in byu.items():
            evs.sort()
            sid, n, start = -1, 0, None
            prev = None
            for t, _ in evs:
                if prev is None or t - prev > gap:
                    if sid >= 0:
                        want[(u, sid)] = (n, start, prev)
                    sid += 1
                    n, start = 0, t
                n += 1
                prev = t
            want[(u, sid)] = (n, start, prev)
        import datetime as dt
        epoch = dt.datetime(1970, 1, 1)
        want = {k: (n, epoch + dt.timedelta(microseconds=s),
                    epoch + dt.timedelta(microseconds=e))
                for k, (n, s, e) in want.items()}
        assert got_set == want
