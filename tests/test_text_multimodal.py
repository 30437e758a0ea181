"""Text-analysis, substring-dedup and multimodal stage tests."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"

from bloom_filters_ray.stages.multimodal import (DecodeResizeStage,
                                                 FrameSampleStage,
                                                 ImageFeatureStage,
                                                 decode_payload,
                                                 resize_bilinear,
                                                 resize_nearest)
from bloom_filters_ray.stages.substring import (substring_contained_flags,
                                                suffix_array)
from bloom_filters_ray.stages.textstats import (LANG_PROFILES,
                                                make_fingerprint_fn,
                                                make_langid_fn,
                                                make_quality_fn,
                                                make_token_stats_fn)


class TestTextStats:
    def test_token_stats(self):
        t = pa.table({"image_id": ["a", "b", "c", "d"],
                      "caption": ["one two three", "", "  x  ", "solo"]})
        out = make_token_stats_fn()(t).to_pydict()
        assert out["n_tokens"] == [3, 0, 1, 1]
        assert out["n_chars"] == [13, 0, 5, 4]

    def test_langid_profiles(self):
        t = pa.table({"doc_id": [1, 2, 3, 4], "text": [
            "the cat sat on the mat with all of them",
            "der hund und die katze sind nicht im haus",
            "le chat est dans la maison avec les autres",
            "zzz qqq xxx",
        ]})
        out = make_langid_fn()(t).to_pydict()
        assert out["lang"][:3] == ["en", "de", "fr"]
        assert out["lang"][3] == "und"
        assert all(s >= 0 for s in out["lang_score"])

    def test_quality_components(self):
        t = pa.table({"image_id": ["a", "b"],
                      "caption": ["the quick brown fox jumps over it",
                                  "!!! ??? ..."]})
        out = make_quality_fn()(t).to_pydict()
        assert out["n_punct"][1] == 9
        assert out["quality"][0] > out["quality"][1]
        assert out["stop_hits"][0] >= 1

    def test_fingerprints_winnowing(self):
        t = pa.table({"image_id": ["a", "b", "c"],
                      "caption": ["w1 w2 w3 w4 w5 w6 w7 w8 w9",
                                  "w1 w2 w3 w4 w5 w6 w7 w8 w9",
                                  "totally different words here now ok"]})
        out = make_fingerprint_fn()(t).to_pandas()
        fa = set(out[out.image_id == "a"].fingerprint)
        fb = set(out[out.image_id == "b"].fingerprint)
        fc = set(out[out.image_id == "c"].fingerprint)
        assert fa == fb and fa
        assert not (fa & fc)


class TestSubstring:
    def test_suffix_array_oracle(self):
        rng = np.random.default_rng(7)
        for n in (1, 2, 5, 37, 200):
            s = rng.integers(0, 5, size=n)
            sa = suffix_array(s)
            want = sorted(range(n), key=lambda i: tuple(s[i:]))
            assert list(sa) == want, n

    def test_containment_naive(self):
        caps = ["abc", "zabcz", "zz", "q", "hello world", "world",
                "abc", "lo wor"]
        # unique captions only (pipeline runs it on exact-tier reps)
        caps = sorted(set(caps))
        flags = substring_contained_flags([c.encode() for c in caps])
        naive = [any(c != d and c in d for d in caps) for c in caps]
        assert list(flags) == naive

    def test_containment_random_mixed_lengths(self):
        """Randomized kernel-vs-naive including many below-anchor-length
        (short-path) captions and planted containments."""
        rng = np.random.default_rng(11)
        caps: set[bytes] = set()
        while len(caps) < 150:
            L = int(rng.integers(1, 70))
            caps.add(bytes(rng.integers(97, 103, size=L, dtype=np.uint8)))
        caps = sorted(caps)
        # plant substrings of existing captions (mix of lengths)
        extra: set[bytes] = set()
        for c in caps[:40]:
            if len(c) >= 3:
                a = int(rng.integers(0, len(c) - 1))
                b = int(rng.integers(a + 1, len(c) + 1))
                extra.add(c[a:b])
        caps = sorted(set(caps) | extra)
        flags = substring_contained_flags(caps)
        naive = [any(c != d and c in d for d in caps) for c in caps]
        assert list(flags) == naive



class TestMultimodal:
    def _payload(self, w=8, h=6, seed=0):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        return img, img.tobytes()

    def test_decode_real_and_stubbed(self):
        img, buf = self._payload()
        assert (decode_payload(buf, 8, 6, "rgb8") == img).all()
        with pytest.raises(NotImplementedError):
            decode_payload(b"\x89PNG", 1, 1, "png")

    def test_resize_shapes_and_identity(self):
        img, _ = self._payload(8, 6)
        assert resize_nearest(img, 6, 8).shape == (6, 8, 3)
        assert (resize_nearest(img, 6, 8) == img).all()
        assert (resize_bilinear(img, 6, 8) == img).all()
        small = resize_bilinear(img, 3, 4)
        assert small.shape == (3, 4, 3)

    def test_decode_resize_stage_on_dataset(self, ray_session):
        from bloom_filters_ray.sources.synthetic import corpus_dataset

        ds = corpus_dataset("/root/testdata/sf0.001", with_bytes=True) \
            .limit(60)
        out = ds.map_batches(
            DecodeResizeStage,
            fn_constructor_kwargs={"out_h": 8, "out_w": 8},
            concurrency=2, batch_size=16, batch_format="pyarrow").to_pandas()
        assert len(out) == 60
        assert (out.w == 8).all() and (out.h == 8).all()
        assert out["bytes"].map(len).eq(8 * 8 * 3).all()
        assert out.decoded.all()

    def test_feature_stage(self, ray_session):
        from bloom_filters_ray.sources.synthetic import corpus_dataset

        ds = corpus_dataset("/root/testdata/sf0.001", with_bytes=True) \
            .limit(30)
        out = ds.map_batches(ImageFeatureStage, concurrency=2,
                             batch_size=16, batch_format="pyarrow").to_pandas()
        assert len(out) == 30
        assert out.mean_r.between(0, 255).all()
        # phash recomputed from pixels equals the source column
        src = corpus_dataset("/root/testdata/sf0.001", with_bytes=True) \
            .limit(30).to_pandas().set_index("image_id").phash
        got = out.set_index("image_id").phash_recomputed
        assert (got == src.loc[got.index]).all()

    def test_frame_sample_stage(self):
        img, buf = self._payload(4, 4, seed=1)
        img2, buf2 = self._payload(4, 4, seed=2)
        video = buf + buf2 + buf + buf2 + buf + buf2
        t = pa.table({"image_id": ["v1"], "bytes": [video],
                      "w": pa.array([4], type=pa.int32()),
                      "h": pa.array([4], type=pa.int32()),
                      "fmt": ["rgb8v"]})
        out = FrameSampleStage(n_frames=3)(t).to_pydict()
        assert out["frame_idx"] == [0, 2, 4]
        assert out["bytes"][0] == buf
        with pytest.raises(NotImplementedError):
            FrameSampleStage()(pa.table({
                "image_id": ["v"], "bytes": [b""],
                "w": pa.array([1], type=pa.int32()),
                "h": pa.array([1], type=pa.int32()), "fmt": ["mp4"]}))

    def test_phash_stage_matches_column(self, ray_session):
        from bloom_filters_ray.sources.synthetic import corpus_dataset
        from bloom_filters_ray.stages.multimodal import PhashStage

        ds = corpus_dataset("/root/testdata/sf0.001", with_bytes=True) \
            .limit(30)
        out = ds.map_batches(PhashStage(), batch_size=16,
                             batch_format="pyarrow").to_pandas()
        src = corpus_dataset("/root/testdata/sf0.001", with_bytes=True) \
            .limit(30).to_pandas().set_index("image_id").phash
        got = out.set_index("image_id").phash
        assert (got == src.loc[got.index]).all()


class TestShardedSubstring:
    def test_sharded_equals_single_partition(self, ray_session):
        """Fingerprint-bucketed pass must be bit-equal to the global
        single-partition suffix-array pass on the real corpus."""
        from bloom_filters_ray.pipelines.dedup import DedupConfig, exact_tier
        from bloom_filters_ray.sources.synthetic import corpus_dataset
        from bloom_filters_ray.stages.substring import (
            make_substring_flag_fn, substring_flags_sharded)

        cfg = DedupConfig()
        ds = corpus_dataset(SF, with_bytes=False).select_columns(
            ["image_id", "caption"])
        uniq = exact_tier(ds, cfg).filter(expr="is_rep == True") \
            .select_columns(["image_id", "caption"]).materialize()
        want = uniq.repartition(1).map_batches(
            make_substring_flag_fn(), batch_format="pyarrow",
            batch_size=None).to_pandas() \
            .sort_values("image_id").reset_index(drop=True)
        got = substring_flags_sharded(uniq, num_partitions=4,
                              target_partition_bytes=1).to_pandas() \
            .sort_values("image_id").reset_index(drop=True)
        assert want.equals(got)
        assert got.contained.sum() > 0

    def test_short_captions_exact(self, ray_session):
        """Captions below the winnowing guarantee threshold take the
        broadcast probe path and must still be exact."""
        import ray.data

        from bloom_filters_ray.stages.substring import (
            make_substring_flag_fn, substring_flags_sharded)
        from bloom_filters_ray.util import ensure_hash_shuffle

        ensure_hash_shuffle()
        caps = {
            "i00": "tiny",                                # in i02 and i03
            "i01": "a very distinctive long caption that repeats nowhere",
            "i02": "this tiny fragment hides in a long sentence somewhere",
            "i03": "tiny",  # NOT unique input -> make unique: changed below
        }
        caps["i03"] = "another long caption with the word tiny inside it ok"
        caps["i04"] = ""                                  # empty: contained
        caps["i05"] = "a very distinctive long caption that repeats nowhere else"
        rows = pa.table({"image_id": list(caps), "caption": list(caps.values())})
        ds = ray.data.from_arrow(rows)
        want = ds.repartition(1).map_batches(
            make_substring_flag_fn(), batch_format="pyarrow",
            batch_size=None).to_pandas() \
            .sort_values("image_id").reset_index(drop=True)
        got = substring_flags_sharded(ds, num_partitions=4,
                              target_partition_bytes=1).to_pandas() \
            .sort_values("image_id").reset_index(drop=True)
        assert want.equals(got)
        m = dict(zip(got.image_id, got.contained))
        assert m["i00"] and m["i04"] and m["i01"] and not m["i05"]

    def test_many_shorts_adversarial(self, ray_session):
        """A tweet-like corpus where MOST captions are below the
        winnowing guarantee threshold: the broadcast probe must stay
        vectorized (no O(n_short * corpus) blowup) and exact."""
        import ray.data

        from bloom_filters_ray.stages.substring import (
            make_substring_flag_fn, substring_flags_sharded)
        from bloom_filters_ray.util import ensure_hash_shuffle

        ensure_hash_shuffle()
        rng = np.random.default_rng(3)
        caps: set[str] = set()
        while len(caps) < 400:  # shorts: 3..30 bytes
            L = int(rng.integers(3, 31))
            caps.add("".join(chr(c) for c in
                             rng.integers(97, 105, size=L)))
        longs: set[str] = set()
        while len(longs) < 40:  # containers >= threshold
            L = int(rng.integers(60, 120))
            longs.add("".join(chr(c) for c in
                              rng.integers(97, 105, size=L)))
        allc = sorted(caps | longs)
        rows = pa.table({"image_id": [f"i{k:04d}" for k in range(len(allc))],
                         "caption": allc})
        ds = ray.data.from_arrow(rows)
        want = ds.repartition(1).map_batches(
            make_substring_flag_fn(), batch_format="pyarrow",
            batch_size=None).to_pandas() \
            .sort_values("image_id").reset_index(drop=True)
        got = substring_flags_sharded(ds, num_partitions=4,
                              target_partition_bytes=1).to_pandas() \
            .sort_values("image_id").reset_index(drop=True)
        assert want.equals(got)
        assert got.contained.sum() > 0  # 8-letter alphabet: hits exist


class TestCorpusIO:
    def test_format_dispatch(self, ray_session):
        from bloom_filters_ray.sources.io import (detect_format,
                                                  lance_available,
                                                  read_corpus_table)

        assert detect_format("/data/corpus.lance") == "lance"
        assert detect_format(f"{SF}/documents.parquet") == "parquet"
        ds = read_corpus_table(f"{SF}/documents.parquet",
                              columns=["doc_id", "lang"])
        assert set(ds.schema().names) == {"doc_id", "lang"}  # pruned read
        if not lance_available():  # sandbox: lance absent -> clear error
            with pytest.raises(ImportError):
                read_corpus_table("/data/corpus.lance")


class TestDctPhash:
    def test_basis_orthonormal_and_naive_dct(self):
        """dct_basis is the published orthonormal DCT-II: B@B.T = I and
        B@X@B.T equals the explicit double-sum definition."""
        import numpy as np

        from bloom_filters_ray.stages.multimodal import dct_basis

        n = 8
        D = dct_basis(n)
        assert np.allclose(D @ D.T, np.eye(n), atol=1e-12)
        rng = np.random.default_rng(7)
        X = rng.normal(size=(n, n))
        got = D @ X @ D.T
        want = np.zeros((n, n))
        for u in range(n):
            for v in range(n):
                su = np.sqrt(1 / n) if u == 0 else np.sqrt(2 / n)
                sv = np.sqrt(1 / n) if v == 0 else np.sqrt(2 / n)
                for i in range(n):
                    for j in range(n):
                        want[u, v] += (X[i, j]
                                       * np.cos((2 * i + 1) * u * np.pi / (2 * n))
                                       * np.cos((2 * j + 1) * v * np.pi / (2 * n)))
                want[u, v] *= su * sv
        assert np.allclose(got, want, atol=1e-10)

    def test_brightness_scale_invariance_and_batch_scalar(self):
        import numpy as np

        from bloom_filters_ray.stages.multimodal import (dct_phash,
                                                         dct_phash_batch)

        rng = np.random.default_rng(11)
        L = rng.uniform(0, 255, size=(32, 32))
        codes = dct_phash_batch(np.stack([L, 0.37 * L, 2.5 * L]))
        assert codes[0] == codes[1] == codes[2]
        img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
        one = dct_phash(img)
        assert isinstance(one, int) and -(1 << 63) <= one < (1 << 63)
        # determinism
        assert one == dct_phash(img.copy())

    def test_near_dup_small_hamming_unrelated_large(self, ray_session):
        """Noise variants of the same image land within a small Hamming
        distance of each other; unrelated images sit near 32."""
        import numpy as np

        from bloom_filters_ray.sources.synthetic import corpus_dataset
        from bloom_filters_ray.stages.multimodal import PhashStage

        df = corpus_dataset("/root/testdata/sf0.001", with_bytes=True) \
            .limit(60).map_batches(PhashStage(kind="dct"), batch_size=16,
                                   batch_format="pyarrow").to_pandas()
        df["doc"] = df.image_id.str.slice(4, 12)
        df["v"] = df.image_id.str.slice(13).astype(int)

        def ham(a, b):
            return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")

        by_doc = df.pivot(index="doc", columns="v", values="phash")
        near = [ham(r[0], r[1]) for _, r in by_doc.iterrows()]
        assert np.mean(near) <= 8 and max(near) <= 16, near
        docs = by_doc.index.tolist()
        far = [ham(by_doc.loc[docs[i], 0], by_doc.loc[docs[i + 1], 0])
               for i in range(len(docs) - 1)]
        assert min(far) >= 16, far

    def test_stage_matches_scalar(self, ray_session):
        from bloom_filters_ray.sources.synthetic import corpus_dataset
        from bloom_filters_ray.stages.multimodal import (PhashStage,
                                                         decode_payload,
                                                         dct_phash)

        src = corpus_dataset("/root/testdata/sf0.001", with_bytes=True) \
            .limit(20).to_pandas()
        out = corpus_dataset("/root/testdata/sf0.001", with_bytes=True) \
            .limit(20).map_batches(PhashStage(kind="dct"), batch_size=8,
                                   batch_format="pyarrow").to_pandas() \
            .set_index("image_id").phash
        for _, r in src.iterrows():
            img = decode_payload(r["bytes"], int(r.w), int(r.h), r.fmt)
            assert out.loc[r.image_id] == dct_phash(img)


class TestSessionize:
    def test_gap_splits_ties_and_boundaries(self, ray_session):
        """Gap predicate is strict (> gap); equal-ts ties order by
        event_id; sessions index per user in time order."""
        import datetime as dt

        import pyarrow as pa
        import ray.data

        from bloom_filters_ray.stages.windows import sessionize
        from bloom_filters_ray.util import ensure_hash_shuffle

        ensure_hash_shuffle()
        t0 = dt.datetime(2024, 1, 1)
        us = lambda s: t0 + dt.timedelta(seconds=s)
        GAP = 10 * 1_000_000  # 10 s
        rows = [
            # user 1: gap exactly 10s -> SAME session; 10.000001s -> new
            (1, us(0), 0), (1, us(10), 1), (1, us(20.000001), 2),
            # user 2: tie timestamps, then a big jump
            (2, us(0), 4), (2, us(0), 3), (2, us(100), 5),
            # user 3: single event
            (3, us(7), 6),
        ]
        tbl = pa.table({
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           type=pa.timestamp("us")),
            "event_id": pa.array([r[2] for r in rows], type=pa.int64()),
        })
        got = sessionize(ray.data.from_arrow(tbl), gap_us=GAP,
                         num_partitions=4).to_pandas() \
            .sort_values(["user_id", "session_idx"]).reset_index(drop=True)
        rec = [(r.user_id, r.session_idx, r.n_events,
                r.start_ts.to_pydatetime(), r.end_ts.to_pydatetime())
               for _, r in got.iterrows()]
        assert rec == [
            (1, 0, 2, us(0), us(10)),
            (1, 1, 1, us(20.000001), us(20.000001)),
            (2, 0, 2, us(0), us(0)),
            (2, 1, 1, us(100), us(100)),
            (3, 0, 1, us(7), us(7)),
        ]
