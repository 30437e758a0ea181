"""End-to-end tests for the flagship near-duplicate pipeline.

Mirrors the reference test strategy (SURVEY.md §5): oracle
re-derivations for the shingle kernel, statistical/recall contracts for
the LSH path (dup-pair recall >= 0.99 vs a brute-force scalar-MinHash
reference, tests/min-hash.test.ts semantics), and the per-row payload
invariants from BASELINE.json (PSNR >= 40 dB, caption equality).
"""

import numpy as np
import pyarrow as pa
import pytest

from bloom_filters_ray.hashing import DEFAULT_SEED, xxh64
from bloom_filters_ray.sources.synthetic import (average_phash, corpus_dataset,
                                                 decode_rgb8, drop_last_word,
                                                 make_variants)
from bloom_filters_ray.stages.neardup import MAX_VALUE, _factory, sig_matrix
from bloom_filters_ray.stages.shingle import (SHINGLE_MASK, _mix3,
                                              shingle_hashes, unique_per_row)

SF = "/root/testdata/sf0.001"


def _shingles_oracle(text: str, k: int = 3, seed: int = DEFAULT_SEED):
    toks = [t for t in text.lower().split() if t]
    th = np.array([xxh64(t, seed) for t in toks], dtype=np.uint64)
    if len(toks) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(toks) < k:
        pads = np.zeros(k, dtype=np.uint64)
        pads[: len(th)] = th
        return _mix3(pads[0:1], pads[1:2], pads[2:3])
    wins = [th[i : i + k] for i in range(len(toks) - k + 1)]
    return np.array([_mix3(w[0:1], w[1:2], w[2:3])[0] for w in wins],
                    dtype=np.uint64)


class TestShingle:
    def test_matches_scalar_oracle(self):
        texts = ["the quick brown fox jumps", "a b", "", "   ", "one",
                 "x y z", "The  Quick   brown", "hello world foo bar baz"]
        flat, offs = shingle_hashes(pa.array(texts), 3)
        for i, t in enumerate(texts):
            got = flat[offs[i]:offs[i + 1]]
            want = _shingles_oracle(t)
            assert np.array_equal(got, want), (i, t)

    def test_case_and_whitespace_normalized(self):
        a, _ = shingle_hashes(pa.array(["Foo  BAR baz qux"]), 3)
        b, _ = shingle_hashes(pa.array(["foo bar   baz QUX"]), 3)
        assert np.array_equal(a, b)

    def test_unique_per_row(self):
        flat = np.array([5, 3, 5, 1, 9, 9, 9], dtype=np.uint64)
        offs = np.array([0, 3, 3, 7], dtype=np.int64)
        f, o = unique_per_row(flat, offs)
        assert list(o) == [0, 2, 2, 4]
        assert list(f) == [3, 5, 1, 9]


class TestSyntheticCorpus:
    def test_deterministic_and_invariant_to_batching(self):
        docs = pa.table({"doc_id": pa.array([0, 1, 7], type=pa.int64()),
                         "text": ["alpha beta gamma delta", "x", "one two three"]})
        t1 = make_variants(docs)
        t2a = make_variants(docs.slice(0, 1))
        t2b = make_variants(docs.slice(1, 2))
        t2 = pa.concat_tables([t2a, t2b])
        assert t1.equals(t2)

    def test_payload_invariants(self):
        """BASELINE.json per-row invariant: exact-dup variants byte-equal
        (caption equality + identical pixels), near-dup variant PSNR>=40."""
        docs = pa.table({"doc_id": pa.array(range(20), type=pa.int64()),
                         "text": [f"word{i} lorem ipsum dolor sit amet {i}"
                                  for i in range(20)]})
        t = make_variants(docs, copies=4).to_pydict()
        rows = {(d, v): i for i, (d, v) in
                enumerate(zip(t["doc_id"], t["variant"]))}
        for d in range(20):
            r0, r1, r2, r3 = (rows[(d, v)] for v in range(4))
            # exact duplicates: same caption, same bytes
            assert t["caption"][r1] == t["caption"][r0]
            assert t["bytes"][r1] == t["bytes"][r0]
            assert t["bytes"][r3] == t["bytes"][r0]
            # near duplicate: caption drops last word, pixels PSNR >= 40
            assert t["caption"][r2] == drop_last_word(t["caption"][r0])
            w, h = t["w"][r0], t["h"][r0]
            p0 = decode_rgb8(t["bytes"][r0], w, h).astype(np.float64)
            p2 = decode_rgb8(t["bytes"][r2], w, h).astype(np.float64)
            mse = np.mean((p0 - p2) ** 2)
            psnr = 10 * np.log10(255.0**2 / mse) if mse > 0 else np.inf
            assert psnr >= 40.0
            # phash of near-dup stays within small Hamming distance
            mask = (1 << 64) - 1
            ham = bin((t["phash"][r0] & mask) ^ (t["phash"][r2] & mask)).count("1")
            assert ham <= 16

    def test_unique_caption_expansion(self):
        """make_unique_caption_fn makes every row's caption unique
        (scaling workloads grow unique work with `copies`), stays
        content-derived (batching-invariant), and keeps the original
        caption as a prefix so near-dup structure survives."""
        from bloom_filters_ray.sources.synthetic import \
            make_unique_caption_fn

        docs = pa.table({"doc_id": pa.array([0, 1, 7], type=pa.int64()),
                         "text": ["alpha beta gamma delta", "x y z",
                                  "one two three"]})
        t = make_variants(docs, copies=6, with_bytes=False)
        fn = make_unique_caption_fn()
        out = fn(t)
        caps = out["caption"].to_pylist()
        assert len(set(caps)) == len(caps)  # all unique now
        for orig, uniq, d, v in zip(t["caption"].to_pylist(), caps,
                                    t["doc_id"].to_pylist(),
                                    t["variant"].to_pylist()):
            assert uniq == f"{orig} uq{d}x{v}"
        # batching-invariant: same rows -> same captions in any split
        split = pa.concat_tables([fn(t.slice(0, 5)), fn(t.slice(5))])
        assert split["caption"].to_pylist() == caps

    def test_phash_matches_decoded_pixels(self):
        docs = pa.table({"doc_id": pa.array([3], type=pa.int64()),
                         "text": ["the quick brown fox jumps over it"]})
        t = make_variants(docs, copies=1).to_pydict()
        img = decode_rgb8(t["bytes"][0], t["w"][0], t["h"][0])
        assert average_phash(img) == t["phash"][0]


@pytest.fixture(scope="module")
def pipeline_result(ray_session):
    from bloom_filters_ray.pipelines.dedup import DedupConfig, dedup_pipeline

    cfg = DedupConfig()
    ds = corpus_dataset(SF, with_bytes=False).select_columns(
        ["image_id", "caption"])
    assignments, stats = dedup_pipeline(ds, cfg)
    return assignments.to_pandas(), stats, cfg


class TestDedupPipeline:
    def test_exact_tier(self, pipeline_result, ray_session):
        df, stats, _ = pipeline_result
        import duckdb

        corpus = corpus_dataset(SF, with_bytes=False).to_pandas()
        want = duckdb.sql("""
            SELECT image_id, min(image_id) OVER (PARTITION BY caption) AS rep_id
            FROM corpus
        """).df()
        got = df[["image_id", "rep_id"]].sort_values("image_id").reset_index(drop=True)
        want = want.sort_values("image_id").reset_index(drop=True)
        assert got.equals(want)
        assert stats["n_input"] == len(corpus)

    def test_recall_vs_bruteforce_reference(self, pipeline_result, ray_session):
        """Dup-pair recall >= 0.99 against the scalar-reference result:
        all-pairs positional MinHash similarity (compareWith semantics,
        src/sketch/min-hash.ts:117-132) >= threshold over unique
        captions, same permutation table and shingle config."""
        df, _, cfg = pipeline_result
        corpus = corpus_dataset(SF, with_bytes=False).to_pandas()
        uniq = corpus.groupby("caption", as_index=False).agg(
            image_id=("image_id", "min"))
        flat, offs = shingle_hashes(pa.array(uniq["caption"]), cfg.shingle_k,
                                    cfg.seed)
        vals = (flat & SHINGLE_MASK).astype(np.int64)
        factory = _factory(cfg.nb_hashes, cfg.seed)
        sigs = factory.signatures(vals, offs)
        ids = uniq["image_id"].to_numpy()
        nonempty = sigs[:, 0] != -1
        sigs, ids = sigs[nonempty], ids[nonempty]
        # brute-force all-pairs similarity in blocks
        n = len(sigs)
        ref_pairs = set()
        for i0 in range(0, n, 512):
            blk = sigs[i0 : i0 + 512]
            sim = (blk[:, None, :] == sigs[None, :, :]).mean(axis=2)
            ii, jj = np.nonzero(sim >= cfg.threshold)
            for i, j in zip(ii, jj):
                gi, gj = i0 + i, j
                if gi < gj:
                    a, b = sorted((ids[gi], ids[gj]))
                    ref_pairs.add((a, b))
        # pipeline clusters: a reference pair is recalled if both ids
        # landed in the same cluster
        cl = dict(zip(df["image_id"], df["cluster_id"]))
        recalled = sum(1 for a, b in ref_pairs if cl[a] == cl[b])
        assert len(ref_pairs) > 50  # fixture actually plants near-dups
        recall = recalled / len(ref_pairs)
        assert recall >= 0.99, f"recall {recall} over {len(ref_pairs)} pairs"

    def test_cluster_ids_are_min_member(self, pipeline_result):
        df, _, _ = pipeline_result
        mins = df.groupby("cluster_id")["image_id"].min()
        assert (mins.index == mins.values).all()

    def test_exact_dups_clustered_together(self, pipeline_result):
        df, _, _ = pipeline_result
        df = df.copy()
        df["doc"] = df["image_id"].str.slice(4, 12)
        df["variant"] = df["image_id"].str.slice(13).astype(int)
        base = df[df["variant"] == 0].set_index("doc")["cluster_id"]
        exact = df[df["variant"] == 1].set_index("doc")["cluster_id"]
        assert (base.loc[exact.index] == exact).all()


class TestJoinVerificationPath:
    def test_join_path_matches_broadcast_path(self, ray_session):
        """The scale-path hash-join verification (broadcast_limit=0)
        yields identical cluster assignments to the broadcast path
        (edge multiplicity may differ; union-find is idempotent)."""
        from bloom_filters_ray.pipelines.dedup import (DedupConfig,
                                                       dedup_pipeline)

        ds = corpus_dataset(SF, with_bytes=False).select_columns(
            ["image_id", "caption"])
        a1, _ = dedup_pipeline(ds, DedupConfig())
        a2, _ = dedup_pipeline(ds, DedupConfig(broadcast_limit=0))
        d1 = a1.to_pandas().sort_values("image_id").reset_index(drop=True)
        d2 = a2.to_pandas().sort_values("image_id").reset_index(drop=True)
        assert d1.equals(d2)


class TestSigMatrixBinary:
    """Regression: the binary branch must derive row width from the
    offsets buffer and honor the array offset — raw-data-buffer width
    inference breaks on slices / padded acero join output."""

    def test_roundtrip_and_sliced_view(self):
        from bloom_filters_ray.stages.neardup import sig_to_binary_fn

        k, n = 30, 7  # bands*rows_per_band=30: 240 B/row, pad-hostile
        m = np.arange(n * k, dtype="<i8").reshape(n, k)
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel(), type=pa.int64()), k)
        t = pa.table({"id": pa.array(np.arange(n)), "sig": sig_col})
        tb = sig_to_binary_fn()(t)
        assert (sig_matrix(tb, "sig") == m).all()
        sl = tb.slice(2, 4)  # nonzero array offset
        assert (sig_matrix(sl, "sig") == m[2:6]).all()

    def test_ragged_binary_rejected(self):
        t = pa.table({"sig": pa.array([b"12345678", b"1234567812345678"])})
        with pytest.raises(ValueError):
            sig_matrix(t, "sig")


class TestJaccardPairs:
    def _ds(self, texts, ray_session=None):
        import ray.data

        from bloom_filters_ray.util import ensure_hash_shuffle

        ensure_hash_shuffle()
        return ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)])

    TEXTS = ["a b c d e", "a b c d e", "a b c d x", "p q r s t"]

    def test_exact_jaccard_pairs(self, ray_session):
        from bloom_filters_ray.stages.setsim import jaccard_pairs

        # shingle sets: d0=d1={abc,bcd,cde}, d2={abc,bcd,cdx}, d3 disjoint
        got = jaccard_pairs(self._ds(self.TEXTS), tau_num=1, tau_den=2,
                            num_partitions=4).to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)
        want = {(0, 1): (3, 3), (0, 2): (2, 4), (1, 2): (2, 4)}
        assert len(got) == 3
        for _, r in got.iterrows():
            assert want[(r.a, r.b)] == (r.inter, r.uni)
        strict = jaccard_pairs(self._ds(self.TEXTS), tau_num=4, tau_den=5,
                               num_partitions=4).to_pandas()
        assert [(r.a, r.b) for _, r in strict.iterrows()] == [(0, 1)]

    def test_max_df_skew_guard(self, ray_session):
        """df > max_df shingles drop out of intersections while sizes
        stay full: with max_df=2, {abc,bcd} (df=3) stop counting, so
        (0,1) keeps only cde -> inter=1, uni=5."""
        from bloom_filters_ray.stages.setsim import jaccard_pairs

        got = jaccard_pairs(self._ds(self.TEXTS), tau_num=1, tau_den=5,
                            max_df=2, num_partitions=4).to_pandas()
        rows = {(r.a, r.b): (r.inter, r.uni) for _, r in got.iterrows()}
        assert rows == {(0, 1): (1, 5)}

    def test_short_doc_sql_parity(self, ray_session):
        """Docs with <k tokens yield one zero-padded shingle
        (stages/shingle.py); the SQL twin must reproduce pairs over a
        fixture that exercises 1-, 2- and 3-token docs and an empty
        doc."""
        import duckdb
        import pyarrow as pa

        from bloom_filters_ray.pipelines.queries import JACCARD_PAIRS_CTE
        from bloom_filters_ray.stages.setsim import jaccard_pairs

        texts = ["alpha", "alpha", "alpha beta", "alpha beta",
                 "alpha beta gamma", "alpha beta gamma", "", "   "]
        tbl = pa.table({"doc_id": pa.array(range(len(texts)),
                                           type=pa.int64()),
                        "text": pa.array(texts)})
        got = jaccard_pairs(self._ds(texts), tau_num=4, tau_den=5,
                            num_partitions=4).to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", tbl)
        want = con.execute(
            f"WITH {JACCARD_PAIRS_CTE} SELECT a, b, inter, uni "
            f"FROM jpairs ORDER BY a, b").df()
        assert got.astype("int64").values.tolist() == \
            want.astype("int64").values.tolist()
        # sanity: the three identical-text pairs, nothing across kinds
        assert [(r.a, r.b) for _, r in got.iterrows()] == \
            [(0, 1), (2, 3), (4, 5)]
