"""Hot-band salting tests (north_star: 'explicit salting of hot
bands'): CMS/TopK-driven hot-key detection, sub-bucket splitting, and
end-to-end recall preservation on a pathologically skewed fixture."""

import numpy as np
import pyarrow as pa
import pytest

from bloom_filters_ray.stages.neardup import make_salt_fn
from bloom_filters_ray.stages.shingle import SHINGLE_MASK, shingle_hashes


def _skewed_corpus(n: int = 400):
    """Captions sharing a long common prefix (every signature band is
    dominated by the shared shingles → hot band buckets) plus a
    distinct tail so each caption is unique."""
    prefix = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for i in range(n):
        rows.append((f"id-{i:05d}", f"{prefix} tail{i} end{i}"))
        rows.append((f"id-{i:05d}x", f"{prefix} tail{i} end{i} extra"))
    ids, caps = zip(*rows)
    return pa.table({"image_id": list(ids), "caption": list(caps)})


class TestSaltFn:
    def test_splits_hot_keys_only(self):
        t = pa.table({
            "band_key": pa.array([7, 7, 7, 7, 9, 9], type=pa.int64()),
            "image_id": ["a", "b", "c", "d", "e", "f"],
        })
        out = make_salt_fn([7], n_salt=4, id_col="image_id")(t).to_pydict()
        hot_keys = set(out["band_key"][:4])
        assert 7 not in hot_keys and len(hot_keys) > 1  # rescattered
        assert out["band_key"][4:] == [9, 9]            # cold untouched

    def test_deterministic_per_id(self):
        t = pa.table({"band_key": pa.array([7] * 6, type=pa.int64()),
                      "image_id": [f"x{i}" for i in range(6)]})
        a = make_salt_fn([7], 4, "image_id")(t)
        b = make_salt_fn([7], 4, "image_id")(t)
        assert a.equals(b)


class TestSaltedPipeline:
    def test_recall_preserved_on_skewed_fixture(self, ray_session):
        import ray.data

        from bloom_filters_ray.pipelines.dedup import (DedupConfig,
                                                       dedup_pipeline)
        from bloom_filters_ray.stages.neardup import _factory

        from bloom_filters_ray.util import ensure_hash_shuffle

        ensure_hash_shuffle()  # before dataset creation (context snapshot)
        corpus = _skewed_corpus(200)
        cfg = DedupConfig(hot_threshold=32, n_salt=8)
        ds = ray.data.from_arrow(corpus).repartition(8)
        assignments, stats = dedup_pipeline(ds, cfg)
        df = assignments.to_pandas()

        # brute-force reference pairs (same semantics as
        # tests/test_neardup_pipeline.py)
        flat, offs = shingle_hashes(corpus["caption"], cfg.shingle_k, cfg.seed)
        vals = (flat & SHINGLE_MASK).astype(np.int64)
        sigs = _factory(cfg.nb_hashes, cfg.seed).signatures(vals, offs)
        ids = np.array(corpus["image_id"].to_pylist())
        ref_pairs = set()
        n = len(sigs)
        for i0 in range(0, n, 256):
            blk = sigs[i0:i0 + 256]
            sim = (blk[:, None, :] == sigs[None, :, :]).mean(axis=2)
            ii, jj = np.nonzero(sim >= cfg.threshold)
            for i, j in zip(ii, jj):
                gi, gj = i0 + i, j
                if gi < gj:
                    a, b = sorted((ids[gi], ids[gj]))
                    ref_pairs.add((a, b))
        cl = dict(zip(df["image_id"], df["cluster_id"]))
        assert len(ref_pairs) >= 200
        recalled = sum(1 for a, b in ref_pairs if cl[a] == cl[b])
        # This fixture is ADVERSARIAL: the shared prefix makes every
        # band of every pair hot, so salting's per-band pair loss has
        # no cold band to fall back on. Salting still keeps the bulk
        # of recall here; on realistic skew (hot buckets = boilerplate,
        # near-dup pairs share cold bands too) recall is unaffected —
        # test_standard_corpus_unaffected asserts bit-equality there.
        assert recalled / len(ref_pairs) >= 0.85

    def test_standard_corpus_unaffected(self, ray_session):
        from bloom_filters_ray.pipelines.dedup import (DedupConfig,
                                                       dedup_pipeline)
        from bloom_filters_ray.sources.synthetic import corpus_dataset

        ds = corpus_dataset("/root/testdata/sf0.001", with_bytes=False) \
            .select_columns(["image_id", "caption"])
        base, _ = dedup_pipeline(ds, DedupConfig())
        salted, _ = dedup_pipeline(ds, DedupConfig(hot_threshold=64))
        b = base.to_pandas().sort_values("image_id").reset_index(drop=True)
        s = salted.to_pandas().sort_values("image_id").reset_index(drop=True)
        assert b.equals(s)
