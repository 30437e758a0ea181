"""North-star flagship tests: combined image+caption pipeline."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def full_result(ray_session):
    from bloom_filters_ray.pipelines.full import (FullDedupConfig,
                                                  full_dedup_pipeline)
    from bloom_filters_ray.sources.synthetic import corpus_dataset

    ds = corpus_dataset(SF, with_bytes=True).select_columns(
        ["image_id", "bytes", "caption", "phash"])
    assignments, stats = full_dedup_pipeline(ds, FullDedupConfig())
    return assignments.to_pandas(), stats


class TestFullPipeline:
    def test_planted_duplicates_recalled(self, full_result):
        df, stats = full_result
        assert len(df) == 1500
        d = df.copy()
        d["doc"] = d.image_id.str.slice(4, 12)
        d["v"] = d.image_id.str.slice(13).astype(int)
        base = d[d.v == 0].set_index("doc").cluster_id
        for v in (1, 2):
            other = d[d.v == v].set_index("doc").cluster_id
            recall = (base.loc[other.index] == other).mean()
            assert recall >= 0.99, (v, recall)

    def test_exact_tier_groups_payload_and_caption(self, full_result):
        df, stats = full_result
        # v0/v1 share payload AND caption -> same rep; v2 differs in both
        d = df.copy()
        d["doc"] = d.image_id.str.slice(4, 12)
        d["v"] = d.image_id.str.slice(13).astype(int)
        v0 = d[d.v == 0].set_index("doc").rep_id
        v1 = d[d.v == 1].set_index("doc").rep_id
        v2 = d[d.v == 2].set_index("doc").rep_id
        assert (v0.loc[v1.index] == v1).all()
        assert (v2 == d[d.v == 2].set_index("doc").image_id).all()
        assert stats["n_unique_pairs"] == 1000

    def test_both_edge_tiers_contribute(self, full_result):
        _, stats = full_result
        assert stats["n_edges"] > 500  # caption + image tiers

    def test_cluster_id_is_min_member(self, full_result):
        df, _ = full_result
        mins = df.groupby("cluster_id")["image_id"].min()
        assert (mins.index == mins.values).all()


class TestJoinVerificationPath:
    def test_join_path_bit_equal_to_broadcast(self, full_result, ray_session):
        """broadcast_limit=0 forces the hash-join verification fallback;
        assignments must be bit-equal to the broadcast fast path."""
        from bloom_filters_ray.pipelines.dedup import DedupConfig
        from bloom_filters_ray.pipelines.full import (FullDedupConfig,
                                                      full_dedup_pipeline)
        from bloom_filters_ray.sources.synthetic import corpus_dataset

        df_b, _ = full_result
        cfg = FullDedupConfig(caption=DedupConfig(broadcast_limit=0))
        ds = corpus_dataset(SF, with_bytes=True).select_columns(
            ["image_id", "bytes", "caption", "phash"])
        assignments, _ = full_dedup_pipeline(ds, cfg)
        a = df_b.sort_values("image_id").reset_index(drop=True)
        b = assignments.to_pandas().sort_values("image_id") \
            .reset_index(drop=True)
        assert a.equals(b)


class TestDistributedCCPath:
    def test_distributed_cc_bit_equal_to_driver(self, full_result, ray_session):
        """cc='distributed' on the flagship: star-contraction labels +
        join assignment must match the driver union-find bit-for-bit."""
        from bloom_filters_ray.pipelines.dedup import DedupConfig
        from bloom_filters_ray.pipelines.full import (FullDedupConfig,
                                                      full_dedup_pipeline)
        from bloom_filters_ray.sources.synthetic import corpus_dataset

        df_b, _ = full_result
        cfg = FullDedupConfig(caption=DedupConfig(cc="distributed"))
        ds = corpus_dataset(SF, with_bytes=True).select_columns(
            ["image_id", "bytes", "caption", "phash"])
        assignments, stats = full_dedup_pipeline(ds, cfg)
        a = df_b.sort_values("image_id").reset_index(drop=True)
        b = assignments.to_pandas().sort_values("image_id") \
            .reset_index(drop=True)
        assert a.equals(b)
        assert stats["n_components"] > 0


class TestSaltedMergedPath:
    """Hot-band salting composes with the merged band tier (one keyed
    shuffle for both tiers, salt entropy below the tier tag bit)."""

    def test_no_hot_bands_bit_equal_to_default(self, full_result,
                                               ray_session):
        """With a threshold no band actually exceeds, the salted
        merged path is a no-op: assignments bit-equal the default,
        and the skew diagnostic reports zero hot buckets."""
        from bloom_filters_ray.pipelines.dedup import DedupConfig
        from bloom_filters_ray.pipelines.full import (FullDedupConfig,
                                                      full_dedup_pipeline)
        from bloom_filters_ray.sources.synthetic import corpus_dataset

        df_b, _ = full_result
        cfg = FullDedupConfig(caption=DedupConfig(hot_threshold=1 << 20))
        ds = corpus_dataset(SF, with_bytes=True).select_columns(
            ["image_id", "bytes", "caption", "phash"])
        assignments, stats = full_dedup_pipeline(ds, cfg)
        assert stats["n_hot_bands"] == 0
        assert stats["hot_threshold_effective"] == 1 << 20
        a = df_b.sort_values("image_id").reset_index(drop=True)
        b = assignments.to_pandas().sort_values("image_id") \
            .reset_index(drop=True)
        assert a.equals(b)

    def test_auto_threshold_small_corpus_bit_equal(self, full_result,
                                                   ray_session):
        """hot_threshold='auto' derives the cut from the band-row
        count; at test scale the 4×max_bucket floor means nothing
        salts and assignments stay bit-equal to the default."""
        from bloom_filters_ray.pipelines.dedup import DedupConfig
        from bloom_filters_ray.pipelines.full import (FullDedupConfig,
                                                      full_dedup_pipeline)
        from bloom_filters_ray.sources.synthetic import corpus_dataset

        df_b, _ = full_result
        cfg = FullDedupConfig(caption=DedupConfig(hot_threshold="auto"))
        ds = corpus_dataset(SF, with_bytes=True).select_columns(
            ["image_id", "bytes", "caption", "phash"])
        assignments, stats = full_dedup_pipeline(ds, cfg)
        assert stats["hot_threshold_effective"] >= 4 * cfg.caption.max_bucket
        assert stats["n_hot_bands"] == 0
        a = df_b.sort_values("image_id").reset_index(drop=True)
        b = assignments.to_pandas().sort_values("image_id") \
            .reset_index(drop=True)
        assert a.equals(b)

    def test_skewed_corpus_salts_and_keeps_recall(self, ray_session):
        """40% boilerplate captions make LSH buckets hot; with a low
        threshold the merged path actually salts (n_hot_bands > 0) and
        the planted near-dup recall survives — hot buckets hold only
        cross-doc candidates verification would reject, while true
        pairs also collide in cold bands (and the phash tier)."""
        from bloom_filters_ray.pipelines.dedup import DedupConfig
        from bloom_filters_ray.pipelines.full import (FullDedupConfig,
                                                      full_dedup_pipeline)
        from bloom_filters_ray.sources.synthetic import (
            corpus_dataset, make_boiler_skew_fn)

        cfg = FullDedupConfig(
            caption=DedupConfig(hot_threshold=32, n_salt=8))
        ds = corpus_dataset(SF, with_bytes=True) \
            .select_columns(["image_id", "bytes", "caption", "phash",
                             "doc_id"]) \
            .map_batches(make_boiler_skew_fn(40), batch_format="pyarrow") \
            .select_columns(["image_id", "bytes", "caption", "phash"])
        assignments, stats = full_dedup_pipeline(ds, cfg)
        assert stats["n_hot_bands"] > 0  # salting actually triggered
        d = assignments.to_pandas()
        assert len(d) == 1500
        d["doc"] = d.image_id.str.slice(4, 12)
        d["v"] = d.image_id.str.slice(13).astype(int)
        base = d[d.v == 0].set_index("doc").cluster_id
        for v in (1, 2):
            other = d[d.v == v].set_index("doc").cluster_id
            recall = (base.loc[other.index] == other).mean()
            assert recall >= 0.99, (v, recall)


class TestFullCheckpointResume:
    def test_full_pipeline_resumes_without_recompute(self, full_result,
                                                     ray_session,
                                                     tmp_path):
        """The flagship resumes from its stage checkpoints: a second
        run with the same checkpoint_dir reuses full_exact/full_sigs
        (parquet untouched on disk) and reproduces the assignments of
        the checkpoint-free run bit-for-bit."""
        import os

        from bloom_filters_ray.pipelines.full import (FullDedupConfig,
                                                      full_dedup_pipeline)
        from bloom_filters_ray.sources.synthetic import corpus_dataset

        df_b, _ = full_result
        cfg = FullDedupConfig(checkpoint_dir=str(tmp_path))
        ds = corpus_dataset(SF, with_bytes=True).select_columns(
            ["image_id", "bytes", "caption", "phash"])
        a1, s1 = full_dedup_pipeline(ds, cfg)
        df1 = a1.to_pandas().sort_values("image_id").reset_index(drop=True)
        assert df1.equals(df_b.sort_values("image_id")
                          .reset_index(drop=True))
        exact_dir = tmp_path / "full_exact"
        sigs_dir = tmp_path / "full_sigs"
        edges_dir = tmp_path / "full_edges_b8_d4"  # merged band tier
        assert (exact_dir / "_SUCCESS").exists()
        assert (sigs_dir / "_SUCCESS").exists()
        assert (edges_dir / "_SUCCESS").exists()
        assert (exact_dir / "_LEDGER.json").exists()  # IBLT ledger
        mtimes = {p: os.path.getmtime(p)
                  for d in (exact_dir, sigs_dir, edges_dir)
                  for p in d.iterdir()}

        ds2 = corpus_dataset(SF, with_bytes=True).select_columns(
            ["image_id", "bytes", "caption", "phash"])
        a2, s2 = full_dedup_pipeline(ds2, FullDedupConfig(
            checkpoint_dir=str(tmp_path)))
        df2 = a2.to_pandas().sort_values("image_id").reset_index(drop=True)
        assert df1.equals(df2)
        assert s1 == s2
        # checkpoint files untouched -> stages were read back, not rerun
        assert mtimes == {p: os.path.getmtime(p)
                          for d in (exact_dir, sigs_dir, edges_dir)
                          for p in d.iterdir()}
