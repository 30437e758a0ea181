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


class TestSaltedFallbackPath:
    def test_hot_threshold_forces_split_tier_and_matches(self, full_result,
                                                         ray_session):
        """hot_threshold opts into band salting, which runs on the
        split-tier fallback; with a threshold no band actually exceeds,
        assignments must equal the merged default path."""
        from bloom_filters_ray.pipelines.dedup import DedupConfig
        from bloom_filters_ray.pipelines.full import (FullDedupConfig,
                                                      full_dedup_pipeline)
        from bloom_filters_ray.sources.synthetic import corpus_dataset

        df_b, _ = full_result
        cfg = FullDedupConfig(caption=DedupConfig(hot_threshold=1 << 20))
        ds = corpus_dataset(SF, with_bytes=True).select_columns(
            ["image_id", "bytes", "caption", "phash"])
        assignments, _ = full_dedup_pipeline(ds, cfg)
        a = df_b.sort_values("image_id").reset_index(drop=True)
        b = assignments.to_pandas().sort_values("image_id") \
            .reset_index(drop=True)
        assert a.equals(b)


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
