"""Distributed connected-components tests: equivalence with the driver
union-find on random graphs and on real pipeline edges."""

import numpy as np
import pyarrow as pa
import pytest

from bloom_filters_ray.stages.neardup import UnionFind


def _uf_labels(edges):
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return uf.components()


class TestDistributedCC:
    @pytest.mark.parametrize("seed,n,m", [(0, 60, 40), (1, 200, 150),
                                          (2, 300, 600)])
    def test_matches_union_find(self, ray_session, seed, n, m):
        import ray.data

        from bloom_filters_ray.stages.cc import \
            connected_components_distributed
        from bloom_filters_ray.util import ensure_hash_shuffle

        ensure_hash_shuffle()
        rng = np.random.default_rng(seed)
        nodes = [f"n{i:04d}" for i in range(n)]
        pairs = set()
        while len(pairs) < m:
            i, j = rng.integers(0, n, size=2)
            if i != j:
                pairs.add((nodes[min(i, j)], nodes[max(i, j)]))
        edges = sorted(pairs)
        want = _uf_labels(edges)
        eds = ray.data.from_arrow(pa.table({
            "a": [a for a, _ in edges], "b": [b for _, b in edges]}))
        got_df = connected_components_distributed(eds, num_partitions=4) \
            .to_pandas()
        got = dict(zip(got_df.image_id, got_df.cluster_id))
        assert got == want

    def test_pipeline_edges_equivalence(self, ray_session):
        """Real caption-tier edges: distributed CC labels == driver
        union-find labels."""
        import ray

        from bloom_filters_ray.pipelines.dedup import (DedupConfig,
                                                       candidate_pairs,
                                                       exact_tier, signatures,
                                                       verify_pairs_broadcast)
        from bloom_filters_ray.sources.synthetic import corpus_dataset
        from bloom_filters_ray.stages.cc import \
            connected_components_distributed

        cfg = DedupConfig()
        ds = corpus_dataset("/root/testdata/sf0.001", with_bytes=False) \
            .select_columns(["image_id", "caption"])
        exact = exact_tier(ds, cfg).materialize()
        reps = exact.filter(expr="is_rep == True") \
            .select_columns(["image_id", "caption"])
        sigs = signatures(reps, cfg).materialize()
        sig_table = pa.concat_tables(
            [b for b in sigs.select_columns(["image_id", "sig"])
             .iter_batches(batch_size=1 << 16, batch_format="pyarrow")])
        edges = verify_pairs_broadcast(candidate_pairs(sigs, cfg),
                                       sig_table, cfg) \
            .select_columns(["a", "b"]).materialize()
        want = _uf_labels([(r["a"], r["b"]) for r in edges.take_all()])
        got_df = connected_components_distributed(edges, num_partitions=4) \
            .to_pandas()
        got = dict(zip(got_df.image_id, got_df.cluster_id))
        assert got == want
        assert len(got) > 500

    def test_pipeline_with_distributed_cc_matches_driver(self, ray_session):
        from bloom_filters_ray.pipelines.dedup import (DedupConfig,
                                                       dedup_pipeline)
        from bloom_filters_ray.sources.synthetic import corpus_dataset

        ds = corpus_dataset("/root/testdata/sf0.001", with_bytes=False) \
            .select_columns(["image_id", "caption"])
        a1, _ = dedup_pipeline(ds, DedupConfig(cc="driver"))
        a2, _ = dedup_pipeline(ds, DedupConfig(cc="distributed"))
        d1 = a1.to_pandas().sort_values("image_id").reset_index(drop=True)
        d2 = a2.to_pandas().sort_values("image_id").reset_index(drop=True)
        assert d1.equals(d2)
