"""Stateful-tier tests: seen-set shard actors, distributed sketch
aggregations, TopK, checkpoint/resume, IBLT delta verification."""

import os

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _corpus(ray_session):
    from bloom_filters_ray.sources.synthetic import corpus_dataset

    return corpus_dataset(SF, with_bytes=False).select_columns(
        ["image_id", "caption"])


class TestSketchAggs:
    def test_bloom_agg_no_false_negatives(self, ray_session):
        from bloom_filters_ray.stages.sketch_aggs import build_bloom

        ds = _corpus(ray_session).materialize()
        n = ds.count()
        f = build_bloom(ds, on="image_id", capacity=n, error_rate=0.01)
        ids = ds.to_pandas()["image_id"]
        assert f.has_many(list(ids)).all()
        absent = [f"img-zz{i}" for i in range(2000)]
        fp = f.has_many(absent).mean()
        assert fp < 0.05

    def test_cms_agg_bounds(self, ray_session):
        from bloom_filters_ray.stages.sketch_aggs import build_cms

        ds = _corpus(ray_session).materialize()
        cms = build_cms(ds, on="caption", error_rate=1e-4)
        df = ds.to_pandas()
        true = df.caption.value_counts()
        est = cms.count_many(list(true.index))
        assert (est >= true.values).all()
        assert (est <= true.values + 1e-4 * len(df) + 50).all()
        assert cms.sum == len(df)

    def test_hll_agg_accuracy(self, ray_session):
        from bloom_filters_ray.stages.sketch_aggs import build_hll

        ds = _corpus(ray_session).materialize()
        hll = build_hll(ds, on="caption", nb_registers=4096)
        true = ds.to_pandas().caption.nunique()
        err = abs(hll.count() - true) / true
        assert err < 3 * 1.04 / np.sqrt(4096), (hll.count(), true)

    def test_topk_agg_matches_exact(self, ray_session):
        from bloom_filters_ray.stages.sketch_aggs import build_topk

        ds = _corpus(ray_session).materialize()
        top = build_topk(ds, on="caption", k=10, error_rate=1e-5)
        df = ds.to_pandas()
        vc = df.caption.value_counts()
        exact = sorted(zip(-vc.values, vc.index))[:10]
        got = [(-t["frequency"], t["value"]) for t in top]
        assert got == exact
        assert [t["rank"] for t in top] == list(range(1, 11))


class TestSeenSet:
    @pytest.mark.parametrize("kind", ["scalable", "cuckoo", "counting"])
    def test_exactly_one_winner_per_key(self, ray_session, kind):
        from bloom_filters_ray.stages.seenset import SeenSet

        ds = _corpus(ray_session).materialize()
        ss = SeenSet(num_shards=4, kind=kind, capacity=1 << 13,
                     error_rate=1e-4)
        try:
            df = ss.mark_new(ds, "caption").to_pandas()
            winners = df.groupby("caption").is_new.sum()
            assert winners.max() == 1
            # a missed key can only come from a false positive (rate eps)
            assert (winners == 0).mean() <= 0.01
        finally:
            ss.shutdown()

    def test_batch_size_invariant(self, ray_session):
        """mark_new's batch_size is an RPC-amortization knob only:
        the one-winner-per-key contract holds at any batch size."""
        from bloom_filters_ray.stages.seenset import SeenSet

        ds = _corpus(ray_session).materialize()
        for bs in (256, 65536):
            ss = SeenSet(num_shards=4, kind="scalable", capacity=1 << 13,
                         error_rate=1e-4)
            try:
                df = ss.mark_new(ds, "caption", batch_size=bs).to_pandas()
                winners = df.groupby("caption").is_new.sum()
                assert winners.max() == 1, bs
                assert (winners == 0).mean() <= 0.01, bs
            finally:
                ss.shutdown()

    def test_save_restore_continues(self, ray_session):
        from bloom_filters_ray.stages.seenset import SeenSet

        ds = _corpus(ray_session).materialize()
        ss = SeenSet(num_shards=3, kind="scalable", capacity=1 << 13)
        ss.mark_new(ds, "caption").materialize()
        state = ss.save()
        ss.shutdown()
        ss2 = SeenSet(num_shards=3, kind="scalable", capacity=1 << 13)
        ss2.load(state)
        try:
            df2 = ss2.mark_new(ds, "caption").to_pandas()
            assert df2.is_new.sum() == 0  # everything already seen
        finally:
            ss2.shutdown()


class TestCheckpointResume:
    def test_dedup_pipeline_resumes_from_checkpoints(self, ray_session, tmp_path):
        from bloom_filters_ray.pipelines.dedup import DedupConfig, dedup_pipeline

        cfg = DedupConfig(checkpoint_dir=str(tmp_path))
        a1, s1 = dedup_pipeline(_corpus(ray_session), cfg)
        df1 = a1.to_pandas().sort_values("image_id").reset_index(drop=True)
        assert os.path.exists(tmp_path / "exact" / "_SUCCESS")
        assert os.path.exists(tmp_path / "sigs" / "_SUCCESS")

        # resume: same checkpoint_dir -> stages read back, same result
        a2, s2 = dedup_pipeline(_corpus(ray_session), cfg)
        df2 = a2.to_pandas().sort_values("image_id").reset_index(drop=True)
        assert df1.equals(df2)
        assert s1 == s2

        # killed mid-run: a later stage's checkpoint missing -> only it
        # is recomputed, upstream parquet is reused, result unchanged
        import shutil

        shutil.rmtree(tmp_path / "sigs")
        a3, s3 = dedup_pipeline(_corpus(ray_session), cfg)
        df3 = a3.to_pandas().sort_values("image_id").reset_index(drop=True)
        assert df1.equals(df3)

    def test_iblt_delta_verification(self, ray_session):
        import ray.data

        from bloom_filters_ray.pipelines.checkpoint import (build_iblt,
                                                            delta_verify)

        ds = _corpus(ray_session).select_columns(["image_id"]).materialize()
        # simulate a partial write: drop 7 known rows
        df = ds.to_pandas()
        dropped = sorted(df.image_id)[100:107]
        written = ray.data.from_arrow(
            pa.table({"image_id": df[~df.image_id.isin(dropped)]
                      .image_id.tolist()}))
        res = delta_verify(ds, written, on="image_id", differences=100)
        assert res["success"]
        assert sorted(res["missing"]) == dropped
        assert res["additional"] == []

    def test_sketch_json_checkpoint_roundtrip(self, ray_session, tmp_path):
        from bloom_filters_ray.pipelines.checkpoint import (load_sketch_json,
                                                            save_sketch_json)
        from bloom_filters_ray.stages.sketch_aggs import build_hll
        from bloom_filters_ray.state.hyperloglog import HyperLogLog

        ds = _corpus(ray_session).materialize()
        hll = build_hll(ds, on="caption", nb_registers=256)
        p = str(tmp_path / "hll.json")
        save_sketch_json(p, hll)
        back = load_sketch_json(p, HyperLogLog)
        assert back.equals(hll)
        assert back.count() == hll.count()


class TestCheckpointArtifacts:
    def test_metrics_and_ledger_written(self, ray_session, tmp_path):
        import json

        import ray.data

        from bloom_filters_ray.pipelines.checkpoint import delta_verify
        from bloom_filters_ray.pipelines.dedup import (DedupConfig,
                                                       dedup_pipeline)
        from bloom_filters_ray.state.iblt import InvertibleBloomFilter

        cfg = DedupConfig(checkpoint_dir=str(tmp_path))
        dedup_pipeline(_corpus(ray_session), cfg)
        mpath = tmp_path / "exact" / "_METRICS.json"
        lpath = tmp_path / "exact" / "_LEDGER.json"
        assert mpath.exists() and lpath.exists()
        m = json.loads(mpath.read_text())
        assert m["rows"] == 1500 and m["stage"] == "exact"
        assert m["config"]["threshold"] == cfg.threshold
        # the ledger reconciles against what was actually written
        ledger = InvertibleBloomFilter.from_json(json.loads(lpath.read_text()))
        written = ray.data.read_parquet(str(tmp_path / "exact")) \
            .select_columns(["image_id"])
        from bloom_filters_ray.pipelines.checkpoint import build_iblt

        again = build_iblt(written, on="image_id", differences=128,
                           seed=cfg.seed)
        diff = again.substract(ledger).decode()
        assert diff["success"]
        assert diff["missing"] == [] and diff["additional"] == []


class TestKillResume:
    def test_sigkilled_run_resumes_without_recompute(self, ray_session,
                                                     tmp_path):
        """north_rule: 'a killed job resumes without recomputation'.
        A subprocess running the checkpointed pipeline is SIGKILLed as
        soon as the first stage checkpoint lands; the resumed run (in
        this process) reuses that parquet — same _METRICS.json mtime —
        and produces the same result as an uninterrupted run."""
        import json
        import signal
        import subprocess
        import sys
        import time

        ckpt = tmp_path / "ckpt"
        script = f"""
import sys; sys.path.insert(0, {str(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
from bloom_filters_ray.sources.synthetic import corpus_dataset
from bloom_filters_ray.pipelines.dedup import DedupConfig, dedup_pipeline
ds = corpus_dataset({SF!r}, with_bytes=False).select_columns(["image_id", "caption"])
dedup_pipeline(ds, DedupConfig(checkpoint_dir={str(ckpt)!r}))
"""
        proc = subprocess.Popen([sys.executable, "-c", script],
                                stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL)
        marker = ckpt / "exact" / "_SUCCESS"
        deadline = time.time() + 120
        while time.time() < deadline and not marker.exists():
            if proc.poll() is not None:
                break
            time.sleep(0.2)
        assert marker.exists(), "first stage checkpoint never appeared"
        proc.send_signal(signal.SIGKILL)
        proc.wait()

        mpath = ckpt / "exact" / "_METRICS.json"
        mtime_before = mpath.stat().st_mtime
        rows_before = json.loads(mpath.read_text())["rows"]

        from bloom_filters_ray.pipelines.dedup import (DedupConfig,
                                                       dedup_pipeline)

        ds = _corpus(ray_session)
        resumed, _ = dedup_pipeline(ds, DedupConfig(checkpoint_dir=str(ckpt)))
        fresh, _ = dedup_pipeline(ds, DedupConfig())
        r = resumed.to_pandas().sort_values("image_id").reset_index(drop=True)
        f = fresh.to_pandas().sort_values("image_id").reset_index(drop=True)
        assert r.equals(f)
        # the exact-stage checkpoint was REUSED, not rewritten
        assert mpath.stat().st_mtime == mtime_before
        assert json.loads(mpath.read_text())["rows"] == rows_before


class TestCheckpointHardening:
    def test_stale_partial_stage_dir_is_cleared(self, ray_session, tmp_path):
        """Crashed mid-write (stage dir without _SUCCESS, stale parquet
        inside) -> the resumed run clears the dir instead of writing new
        files alongside, so no duplicated rows."""
        import shutil

        from bloom_filters_ray.pipelines.dedup import (DedupConfig,
                                                       dedup_pipeline)

        cfg = DedupConfig(checkpoint_dir=str(tmp_path))
        a1, _ = dedup_pipeline(_corpus(ray_session), cfg)
        df1 = a1.to_pandas().sort_values("image_id").reset_index(drop=True)
        os.remove(tmp_path / "exact" / "_SUCCESS")
        frag = next(p for p in (tmp_path / "exact").iterdir()
                    if p.suffix == ".parquet")
        stale = tmp_path / "exact" / "zz_stale_partial.parquet"
        shutil.copy(frag, stale)
        a2, _ = dedup_pipeline(_corpus(ray_session), cfg)
        df2 = a2.to_pandas().sort_values("image_id").reset_index(drop=True)
        assert not stale.exists()
        assert df1.equals(df2)

    def test_config_change_invalidates_checkpoint(self, ray_session, tmp_path):
        """A resumed run under a changed DedupConfig must not silently
        reuse checkpoints computed under the old config."""
        import json

        from bloom_filters_ray.pipelines.dedup import (DedupConfig,
                                                       dedup_pipeline)

        dedup_pipeline(_corpus(ray_session),
                       DedupConfig(checkpoint_dir=str(tmp_path)))
        with open(tmp_path / "sigs" / "_METRICS.json") as f:
            assert json.load(f)["config"]["threshold"] == 0.8
        dedup_pipeline(_corpus(ray_session),
                       DedupConfig(checkpoint_dir=str(tmp_path),
                                   threshold=0.9))
        with open(tmp_path / "sigs" / "_METRICS.json") as f:
            assert json.load(f)["config"]["threshold"] == 0.9
