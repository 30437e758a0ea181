"""End-to-end pin of the `ray job submit` entry point
(scripts/run_full_dedup.py): corpus parquet in → hash-bucketed
assignment partitions + _STATS.json out, on an already-initialized
Ray session (the job-runtime shape)."""

import glob
import json
import sys


class TestJobScript:
    def test_run_full_dedup_end_to_end(self, ray_session, tmp_path):
        from bloom_filters_ray.sources.synthetic import corpus_dataset

        inp, out, ck = (tmp_path / "corpus", tmp_path / "out",
                        tmp_path / "ckpt")
        corpus_dataset("/root/testdata/sf0.001", with_bytes=True) \
            .write_parquet(str(inp))

        from scripts.run_full_dedup import main

        argv = sys.argv
        sys.argv = ["run_full_dedup.py", "--input", str(inp),
                    "--output", str(out), "--checkpoint-dir", str(ck),
                    "--cc", "driver"]
        try:
            assert main() == 0
        finally:
            sys.argv = argv

        with open(out / "_STATS.json") as f:
            stats = json.load(f)
        assert stats["n_input"] == 1500
        assert stats["n_components"] > 0
        files = glob.glob(str(out / "bucket=*" / "*.parquet"))
        assert files, "expected hash-bucketed output partitions"
        import duckdb

        n_rows, n_ids = duckdb.sql(
            f"SELECT count(*), count(DISTINCT image_id) "
            f"FROM read_parquet('{out}/bucket=*/*.parquet')").fetchone()
        assert (n_rows, n_ids) == (1500, 1500)
        # stage checkpoints landed (resume surface)
        assert (ck / "full_exact" / "_SUCCESS").exists()

        # idempotent re-run: a COMPLETE output (_STATS.json present) is
        # skipped, leaving the partition dirs untouched — rerunning must
        # NEVER append a second copy of the assignment rows
        sys.argv = ["run_full_dedup.py", "--input", str(inp),
                    "--output", str(out), "--checkpoint-dir", str(ck),
                    "--cc", "driver"]
        try:
            assert main() == 0
        finally:
            sys.argv = argv
        n_rows2, = duckdb.sql(
            f"SELECT count(*) "
            f"FROM read_parquet('{out}/bucket=*/*.parquet')").fetchone()
        assert n_rows2 == 1500, "re-run duplicated output rows"
