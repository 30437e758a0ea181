"""Benchmark harness for the bloom_filters_ray engine.

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "throughput": {name: rows_per_sec, ...}, "rows": {...}}

``--scaling`` runs the flagship near-dup pipeline twice in FRESH
processes (num_cpus=8 then 32, same input) and reports both
throughputs plus scaling efficiency — the sandbox protocol for the
north_rule's N→4N cluster criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
COPIES = int(os.environ.get("BENCH_COPIES", "8"))


def bench_neardup(sf_dir: str) -> int:
    """Flagship: synthetic corpus (COPIES variants/doc) → exact tier →
    MinHash/LSH → verify → connected components → assignments."""
    from bloom_filters_ray.pipelines.dedup import DedupConfig, dedup_pipeline
    from bloom_filters_ray.sources.synthetic import corpus_dataset

    ds = corpus_dataset(sf_dir, copies=COPIES, with_bytes=False) \
        .select_columns(["image_id", "caption"])
    assignments, stats = dedup_pipeline(ds, DedupConfig())
    return assignments.count()


def bench_sketches(sf_dir: str) -> int:
    """Distributed sketch builds over the caption corpus: Bloom + CMS +
    HLL partial/final aggregations in one pass each."""
    from bloom_filters_ray.sources.synthetic import corpus_dataset
    from bloom_filters_ray.stages.sketch_aggs import (build_bloom, build_cms,
                                                      build_hll)

    ds = corpus_dataset(sf_dir, copies=COPIES, with_bytes=False) \
        .select_columns(["caption"]).materialize()
    n = ds.count()
    build_bloom(ds, on="caption", capacity=n, error_rate=0.01)
    build_cms(ds, on="caption", error_rate=1e-4)
    build_hll(ds, on="caption", nb_registers=4096)
    return 3 * n


def bench_image_corpus(sf_dir: str) -> int:
    """Image-side throughput: synthesize pixel payloads + phash for
    3 variants/doc and run token stats over captions (decode-adjacent
    per-row work + vectorized text kernels)."""
    from bloom_filters_ray.sources.synthetic import corpus_dataset
    from bloom_filters_ray.stages.textstats import make_token_stats_fn

    ds = corpus_dataset(sf_dir, copies=3, with_bytes=True)
    return ds.map_batches(make_token_stats_fn(), batch_format="pyarrow").count()


BENCH_QUERIES = {
    "neardup_captions": bench_neardup,
    "sketch_builds": bench_sketches,
    "image_corpus": bench_image_corpus,
}


def run(sf_dir: str, num_cpus: int, only: list[str] | None = None) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in BENCH_QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        rows[name] = int(fn(sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)
    ray.shutdown()
    return {
        "metric": "headline pipeline wall time (dedup/sketch/image corpus)",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "rows": rows,
        "throughput": {k: round(rows[k] / times[k], 1) for k in times},
        "copies": COPIES,
    }


def run_scaling(sf_dir: str) -> dict:
    """North-rule scaling evidence: same job, fresh processes, 8 vs 32
    CPUs (sandbox stand-in for N vs 4N nodes)."""
    out = {}
    for cpus in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=sf_dir,
                   BENCH_COPIES=str(COPIES))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "neardup_captions"],
            env=env, capture_output=True, text=True, check=True)
        out[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
    thr8 = out[8]["throughput"]["neardup_captions"]
    thr32 = out[32]["throughput"]["neardup_captions"]
    eff = (thr32 / thr8) / (32 / 8)
    return {
        "metric": "scaling efficiency (throughput ratio / cpu ratio, 8→32 cpus)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "queries": {"neardup_8cpu_sec": out[8]["queries"]["neardup_captions"],
                    "neardup_32cpu_sec": out[32]["queries"]["neardup_captions"]},
        "throughput_rows_per_sec": {"cpus_8": thr8, "cpus_32": thr32},
        "sf": sf_dir,
        "num_cpus": 32,
        "rows": out[32]["rows"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
    elif "--child" in sys.argv:
        only = sys.argv[sys.argv.index("--child") + 1 :] or None
        print(json.dumps(run(SF_DIR, NUM_CPUS, only)))
    else:
        print(json.dumps(run(SF_DIR, NUM_CPUS)))
