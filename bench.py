"""Benchmark harness for the bloom_filters_ray engine.

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "rows": {...}, "throughput": {name: rows_per_sec, ...}}

``--scaling`` runs the flagship pipeline twice in FRESH processes
(num_cpus=N then 4N, same input, same fixed shuffle partition count)
and reports both throughputs plus scaling efficiency — the sandbox
protocol for the north_rule's N→4N cluster criterion (BASELINE.md).
N defaults to 4 (``BENCH_SCALE_N``): this VM's memory subsystem
saturates near ~12 effective cores (see BASELINE.md's probe table),
so 8→32 measures host contention, not engine scaling.
A small warm-up run precedes timing in every process so worker
startup and first-touch page faults are not billed to the pipeline.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
COPIES = int(os.environ.get("BENCH_COPIES", "12"))
PARTITIONS = int(os.environ.get("BENCH_PARTITIONS", "32"))
SCALE_N = int(os.environ.get("BENCH_SCALE_N", "4"))
REPEAT = int(os.environ.get("BENCH_REPEAT", "3"))  # best-of-N per query
# the scaling protocol needs enough parallel work that per-execution
# serial costs (~5-8s) amortize; the plain per-round bench stays small
SCALING_COPIES = int(os.environ.get("BENCH_SCALING_COPIES", "96"))


def _full_cfg():
    from bloom_filters_ray.pipelines.dedup import DedupConfig
    from bloom_filters_ray.pipelines.full import FullDedupConfig

    return FullDedupConfig(caption=DedupConfig(num_partitions=PARTITIONS))


def bench_full_neardup(sf_dir: str) -> int:
    """Flagship: image+caption corpus WITH pixel payloads (COPIES
    variants/doc) → per-image decode + phash from pixels (a real
    pipeline derives the code from the payload) → exact tier →
    caption MinHash/LSH + phash Hamming tiers → union-find →
    assignments."""
    from bloom_filters_ray.pipelines.full import full_dedup_pipeline
    from bloom_filters_ray.sources.synthetic import corpus_dataset
    from bloom_filters_ray.stages.multimodal import PhashStage

    ds = corpus_dataset(sf_dir, copies=COPIES, with_bytes=True) \
        .select_columns(["image_id", "bytes", "w", "h", "fmt", "caption"])
    # instance => stateless task pool (an actor pool's standing CPU
    # reservation starves 4-CPU clusters alongside shuffle aggregators)
    ds = ds.map_batches(PhashStage(), batch_size=256,
                        batch_format="pyarrow") \
        .select_columns(["image_id", "bytes", "caption", "phash"])
    assignments, stats = full_dedup_pipeline(ds, _full_cfg())
    return assignments.count()


def bench_caption_neardup(sf_dir: str) -> int:
    """Caption-only tier (no payloads): exact + MinHash/LSH."""
    from bloom_filters_ray.pipelines.dedup import DedupConfig, dedup_pipeline
    from bloom_filters_ray.sources.synthetic import corpus_dataset

    ds = corpus_dataset(sf_dir, copies=COPIES, with_bytes=False) \
        .select_columns(["image_id", "caption"])
    assignments, _ = dedup_pipeline(
        ds, DedupConfig(num_partitions=PARTITIONS))
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


def bench_image_features(sf_dir: str) -> int:
    """Image-side throughput: pixel synthesis (decode-stand-in) +
    per-image feature extraction in an actor pool. BENCH_IMG_COPIES
    (default 3, so the headline number stays comparable across rounds)
    sizes the corpus — the non-flagship scaling protocol raises it so
    per-leg work amortizes executor startup."""
    from bloom_filters_ray.sources.synthetic import corpus_dataset
    from bloom_filters_ray.stages.multimodal import ImageFeatureStage

    copies = int(os.environ.get("BENCH_IMG_COPIES", "3"))
    ds = corpus_dataset(sf_dir, copies=copies, with_bytes=True)
    return ds.map_batches(ImageFeatureStage, concurrency=max(NUM_CPUS // 2, 2),
                          batch_size=64, batch_format="pyarrow").count()


def bench_ann(sf_dir: str) -> int:
    """Similarity search: brute-force cosine top-10 for 50 query
    vectors (block-local top-k, broadcast query matrix) + projection-
    LSH embedding near-dup clustering over the planted corpus."""
    import pyarrow.parquet as pq
    import ray.data

    from bloom_filters_ray.pipelines.embdedup import (EmbDedupConfig,
                                                      embedding_dedup_pipeline)
    from bloom_filters_ray.sources.synthetic import embedding_corpus
    from bloom_filters_ray.stages.ann import brute_force_topk, embedding_matrix
    from bloom_filters_ray.util import ensure_hash_shuffle

    ensure_hash_shuffle()
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       filters=[("vec_id", "<", 50)])
    Q = embedding_matrix(qt["embedding"])
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               override_num_blocks=16)
    topk = brute_force_topk(ds, qt["vec_id"].to_numpy(), Q, k=10)
    assignments, _ = embedding_dedup_pipeline(embedding_corpus(sf_dir),
                                              EmbDedupConfig())
    return len(topk) + assignments.count()


def bench_substring(sf_dir: str) -> int:
    """Exact-substring dedup, scale path: winnowing-fingerprint bucket
    sharding + per-partition suffix-array passes — bit-equal to the
    global single-partition pass (stages/substring.py), no
    repartition(1) anywhere."""
    from bloom_filters_ray.pipelines.dedup import DedupConfig, exact_tier
    from bloom_filters_ray.sources.synthetic import corpus_dataset
    from bloom_filters_ray.stages.substring import substring_flags_sharded

    cfg = DedupConfig(num_partitions=PARTITIONS)
    ds = corpus_dataset(sf_dir, copies=3, with_bytes=False) \
        .select_columns(["image_id", "caption"])
    uniq = exact_tier(ds, cfg).filter(expr="is_rep == True") \
        .select_columns(["image_id", "caption"])
    # BENCH_SUBSTR_TPB shrinks the size-adaptive partition threshold so
    # scaling runs can force the sharded path (p_eff > 1) at bench scale
    tpb = int(os.environ.get("BENCH_SUBSTR_TPB", str(32 << 20)))
    return substring_flags_sharded(uniq, num_partitions=16,
                                   target_partition_bytes=tpb).count()


EXTRAS: dict = {}  # per-process metrics side channel (e.g. recall)


def bench_caption_skewed(sf_dir: str) -> int:
    """Salting A/B workload (not part of the per-round headline set):
    caption dedup over a corpus where BENCH_SKEW_PCT% of docs share a
    30-token boilerplate prefix — cross-doc Jaccard ≈ 0.6 (below the
    0.8 verify threshold) but band-collision rate is high, so LSH
    buckets go hot with candidates verification must reject. Salting
    is toggled via BENCH_HOT_THRESHOLD (empty = off); the bucket cap
    is loosened (BENCH_SKEW_MAX_BUCKET, default 4096) so the unsalted
    arm actually pays the quadratic hot-bucket cost the cap normally
    hides. Planted-pair recall (doc's v0 rep clustered with its v2
    near-dup rep) lands in EXTRAS."""
    from bloom_filters_ray.pipelines.dedup import DedupConfig, dedup_pipeline
    from bloom_filters_ray.sources.synthetic import (corpus_dataset,
                                                     make_boiler_skew_fn)

    pct = int(os.environ.get("BENCH_SKEW_PCT", "40"))
    max_bucket = int(os.environ.get("BENCH_SKEW_MAX_BUCKET", "4096"))
    hot_env = os.environ.get("BENCH_HOT_THRESHOLD", "")
    cfg = DedupConfig(num_partitions=PARTITIONS, max_bucket=max_bucket,
                      hot_threshold=int(hot_env) if hot_env else None)
    ds = corpus_dataset(sf_dir, copies=COPIES, with_bytes=False) \
        .select_columns(["image_id", "caption", "doc_id"]) \
        .map_batches(make_boiler_skew_fn(pct), batch_format="pyarrow") \
        .select_columns(["image_id", "caption"])
    assignments, _ = dedup_pipeline(ds, cfg)
    df = assignments.select_columns(["image_id", "cluster_id"]).to_pandas()
    # image_id = img-{doc:08d}-{variant}
    EXTRAS["caption_skewed_recall"] = round(_planted_recall(df), 4)
    EXTRAS["caption_skewed_hot_threshold"] = hot_env or None
    return len(df)


def _planted_recall(df) -> float:
    """Recall over the planted (variant 0, variant 2) near-dup pair
    per doc, from an assignments frame with image_id/cluster_id."""
    var = df.image_id.str.rsplit("-", n=1).str[-1]
    doc = df.image_id.str.slice(4, 12)
    d0 = df[var == "0"].set_index(doc[var == "0"])["cluster_id"]
    d2 = df[var == "2"].set_index(doc[var == "2"])["cluster_id"]
    joined = d0.align(d2, join="inner")
    return float((joined[0] == joined[1]).mean())


def bench_full_skewed(sf_dir: str) -> int:
    """Flagship salting A/B workload: the MERGED band tier (caption
    LSH + phash Hamming through ONE keyed shuffle) over the same
    boilerplate-skewed corpus as bench_caption_skewed. phash comes
    from the corpus column (no decode stage) so the A/B isolates the
    band/shuffle stages salting actually changes. BENCH_HOT_THRESHOLD
    toggles salting ("auto" allowed); the loosened
    BENCH_SKEW_MAX_BUCKET makes the unsalted arm pay the real
    hot-bucket cost. Planted recall + hot-band count land in
    EXTRAS."""
    from bloom_filters_ray.pipelines.dedup import DedupConfig
    from bloom_filters_ray.pipelines.full import (FullDedupConfig,
                                                  full_dedup_pipeline)
    from bloom_filters_ray.sources.synthetic import (corpus_dataset,
                                                     make_boiler_skew_fn)

    pct = int(os.environ.get("BENCH_SKEW_PCT", "40"))
    max_bucket = int(os.environ.get("BENCH_SKEW_MAX_BUCKET", "4096"))
    hot_env = os.environ.get("BENCH_HOT_THRESHOLD", "")
    hot = None if not hot_env else (
        "auto" if hot_env == "auto" else int(hot_env))
    cfg = FullDedupConfig(caption=DedupConfig(
        num_partitions=PARTITIONS, max_bucket=max_bucket,
        hot_threshold=hot))
    ds = corpus_dataset(sf_dir, copies=COPIES, with_bytes=True) \
        .select_columns(["image_id", "bytes", "caption", "phash",
                         "doc_id"]) \
        .map_batches(make_boiler_skew_fn(pct), batch_format="pyarrow") \
        .select_columns(["image_id", "bytes", "caption", "phash"])
    assignments, stats = full_dedup_pipeline(ds, cfg)
    df = assignments.select_columns(["image_id", "cluster_id"]).to_pandas()
    EXTRAS["full_skewed_recall"] = round(_planted_recall(df), 4)
    EXTRAS["full_skewed_hot_threshold"] = hot_env or None
    EXTRAS["full_skewed_n_hot_bands"] = stats.get("n_hot_bands")
    return len(df)


def bench_seenset(sf_dir: str) -> int:
    """Seen-set streaming prune throughput: corpus captions (COPIES
    variants/doc -> high dup rate, the realistic prune shape) routed
    through 8 scalable-Bloom shard actors. BENCH_SEENSET_BS sets the
    mark_new batch size — the RPC-amortization knob the matched A/B in
    BASELINE.md measures (each batch costs one check_and_add
    round-trip per shard, barriered on the slowest shard)."""
    from bloom_filters_ray.sources.synthetic import corpus_dataset
    from bloom_filters_ray.stages.seenset import SeenSet

    bs = int(os.environ.get("BENCH_SEENSET_BS", "32768"))
    ss = SeenSet(num_shards=8, kind="scalable", capacity=1 << 18)
    ds = corpus_dataset(sf_dir, copies=COPIES, with_bytes=False) \
        .select_columns(["image_id", "caption"])
    # materialize: the marking pass must run exactly ONCE (shard actors
    # are stateful; a second lazy execution would re-mark every key as
    # seen), and we want both the row count and the new-key tally
    marked = ss.mark_new(ds, "caption", batch_size=bs).materialize()
    n = marked.count()
    EXTRAS["seenset_new"] = int(marked.sum("is_new") or 0)
    EXTRAS["seenset_batch_size"] = bs
    ss.shutdown()
    return n


BENCH_QUERIES = {
    "full_neardup": bench_full_neardup,
    "caption_neardup": bench_caption_neardup,
    "sketch_builds": bench_sketches,
    "image_features": bench_image_features,
    "ann_embedding": bench_ann,
    "substring_dedup": bench_substring,
}

# opt-in workloads (reachable via --child / --salting-ab / scaling env;
# NOT in the per-round headline set, which stays comparable across rounds)
EXTRA_QUERIES = {
    "caption_skewed": bench_caption_skewed,
    "full_skewed": bench_full_skewed,
    "seenset_prune": bench_seenset,
}


def _warmup(sf_dir: str):
    """Spawn workers / shuffle actors and touch the hot code paths so
    steady-state throughput is measured, not process startup."""
    from bloom_filters_ray.pipelines.dedup import DedupConfig, dedup_pipeline
    from bloom_filters_ray.sources.synthetic import corpus_dataset

    ds = corpus_dataset(sf_dir, copies=2, with_bytes=True).limit(512) \
        .select_columns(["image_id", "caption"])
    dedup_pipeline(ds, DedupConfig(num_partitions=PARTITIONS))


def run(sf_dir: str, num_cpus: int, only: list[str] | None = None) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    _warmup(sf_dir)

    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    pool = {**BENCH_QUERIES, **EXTRA_QUERIES} if only else BENCH_QUERIES
    if only:
        unknown = sorted(set(only) - set(pool))
        if unknown:
            raise SystemExit(
                f"unknown bench query name(s) {unknown}; "
                f"valid: {sorted(pool)}")
    names = [n for n in pool if not only or n in only]
    # best-of-N with the repeats in OUTER cycles (q1 q2 ... qk, q1 q2
    # ...): this host's wall time drifts ±70% with a period of minutes,
    # so consecutive repeats of one query share the same drift phase —
    # cycling decorrelates the N samples from local drift for free.
    for _ in range(max(REPEAT, 1)):
        for name in names:
            fn = pool[name]
            t0 = time.perf_counter()
            rows[name] = int(fn(sf_dir))
            dt = time.perf_counter() - t0
            if name not in times or dt < times[name]:
                times[name] = round(dt, 3)
    ray.shutdown()
    out = {
        "metric": "headline pipeline wall time (dedup tiers, sketches, image features, ANN, substring)",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "rows": rows,
        "throughput": {k: round(rows[k] / times[k], 1) for k in times},
        "copies": COPIES,
        "partitions": PARTITIONS,
    }
    if EXTRAS:
        out["extras"] = dict(EXTRAS)
    return out


def run_scaling(sf_dir: str) -> dict:
    """North-rule scaling evidence: same job, fresh processes, N vs 4N
    CPUs (sandbox stand-in for N vs 4N nodes), identical input and
    partitioning. Legs are INTERLEAVED (lo, hi, lo, hi, ... —
    BENCH_SCALE_LEGS per level, default 3) and the best throughput
    per leg is kept: this host's performance drifts ±50% over tens of
    minutes, so back-to-back single legs measure drift, not scaling
    (BASELINE.md records the drift probes). BENCH_SCALE_QUERY picks
    the pipeline (default full_neardup; any BENCH/EXTRA query name)."""
    lo, hi = SCALE_N, 4 * SCALE_N
    q = os.environ.get("BENCH_SCALE_QUERY", "full_neardup")
    best: dict[int, dict] = {}
    legs = int(os.environ.get("BENCH_SCALE_LEGS", "3"))  # per level
    for cpus in (lo, hi) * max(legs, 1):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=sf_dir,
                   BENCH_COPIES=str(SCALING_COPIES),
                   BENCH_IMG_COPIES=str(SCALING_COPIES),
                   BENCH_PARTITIONS=str(PARTITIONS))
        # 2 in-process repeats x BENCH_SCALE_LEGS legs = 6 samples per
        # level; more in-process repeats would stretch each leg past
        # the host's drift period and stop sampling it
        env.setdefault("BENCH_REPEAT", "2")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", q],
            env=env, capture_output=True, text=True, check=True)
        res = json.loads(proc.stdout.strip().splitlines()[-1])
        if cpus not in best or (res["throughput"][q]
                                > best[cpus]["throughput"][q]):
            best[cpus] = res
    thr_lo = best[lo]["throughput"][q]
    thr_hi = best[hi]["throughput"][q]
    eff = (thr_hi / thr_lo) / 4.0
    return {
        "metric": f"scaling efficiency (throughput ratio / cpu ratio, {lo}→{hi} cpus)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "query": q,
        "queries": {f"{q}_{lo}cpu_sec": best[lo]["queries"][q],
                    f"{q}_{hi}cpu_sec": best[hi]["queries"][q]},
        "throughput_rows_per_sec": {f"cpus_{lo}": thr_lo, f"cpus_{hi}": thr_hi},
        "sf": sf_dir,
        "num_cpus": hi,
        "rows": best[hi]["rows"],
        "copies": SCALING_COPIES,
    }


def run_salting_ab(sf_dir: str, query: str = "caption_skewed") -> dict:
    """Matched A/B of hot-band salting on the skewed (boilerplate)
    corpus: arms are INTERLEAVED fresh processes (off, on, off, on,
    ...), best throughput per arm kept — the only valid comparison
    shape on this drift-heavy host (see BASELINE.md). *query* picks
    the workload: caption_skewed (split caption tier) or full_skewed
    (flagship merged band tier). Reports both arms' wall/throughput,
    planted-pair recall per arm, and the on/off throughput ratio."""
    if query not in EXTRA_QUERIES:
        raise SystemExit(f"unknown salting-ab query {query!r}; "
                         f"valid: {sorted(EXTRA_QUERIES)}")
    arms = {"off": "", "on": os.environ.get("BENCH_SALT_HOT", "256")}
    legs = int(os.environ.get("BENCH_AB_LEGS", "3"))
    best: dict[str, dict] = {}
    for arm, hot in [(a, h) for _ in range(max(legs, 1))
                     for a, h in arms.items()]:
        env = dict(os.environ, GRAFT_SF_DIR=sf_dir,
                   BENCH_PARTITIONS=str(PARTITIONS),
                   BENCH_HOT_THRESHOLD=hot)
        env.setdefault("RAY_GRAFT_CPUS", str(NUM_CPUS))
        env.setdefault("BENCH_REPEAT", "2")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", query],
            env=env, capture_output=True, text=True, check=True)
        res = json.loads(proc.stdout.strip().splitlines()[-1])
        if arm not in best or (res["throughput"][query]
                               > best[arm]["throughput"][query]):
            best[arm] = res
    thr = {a: best[a]["throughput"][query] for a in arms}
    out = {
        "metric": f"hot-band salting A/B on skewed corpus [{query}] "
                  "(salted/unsalted throughput ratio)",
        "value": round(thr["on"] / thr["off"], 3),
        "unit": "ratio",
        "queries": {f"{query}_{a}_sec":
                    best[a]["queries"][query] for a in arms},
        "throughput_rows_per_sec": thr,
        "recall": {a: best[a]["extras"][f"{query}_recall"]
                   for a in arms},
        "skew_pct": int(os.environ.get("BENCH_SKEW_PCT", "40")),
        "max_bucket": int(os.environ.get("BENCH_SKEW_MAX_BUCKET", "4096")),
        "hot_threshold": arms["on"],
        "sf": sf_dir,
        "rows": best["on"]["rows"],
        "copies": COPIES,
    }
    n_hot = best["on"]["extras"].get(f"{query}_n_hot_bands")
    if n_hot is not None:
        out["n_hot_bands"] = n_hot
    return out


def run_env_ab(sf_dir: str, query: str, env_var: str,
               off_val: str, on_val: str) -> dict:
    """Generic matched A/B: run *query* in INTERLEAVED fresh child
    processes with *env_var* set to off_val / on_val, best throughput
    per arm kept — the only drift-safe comparison shape on this host
    (BASELINE.md). Example:
    ``python bench.py --ab seenset_prune BENCH_SEENSET_BS 4096 32768``."""
    pool = {**BENCH_QUERIES, **EXTRA_QUERIES}
    if query not in pool:
        raise SystemExit(f"unknown bench query {query!r}; "
                         f"valid: {sorted(pool)}")
    arms = {"off": off_val, "on": on_val}
    legs = int(os.environ.get("BENCH_AB_LEGS", "3"))
    best: dict[str, dict] = {}
    for arm, val in [(a, v) for _ in range(max(legs, 1))
                     for a, v in arms.items()]:
        env = dict(os.environ, GRAFT_SF_DIR=sf_dir,
                   BENCH_PARTITIONS=str(PARTITIONS))
        env[env_var] = val
        env.setdefault("RAY_GRAFT_CPUS", str(NUM_CPUS))
        env.setdefault("BENCH_REPEAT", "2")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", query],
            env=env, capture_output=True, text=True, check=True)
        res = json.loads(proc.stdout.strip().splitlines()[-1])
        if arm not in best or (res["throughput"][query]
                               > best[arm]["throughput"][query]):
            best[arm] = res
    thr = {a: best[a]["throughput"][query] for a in arms}
    return {
        "metric": f"env A/B [{query}] {env_var}={off_val} vs {on_val} "
                  "(on/off throughput ratio)",
        "value": round(thr["on"] / thr["off"], 3),
        "unit": "ratio",
        "queries": {f"{query}_{a}_sec": best[a]["queries"][query]
                    for a in arms},
        "throughput_rows_per_sec": thr,
        "env_var": env_var,
        "arms": arms,
        "extras": {a: best[a].get("extras") for a in arms},
        "sf": sf_dir,
        "rows": best["on"]["rows"],
        "copies": COPIES,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
    elif "--ab" in sys.argv:
        i = sys.argv.index("--ab")
        try:
            q, var, off, on = sys.argv[i + 1:i + 5]
        except ValueError:
            raise SystemExit(
                "usage: bench.py --ab <query> <ENV_VAR> <off_val> <on_val>")
        print(json.dumps(run_env_ab(SF_DIR, q, var, off, on)))
    elif "--salting-ab" in sys.argv:
        rest = sys.argv[sys.argv.index("--salting-ab") + 1:]
        print(json.dumps(run_salting_ab(
            SF_DIR, rest[0] if rest else "caption_skewed")))
    elif "--child" in sys.argv:
        only = sys.argv[sys.argv.index("--child") + 1 :] or None
        print(json.dumps(run(SF_DIR, NUM_CPUS, only)))
    else:
        print(json.dumps(run(SF_DIR, NUM_CPUS)))
