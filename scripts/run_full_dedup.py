"""Production job entry point for the flagship dedup pipeline.

On a real cluster this is launched with the Ray job API (north_rule):

    ray job submit --working-dir . -- \
        python scripts/run_full_dedup.py \
            --input  /data/corpus/          \
            --output /data/dedup_out/       \
            --checkpoint-dir /data/ckpt/    \
            --cc distributed

The script OWNS no Ray session on a cluster: `ray job submit` runs it
inside the cluster's runtime where `ray.init()` auto-connects; locally
it falls back to a local session. Input is a directory of parquet (or
Lance, when the `lance` package is present — sources/io.py dispatches
by extension) with the input_hint schema (image_id, bytes, w, h, fmt,
caption, phash). Output: Hive-partitioned parquet of cluster
assignments (one directory per hash bucket of the rep id), plus a
stats/metrics JSON. Resume granularity: the expensive stages resume
from --checkpoint-dir; the final write is idempotent — a COMPLETE
prior run (marked by _STATS.json) is skipped entirely, a PARTIAL one
is replaced with mode="overwrite" so a crash mid-write never leaves
duplicated assignment rows in the partition dirs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="corpus directory (parquet/lance, input_hint schema)")
    ap.add_argument("--output", required=True,
                    help="output directory for assignment parquet")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="stage checkpoint directory (enables resume)")
    ap.add_argument("--partitions", type=int, default=None,
                    help="shuffle partitions (default ~1/CPU)")
    ap.add_argument("--cc", choices=("driver", "distributed"),
                    default="distributed",
                    help="clustering mode (distributed = no driver state)")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--phash-max-distance", type=int, default=4)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():  # ray job submit: already connected
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)

    from bloom_filters_ray.pipelines.dedup import DedupConfig
    from bloom_filters_ray.pipelines.full import (FullDedupConfig,
                                                  full_dedup_pipeline)
    from bloom_filters_ray.sources.io import read_corpus_table
    from bloom_filters_ray.util import ensure_hash_shuffle

    stats_path = os.path.join(args.output, "_STATS.json")
    if os.path.exists(stats_path):
        # _STATS.json is written only after a successful full write →
        # the output is complete; re-running is a no-op (idempotent).
        with open(stats_path) as f:
            prior = json.load(f)
        prior["skipped"] = "output already complete"
        print(json.dumps(prior))
        return 0

    ensure_hash_shuffle()
    cfg = FullDedupConfig(
        caption=DedupConfig(threshold=args.threshold,
                            num_partitions=args.partitions,
                            cc=args.cc),
        phash_max_distance=args.phash_max_distance,
        checkpoint_dir=args.checkpoint_dir,
    )
    ds = read_corpus_table(
        args.input, columns=["image_id", "bytes", "caption", "phash"])

    t0 = time.perf_counter()
    assignments, stats = full_dedup_pipeline(ds, cfg)
    # resumable output: partition by a hash bucket of the rep id so a
    # re-run overwrites per-partition files instead of one giant file
    import numpy as np
    import pyarrow as pa

    from bloom_filters_ray.hashing import xxh64_arrow

    def bucket(batch: pa.Table) -> pa.Table:
        col = batch["rep_id"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        b = (xxh64_arrow(col, 3) % np.uint64(256)).astype(np.int64)
        return batch.append_column("bucket", pa.array(b))

    # mode="overwrite": a partial dir from a crashed write is replaced,
    # never appended to (appending would silently duplicate rows).
    assignments.map_batches(bucket, batch_format="pyarrow") \
        .write_parquet(args.output, partition_cols=["bucket"],
                       mode="overwrite")
    stats["wall_sec"] = round(time.perf_counter() - t0, 3)
    with open(stats_path, "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
