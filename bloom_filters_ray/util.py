"""Shared Ray Data context helpers."""

from __future__ import annotations

import logging
import os


class _SchemaHashWarningFilter(logging.Filter):
    """Drop Ray Data's per-task "Failed to hash the schemas" warning:
    parquet files written by pandas carry b'pandas' schema metadata that
    pyarrow cannot hash (upstream quirk), and Ray's schema-dedup probe
    logs a harmless warning for every such block."""

    def filter(self, record: logging.LogRecord) -> bool:  # noqa: A003
        return "Failed to hash the schemas" not in record.getMessage()


def _silence_schema_hash_warning():
    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).addFilter(_SchemaHashWarningFilter())


def cluster_cpus(default: int = 8) -> int:
    """CPU count of the connected Ray cluster (or *default* if Ray is
    not initialised yet)."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:  # noqa: BLE001
        pass
    return int(os.environ.get("RAY_GRAFT_CPUS", default))


def ensure_hash_shuffle():
    """Switch the global DataContext to the hash-shuffle strategy
    (required for key-based ``repartition(keys=...)``; also the
    scale-friendly strategy for our groupbys) and size its default
    parallelism to the cluster instead of the 200-partition default —
    200 aggregator actors on an 8-CPU local node costs ~60s of actor
    startup per shuffle; on a real multi-node cluster the partition
    count should instead be set per-stage via ``num_partitions``.

    Must run before the datasets of a pipeline are *created* — each
    Dataset snapshots the context. Idempotent; never touches ray.init.
    """
    from ray.data.context import DataContext, ShuffleStrategy

    _silence_schema_hash_warning()
    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    cpus = cluster_cpus()
    ctx.default_hash_shuffle_parallelism = min(
        ctx.default_hash_shuffle_parallelism, max(cpus, 2))
    # Aggregator-actor count scales with the cluster (like reduce slots
    # on a real multi-node cluster) while the PARTITION count stays a
    # fixed pipeline property — shuffle structure is identical across
    # cluster sizes, only the resources executing it grow.
    env_aggs = os.environ.get("GRAFT_SHUFFLE_AGGREGATORS")
    aggs = int(env_aggs) if env_aggs else max(cpus // 2, 2)
    ctx.max_hash_shuffle_aggregators = min(ctx.max_hash_shuffle_aggregators,
                                           aggs)
    # Aggregator actors must not reserve whole CPUs: 8 actors x 1 CPU
    # deadlocks a 4-CPU cluster (actors pend forever, the shuffle never
    # starts). A small fractional reservation keeps them schedulable
    # everywhere; they are IO/merge-light relative to the map side.
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.05
    ctx.join_operator_actor_num_cpus_per_partition_override = 0.05
