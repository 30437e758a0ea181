"""Driver contract for the Ray-Data-native bloom_filters_ray engine.

The driver initialises Ray BEFORE importing this module; nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship near-duplicate detection + clustering pipeline
  on the sf0.001 synthetic image+caption corpus.
- ``queries()``: one callable per implemented operator/pipeline
  (SURVEY.md §2); each takes ``sf_dir`` and returns a Dataset /
  pyarrow.Table.
- ``oracle_sql()``: DuckDB-equivalent SQL for the SQL-expressible
  queries; sketch/LSH queries are rows-only by nature.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthetic
    image+caption corpus → exact (payload, caption) tier → MinHash/LSH
    caption tier + phash Hamming image tier → connected components →
    cluster assignments."""
    from bloom_filters_ray.pipelines.queries import q_full_neardup

    return q_full_neardup("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from bloom_filters_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from bloom_filters_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
