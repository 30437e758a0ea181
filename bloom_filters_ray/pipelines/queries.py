"""Named engine queries + their DuckDB oracle SQL.

Each query is a callable ``fn(sf_dir) -> Dataset | pyarrow.Table``;
``ORACLES`` maps the same names to ANSI SQL that DuckDB can run on the
driver's pre-registered parquet views (documents, events, ...). Column
names/types match between the two sides — the driver's correctness gate
sorts columns by name and value-hashes them.

Queries without an oracle entry exercise non-SQL-expressible operators
(probabilistic sketches, LSH clustering); the driver records a weaker
rows-only check for those (see __ray_entry__.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import DEFAULT_SEED
from ..sources.synthetic import CORPUS_SQL, corpus_dataset
from ..stages.sketch_aggs import build_bloom, build_cms, build_hll, make_bloom_probe_fn
from ..stages.textstats import (make_fingerprint_fn, make_langid_fn,
                                make_quality_fn, make_token_stats_fn)
from ..util import ensure_hash_shuffle
from .dedup import DedupConfig, dedup_pipeline


def _docs(sf_dir: str, columns=None):
    import ray.data

    ensure_hash_shuffle()
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _caption_corpus(sf_dir: str):
    """Caption-side corpus (no image payloads: dedup/text queries never
    read pixel bytes — prune at the source)."""
    return corpus_dataset(sf_dir, with_bytes=False).select_columns(
        ["image_id", "caption", "w", "h", "fmt", "doc_id", "variant"])


# ---------------------------------------------------------------------------
# oracled queries
# ---------------------------------------------------------------------------

def q_corpus(sf_dir: str):
    """The synthetic corpus itself (caption-side columns) — validates
    the deterministic generator against its SQL twin."""
    return _caption_corpus(sf_dir)


def q_exact_dedup(sf_dir: str):
    """Exact-duplicate tier: hash-partitioned groupby on caption,
    min-id representative per group."""
    from .dedup import exact_tier

    cfg = DedupConfig()
    ds = corpus_dataset(sf_dir, with_bytes=False).select_columns(
        ["image_id", "caption"])
    return exact_tier(ds, cfg).select_columns(["image_id", "rep_id", "is_rep"])


def q_topk_captions(sf_dir: str):
    """Exact heavy hitters: top 20 captions by count (groupby + sort +
    limit; ties broken by caption for determinism)."""
    ds = _caption_corpus(sf_dir).select_columns(["caption"])
    counts = ds.groupby("caption").count().rename_columns({"count()": "cnt"})
    return counts.sort(["cnt", "caption"], descending=[True, False]).limit(20)


def q_distinct_captions(sf_dir: str):
    """Exact distinct-caption count (the HLL oracle twin)."""
    n = _caption_corpus(sf_dir).select_columns(["caption"]) \
        .groupby("caption").count().count()
    return pa.table({"n_unique": pa.array([n], type=pa.int64())})


def q_token_stats(sf_dir: str):
    """Per-image whitespace token count + unicode char count."""
    ds = _caption_corpus(sf_dir).select_columns(["image_id", "caption"])
    return ds.map_batches(make_token_stats_fn(), batch_format="pyarrow")


def q_lang_counts(sf_dir: str):
    """Plain-table groupby: documents per language tag."""
    return _docs(sf_dir, columns=["lang"]).groupby("lang").count() \
        .rename_columns({"count()": "cnt"})


def q_bloom_members(sf_dir: str):
    """Distributed Bloom build (per-block partials, bitwise-OR tree
    combine) then broadcast probe of every inserted id — Bloom filters
    have no false negatives, so the oracle is `present = TRUE`."""
    import ray

    ids = _caption_corpus(sf_dir).select_columns(["image_id"])
    n = ids.count()
    f = build_bloom(ids, on="image_id", capacity=max(n, 1), error_rate=0.01)
    ref = ray.put(f)
    return ids.map_batches(make_bloom_probe_fn(ref, "image_id"),
                           batch_format="pyarrow")


ORACLES: dict[str, str] = {
    "corpus": f"WITH {CORPUS_SQL} SELECT * FROM corpus",
    "exact_dedup": f"""
        WITH {CORPUS_SQL}
        SELECT image_id,
               min(image_id) OVER (PARTITION BY caption) AS rep_id,
               image_id = min(image_id) OVER (PARTITION BY caption) AS is_rep
        FROM corpus
    """,
    "topk_captions": f"""
        WITH {CORPUS_SQL}
        SELECT caption, count(*) AS cnt FROM corpus
        GROUP BY caption ORDER BY cnt DESC, caption LIMIT 20
    """,
    "distinct_captions": f"""
        WITH {CORPUS_SQL}
        SELECT count(DISTINCT caption) AS n_unique FROM corpus
    """,
    "token_stats": f"""
        WITH {CORPUS_SQL}
        SELECT image_id,
               CAST(CASE WHEN trim(caption) = '' THEN 0
                    ELSE length(regexp_split_to_array(trim(caption), ' +'))
                    END AS BIGINT) AS n_tokens,
               CAST(length(caption) AS BIGINT) AS n_chars
        FROM corpus
    """,
    "lang_counts": "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang",
    "bloom_members": f"""
        WITH {CORPUS_SQL}
        SELECT image_id, TRUE AS present FROM corpus
    """,
}


# ---------------------------------------------------------------------------
# non-SQL-expressible queries (rows-only driver check)
# ---------------------------------------------------------------------------

def q_neardup_clusters(sf_dir: str):
    """Flagship near-duplicate pipeline: exact tier + MinHash/LSH +
    verification + connected components → cluster assignments."""
    ds = corpus_dataset(sf_dir, with_bytes=False).select_columns(
        ["image_id", "caption"])
    assignments, _ = dedup_pipeline(ds, DedupConfig())
    return assignments


def q_hll_distinct_captions(sf_dir: str):
    """HyperLogLog estimate of distinct captions (register-max tree
    merge); compare against q_distinct_captions for accuracy."""
    ds = _caption_corpus(sf_dir).select_columns(["caption"])
    hll = build_hll(ds, on="caption", nb_registers=4096)
    return pa.table({"n_est": pa.array([float(hll.count())], type=pa.float64())})


def q_cms_caption_counts(sf_dir: str):
    """CMS-estimated frequency per distinct caption (count(x) >=
    true(x), <= true(x) + eps * N w.h.p.)."""
    ds = _caption_corpus(sf_dir).select_columns(["caption"])
    cms = build_cms(ds, on="caption", error_rate=1e-4)
    uniq = ds.groupby("caption").count().rename_columns({"count()": "true_cnt"})

    def probe(batch: pa.Table) -> pa.Table:
        col = batch["caption"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        est = cms.count_many(col)
        return batch.append_column("est_cnt", pa.array(est.astype(np.int64)))

    return uniq.map_batches(probe, batch_format="pyarrow")


def q_doc_quality(sf_dir: str):
    """Per-image quality-score components (C4/Gopher-style heuristics)."""
    ds = _caption_corpus(sf_dir).select_columns(["image_id", "caption"])
    return ds.map_batches(make_quality_fn(), batch_format="pyarrow")


def q_langid(sf_dir: str):
    """Stopword-profile language ID over document text."""
    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        make_langid_fn(), batch_format="pyarrow")


def q_fingerprints(sf_dir: str):
    """Winnowing fingerprints of captions (k=3 shingles, window=4)."""
    ds = _caption_corpus(sf_dir).select_columns(["image_id", "caption"])
    return ds.map_batches(make_fingerprint_fn(), batch_format="pyarrow")


QUERIES = {
    "corpus": q_corpus,
    "exact_dedup": q_exact_dedup,
    "topk_captions": q_topk_captions,
    "distinct_captions": q_distinct_captions,
    "token_stats": q_token_stats,
    "lang_counts": q_lang_counts,
    "bloom_members": q_bloom_members,
    "neardup_clusters": q_neardup_clusters,
    "hll_distinct_captions": q_hll_distinct_captions,
    "cms_caption_counts": q_cms_caption_counts,
    "doc_quality": q_doc_quality,
    "langid": q_langid,
    "fingerprints": q_fingerprints,
}
