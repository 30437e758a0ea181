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
from ..sources.synthetic import CORPUS_SQL, EMB_ZEROED_SQL, corpus_dataset
from ..stages.sampling import PHI64
from ..stages.sketch_aggs import build_bloom, build_cms, build_hll, make_bloom_probe_fn
from ..stages.textstats import (LANG_PROFILES, make_fingerprint_fn,
                                make_langid_fn, make_quality_fn,
                                make_token_stats_fn)
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


def q_bpe_token_stats(sf_dir: str):
    """BPE-ish token counts per image (GPT-2-style pre-tokenization
    classes, one vectorized RE2 pass) — both this and the DuckDB
    oracle run the same RE2 pattern, so counts match exactly."""
    from ..stages.textstats import make_bpe_count_fn

    ds = _caption_corpus(sf_dir).select_columns(["image_id", "caption"])
    return ds.map_batches(make_bpe_count_fn(), batch_format="pyarrow")


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


def _stop_in(lang: str) -> str:
    """SQL IN-list literal of a LANG_PROFILES stopword profile — the
    oracle lists are generated from the same table the engine uses, so
    they cannot drift."""
    return ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])


# shared CTE body for the exact set-similarity queries: `jpairs` is
# (a, b, inter, uni) with 3-word-shingle Jaccard >= 4/5 (the SQL twin
# of stages/setsim.py: jaccard_pairs at tau=0.8, max_df=1024)
JACCARD_PAIRS_CTE = """docs AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), ' +') AS w
            FROM documents WHERE trim(text) <> ''),
        toks AS (SELECT DISTINCT doc_id, tok FROM (
                 SELECT doc_id,
                        w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS tok
                 FROM docs, unnest(range(1, len(w) - 1)) AS s(g)
                 UNION ALL
                 -- rows with 1..k-1 tokens yield ONE zero-padded
                 -- shingle in the engine (stages/shingle.py); the
                 -- joined-token string is its collision-free twin
                 SELECT doc_id, array_to_string(w, ' ') AS tok
                 FROM docs WHERE len(w) < 3)),
        sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
        cold AS (SELECT tok FROM toks GROUP BY tok HAVING count(*) <= 1024),
        co AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
               FROM toks a JOIN toks b
                    ON a.tok = b.tok AND a.doc_id < b.doc_id
               WHERE a.tok IN (SELECT tok FROM cold)
               GROUP BY 1, 2),
        jpairs AS (
            SELECT co.a, co.b, i AS inter, na.n + nb.n - i AS uni
            FROM co JOIN sizes na ON na.doc_id = co.a
                    JOIN sizes nb ON nb.doc_id = co.b
            WHERE 5 * i >= 4 * (na.n + nb.n - i))"""


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
    "token_quantiles": f"""
        WITH {CORPUS_SQL},
        tok AS (SELECT CAST(CASE WHEN trim(caption) = '' THEN 0
                     ELSE length(regexp_split_to_array(trim(caption), ' +'))
                     END AS BIGINT) AS v
                FROM corpus),
        h AS (SELECT v, count(*) AS c FROM tok GROUP BY 1),
        cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cc FROM h),
        n AS (SELECT count(*) AS n FROM tok),
        p AS (SELECT unnest([25, 50, 75, 95, 99]) AS pct)
        SELECT CAST(pct AS BIGINT) AS pct, CAST(min(v) AS BIGINT) AS q
        FROM p, cum, n
        WHERE cc >= (pct * n + 99) // 100
        GROUP BY pct
    """,
    "topk_sketch": f"""
        WITH {CORPUS_SQL},
        counts AS (SELECT caption AS value, count(*) AS frequency
                   FROM corpus GROUP BY caption)
        SELECT value, frequency,
               row_number() OVER (ORDER BY frequency DESC, value) AS rank
        FROM counts ORDER BY frequency DESC, value LIMIT 10
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
    "lang_distinct_docs": """
        SELECT lang, count(DISTINCT text) AS n_unique
        FROM documents GROUP BY lang
    """,
    "lang_top_texts": """
        SELECT lang, value, frequency, rank FROM (
            SELECT lang, text AS value, count(*) AS frequency,
                   CAST(row_number() OVER (
                       PARTITION BY lang
                       ORDER BY count(*) DESC, text) AS BIGINT) AS rank
            FROM documents GROUP BY lang, text
        ) WHERE rank <= 3
    """,
    "lang_token_quantiles": """
        WITH tok AS (
            SELECT lang, CAST(CASE WHEN trim(text) = '' THEN 0
                 ELSE length(regexp_split_to_array(trim(text), ' +'))
                 END AS BIGINT) AS v
            FROM documents),
        h AS (SELECT lang, v, count(*) AS c FROM tok GROUP BY 1, 2),
        cum AS (SELECT lang, v,
                       sum(c) OVER (PARTITION BY lang ORDER BY v) AS cc
                FROM h),
        n AS (SELECT lang, count(*) AS cnt FROM tok GROUP BY 1),
        p AS (SELECT unnest([50, 90, 99]) AS pct)
        SELECT cum.lang, CAST(pct AS BIGINT) AS pct,
               CAST(min(v) AS BIGINT) AS q
        FROM p CROSS JOIN cum JOIN n ON cum.lang = n.lang
        WHERE cc >= (pct * cnt + 99) // 100
        GROUP BY cum.lang, pct
    """,
    "stratified_sample": f"""
        WITH keyed AS (
            SELECT lang, doc_id, n_chars::DOUBLE AS weight,
                   ln(((xor(z, z >> 32) >> 11)::DOUBLE + 0.5)
                      * pow(2.0, -53)) / n_chars::DOUBLE AS skey
            FROM (SELECT lang, doc_id, n_chars,
                         (((doc_id::HUGEINT + 42) * {PHI64}::HUGEINT)
                          % 18446744073709551616::HUGEINT)::UBIGINT AS z
                  FROM documents WHERE n_chars > 0)
        )
        SELECT lang, doc_id, weight, rank FROM (
            SELECT lang, doc_id, weight,
                   CAST(row_number() OVER (
                       PARTITION BY lang
                       ORDER BY skey DESC, doc_id) AS BIGINT) AS rank
            FROM keyed
        ) WHERE rank <= 20
    """,
    # fib64(key, seed) twin: z = ((key+seed) * PHI64) mod 2^64 (the
    # HUGEINT product fits INT128 for any BIGINT key); h = z ^ (z>>32).
    "doc_splits": f"""
        SELECT doc_id, CAST(xor(z, z >> 32) % 10 AS BIGINT) AS split
        FROM (SELECT doc_id,
                     (((doc_id::HUGEINT + 42) * {PHI64}::HUGEINT)
                      % 18446744073709551616::HUGEINT)::UBIGINT AS z
              FROM documents)
    """,
    # A-ES weighted sample twin: u = ((h >> 11) + 0.5) * 2^-53,
    # key = ln(u)/w, global top-50 by key (ties by doc_id).
    "weighted_sample": f"""
        WITH keyed AS (
            SELECT doc_id, n_chars::DOUBLE AS weight,
                   ln(((xor(z, z >> 32) >> 11)::DOUBLE + 0.5)
                      * pow(2.0, -53)) / n_chars::DOUBLE AS skey
            FROM (SELECT doc_id, n_chars,
                         (((doc_id::HUGEINT + 42) * {PHI64}::HUGEINT)
                          % 18446744073709551616::HUGEINT)::UBIGINT AS z
                  FROM documents WHERE n_chars > 0)
        )
        SELECT CAST(row_number() OVER (ORDER BY skey DESC, doc_id)
                    AS BIGINT) AS rank,
               doc_id, weight
        FROM keyed ORDER BY skey DESC, doc_id LIMIT 50
    """,
    "bpe_token_stats": f"""
        WITH {CORPUS_SQL}
        SELECT image_id,
               CAST(len(regexp_extract_all(caption,
                    ' ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+')) AS BIGINT)
                   AS n_bpe_tokens
        FROM corpus
    """,
    "bloom_members": f"""
        WITH {CORPUS_SQL}
        SELECT image_id, TRUE AS present FROM corpus
    """,
    "quality_components": f"""
        WITH {CORPUS_SQL},
        tok AS (
            SELECT image_id,
                   unnest(regexp_split_to_array(lower(trim(caption)), ' +')) AS t
            FROM corpus WHERE trim(caption) <> ''
        ),
        sh AS (
            SELECT image_id, count(*) AS n
            FROM tok WHERE t IN ('the', 'of', 'and', 'to', 'in', 'is', 'it', 'you', 'that', 'he', 'was', 'for', 'on', 'are', 'as', 'with', 'his', 'they', 'at', 'be', 'this', 'have', 'from', 'or', 'one', 'had', 'by', 'but', 'not', 'what', 'all', 'were', 'we', 'when', 'your', 'can', 'there', 'an')
            GROUP BY image_id
        ),
        nt AS (SELECT image_id, count(*) AS n FROM tok GROUP BY image_id)
        SELECT c.image_id,
               CAST(coalesce(nt.n, 0) AS BIGINT) AS n_tokens,
               CAST(length(c.caption) AS BIGINT) AS n_chars,
               CAST(length(regexp_replace(c.caption, '[^A-Za-z]', '', 'g'))
                    AS BIGINT) AS n_alpha,
               CAST(length(regexp_replace(c.caption, '[^0-9]', '', 'g'))
                    AS BIGINT) AS n_digit,
               CAST(length(c.caption)
                    - length(regexp_replace(c.caption,
                                            '[!-/:-@[-`{{-~]', '', 'g'))
                    AS BIGINT) AS n_punct,
               CAST(coalesce(sh.n, 0) AS BIGINT) AS stop_hits
        FROM corpus c
        LEFT JOIN nt USING (image_id) LEFT JOIN sh USING (image_id)
    """,
    # doc_quality extends quality_components★ with the derived float
    # columns; every division/multiply is parenthesized exactly as the
    # numpy in make_quality_fn evaluates it (IEEE-754 ops are
    # deterministic given order, so the value-hash matches bit-for-bit)
    "doc_quality": f"""
        WITH {CORPUS_SQL},
        tok AS (
            SELECT image_id,
                   unnest(regexp_split_to_array(lower(trim(caption)), ' +')) AS t
            FROM corpus WHERE trim(caption) <> ''
        ),
        sh AS (
            SELECT image_id, count(*) AS n
            FROM tok WHERE t IN ({_stop_in('en')})
            GROUP BY image_id
        ),
        nt AS (SELECT image_id, count(*) AS n,
                      sum(length(t)) AS sum_len
               FROM tok GROUP BY image_id),
        base AS (
            SELECT c.image_id,
                   CAST(coalesce(nt.n, 0) AS BIGINT) AS n_tokens,
                   CAST(length(c.caption) AS BIGINT) AS n_chars,
                   CAST(length(regexp_replace(c.caption, '[^A-Za-z]', '', 'g'))
                        AS BIGINT) AS n_alpha,
                   CAST(length(regexp_replace(c.caption, '[^0-9]', '', 'g'))
                        AS BIGINT) AS n_digit,
                   CAST(length(c.caption)
                        - length(regexp_replace(c.caption,
                                                '[!-/:-@[-`{{-~]', '', 'g'))
                        AS BIGINT) AS n_punct,
                   CAST(coalesce(sh.n, 0) AS BIGINT) AS stop_hits,
                   CAST(coalesce(nt.sum_len, 0) AS BIGINT) AS sum_tok_len
            FROM corpus c
            LEFT JOIN nt USING (image_id) LEFT JOIN sh USING (image_id)
        ),
        derived AS (
            SELECT *,
                   CAST(sum_tok_len AS DOUBLE) / greatest(n_tokens, 1)
                       AS mean_token_len,
                   CAST(stop_hits AS DOUBLE) / greatest(n_tokens, 1)
                       AS stop_ratio,
                   CAST(n_alpha AS DOUBLE) / greatest(n_chars, 1)
                       AS alpha_ratio
            FROM base
        )
        SELECT image_id, n_tokens, n_chars, n_alpha, n_digit, n_punct,
               stop_hits, mean_token_len, stop_ratio, alpha_ratio,
               ((least(greatest(alpha_ratio / 0.6, 0), 1)
                 * least(greatest(mean_token_len / 3.0, 0), 1))
                * least(greatest((15 - mean_token_len) / 5.0, 0), 1))
               * (least(greatest(n_tokens / 5.0, 0), 1)
                  * least(greatest((512 - n_tokens) / 256.0, 0), 1))
                   AS quality
        FROM derived
    """,
    # langid: per-profile stopword hit counts, argmax with ties broken
    # by profile order (en, de, fr, es) exactly as np.argmax picks the
    # first maximum; 'und' when the best profile has < 1 hit
    "langid": f"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), ' +')) AS t
            FROM documents WHERE trim(text) <> ''
        ),
        nt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        hits AS (
            SELECT doc_id,
                   count(*) FILTER (WHERE t IN ({_stop_in('en')})) AS r_en,
                   count(*) FILTER (WHERE t IN ({_stop_in('de')})) AS r_de,
                   count(*) FILTER (WHERE t IN ({_stop_in('fr')})) AS r_fr,
                   count(*) FILTER (WHERE t IN ({_stop_in('es')})) AS r_es
            FROM tok GROUP BY doc_id
        ),
        h AS (
            SELECT d.doc_id,
                   coalesce(r_en, 0) AS h_en, coalesce(r_de, 0) AS h_de,
                   coalesce(r_fr, 0) AS h_fr, coalesce(r_es, 0) AS h_es,
                   greatest(coalesce(nt.n, 0), 1) AS n_tok
            FROM documents d
            LEFT JOIN hits USING (doc_id) LEFT JOIN nt USING (doc_id)
        )
        SELECT doc_id,
               CASE WHEN greatest(h_en, h_de, h_fr, h_es) < 1 THEN 'und'
                    WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es
                        THEN 'en'
                    WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
                    WHEN h_fr >= h_es THEN 'fr'
                    ELSE 'es' END AS lang,
               CAST(greatest(h_en, h_de, h_fr, h_es) AS DOUBLE) / n_tok
                   AS lang_score
        FROM h
    """,
    "events_window": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS cnt,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events GROUP BY 1, 2
    """,
    "lineitem_agg": """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt,
               CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_qty_cents,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_price_cents
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY 1, 2
    """,
    "nation_revenue": """
        SELECT n_name, count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1
    """,
    "priority_revenue": """
        SELECT o_orderpriority, count(*) AS n_items,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    "urgent_customer_segments": """
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_orderpriority = '1-URGENT')
        GROUP BY 1
    """,
    "never_urgent_segments": """
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
        GROUP BY 1
    """,
    "segment_priority_revenue": """
        SELECT c_mktsegment, o_orderpriority, count(*) AS n_items,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    """,
    "asof_prev_click": """
        SELECT l.event_id,
               r.event_id AS prev_click_id,
               epoch_us(l.ts) - epoch_us(r.ts) AS gap_us
        FROM (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'purchase') l
        ASOF JOIN (SELECT user_id, ts, event_id FROM events
                   WHERE event_type = 'click') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "clicks_before_purchase": """
        SELECT l.event_id,
               count(r.event_id) AS n_prior_clicks
        FROM (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'purchase') l
        LEFT JOIN (SELECT user_id, ts, event_id FROM events
                   WHERE event_type = 'click') r
          ON l.user_id = r.user_id
         AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts < l.ts
        GROUP BY l.event_id
    """,
    "top_events_per_user": """
        SELECT user_id, event_id, rk FROM (
            SELECT user_id, event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC) AS rk
            FROM events) WHERE rk <= 3
    """,
    "events_hopping": """
        WITH e AS (
            SELECT epoch_us(ts) AS tus, event_type,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events)
        SELECT make_timestamp((tus // 1800000000 - g) * 1800000000)
                   AS window_start,
               event_type, count(*) AS cnt,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM e, unnest(range(0, 2)) AS s(g)
        GROUP BY 1, 2
    """,
    "user_sessions": """
        WITH e AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 6 HOUR
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) - 1
                       AS session_idx
            FROM e
        )
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               count(*) AS n_events,
               min(ts) AS start_ts, max(ts) AS end_ts
        FROM s GROUP BY 1, 2
    """,
    "xor_members": f"""
        WITH {CORPUS_SQL}
        SELECT min(image_id) AS image_id, TRUE AS present
        FROM corpus GROUP BY caption
    """,
    "cuckoo_members": f"""
        WITH {CORPUS_SQL}
        SELECT min(image_id) AS image_id, TRUE AS present
        FROM corpus GROUP BY caption
    """,
    "ngram_jaccard": """
        WITH pairs AS (
            SELECT doc_id, trim(text) AS a,
                   regexp_replace(trim(text), ' [^ ]*$', '') AS b
            FROM documents
        ),
        ta AS (SELECT DISTINCT doc_id,
                      unnest(regexp_split_to_array(lower(a), ' +')) AS tok
               FROM pairs),
        tb AS (SELECT DISTINCT doc_id,
                      unnest(regexp_split_to_array(lower(b), ' +')) AS tok
               FROM pairs),
        na AS (SELECT doc_id, count(*) AS n FROM ta GROUP BY doc_id),
        nu AS (SELECT doc_id, count(*) AS n
               FROM (SELECT doc_id, tok FROM ta UNION
                     SELECT doc_id, tok FROM tb) GROUP BY doc_id),
        nb AS (SELECT doc_id, count(*) AS n FROM tb GROUP BY doc_id)
        SELECT na.doc_id,
               CAST(na.n + nb.n - nu.n AS DOUBLE) / nu.n AS jaccard
        FROM na JOIN nb USING (doc_id) JOIN nu USING (doc_id)
    """,
    "substring_dups": f"""
        WITH {CORPUS_SQL},
        uniq AS (SELECT caption, min(image_id) AS image_id
                 FROM corpus GROUP BY caption)
        SELECT a.image_id,
               EXISTS (SELECT 1 FROM uniq b
                       WHERE b.caption <> a.caption
                         AND contains(b.caption, a.caption)) AS contained
        FROM uniq a
    """,
    "jaccard_dup_pairs": f"""
        WITH {JACCARD_PAIRS_CTE}
        SELECT a, b, inter, uni FROM jpairs
    """,
    "jaccard_dup_clusters": f"""
        WITH RECURSIVE {JACCARD_PAIRS_CTE},
        edges AS (SELECT a, b FROM jpairs
                  UNION ALL SELECT b AS a, a AS b FROM jpairs),
        reach(n, m) AS (
            SELECT a AS n, b AS m FROM edges
            UNION
            SELECT r.n, e.b AS m FROM reach r JOIN edges e ON r.m = e.a
        )
        SELECT n AS doc_id, least(n, min(m)) AS cluster_id
        FROM reach GROUP BY n
    """,
    "emb_dup_pairs": f"""
        WITH {EMB_ZEROED_SQL}
        SELECT a.emb_id AS a, b.emb_id AS b
        FROM zeroed_variants a JOIN zeroed_variants b ON a.emb_id < b.emb_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
    """,
    "ann_topk": """
        SELECT qid AS query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT q.vec_id AS qid, e.vec_id AS neighbor_id,
                   list_cosine_similarity(q.embedding, e.embedding) AS sim,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding, e.embedding)
                                DESC, e.vec_id) AS rank
            FROM embeddings q, embeddings e
            WHERE q.vec_id < 5 AND e.vec_id != q.vec_id
        ) WHERE rank <= 10
    """,
    # IVF at nprobe == n_centroids scans every inverted list, so the
    # result is provably the exact brute-force top-k — same SQL twin
    # as ann_topk (this puts the IVF machinery itself under the hard
    # value-hash gate; partial-probe recall stays a rows-only check).
    "ann_ivf_exact": """
        SELECT qid AS query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT q.vec_id AS qid, e.vec_id AS neighbor_id,
                   list_cosine_similarity(q.embedding, e.embedding) AS sim,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding, e.embedding)
                                DESC, e.vec_id) AS rank
            FROM embeddings q, embeddings e
            WHERE q.vec_id < 5 AND e.vec_id != q.vec_id
        ) WHERE rank <= 10
    """,
}


# ---------------------------------------------------------------------------
# non-SQL-expressible queries (rows-only driver check)
# ---------------------------------------------------------------------------

def q_full_neardup(sf_dir: str):
    """North-star flagship: combined image+caption near-dup clustering
    (exact payload+caption tier, MinHash/LSH caption tier, phash
    Hamming tier, union-find over both edge streams)."""
    from .full import FullDedupConfig, full_dedup_pipeline

    ds = corpus_dataset(sf_dir, with_bytes=True).select_columns(
        ["image_id", "bytes", "caption", "phash"])
    assignments, _ = full_dedup_pipeline(ds, FullDedupConfig())
    return assignments


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
    """Per-image quality-score components (C4/Gopher-style heuristics).
    Hard-oracled: the SQL twin reproduces the float columns bit-exactly
    by mirroring the numpy evaluation order (IEEE ops are deterministic
    given operand order)."""
    ds = _caption_corpus(sf_dir).select_columns(["image_id", "caption"])
    return ds.map_batches(make_quality_fn(), batch_format="pyarrow")


def q_langid(sf_dir: str):
    """Stopword-profile language ID over document text. Hard-oracled:
    argmax tie-break (profile order) and the score division are both
    SQL-reproducible."""
    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        make_langid_fn(), batch_format="pyarrow")


def q_fingerprints(sf_dir: str):
    """Winnowing fingerprints of captions (k=3 shingles, window=4)."""
    ds = _caption_corpus(sf_dir).select_columns(["image_id", "caption"])
    return ds.map_batches(make_fingerprint_fn(), batch_format="pyarrow")


def q_quality_components(sf_dir: str):
    """Integer quality-score components (exact-arithmetic subset of
    q_doc_quality, SQL-oracle friendly): token/char/alpha/digit/punct
    counts + English-stopword hits per image."""
    from ..stages.textstats import make_quality_fn

    ds = _caption_corpus(sf_dir).select_columns(["image_id", "caption"])
    out = ds.map_batches(make_quality_fn(), batch_format="pyarrow")
    return out.select_columns(["image_id", "n_tokens", "n_chars", "n_alpha",
                               "n_digit", "n_punct", "stop_hits"])


def q_text_simhash(sf_dir: str):
    """SimHash codes of caption shingle sets (Charikar
    sign-of-weighted-sums; stages/simhash.py) — the text-side 64-bit
    code the Hamming banding machinery consumes."""
    from ..stages.simhash import make_text_simhash_fn

    ds = _caption_corpus(sf_dir).select_columns(["image_id", "caption"])
    return ds.map_batches(make_text_simhash_fn(), batch_format="pyarrow")


def q_image_simhash(sf_dir: str):
    """SimHash over decoded pixel features (quantized pooled cells) —
    the image-side 64-bit code alternative to phash; feeds the same
    Hamming banding machinery."""
    from ..stages.simhash import make_image_simhash_fn

    ds = corpus_dataset(sf_dir, with_bytes=True).select_columns(
        ["image_id", "bytes", "w", "h", "fmt"])
    return ds.map_batches(make_image_simhash_fn(), batch_format="pyarrow",
                          batch_size=256)


def q_image_dctphash(sf_dir: str):
    """DCT perceptual hash recomputed from decoded pixels (actor-pool
    decode → bilinear 32×32 luma → ONE batched 2-D orthonormal DCT per
    batch → median-threshold 8×8 low block): the classic pHash, the
    higher-robustness alternative to the source's average hash; feeds
    the same Hamming banding machinery (stages/multimodal.py:
    PhashStage(kind='dct'))."""
    from ..stages.multimodal import PhashStage

    ds = corpus_dataset(sf_dir, with_bytes=True).select_columns(
        ["image_id", "bytes", "w", "h", "fmt"])
    return ds.map_batches(PhashStage(kind="dct"), batch_format="pyarrow",
                          batch_size=256, concurrency=4) \
        .select_columns(["image_id", "phash"])


def q_simhash_neardup(sf_dir: str):
    """SimHash caption near-dup clustering: exact tier → 64-bit text
    SimHash codes → pigeonhole Hamming banding (codes travel with band
    rows, in-bucket vectorized verification ≤ 7 bits — the 8-band
    pigeonhole guarantee) → distributed star-contraction labels → join
    assignment. The text-side twin of the phash image tier — one
    shuffle for the exact tier, one for the band buckets, nothing
    driver-side. SimHash is deliberately tighter than the MinHash
    tier: it catches small token-level edits (~91%% of the planted
    drop-last-word variants here), while MinHash/LSH covers the
    Jaccard ≥ 0.8 range — the engine ships both."""
    from ..stages.simhash import (make_bucket_hamming_emitter,
                                  make_code_band_rows_with_code,
                                  make_text_simhash_fn)
    from .dedup import assign_clusters_distributed, exact_tier

    cfg = DedupConfig()
    ds = corpus_dataset(sf_dir, with_bytes=False).select_columns(
        ["image_id", "caption"])
    exact = exact_tier(ds, cfg).materialize()
    reps = exact.filter(expr="is_rep == True") \
        .select_columns(["image_id", "caption"])
    codes = reps.map_batches(make_text_simhash_fn(), batch_format="pyarrow")
    bands = codes.map_batches(
        make_code_band_rows_with_code("simhash", cfg.id_col, 8, cfg.seed),
        batch_format="pyarrow")
    bands = bands.repartition(cfg.partitions(), keys=["band_key"])
    edges = bands.map_batches(
        make_bucket_hamming_emitter(cfg.id_col, max_distance=7),
        batch_format="pyarrow", batch_size=None).select_columns(["a", "b"])
    assignments, _ = assign_clusters_distributed(exact, edges, cfg)
    return assignments


def q_events_window(sf_dir: str):
    """Tumbling 1-hour windowed aggregate over the events stream table:
    count + exact integer-cents sum per (window, event_type). Sums in
    int64 cents so the distributed sum is order-independent (float sums
    are not associative)."""
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count, Sum

    ensure_hash_shuffle()

    def fn(batch: pa.Table) -> pa.Table:
        ts = batch["ts"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        win = pc.floor_temporal(ts, unit="hour")
        v = batch["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        return pa.Table.from_arrays(
            [win, batch["event_type"], pa.array(cents)],
            names=["window_start", "event_type", "cents"])

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])
    ds = ds.map_batches(fn, batch_format="pyarrow")
    out = ds.groupby(["window_start", "event_type"])         .aggregate(Count(), Sum("cents"))
    return out.rename_columns({"count()": "cnt", "sum(cents)": "sum_cents"})


def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1-shaped wide aggregate over lineitem: per
    (returnflag, linestatus) for rows shipped up to the cutoff —
    count + integer-cents sums of quantity and extendedprice.
    Column-pruned, predicate-pushdown read (only 5 of 11 columns and
    the matching row groups leave storage); sums in int64 cents so
    the distributed reduction is order-independent."""
    import datetime as dt

    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count, Sum

    ensure_hash_shuffle()
    cutoff = dt.datetime(1998, 9, 2)

    def fn(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [batch["l_returnflag"], batch["l_linestatus"],
             pa.array(np.floor(q * 100 + 0.5).astype(np.int64)),
             pa.array(np.floor(p * 100 + 0.5).astype(np.int64))],
            names=["l_returnflag", "l_linestatus", "qty_cents",
                   "price_cents"])

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_shipdate"],
        filter=pc.field("l_shipdate") <= pc.scalar(cutoff))
    out = ds.map_batches(fn, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]) \
        .aggregate(Count(), Sum("qty_cents"), Sum("price_cents"))
    return out.rename_columns({"count()": "cnt",
                               "sum(qty_cents)": "sum_qty_cents",
                               "sum(price_cents)": "sum_price_cents"})


def q_nation_revenue(sf_dir: str):
    """Star-schema broadcast join: orders ⋈ customer ⋈ nation →
    integer-cents revenue per nation name. The two dimension tables
    ship once via ``ray.put`` (sorted-key numpy lookup inside the
    map — the broadcast-join pattern for small sides), the fact table
    streams; one small groupby shuffle at the end."""
    import ray
    import ray.data
    from ray.data.aggregate import Count, Sum

    ensure_hash_shuffle()
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    ck = cust["c_custkey"].to_numpy().astype(np.int64)
    order_ck = np.argsort(ck)
    nk = nat["n_nationkey"].to_numpy().astype(np.int64)
    order_nk = np.argsort(nk)
    side = (ck[order_ck],
            cust["c_nationkey"].to_numpy().astype(np.int64)[order_ck],
            nk[order_nk],
            np.asarray(nat["n_name"].to_pylist(), dtype=object)[order_nk])
    ref = ray.put(side)

    def fn(batch: pa.Table) -> pa.Table:
        from ..stages.sketch_aggs import _plain_fetch

        cks, cnation, nks, nname = _plain_fetch(ref)
        o_ck = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.searchsorted(cks, o_ck)
        if not (cks[np.minimum(pos, len(cks) - 1)] == o_ck).all():
            raise KeyError("orders.o_custkey missing from customer")
        nkey = cnation[pos]
        npos = np.searchsorted(nks, nkey)
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array(nname[npos], type=pa.string()),
            "price_cents": pa.array(
                np.floor(price * 100 + 0.5).astype(np.int64)),
        })

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_totalprice"])
    out = ds.map_batches(fn, batch_format="pyarrow") \
        .groupby("n_name").aggregate(Count(), Sum("price_cents"))
    return out.rename_columns({"count()": "n_orders",
                               "sum(price_cents)": "revenue_cents"})


def q_priority_revenue(sf_dir: str):
    """Fact-to-fact distributed hash join: lineitem ⋈ orders on
    orderkey (both sides big — no broadcast), then integer-cents
    revenue per order priority. Column-pruned reads; the join and the
    final groupby are separate executions (two concurrent hash-shuffle
    operators in one lineage serialize — see CLAUDE.md)."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    from ..util import cluster_cpus

    ensure_hash_shuffle()
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_extendedprice"])

    def cents(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "price_cents": pa.array(
                np.floor(p * 100 + 0.5).astype(np.int64)),
        })

    li = li.map_batches(cents, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"])
    joined = li.join(orders, "inner", max(8, cluster_cpus()),
                     on=("l_orderkey",), right_on=("o_orderkey",)) \
        .materialize()
    out = joined.groupby("o_orderpriority") \
        .aggregate(Count(), Sum("price_cents"))
    return out.rename_columns({"count()": "n_items",
                               "sum(price_cents)": "revenue_cents"})


def q_urgent_customer_segments(sf_dir: str,
                               broadcast_limit: int = 2_000_000):
    """Bloom-accelerated semi-join: customers with ≥1 URGENT order,
    counted per market segment. The Bloom filter over the urgent
    orders' custkeys (distributed OR-merge build, KBs of state) prunes
    the probe side first — "not in filter" is a DEFINITE negative (no
    false negatives), so only the ~1% false-positive residue plus the
    true members reach the exact check. The exact side is GATED on the
    distinct-key count: at or below ``broadcast_limit`` it is a
    broadcast sorted int64 array (vectorized collect, searchsorted
    probe); above it NOTHING is collected to the driver — the
    bloom-pruned customers hash-join the distributed distinct-key set
    instead (same switch shape as pipelines/dedup.py's band tier).
    This is the classic sketch pushdown the engine's Bloom tier gives
    an analytics plan for free."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    from ..stages.sketch_aggs import _plain_fetch
    from ..util import cluster_cpus

    ensure_hash_shuffle()
    urgent = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
        filter=pc.field("o_orderpriority") == pc.scalar("1-URGENT"))

    def keyfn(batch: pa.Table) -> pa.Table:
        return pa.table({"k": pc.cast(batch["o_custkey"], pa.string())})

    keys = urgent.map_batches(keyfn, batch_format="pyarrow").materialize()
    n = keys.count()
    f = build_bloom(keys, on="k", capacity=max(n, 1), error_rate=0.01)
    # exact side: distinct urgent custkeys (bounded by the customer
    # table, the small side) — distributed distinct
    distinct = keys.groupby("k").count().materialize()
    n_distinct = distinct.count()
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])

    if n_distinct <= broadcast_limit:
        # small side: vectorized driver collect + broadcast probe
        parts = [pc.cast(b["k"], pa.int64()).to_numpy(zero_copy_only=False)
                 for b in distinct.iter_batches(batch_size=1 << 16,
                                                batch_format="pyarrow")]
        dk = np.sort(np.concatenate(parts)) if parts \
            else np.empty(0, dtype=np.int64)
        side_ref = ray.put((f, dk))

        def probe(batch: pa.Table) -> pa.Table:
            blm, exact = _plain_fetch(side_ref)
            ck = batch["c_custkey"]
            if isinstance(ck, pa.ChunkedArray):
                ck = ck.combine_chunks()
            maybe = blm.has_many(pc.cast(ck, pa.string()))
            ck_np = ck.to_numpy(zero_copy_only=False).astype(np.int64)
            verified = np.zeros(len(ck_np), dtype=bool)
            if maybe.any():  # exact check ONLY on the bloom+ residue
                cand = ck_np[maybe]
                pos = np.minimum(np.searchsorted(exact, cand),
                                 max(len(exact) - 1, 0))
                ok = exact[pos] == cand if len(exact) else \
                    np.zeros(len(cand), dtype=bool)
                verified[np.flatnonzero(maybe)[ok]] = True
            return batch.filter(pa.array(verified))

        pruned = cust.map_batches(probe, batch_format="pyarrow")
    else:
        # big side: broadcast ONLY the Bloom filter (KBs); the exact
        # residue check is a distributed hash join against the
        # distinct-key dataset — no driver collect at any size
        bref = ray.put(f)

        def bloom_prune(batch: pa.Table) -> pa.Table:
            blm = _plain_fetch(bref)
            ck = batch["c_custkey"]
            if isinstance(ck, pa.ChunkedArray):
                ck = ck.combine_chunks()
            maybe = blm.has_many(pc.cast(ck, pa.string()))
            return batch.filter(pa.array(maybe))

        def to_int(batch: pa.Table) -> pa.Table:
            return pa.table({"uk": pc.cast(batch["k"], pa.int64())})

        keys_int = distinct.map_batches(to_int, batch_format="pyarrow") \
            .materialize()
        pruned = cust.map_batches(bloom_prune, batch_format="pyarrow") \
            .materialize() \
            .join(keys_int, "inner", max(8, cluster_cpus()),
                  on=("c_custkey",), right_on=("uk",)) \
            .materialize()

    out = pruned.groupby("c_mktsegment").count()
    return out.rename_columns({"count()": "n_customers"})


def q_lang_distinct_docs(sf_dir: str):
    """Exact distinct-text count per language: two-level distinct —
    groupby (lang, text) dedups, then a per-lang count. The two keyed
    shuffles are MATERIALIZED apart (two keyed repartitions fused into
    one lineage serialize behind one worker — see CLAUDE.md)."""
    ensure_hash_shuffle()
    distinct = _docs(sf_dir, columns=["lang", "text"]) \
        .groupby(["lang", "text"]).count().materialize()
    out = distinct.select_columns(["lang"]).groupby("lang").count()
    return out.rename_columns({"count()": "n_unique"})


def q_lang_distinct_hll(sf_dir: str):
    """Sketch-PER-GROUP: one HyperLogLog per language via
    groupby(lang).aggregate(HLLAgg) — per-group register sets build as
    mergeable partials inside the hash shuffle, then a tiny map
    decodes each group's estimate. At 100 TB this is THE shape for
    per-slice cardinality diagnostics (fixed sketch state per group,
    never the values). Approximate (rows-only); the exact twin is
    q_lang_distinct_docs★, and the ≤3σ accuracy contract is pinned in
    tests."""
    import pickle

    from ..stages.sketch_aggs import HLLAgg

    ensure_hash_shuffle()
    agg = _docs(sf_dir, columns=["lang", "text"]) \
        .groupby("lang").aggregate(HLLAgg(on="text"))

    def decode(batch: pa.Table) -> pa.Table:
        ests = [int(round(pickle.loads(b).count()))
                for b in batch["hll"].to_pylist()]
        return pa.table({"lang": batch["lang"],
                         "n_unique_est": pa.array(ests, type=pa.int64())})

    return agg.map_batches(decode, batch_format="pyarrow")


def q_lang_top_texts(sf_dir: str):
    """TopK sketch PER GROUP — the per-slice heavy-hitters complement
    of q_lang_distinct_hll's per-group HLL: one (CMS, candidate-heap)
    TopK partial per language via groupby(lang).aggregate(TopKAgg),
    merged inside the hash shuffle (only fixed-size sketch state
    moves), then a tiny decode explodes each group's top-3 into
    (lang, value, frequency, rank) rows. HARD-oracled in the same
    exactness regime as topk_sketch★: CMS 27k cols × 7 rows
    (accuracy=e^-7) far above the per-lang distinct-text count and
    candidates_per_block above the per-block distinct count make the
    estimates exact and the (freq desc, value) ranking identical to
    the SQL twin's row_number()."""
    import math
    import pickle

    from ..stages.sketch_aggs import TopKAgg

    ensure_hash_shuffle()
    agg = _docs(sf_dir, columns=["lang", "text"]) \
        .groupby("lang").aggregate(TopKAgg(
            on="text", k=3, accuracy=math.exp(-7),
            candidates_per_block=8192))

    def decode(batch: pa.Table) -> pa.Table:
        langs, vals, freqs, ranks = [], [], [], []
        for lang, blob in zip(batch["lang"].to_pylist(),
                              batch["topk"].to_pylist()):
            for t in pickle.loads(blob):
                langs.append(lang)
                vals.append(t["value"])
                freqs.append(t["frequency"])
                ranks.append(t["rank"])
        return pa.table({
            "lang": pa.array(langs, type=pa.string()),
            "value": pa.array(vals, type=pa.string()),
            "frequency": pa.array(freqs, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
        })

    return agg.map_batches(decode, batch_format="pyarrow")


def q_lang_token_quantiles(sf_dir: str):
    """Per-GROUP exact percentiles: p50/p90/p99 of the per-document
    whitespace token count, per language (stages/quantiles.py:
    exact_int_quantiles_by — one (lang, n_tokens, count) histogram
    shuffle, vectorized driver scan). Same integer-exact threshold
    definition as token_quantiles★, partitioned by group in both the
    engine and the SQL twin."""
    from ..stages.quantiles import exact_int_quantiles_by

    ds = _docs(sf_dir, columns=["lang", "text"]) \
        .map_batches(make_token_stats_fn(id_col="lang", text_col="text"),
                     batch_format="pyarrow") \
        .select_columns(["lang", "n_tokens"])
    return exact_int_quantiles_by(ds, "lang", "n_tokens", [50, 90, 99])


def q_doc_splits(sf_dir: str):
    """Deterministic train/val/test split assignment (stages/
    sampling.py: hash_split) — split = fib64(doc_id, seed) % 10, a
    pure per-row multiply-shift hash of row CONTENT. No shuffle, no
    state: streams at any scale, and a doc keeps its split id under
    repartitioning, reruns, and corpus growth. HARD-oracled: the SQL
    twin runs the identical INT128 multiply-mod-2^64 + xor-shift in
    DuckDB, so every one of the rows' split ids is value-checked."""
    from ..stages.sampling import hash_split

    ds = _docs(sf_dir, columns=["doc_id"])
    return hash_split(ds, "doc_id", n_splits=10, seed=42)


def q_weighted_sample(sf_dir: str):
    """Distributed weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES, stages/sampling.py): rank rows by ln(u)/w with
    u = uniform01(fib64(doc_id, seed)), keep the global top-50 —
    block-local top-k partials mean at most k rows leave each block
    (no shuffle at all). HARD-oracled via the fib64 hasher: DuckDB
    recomputes the exact ranking keys (1-ulp log differences vs a
    ~1e-10 adjacent-key gap — ordering-safe, see sampling.py) and the
    compared columns (rank, doc_id, weight) are integer-exact.
    fib64 trades cross-row independence for SQL reproducibility
    (see sampling.py's statistical caveat); production sampling
    uses the default xxh64 hasher, whose k=1 inclusion-probability
    law is pinned in tests."""
    from ..stages.sampling import weighted_sample_k

    ds = _docs(sf_dir, columns=["doc_id", "n_chars"]) \
        .rename_columns({"n_chars": "weight"})
    return weighted_sample_k(ds, "doc_id", "weight", k=50, seed=42,
                             hasher="fib64")


def q_stratified_sample(sf_dir: str):
    """Stratified (per-group) weighted sample without replacement: the
    A-ES top-20 documents per language (stages/sampling.py:
    stratified_sample_k) — block-local per-group top-k partials, ONE
    keyed repartition of at most k rows per group per block, final
    rank. The balanced-per-slice training-sample shape. HARD-oracled
    like weighted_sample★: fib64 keys recomputed exactly in DuckDB,
    twin is row_number() OVER (PARTITION BY lang ORDER BY key)."""
    from ..stages.sampling import stratified_sample_k

    ds = _docs(sf_dir, columns=["lang", "doc_id", "n_chars"]) \
        .rename_columns({"n_chars": "weight"})
    return stratified_sample_k(ds, "lang", "doc_id", "weight", k=20,
                               seed=42, hasher="fib64")


def q_never_urgent_segments(sf_dir: str):
    """Distributed LEFT ANTI join: customers with NO urgent order,
    counted per market segment — left_outer hash join against the
    distinct urgent custkeys, keep the null (unmatched) side. The
    anti-join is the dedup-adjacent plan shape (new-rows-only
    filtering) that Bloom filters canNOT serve alone (a sketch has
    false positives, so 'definitely absent' needs the exact join);
    it is the exact complement of q_urgent_customer_segments'
    semi-join (per-segment counts sum to the customer totals).
    Returned as a schema-stable Arrow table so an empty result keeps
    its columns."""
    import pyarrow.compute as pc
    import ray.data

    from ..util import cluster_cpus

    ensure_hash_shuffle()
    okeys = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
        filter=pc.field("o_orderpriority") == pc.scalar("1-URGENT")) \
        .groupby("o_custkey").count().materialize()
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    joined = cust.join(okeys, "left_outer", max(8, cluster_cpus()),
                       on=("c_custkey",), right_on=("o_custkey",)) \
        .materialize()

    def keep_unmatched(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_null(batch["count()"])) \
            .select(["c_mktsegment"])

    out = joined.map_batches(keep_unmatched, batch_format="pyarrow") \
        .groupby("c_mktsegment").count() \
        .rename_columns({"count()": "n_customers"})
    schema = pa.schema([("c_mktsegment", pa.string()),
                        ("n_customers", pa.int64())])
    parts = [b.cast(schema) for b in out.iter_batches(
        batch_size=1 << 16, batch_format="pyarrow")]
    return pa.concat_tables(parts) if parts else schema.empty_table()


def q_asof_prev_click(sf_dir: str):
    """Distributed AS-OF join (stages/windows.py): each purchase event
    matched to the same user's most recent click at or before it —
    ONE read pass tags both sides out of the stream
    (make_type_tag_fn: half the read I/O of two filtered scans at
    100 TB), one keyed shuffle, whole-block vectorized matcher,
    integer-µs gap. The DuckDB twin is a literal ASOF JOIN. (key, ts)
    is unique in the events corpus, so matching is deterministic."""
    import pyarrow.compute as pc
    import ray.data

    from ..stages.windows import asof_join_tagged, make_type_tag_fn

    ensure_hash_shuffle()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
        filter=pc.field("event_type").isin(["purchase", "click"]))
    tagged = ds.map_batches(make_type_tag_fn("purchase", "click"),
                            batch_format="pyarrow")
    out = asof_join_tagged(tagged)
    return out.rename_columns({"prev_id": "prev_click_id"})


def q_clicks_before_purchase(sf_dir: str):
    """Distributed RANGE-count join (stages/windows.py): for each
    purchase event, how many same-user clicks happened in the hour
    before it ([ts−1h, ts)). ONE read pass tags both sides, one keyed
    shuffle, then the sort/cumsum block kernel — the interval-join
    pattern without an interval join operator."""
    import pyarrow.compute as pc
    import ray.data

    from ..stages.windows import (make_type_tag_fn,
                                  range_count_join_tagged)

    ensure_hash_shuffle()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
        filter=pc.field("event_type").isin(["purchase", "click"]))
    tagged = ds.map_batches(make_type_tag_fn("purchase", "click"),
                            batch_format="pyarrow")
    out = range_count_join_tagged(tagged, window_us=3600 * 1_000_000)
    return out.rename_columns({"n_prior": "n_prior_clicks"})


def q_top_events_per_user(sf_dir: str):
    """Top-3 most recent events per user (stages/windows.py:
    top_n_per_key) — the row_number()-over-partition pattern as one
    keyed repartition + whole-block vectorized ranking, never a global
    sort."""
    import ray.data

    ensure_hash_shuffle()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id"])
    from ..stages.windows import top_n_per_key

    return top_n_per_key(ds, n=3)


def q_segment_priority_revenue(sf_dir: str):
    """Three-way distributed join plan (TPC-H Q3 shape): lineitem ⋈
    orders on orderkey, then ⋈ customer on custkey — both joins
    hash-shuffled (every side is big at target scale), MATERIALIZED
    between (two concurrent hash-shuffle operators in one execution
    serialize, see CLAUDE.md) — then integer-cents revenue per
    (market segment, order priority)."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    from ..util import cluster_cpus

    ensure_hash_shuffle()
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_extendedprice"])

    def cents(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "price_cents": pa.array(
                np.floor(p * 100 + 0.5).astype(np.int64)),
        })

    li = li.map_batches(cents, batch_format="pyarrow")
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey",
                                            "o_orderpriority"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    p = max(8, cluster_cpus())
    j1 = li.join(orders, "inner", p,
                 on=("l_orderkey",), right_on=("o_orderkey",)).materialize()
    j2 = j1.join(cust, "inner", p,
                 on=("o_custkey",), right_on=("c_custkey",)).materialize()
    out = j2.groupby(["c_mktsegment", "o_orderpriority"]) \
        .aggregate(Count(), Sum("price_cents"))
    return out.rename_columns({"count()": "n_items",
                               "sum(price_cents)": "revenue_cents"})


def q_events_hopping(sf_dir: str):
    """HOPPING (overlapping) windowed aggregate: 1-hour windows every
    30 minutes — each event lands in exactly size/hop = 2 windows
    (flat-map row duplication with integer-µs window starts), then
    count + integer-cents sum per (window_start, event_type). The
    overlap is what tumbling q_events_window can't express."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    ensure_hash_shuffle()
    HOP = 1_800_000_000  # 30 min in µs
    N_WIN = 2            # size = N_WIN * hop = 1 h

    def fn(batch: pa.Table) -> pa.Table:
        ts = batch["ts"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        tus = ts.to_numpy(zero_copy_only=False).view(np.int64)
        k = tus // HOP
        starts = np.concatenate(
            [(k - g) * HOP for g in range(N_WIN)])
        v = batch["value"].to_numpy(zero_copy_only=False)
        cents = np.tile(np.floor(v * 100 + 0.5).astype(np.int64), N_WIN)
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        et_rep = pa.concat_arrays([et] * N_WIN)
        return pa.Table.from_arrays(
            [pa.array(starts).cast(pa.timestamp("us")), et_rep,
             pa.array(cents)],
            names=["window_start", "event_type", "cents"])

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])
    out = ds.map_batches(fn, batch_format="pyarrow") \
        .groupby(["window_start", "event_type"]) \
        .aggregate(Count(), Sum("cents"))
    return out.rename_columns({"count()": "cnt",
                               "sum(cents)": "sum_cents"})


def q_user_sessions(sf_dir: str):
    """Gap-based sessionization of the events stream (6-hour
    inactivity gap): keyed repartition on user_id, whole-block
    vectorized gap-split (stages/windows.py) — one row per session
    with event count and start/end timestamps. Integer-microsecond
    gap predicate; the SQL twin's lag+interval formulation is
    bit-equal."""
    import ray.data

    from ..stages.windows import sessionize

    ensure_hash_shuffle()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id"])
    return sessionize(ds, gap_us=6 * 3600 * 1_000_000)


def q_xor_members(sf_dir: str):
    """Static-set membership via XOR filters (16-bit fingerprints) over
    the exact-tier representative ids. XOR peeling is a global
    construction, so the distributed shape is CO-PARTITIONED build +
    probe: each block peels its own filter and probes its own members
    inside ONE task (vectorized ``has_many``) — no broadcast list, no
    O(n_blocks) cross-filter scans, work scales with blocks (the
    q_cuckoo_members shape). Per-filter no-false-negatives holds
    (reference has() contract, src/bloom/xor-filter.ts:239-259), so
    every member probes True; a cross-partition lookup service would
    route each probe key to its build partition by the same hash —
    never fan out to all filters."""
    from ..state.xor_filter import XorFilter
    from .dedup import exact_tier

    cfg = DedupConfig()
    ds = corpus_dataset(sf_dir, with_bytes=False).select_columns(
        ["image_id", "caption"])
    reps = exact_tier(ds, cfg).filter(expr="is_rep == True") \
        .select_columns(["image_id"])

    def build_probe(batch: pa.Table) -> pa.Table:
        col = batch["image_id"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({"image_id": pa.array([], type=pa.string()),
                             "present": pa.array([], type=pa.bool_())})
        xf = XorFilter.create(col.to_pylist(), bits_per_fingerprint=16)
        present = xf.has_many(col)
        return pa.table({"image_id": col,
                         "present": pa.array(present, type=pa.bool_())})

    return reps.map_batches(build_probe, batch_format="pyarrow")


def q_cuckoo_members(sf_dir: str):
    """Static-set membership via CuckooFilters over the exact-tier
    representative ids. Cuckoo insertion is a sequential kick chain
    (not mergeable, not vectorizable), so the scale shape is
    CO-PARTITIONED build+probe: each block builds its own filter and
    probes its own members inside ONE task — no broadcast, no cross-
    shard probes, work scales with blocks. No false negatives means
    every member probes True; the (deterministic-seed) chance of an
    insert failing its kick budget is absorbed by an exact overflow
    stash, as a production cuckoo table would (reference semantics:
    cuckoo-filter.ts add/has)."""
    from ..state.cuckoo import CuckooFilter
    from .dedup import exact_tier

    cfg = DedupConfig()
    ds = corpus_dataset(sf_dir, with_bytes=False).select_columns(
        ["image_id", "caption"])
    reps = exact_tier(ds, cfg).filter(expr="is_rep == True") \
        .select_columns(["image_id"])

    def build_probe(batch: pa.Table) -> pa.Table:
        col = batch["image_id"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = [str(x) for x in col.to_pylist()]  # inserts: kick chains
        if not ids:
            return pa.table({"image_id": pa.array([], type=pa.string()),
                             "present": pa.array([], type=pa.bool_())})
        f = CuckooFilter.create(len(ids), error_rate=0.01)
        stash = {x for x in ids if not f.add(x)}
        present = f.has_many(col)  # vectorized probe
        if stash:  # exact overflow stash (rare kick-budget overflow)
            present |= np.array([x in stash for x in ids], dtype=bool)
        return pa.table({"image_id": pa.array(ids, type=pa.string()),
                         "present": pa.array(present, type=pa.bool_())})

    return reps.map_batches(build_probe, batch_format="pyarrow")


def q_ngram_jaccard(sf_dir: str):
    """Exact token-set Jaccard of each planted near-dup pair (variant 0
    caption vs variant 2 caption per doc) — the deterministic oracle
    twin of the MinHash estimate. Fully vectorized: per-row distinct
    token hashes, union via concat+dedupe."""
    import pyarrow.compute as pc

    from ..stages.shingle import shingle_hashes, unique_per_row

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        cap_a = pc.utf8_trim(texts, " ")  # = SQL trim(): ASCII space only
        cap_b = pc.replace_substring_regex(cap_a, pattern=" [^ ]*$",
                                           replacement="")
        fa, oa = unique_per_row(*shingle_hashes(cap_a, k=1))
        fb, ob = unique_per_row(*shingle_hashes(cap_b, k=1))
        na, nb = np.diff(oa), np.diff(ob)
        # union per row = distinct of the concatenation (segmented
        # scatter, no row loop)
        n = len(na)
        cat = np.empty(oa[-1] + ob[-1], dtype=np.uint64)
        oc = np.zeros(n + 1, dtype=np.int64)
        oc[1:] = np.cumsum(na + nb)
        row_a = np.repeat(np.arange(n), na)
        cat[oc[:-1][row_a] + (np.arange(oa[-1]) - oa[:-1][row_a])] = fa
        row_b = np.repeat(np.arange(n), nb)
        cat[oc[:-1][row_b] + na[row_b]
            + (np.arange(ob[-1]) - ob[:-1][row_b])] = fb
        _, ou = unique_per_row(cat, oc)
        u = np.diff(ou)
        inter = na + nb - u
        jac = np.where(u > 0, inter / np.maximum(u, 1), 1.0)
        return pa.Table.from_arrays(
            [batch["doc_id"], pa.array(jac)],
            names=["doc_id", "jaccard"])

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


def q_topk_sketch(sf_dir: str):
    """Distributed reference-semantics TopK (CMS estimates + candidate
    heap, topk.ts:138-262): top 10 caption frequencies. HARD-oracled:
    with the CMS geometry (27k columns × 7 rows — accuracy=e^-7 in the
    reference's rows=ceil(ln(1/accuracy)) API; the 0.999 default would
    build a 1-row sketch that overcounts ~3.5% of keys here) far above
    the distinct-caption count, and ``candidates_per_block`` above the
    per-block distinct count, the sketch's estimates are the exact
    counts and its (freq desc, value) ranking is the SQL twin's
    row_number() — the same exactness regime the reference's own test
    suite asserts (topk.test.ts expects exact frequencies)."""
    import math

    from ..stages.sketch_aggs import build_topk

    ds = _caption_corpus(sf_dir).select_columns(["caption"])
    top = build_topk(ds, on="caption", k=10, accuracy=math.exp(-7),
                     candidates_per_block=4096)
    return pa.table({
        "value": pa.array([t["value"] for t in top], type=pa.string()),
        "frequency": pa.array([t["frequency"] for t in top], type=pa.int64()),
        "rank": pa.array([t["rank"] for t in top], type=pa.int64()),
    })


def q_token_quantiles(sf_dir: str):
    """Exact distributed percentiles (p25/50/75/95/99) of the
    per-caption whitespace token count — histogram reduction
    (stages/quantiles.py): only (distinct_count, freq) rows shuffle,
    the driver scans a cumsum. Quantile definition is integer-exact
    and mirrored verbatim by the SQL twin."""
    from ..stages.quantiles import exact_int_quantiles

    ds = _caption_corpus(sf_dir).select_columns(["image_id", "caption"]) \
        .map_batches(make_token_stats_fn(), batch_format="pyarrow") \
        .select_columns(["n_tokens"])
    return exact_int_quantiles(ds, "n_tokens", [25, 50, 75, 95, 99])


def q_token_quantiles_kll(sf_dir: str):
    """KLL sketch quantiles (state/kll.py, KLLAgg partial/final) over
    the per-document token count — the UNBOUNDED-domain complement of
    token_quantiles★'s exact histogram: fixed-size level stacks merge
    inside the aggregate tree, so it works on float/high-cardinality
    columns where the exact path's max_hist_rows gate trips.
    Approximate by nature (rows-only check); the ≤1.65/k rank-error
    contract vs the exact twin is pinned in tests (test_sketches.py,
    test_analytics_paths.py)."""
    from ..stages.sketch_aggs import build_kll

    ds = _docs(sf_dir, columns=["doc_id", "text"]) \
        .map_batches(make_token_stats_fn(id_col="doc_id",
                                         text_col="text"),
                     batch_format="pyarrow") \
        .select_columns(["n_tokens"])
    sk = build_kll(ds, on="n_tokens", k=200)
    pcts = [25, 50, 75, 95, 99]
    return pa.table({
        "pct": pa.array(pcts, type=pa.int64()),
        "q_est": pa.array(sk.quantiles(pcts), type=pa.float64()),
    })


def q_lang_token_quantiles_kll(sf_dir: str):
    """KLL sketch quantiles PER GROUP — one KLLSketch per language via
    groupby(lang).aggregate(KLLAgg), completing the per-slice
    exact-vs-sketch matrix (distinct: lang_distinct_docs★ vs
    lang_distinct_hll; heavy hitters: lang_top_texts★; quantiles:
    lang_token_quantiles★ vs THIS). Only fixed-size level stacks move
    through the hash shuffle — the scale path when a group's value
    domain is unbounded and the exact histogram's max_hist_rows gate
    trips. Approximate (rows-only); the per-group rank-error contract
    vs the exact twin is pinned in tests."""
    import pickle

    from ..stages.sketch_aggs import KLLAgg

    ensure_hash_shuffle()
    agg = _docs(sf_dir, columns=["lang", "text"]) \
        .map_batches(make_token_stats_fn(id_col="lang", text_col="text"),
                     batch_format="pyarrow") \
        .select_columns(["lang", "n_tokens"]) \
        .groupby("lang").aggregate(KLLAgg(on="n_tokens", k=200))
    pcts = [50, 90, 99]

    def decode(batch: pa.Table) -> pa.Table:
        langs, out_p, out_q = [], [], []
        for lang, blob in zip(batch["lang"].to_pylist(),
                              batch["kll"].to_pylist()):
            qs = pickle.loads(blob).quantiles(pcts)
            langs.extend([lang] * len(pcts))
            out_p.extend(pcts)
            out_q.extend(float(q) for q in qs)
        return pa.table({
            "lang": pa.array(langs, type=pa.string()),
            "pct": pa.array(out_p, type=pa.int64()),
            "q_est": pa.array(out_q, type=pa.float64()),
        })

    return agg.map_batches(decode, batch_format="pyarrow")


def q_seenset_mark(sf_dir: str):
    """Streaming seen-set pruning: sharded ScalableBloom actors mark
    the first arrival of each caption (is_new). Winner identity is
    arrival-order dependent (rows-only check); invariants are tested
    in tests/test_stateful.py."""
    from ..stages.seenset import SeenSet

    ds = _caption_corpus(sf_dir).select_columns(["image_id", "caption"])
    ss = SeenSet(num_shards=4, kind="scalable", capacity=1 << 14)
    try:
        out = ss.mark_new(ds, "caption").materialize()
    finally:
        pass
    res = pa.concat_tables([b for b in out.iter_batches(
        batch_size=1 << 16, batch_format="pyarrow")])
    ss.shutdown()
    return res


def q_substring_dups(sf_dir: str):
    """Exact-substring dedup over unique captions: contained=True iff
    the caption occurs inside another unique caption. Distributed via
    winnowing-fingerprint content-locality bucketing (exact — the
    winnowing theorem guarantees containee/container co-location; see
    stages/substring.py), per-partition suffix-array passes, and a
    broadcast probe for below-threshold short captions."""
    from ..stages.substring import substring_flags_sharded
    from .dedup import exact_tier

    cfg = DedupConfig()
    ds = corpus_dataset(sf_dir, with_bytes=False).select_columns(
        ["image_id", "caption"])
    uniq = exact_tier(ds, cfg).filter(expr="is_rep == True")         .select_columns(["image_id", "caption"])
    return substring_flags_sharded(uniq)


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 of the first 5 embedding rows against
    the whole embeddings table (block-local top-k + driver merge)."""
    import pyarrow.parquet as pq
    import ray.data

    ensure_hash_shuffle()
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       filters=[("vec_id", "<", 5)])
    from ..stages.ann import brute_force_topk, embedding_matrix

    Q = embedding_matrix(qt["embedding"])
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet").repartition(8)
    return brute_force_topk(ds, qt["vec_id"].to_numpy(), Q, k=10)


def q_ann_ivf(sf_dir: str):
    """IVF approximate cosine top-10 for the first 5 query vectors:
    sampled-kmeans coarse quantizer → centroid-keyed inverted-list
    repartition → per-block nprobe-list scans → driver merge of tiny
    partials (stages/ann.py: ivf_topk). Approximate by design
    (rows-only check); recall vs the exact brute force rises with
    nprobe and is pinned in tests/test_simhash_ann.py (0.94 at
    nprobe=12/16, exact at full probe)."""
    import pyarrow.parquet as pq
    import ray.data

    from ..stages.ann import embedding_matrix, ivf_topk

    ensure_hash_shuffle()
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       filters=[("vec_id", "<", 5)])
    Q = embedding_matrix(qt["embedding"])
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               override_num_blocks=8)
    return ivf_topk(ds, qt["vec_id"].to_numpy(), Q, k=10,
                    n_centroids=32, nprobe=8)


def q_ann_ivf_exact(sf_dir: str):
    """IVF at FULL probe (nprobe == n_centroids): every inverted list
    is scanned, so the result is provably the exact brute-force top-k
    (tests/test_simhash_ann.py pins the equivalence) — this runs the
    whole IVF machinery (sampled k-means coarse quantizer,
    centroid-keyed inverted-list repartition, block-local list scans,
    shared _rank_topk merge) under the hard DuckDB value-hash gate;
    the partial-probe configuration stays rows-only by nature."""
    import pyarrow.parquet as pq
    import ray.data

    from ..stages.ann import embedding_matrix, ivf_topk

    ensure_hash_shuffle()
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       filters=[("vec_id", "<", 5)])
    Q = embedding_matrix(qt["embedding"])
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               override_num_blocks=8)
    return ivf_topk(ds, qt["vec_id"].to_numpy(), Q, k=10,
                    n_centroids=32, nprobe=32)


def q_jaccard_dup_pairs(sf_dir: str):
    """Exact set-similarity join over the documents table: all doc
    pairs whose distinct 3-word-shingle sets have Jaccard ≥ 0.8,
    via the inverted-index double shuffle (stages/setsim.py) — the
    hard-verification counterpart the MinHash/LSH pipeline
    approximates. Integer cross-multiplied threshold; hot shingles
    (df > 1024, none at test scale) excluded per the documented skew
    guard, mirrored exactly by the SQL twin."""
    from ..stages.setsim import jaccard_pairs

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return jaccard_pairs(ds, tau_num=4, tau_den=5, k=3, max_df=1024)


def q_jaccard_dup_clusters(sf_dir: str):
    """Connected components over the exact-Jaccard duplicate graph —
    the CLUSTERING operator itself under the hard oracle gate: exact
    set-similarity edges (q_jaccard_dup_pairs) → distributed
    large/small-star contraction (stages/cc.py) → (doc_id,
    cluster_id = min id of the component). The SQL twin labels the
    same components via a recursive transitive-closure CTE."""
    from ..stages.cc import connected_components_distributed
    from ..stages.setsim import jaccard_pairs
    from ..util import cluster_cpus

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    edges = jaccard_pairs(ds, tau_num=4, tau_den=5, k=3, max_df=1024) \
        .select_columns(["a", "b"])
    labels = connected_components_distributed(edges, max(8, cluster_cpus()))
    return labels.rename_columns({"image_id": "doc_id"})


def q_ann_pq(sf_dir: str):
    """Product-quantization approximate cosine top-10 for the first 5
    query vectors: per-subspace codebooks trained on a sample, corpus
    encoded to 16 one-byte codes per row (the RAM-scale representation
    for 10^12-row ANN), block-local ADC scans, driver merge
    (stages/ann.py: pq_topk). Approximate by design (rows-only);
    recall vs exact brute force is pinned in
    tests/test_simhash_ann.py::TestPQ (0.84 at m=16/ks=256, rising
    with code budget)."""
    import pyarrow.parquet as pq
    import ray.data

    from ..stages.ann import embedding_matrix, pq_topk

    ensure_hash_shuffle()
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       filters=[("vec_id", "<", 5)])
    Q = embedding_matrix(qt["embedding"])
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet") \
        .repartition(8)
    return pq_topk(ds, qt["vec_id"].to_numpy(), Q, k=10, m=16,
                   n_codes=256)


def q_ann_opq(sf_dir: str):
    """OPQ approximate cosine top-10 (stages/ann.py: opq_topk — Ge et
    al., CVPR 2013 non-parametric variant): flat PQ behind a learned
    orthogonal rotation that rebalances subspace variance; rotation is
    a broadcast (d, d) matrix applied in the encode + ADC stages, so
    the scan cost is unchanged. Approximate by design (rows-only);
    opq_iters=0 ≡ flat PQ is pinned bit-for-bit in
    tests/test_simhash_ann.py::TestPQ."""
    import pyarrow.parquet as pq
    import ray.data

    from ..stages.ann import embedding_matrix, opq_topk

    ensure_hash_shuffle()
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       filters=[("vec_id", "<", 5)])
    Q = embedding_matrix(qt["embedding"])
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet") \
        .repartition(8)
    return opq_topk(ds, qt["vec_id"].to_numpy(), Q, k=10, m=16,
                    n_codes=256, opq_iters=6)


def q_ann_ivf_pq(sf_dir: str):
    """IVFADC approximate cosine top-10 (Jégou et al. 2011): coarse
    centroids + residual-PQ codebooks trained on a sample, corpus
    encoded to (list_id, 16 bytes), inverted-list repartition, nprobe
    ADC scans with list-independent q·codebook tables (stages/ann.py:
    ivf_pq_topk). Approximate (rows-only); recall rises with nprobe
    and reaches flat-PQ at full probe (tests pin 0.84@full on the
    worst-case unclustered embeddings)."""
    import pyarrow.parquet as pq
    import ray.data

    from ..stages.ann import embedding_matrix, ivf_pq_topk

    ensure_hash_shuffle()
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       filters=[("vec_id", "<", 5)])
    Q = embedding_matrix(qt["embedding"])
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet") \
        .repartition(8)
    return ivf_pq_topk(ds, qt["vec_id"].to_numpy(), Q, k=10,
                       n_centroids=64, nprobe=16, m=16, n_codes=256)


def q_ann_pq_rerank(sf_dir: str):
    """Two-stage retrieval: PQ-ADC shortlist (k'=100 candidates/query)
    then a second streaming pass computing EXACT cosine for the
    shortlisted pairs only — true vectors never leave their blocks
    (stages/ann.py: pq_topk_reranked). Rows-only: the result equals
    brute force whenever shortlist recall@k' covers the true top-k
    (it does at sf0.001, pinned in tests; a handful of rank-6..10
    neighbors differ at sf0.1), and rerank recall ≥ raw ADC recall
    always."""
    import pyarrow.parquet as pq
    import ray.data

    from ..stages.ann import embedding_matrix, pq_topk_reranked

    ensure_hash_shuffle()
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       filters=[("vec_id", "<", 5)])
    Q = embedding_matrix(qt["embedding"])
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet") \
        .repartition(8)
    return pq_topk_reranked(ds, qt["vec_id"].to_numpy(), Q, k=10,
                            k_candidates=100, m=8, n_codes=256)


def q_emb_dup_pairs(sf_dir: str):
    """Exact cosine-threshold duplicate pairs over the SQL-reproducible
    zeroed-coordinate variant corpus (one planted near-dup per vector
    at cos≈0.992; threshold 0.95 sits in a ≥0.35 empirical gap, so the
    float64-numpy vs DuckDB comparison cannot flip a pair): blocked
    matmul against the broadcast normalized matrix — the brute-force
    baseline the banded embedding_neardup pipeline approximates at
    scale (stages/ann.py: exact_cosine_pairs)."""
    import ray.data

    from ..sources.synthetic import make_zeroed_variants
    from ..stages.ann import exact_cosine_pairs

    ensure_hash_shuffle()
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    variants = ds.map_batches(make_zeroed_variants,
                              batch_format="pyarrow") \
        .select_columns(["emb_id", "embedding"]).materialize()
    return exact_cosine_pairs(variants, 0.95, id_col="emb_id")


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup clustering over the planted-near-dup
    embedding corpus (projection-LSH bands + exact cosine verify)."""
    from ..sources.synthetic import embedding_corpus
    from .embdedup import EmbDedupConfig, embedding_dedup_pipeline

    ds = embedding_corpus(sf_dir)
    assignments, _ = embedding_dedup_pipeline(ds, EmbDedupConfig())
    return assignments


def q_image_neardup(sf_dir: str):
    """Image-tier near-dup clustering: exact byte dedup + phash Hamming
    banding + verification."""
    from ..sources.synthetic import corpus_dataset
    from .imagededup import ImageDedupConfig, image_dedup_pipeline

    ds = corpus_dataset(sf_dir, with_bytes=True).select_columns(
        ["image_id", "bytes", "phash"])
    assignments, _ = image_dedup_pipeline(ds, ImageDedupConfig())
    return assignments


QUERIES = {
    "corpus": q_corpus,
    "exact_dedup": q_exact_dedup,
    "topk_captions": q_topk_captions,
    "distinct_captions": q_distinct_captions,
    "token_stats": q_token_stats,
    "lang_counts": q_lang_counts,
    "lang_distinct_docs": q_lang_distinct_docs,
    "lang_distinct_hll": q_lang_distinct_hll,
    "lang_top_texts": q_lang_top_texts,
    "lang_token_quantiles": q_lang_token_quantiles,
    "doc_splits": q_doc_splits,
    "weighted_sample": q_weighted_sample,
    "stratified_sample": q_stratified_sample,
    "bpe_token_stats": q_bpe_token_stats,
    "bloom_members": q_bloom_members,
    "neardup_clusters": q_neardup_clusters,
    "full_neardup": q_full_neardup,
    "hll_distinct_captions": q_hll_distinct_captions,
    "cms_caption_counts": q_cms_caption_counts,
    "doc_quality": q_doc_quality,
    "langid": q_langid,
    "fingerprints": q_fingerprints,
    "quality_components": q_quality_components,
    "text_simhash": q_text_simhash,
    "simhash_neardup": q_simhash_neardup,
    "image_simhash": q_image_simhash,
    "image_dctphash": q_image_dctphash,
    "events_window": q_events_window,
    "events_hopping": q_events_hopping,
    "user_sessions": q_user_sessions,
    "lineitem_agg": q_lineitem_agg,
    "nation_revenue": q_nation_revenue,
    "priority_revenue": q_priority_revenue,
    "urgent_customer_segments": q_urgent_customer_segments,
    "never_urgent_segments": q_never_urgent_segments,
    "segment_priority_revenue": q_segment_priority_revenue,
    "asof_prev_click": q_asof_prev_click,
    "clicks_before_purchase": q_clicks_before_purchase,
    "top_events_per_user": q_top_events_per_user,
    "xor_members": q_xor_members,
    "cuckoo_members": q_cuckoo_members,
    "ngram_jaccard": q_ngram_jaccard,
    "topk_sketch": q_topk_sketch,
    "token_quantiles": q_token_quantiles,
    "token_quantiles_kll": q_token_quantiles_kll,
    "lang_token_quantiles_kll": q_lang_token_quantiles_kll,
    "seenset_mark": q_seenset_mark,
    "substring_dups": q_substring_dups,
    "ann_topk": q_ann_topk,
    "ann_ivf": q_ann_ivf,
    "ann_ivf_exact": q_ann_ivf_exact,
    "ann_pq": q_ann_pq,
    "ann_opq": q_ann_opq,
    "ann_ivf_pq": q_ann_ivf_pq,
    "ann_pq_rerank": q_ann_pq_rerank,
    "jaccard_dup_pairs": q_jaccard_dup_pairs,
    "jaccard_dup_clusters": q_jaccard_dup_clusters,
    "emb_dup_pairs": q_emb_dup_pairs,
    "embedding_neardup": q_embedding_neardup,
    "image_neardup": q_image_neardup,
}
