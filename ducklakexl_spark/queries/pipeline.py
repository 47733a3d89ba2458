"""End-to-end training-data curation funnel (SURVEY.md §2.D): the
composite pipeline a 100 TB corpus actually runs — heuristic quality
gate → exact dedup → cross-document duplicate-span dedup — reported as a
per-stage survival funnel (doc and token counts), the number a data-
curation team watches per ingest.

Each stage reuses the exact formulation of its standalone operator
(text_quality_score, dedup_exact, dedup_ngram_spans), so this is the
composition test: the stages agree with DuckDB not just alone but chained,
with each stage consuming the previous stage's survivors.

Scale shape: one documents scan feeds the whole funnel (tokens, quality
flags, and the exact-dedup key are computed in a single projection);
exact dedup is one groupBy on a 128-bit key with min_by carrying the
keeper's stats (no join-back); the span stage shuffles only 60-bit gram
hashes keyed identically for the frequency groupBy and the dup join
(exchange reuse); the four stage totals are single-row aggregates
unioned at the end.  Nothing corpus-sized is ever broadcast and no stage
re-reads the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducklakexl_spark.queries import load, query
from ducklakexl_spark.queries.dedup import (
    SPAN_N,
    _sql_hash,
    portable_hash,
    word_ngrams_col,
)

DUP_FRAC_MAX = 0.5  # span stage: drop docs with > 50% duplicated 8-grams


def _funnel_oracle() -> str:
    gh = _sql_hash("g", 97)
    return f"""
    WITH base AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\\s+')                 AS toks,
             len(string_split_regex(trim(text), '\\s+'))            AS nt,
             length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))  AS np,
             length(text)                                           AS nc,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS ckey
      FROM documents
    ),
    quality AS (
      SELECT * FROM base
      WHERE nt BETWEEN 20 AND 1000
        AND CAST(np AS DOUBLE) / nullif(nc, 0) < 0.1
    ),
    keepers AS (
      SELECT min(doc_id)        AS doc_id,
             min_by(nt, doc_id)   AS nt,
             min_by(toks, doc_id) AS toks
      FROM quality GROUP BY ckey
    ),
    grams AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, nt - {SPAN_N - 1}),
               i -> array_to_string(list_slice(toks, i, i + {SPAN_N - 1}), ' ')
             )) AS gs
      FROM keepers WHERE nt >= {SPAN_N}
    ),
    exploded AS (
      SELECT doc_id, {gh} AS gh
      FROM (SELECT doc_id, unnest(gs) AS g FROM grams)
    ),
    counts AS (SELECT gh, count(*) AS n FROM exploded GROUP BY gh),
    perdoc AS (
      SELECT e.doc_id, count(*) AS n_dup
      FROM exploded e JOIN counts c ON e.gh = c.gh
      WHERE c.n >= 2
      GROUP BY e.doc_id
    ),
    span_kept AS (
      SELECT k.doc_id, k.nt
      FROM keepers k
      LEFT JOIN grams g  ON g.doc_id = k.doc_id
      LEFT JOIN perdoc p ON p.doc_id = k.doc_id
      WHERE g.doc_id IS NULL
         OR round(CAST(coalesce(p.n_dup, 0) AS DOUBLE) / len(g.gs), 6)
            <= {DUP_FRAC_MAX}
    )
    SELECT stage_ord, stage, n_docs, n_tokens FROM (
      SELECT 1 AS stage_ord, 'raw' AS stage, count(*) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens FROM base
      UNION ALL
      SELECT 2, 'quality', count(*), CAST(sum(nt) AS BIGINT) FROM quality
      UNION ALL
      SELECT 3, 'exact_dedup', count(*), CAST(sum(nt) AS BIGINT) FROM keepers
      UNION ALL
      SELECT 4, 'span_dedup', count(*), CAST(sum(nt) AS BIGINT) FROM span_kept
    ) s
    """


@query("pipeline_curation_funnel", oracle=_funnel_oracle())
def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate → exact dedup → duplicate-span dedup, as a funnel."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    # Pass 1 (narrow): per-doc stats WITHOUT carrying the token arrays.
    # The pre-r9 shape kept `toks` in `base` and shipped it through the
    # exact-dedup groupBy (min_by(toks, doc_id)) — the whole tokenized
    # corpus crossed that shuffle just so the span stage could re-read
    # the keeper's tokens (guide §2.3: shuffle keys/metadata, not
    # payloads).  It also re-derived this pipeline once per funnel-stage
    # count: 7 documents scans in one plan.  Now each stage is a
    # localCheckpointed narrow frame computed exactly once (the
    # operators/graph.py discipline).
    base = docs.select(
        "doc_id",
        F.size(toks).alias("nt"),
        F.length(
            F.regexp_replace(F.col("text"), "[A-Za-z0-9 ]", "")
        ).alias("np"),
        F.length("text").alias("nc"),
        F.md5(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
        ).alias("ckey"),
    ).localCheckpoint(eager=True)
    quality = base.filter(
        F.col("nt").between(20, 1000)
        & (
            F.col("np").cast("double") / F.nullif(F.col("nc"), F.lit(0))
            < 0.1
        )
    )
    # exact dedup on the 128-bit key: the shuffle now moves only
    # (ckey, doc_id, nt).  min(doc_id) IS the doc whose stats min_by
    # carried before, so the narrow aggregate is value-identical.
    keepers = (
        quality.groupBy("ckey")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("nt", "doc_id").alias("nt"),
        )
        .localCheckpoint(eager=True)
    )
    # Pass 2: re-tokenize KEEPER docs only (join shuffles the text blobs
    # once; tokenize+ngram run map-side after it) and emit one narrow
    # (doc_id, n_grams, gh) row per distinct 8-gram — checkpointed once,
    # consumed by the frequency pass, the per-doc dup count AND the
    # per-doc gram size.
    ktoks = docs.join(keepers.select("doc_id"), "doc_id").select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("nt")
    )
    gs = F.array_distinct(word_ngrams_col(F.col("toks"), SPAN_N))
    exn = (
        ktoks.filter(F.col("nt") >= SPAN_N)
        .select("doc_id", F.size(gs).alias("n_grams"), F.explode(gs).alias("g"))
        .select(
            "doc_id", "n_grams", portable_hash(F.col("g"), 97).alias("gh")
        )
        .localCheckpoint(eager=True)
    )
    dup = (
        exn.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("gh")
    )
    perdoc = exn.join(dup, "gh").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup")
    )
    gsizes = exn.groupBy("doc_id").agg(F.min("n_grams").alias("n_grams"))
    span_kept = (
        keepers.select("doc_id", "nt")
        .join(gsizes, "doc_id", "left")
        .join(perdoc, "doc_id", "left")
        .filter(
            F.col("n_grams").isNull()
            | (
                F.round(
                    F.coalesce(F.col("n_dup"), F.lit(0)) / F.col("n_grams"),
                    6,
                )
                <= DUP_FRAC_MAX
            )
        )
    )

    def stage(ord_: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
        ).select(
            F.lit(ord_).alias("stage_ord"),
            F.lit(name).alias("stage"),
            "n_docs",
            "n_tokens",
        )

    return (
        stage(1, "raw", base)
        .unionAll(stage(2, "quality", quality))
        .unionAll(stage(3, "exact_dedup", keepers))
        .unionAll(stage(4, "span_dedup", span_kept))
    )
