"""Text-analysis operators for LLM training-data pipelines: token counting
(whitespace + BPE-ish regex), quality scoring, language-ID heuristic, and
document fingerprinting (SURVEY.md §2.D).

All are pure column expressions (JVM-side, whole-stage-codegen'd) over the
``documents`` table — the shape that scales: per-row, no shuffle, no Python.
Each has an exact DuckDB oracle because the hashing primitive used
everywhere is md5 (identical hex output in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ducklakexl_spark.queries import broadcast_if_small, load, query

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks.
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@query(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT)   AS n_bpe_tokens,
           CAST(length(text) AS BIGINT)                                AS n_chars_calc
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )


@query(
    "text_quality_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\\s+') AS tokens,
             length(text)                            AS nc,
             length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS n_punct
      FROM documents
    )
    SELECT doc_id,
           CAST(len(tokens) AS BIGINT) AS n_tokens,
           round(CAST(n_punct AS DOUBLE) / nc, 6) AS punct_ratio,
           round(CAST(len(list_filter(tokens, t -> lower(t) IN ({_STOP_SQL})))
                      AS DOUBLE) / len(tokens), 6) AS stopword_ratio,
           round(CAST(nc AS DOUBLE) / len(tokens), 6) AS avg_token_len,
           CAST(len(tokens) BETWEEN 20 AND 1000
                AND CAST(n_punct AS DOUBLE) / nc < 0.1 AS BOOLEAN) AS passes_quality
    FROM tok
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/punctuation/stopword quality heuristics, single scan.

    The four token-derived terms compute ONCE in a lower projection
    behind a CollapseProject barrier (see similarity._ivf_scored for the
    measured pathology: the interpreted HOF path re-evaluates split()
    per referencing expression — 2.4x slower without the split).

    r9 optimization (guide §4.1 "prefer built-ins over per-element
    lambdas"): the stopword count dropped its interpreted HOF
    (filter(split(...), t -> array_contains(stop, lower(t))) evaluates
    the lambda per TOKEN through the expression interpreter) for a
    single regexp_count over the lowered text — tokens are maximal
    non-space runs, so a stopword token is exactly a stoplist
    alternation between \\s boundaries of the space-padded text; the
    (?<=\\s)/(?=\\s) lookarounds are zero-width, so adjacent stopwords
    all match.  Equivalence proven exact vs the unchanged DuckDB oracle
    at sf0.001/0.01/0.1 (fixtures are single-space-separated ASCII —
    scanned: no tabs/newlines/non-ASCII at any SF).  Measured sf1:
    2.30 s -> 1.80 s warm; sf0.1: 0.42 -> 0.27 s (same box, min-of-N).
    An Arrow-native mapInArrow variant (RE2 + numpy) measured 1.09 s at
    sf1 but loses at sf0.1 to Python-boundary overhead and swaps Java
    regex for RE2 semantics in a strict-oracle path — documented in
    OPTIMIZATION_r09.md, deliberately not shipped."""
    d = load(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    tokens = F.split(trimmed, r"\s+")
    stop_alt = "|".join(STOPWORDS)
    lower = d.select(
        "doc_id",
        F.size(tokens).alias("_nt"),
        F.length("text").alias("_nc"),
        F.length(
            F.regexp_replace(F.col("text"), "[A-Za-z0-9 ]", "")
        ).alias("_np"),
        F.regexp_count(
            F.concat(F.lit(" "), F.lower(trimmed), F.lit(" ")),
            F.lit(rf"(?<=\s)(?:{stop_alt})(?=\s)"),
        ).alias("_ns"),
        F.monotonically_increasing_id().alias("_b"),
    ).filter(F.col("_b") >= 0)
    punct_ratio = F.col("_np").cast("double") / F.col("_nc")
    return lower.select(
        "doc_id",
        F.col("_nt").cast("long").alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(
            F.col("_ns").cast("double") / F.col("_nt"), 6
        ).alias("stopword_ratio"),
        F.round(
            F.col("_nc").cast("double") / F.col("_nt"), 6
        ).alias("avg_token_len"),
        (F.col("_nt").between(20, 1000) & (punct_ratio < 0.1)).alias(
            "passes_quality"
        ),
    )


@query(
    "text_lang_id",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, lang,
             string_split_regex(trim(lower(text)), '\\s+') AS tokens,
             regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') AS has_cjk
      FROM documents
    )
    SELECT doc_id, lang AS actual_lang,
           CASE WHEN has_cjk THEN 'zh'
                WHEN CAST(len(list_filter(tokens, t -> t IN ({_STOP_SQL})))
                          AS DOUBLE) / len(tokens) >= 0.05 THEN 'en'
                WHEN CAST(len(list_filter(tokens,
                          t -> t SIMILAR TO '.*[aeiou]')) AS DOUBLE)
                     / len(tokens) >= 0.8 THEN 'es'
                ELSE 'other' END AS predicted_lang
    FROM feat
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic (deterministic, engine-portable).

    A real pipeline would swap in a fastText-style model via pandas_udf;
    the classification *plumbing* (per-row, no shuffle) is identical.
    """
    d = load(spark, sf_dir, "documents")
    tokens = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    stop_ratio = (
        F.size(F.filter(tokens, lambda t: F.array_contains(stop_arr, t))).cast(
            "double"
        )
        / F.size(tokens)
    )
    vowel_ratio = (
        F.size(F.filter(tokens, lambda t: t.rlike("[aeiou]$"))).cast("double")
        / F.size(tokens)
    )
    has_cjk = F.col("text").rlike("[一-鿿]")
    return d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        F.when(has_cjk, "zh")
        .when(stop_ratio >= 0.05, "en")
        .when(vowel_ratio >= 0.8, "es")
        .otherwise("other")
        .alias("predicted_lang"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return d.select("doc_id", F.md5(normalized).alias("fingerprint"))


@query(
    "text_length_stats",
    oracle="""
    SELECT lang, source,
           count(*)                                   AS n_docs,
           CAST(sum(n_chars) AS BIGINT)               AS total_chars,
           round(avg(CAST(n_chars AS DOUBLE)), 4)     AS avg_chars,
           CAST(min(n_chars) AS BIGINT)               AS min_chars,
           CAST(max(n_chars) AS BIGINT)               AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def text_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


@query(
    "text_repetition_filter",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ), feat AS (
      SELECT doc_id,
             len(w) AS n_words,
             len(list_distinct(w)) AS n_distinct,
             CASE WHEN len(w) >= 2
                  THEN list_transform(range(1, len(w)),
                                      i -> w[i] || ' ' || w[i + 1])
                  ELSE [] END AS bg
      FROM tok
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           round(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 6)
               AS dup_word_frac,
           round(CASE WHEN len(bg) > 0
                      THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE)
                               / len(bg)
                      ELSE 0.0 END, 6) AS dup_bigram_frac,
           CAST(1.0 - CAST(n_distinct AS DOUBLE) / n_words <= 0.9
                AND (CASE WHEN len(bg) > 0
                          THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE)
                                   / len(bg)
                          ELSE 0.0 END) <= 0.95 AS BOOLEAN) AS passes_repetition
    FROM feat
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter (the Gopher/MassiveText family of
    rules): duplicate-word fraction and duplicate-bigram fraction per
    document, with a keep flag.  Pure per-row array expressions — no
    shuffle, no Python; at 100 TB this is a single codegen'd map over
    the corpus.  Ratios divide exact integer counts, so the thresholds
    are engine-deterministic."""
    d = load(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(w)
    from ducklakexl_spark.queries.dedup import word_ngrams_col

    bg = F.when(
        n >= 2, word_ngrams_col(w, 2)
    ).otherwise(F.array().cast("array<string>"))
    dup_w = 1.0 - F.size(F.array_distinct(w)).cast("double") / n
    dup_b = F.when(
        F.size(bg) > 0,
        1.0 - F.size(F.array_distinct(bg)).cast("double") / F.size(bg),
    ).otherwise(F.lit(0.0))
    return d.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.round(dup_w, 6).alias("dup_word_frac"),
        F.round(dup_b, 6).alias("dup_bigram_frac"),
        ((dup_w <= 0.9) & (dup_b <= 0.95)).alias("passes_repetition"),
    )


@query(
    "text_gopher_filter",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ), feat AS (
      SELECT doc_id,
             len(w) AS n_words,
             CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE)
                 / len(w) AS mean_word_len,
             len(list_filter(w, t -> lower(t) IN ({_STOP_SQL}))) AS stop_hits
      FROM tok
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           round(mean_word_len, 6) AS mean_word_len,
           CAST(stop_hits AS BIGINT) AS stop_hits,
           CAST(n_words BETWEEN 20 AND 100000
                AND mean_word_len BETWEEN 2 AND 12
                AND stop_hits >= 1 AS BOOLEAN) AS passes_gopher
    FROM feat
    """,
)
def text_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document gate: word-count band, mean-word-length
    band, minimum stopword evidence (the signals from the MassiveText
    quality rules that the synthetic fixture can exercise).  Same scale
    shape as the other text ops: one codegen'd projection, thresholds on
    exact integer arithmetic."""
    d = load(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(w)
    mean_len = F.aggregate(
        F.transform(w, F.length), F.lit(0), lambda a, x: a + x
    ).cast("double") / n
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_hits = F.size(F.filter(w, lambda t: F.array_contains(stop_arr, F.lower(t))))
    return d.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        stop_hits.cast("long").alias("stop_hits"),
        (
            n.between(20, 100000)
            & mean_len.between(2, 12)
            & (stop_hits >= 1)
        ).alias("passes_gopher"),
    )


# Common-subset regexes (Java regex on the Spark side, RE2 in DuckDB:
# no lookaround, no backrefs) for the classic PII scrub patterns.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
_PII_PHONE = "\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b"


@query(
    "text_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PII_IPV4}')) AS BIGINT)
               AS n_ips,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT)
               AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
                   '{_PII_EMAIL}', '<EMAIL>', 'g'),
                   '{_PII_IPV4}', '<IP>', 'g'),
                   '{_PII_PHONE}', '<PHONE>', 'g')) AS scrubbed_md5
    FROM documents
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: count and replace email / IPv4 / phone
    patterns, emitting an md5 of the scrubbed text so the oracle proves
    the *transformation* is identical, not just the counts.  The regexes
    stay in the Java-regex ∩ RE2 common subset so both engines match the
    same spans.  Per-row codegen'd projection — the 100 TB shape."""
    d = load(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>"),
            _PII_IPV4,
            "<IP>",
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_EMAIL), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_IPV4), 0))
        .cast("long")
        .alias("n_ips"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_PHONE), 0))
        .cast("long")
        .alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@query(
    "udf_text_scores",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, text,
             greatest(length(text), 1) AS nc,
             greatest(len(string_split_regex(trim(text), '\\s+')), 1) AS nt,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS np
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT)
               AS n_bpe,
           round((least(nt, 400) / 400.0)
                 * (1.0 - least(CAST(np AS DOUBLE) / nc, 0.5) * 2.0), 6)
               AS quality
    FROM tok
    """,
)
def udf_text_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-registered *pandas UDF* surface under the correctness
    gate: ``bpe_token_count`` and ``quality_score`` (Arrow-batched,
    ``functions.register_all``) called from SQL text, hash-matched
    against the pure-SQL formulation DuckDB runs.  Every arithmetic step
    is a deterministic per-row IEEE op (no sums), so the two engines
    agree bit-for-bit before rounding.  Scale shape: Arrow batches
    stream through the Python workers — no shuffle, no collect."""
    from ducklakexl_spark import functions as FN

    FN.register_all(spark)
    load(spark, sf_dir, "documents").createOrReplaceTempView("__udf_docs")
    return spark.sql(
        """
        SELECT doc_id,
               bpe_token_count(text) AS n_bpe,
               round(quality_score(text), 6) AS quality
        FROM __udf_docs
        """
    )


@query(
    "udf_geo_mean_chars",
    oracle="""
    SELECT lang, source,
           round(exp(avg(ln(n_chars))), 3) AS geo_mean_chars
    FROM documents
    WHERE n_chars > 0
    GROUP BY lang, source
    """,
)
def udf_geo_mean_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouped-aggregate pandas UDF (UDAF shape) under the gate:
    ``geo_mean`` per (lang, source) against DuckDB's exp(avg(ln)) —
    rounded to 3 dp because a mean of logs is a float sum whose
    accumulation order differs between engines.  The UDAF runs as one
    shuffle on the group key with Arrow-batched state per group."""
    from ducklakexl_spark import functions as FN

    FN.register_all(spark)
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return (
        d.groupBy("lang", "source")
        .agg(F.expr("geo_mean(n_chars)").alias("g"))
        .select("lang", "source", F.round("g", 3).alias("geo_mean_chars"))
    )


def _hash_pct_sql(key: str) -> str:
    """Portable deterministic [0,100) bucket from md5(key): the first
    four hex nibbles decoded by character position — the same SQL text
    runs in Spark and DuckDB (conv()/from_hex are engine-specific)."""
    h = f"md5(CAST({key} AS STRING))"  # STRING parses in both engines
    nib = "(instr('0123456789abcdef', substr({h}, {i}, 1)) - 1)"
    val = " + ".join(
        f"{nib.format(h=h, i=i)} * {16 ** (4 - i)}" for i in range(1, 5)
    )
    return f"(({val}) % 100)"


_PCT = _hash_pct_sql("doc_id")
_RATE = "CASE source WHEN 'src0' THEN 50 WHEN 'src1' THEN 20 ELSE 10 END"


@query(
    "sample_stratified",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(CASE WHEN {_PCT} < {_RATE} THEN 1 END) AS BIGINT)
               AS n_kept
    FROM documents
    GROUP BY source
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-source quota) sampling, the training-data mixing
    primitive: keep-rate per source via a deterministic md5 bucket, so
    the sample is reproducible across engines, runs, and partitionings —
    the property random() sampling can't give a distributed pipeline.
    One codegen'd projection + one partial-aggregated groupBy."""
    d = load(spark, sf_dir, "documents")
    kept = F.expr(_PCT) < F.expr(_RATE)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(kept, 1)).alias("n_kept"),
    )


@query(
    "split_train_test",
    oracle=f"""
    SELECT CASE WHEN {_PCT} < 90 THEN 'train' ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_total
    FROM documents
    GROUP BY split
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/test split by hashed doc_id — stable
    under re-partitioning and incremental corpus growth (a doc never
    migrates between splits), which is the requirement for leakage-free
    eval sets.  Same single-pass shape as sample_stratified."""
    d = load(spark, sf_dir, "documents")
    split = F.when(F.expr(_PCT) < 90, "train").otherwise("test")
    return d.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars_total"),
    )


@query(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents
    ),
    freq AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    tot AS (SELECT sum(c) AS n FROM freq),
    scored AS (
      SELECT t.doc_id, ln(f.c / tot.n) AS lp
      FROM tok t JOIN freq f ON t.w = f.w CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(lp), 6) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring — the statistical quality signal
    (a doc of common words scores high, gibberish scores low; the
    classic perplexity-filter family).  Train pass: one token groupBy
    (vocab-sized result).  Score pass: broadcast the vocab frequencies
    back and average log-probabilities per document.  At 100 TB the
    vocabulary stays metadata-sized next to the corpus, so scoring is a
    broadcast join — no corpus-wide shuffle except the per-doc
    aggregation."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    )
    # the vocab table is consumed twice (total + score-back broadcast);
    # materialized once so the train scan runs exactly once — without
    # this the `total` branch replayed the whole tokenize+groupBy
    # pipeline (3 corpus scans for a 2-pass algorithm)
    freq = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    total = freq.agg(F.sum("c").alias("n"))
    scored = (
        tok.join(broadcast_if_small(freq, sf_dir, "documents"), "w")
        .join(F.broadcast(total))
        .select("doc_id", F.log(F.col("c") / F.col("n")).alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )


CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16


@query(
    "text_chunk_documents",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    )
    SELECT doc_id,
           CAST(k - 1 AS BIGINT) AS chunk_idx,
           CAST(len(w) AS BIGINT) AS n_doc_tokens,
           CAST(least((k - 1) * ({CHUNK_TOKENS} - {CHUNK_OVERLAP}) + {CHUNK_TOKENS},
                      len(w))
                - (k - 1) * ({CHUNK_TOKENS} - {CHUNK_OVERLAP}) AS BIGINT)
               AS chunk_len,
           md5(array_to_string(w[(k - 1) * ({CHUNK_TOKENS} - {CHUNK_OVERLAP}) + 1 :
                                 least((k - 1) * ({CHUNK_TOKENS} - {CHUNK_OVERLAP})
                                       + {CHUNK_TOKENS}, len(w))], ' '))
               AS chunk_md5
    FROM tok CROSS JOIN generate_series(1, 1000) t(k)
    WHERE k <= greatest(1,
          CAST(ceil(CAST(len(w) - {CHUNK_OVERLAP} AS DOUBLE)
                    / ({CHUNK_TOKENS} - {CHUNK_OVERLAP})) AS BIGINT))
    """,
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping chunking (the RAG/pre-training window
    split): {CHUNK_TOKENS}-token chunks with {CHUNK_OVERLAP}-token
    overlap, emitted per document with an md5 of the chunk text so the
    oracle proves the chunk CONTENT is identical, not just the counts.
    Pure per-row array arithmetic + one explode — no shuffle; at 100 TB
    this is a codegen'd map pass whose output feeds the tokenizer."""
    d = load(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    stride = CHUNK_TOKENS - CHUNK_OVERLAP
    d = d.select("doc_id", w.alias("w"), F.size(w).alias("n_doc_tokens"))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil(
            (F.col("n_doc_tokens") - CHUNK_OVERLAP) / F.lit(stride)
        ).cast("long"),
    )
    d = d.select(
        "doc_id",
        "w",
        "n_doc_tokens",
        F.explode(F.sequence(F.lit(1), n_chunks)).alias("k"),
    )
    start = (F.col("k") - 1) * stride  # 0-based start
    end = F.least(start + CHUNK_TOKENS, F.col("n_doc_tokens"))
    chunk = F.slice(F.col("w"), start + 1, end - start)
    return d.select(
        "doc_id",
        (F.col("k") - 1).cast("long").alias("chunk_idx"),
        F.col("n_doc_tokens").cast("long"),
        (end - start).cast("long").alias("chunk_len"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


PACK_BUDGET = 512


@query(
    "text_pack_sequences",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tok
      FROM documents
    ),
    packed AS (
      SELECT doc_id, n_tok,
             CAST(floor((sum(n_tok) OVER (ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok)
                        / {PACK_BUDGET}) AS BIGINT) AS seq_id
      FROM tok
    )
    SELECT seq_id,
           CAST(count(*) AS BIGINT)   AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM packed GROUP BY seq_id
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing (filling {PACK_BUDGET}-token
    training sequences): docs in doc_id order, a running token cumsum,
    and seq_id = floor(preceding_total / budget) — reproducible across
    engines and partitionings, unlike greedy bin packing.  The window
    cumsum is the only ordered pass; everything else partial-aggregates.
    At 100 TB the global sort is the known cost of stable packing — in
    production the same formula runs per shard (doc_id ranges) so each
    partition packs independently."""
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    win = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    packed = d.select("doc_id", n_tok.alias("n_tok")).withColumn(
        "seq_id",
        F.floor(
            (F.sum("n_tok").over(win) - F.col("n_tok")) / PACK_BUDGET
        ).cast("long"),
    )
    return packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "text_perplexity_buckets",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents
    ),
    freq AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    tot AS (SELECT sum(c) AS n FROM freq),
    scored AS (
      SELECT t.doc_id, ln(f.c / tot.n) AS lp
      FROM tok t JOIN freq f ON t.w = f.w CROSS JOIN tot
    ),
    per_doc AS (
      SELECT doc_id, round(avg(lp), 6) AS avg_logprob
      FROM scored GROUP BY doc_id
    ),
    tiled AS (
      SELECT doc_id, avg_logprob,
             ntile(3) OVER (ORDER BY avg_logprob DESC, doc_id) AS t3
      FROM per_doc
    )
    SELECT CASE t3 WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                   ELSE 'tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(min(avg_logprob), 6) AS min_lp,
           round(max(avg_logprob), 6) AS max_lp
    FROM tiled GROUP BY bucket
    """,
)
def text_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CC-Net-style perplexity bucketing (Wenzek et al. 2020): score every
    document with the corpus unigram LM, rank, and cut into head/middle/
    tail thirds — the standard pretraining-data quality tiers.

    Scale shape: scoring is the text_unigram_logprob plan (vocab groupBy
    + broadcast score-back).  The global rank is the one intrinsically
    global step; ntile over an un-partitioned window is a single-reducer
    sort, which is fine for the per-doc *score table* (doc_id + double —
    ~16 bytes/doc, i.e. GBs at 100 TB corpus scale, and in production the
    cutoffs would come from approx quantiles instead, turning bucketing
    into a map-side comparison).  Ties order by (score, doc_id) on both
    engines, and bucketing uses the 6-decimal-rounded score so the
    FP-summation-order difference between engines cannot flip a rank."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    )
    # vocab-sized model table materialized once (see
    # text_unigram_logprob): total + score-back share one train scan
    freq = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    total = freq.agg(F.sum("c").alias("n"))
    per_doc = (
        tok.join(broadcast_if_small(freq, sf_dir, "documents"), "w")
        .join(F.broadcast(total))
        .select("doc_id", F.log(F.col("c") / F.col("n")).alias("lp"))
        .groupBy("doc_id")
        .agg(F.round(F.avg("lp"), 6).alias("avg_logprob"))
    )
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("avg_logprob").desc(), "doc_id")
    tiled = per_doc.withColumn("t3", F.ntile(3).over(w))
    bucket = (
        F.when(F.col("t3") == 1, "head")
        .when(F.col("t3") == 2, "middle")
        .otherwise("tail")
    )
    return (
        tiled.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("avg_logprob"), 6).alias("min_lp"),
            F.round(F.max("avg_logprob"), 6).alias("max_lp"),
        )
    )


BPE_TOPK = 50


@query(
    "text_bpe_pair_freqs",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents
    ),
    pairs AS (
      SELECT substr(w, i, 2) AS pair FROM (
        SELECT w, unnest(generate_series(1, length(w) - 1)) AS i
        FROM tok WHERE length(w) >= 2) t
    )
    SELECT pair, count(*) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT {BPE_TOPK}
    """,
)
def text_bpe_pair_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The core BPE-training step: adjacent-symbol pair frequencies over
    the corpus, top-{50} merge candidates.  (Real BPE iterates this count
    → merge → recount loop; each round is exactly this plan, so the
    operator IS the inner loop of tokenizer training at corpus scale.)

    Scale shape: pair extraction is a per-row higher-order transform
    (sequence + substr — JVM codegen, no Python), the count is one
    map-side-combined groupBy on a vocab²-bounded key space, and the
    top-k executes as TakeOrderedAndProject — no global sort of the
    pair table."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = tok.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(BPE_TOPK)
    )


BPE_MERGE_ROUNDS = 3

# one BPE round in DuckDB: pair counts over the current symbol
# sequences, argmax pair, apply the merge.  {w} = previous vocab CTE.
_BPE_ROUND_SQL = """
    p{r} AS (
      SELECT toks[i] || ' ' || toks[i + 1] AS pair,
             CAST(sum(cnt) AS BIGINT) AS freq
      FROM (
        SELECT toks, cnt, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM (SELECT string_split(seq, ' ') AS toks, cnt FROM {w}) t0
        WHERE len(toks) >= 2) t1
      GROUP BY pair
    ),
    b{r} AS (SELECT pair, freq FROM p{r}
             ORDER BY freq DESC, pair LIMIT 1),
    w{r} AS (
      SELECT trim(replace(' ' || seq || ' ',
                          ' ' || (SELECT pair FROM b{r}) || ' ',
                          ' ' || replace((SELECT pair FROM b{r}), ' ', '')
                              || ' ')) AS seq,
             cnt
      FROM {w}
    )"""


def _bpe_merges_oracle() -> str:
    rounds = ",".join(
        _BPE_ROUND_SQL.format(r=r, w=f"w{r - 1}" if r > 1 else "w0")
        for r in range(1, BPE_MERGE_ROUNDS + 1)
    )
    finals = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_round, pair, freq FROM b{r}"
        for r in range(1, BPE_MERGE_ROUNDS + 1)
    )
    return f"""
    WITH w0 AS (
      SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq,
             count(*) AS cnt
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
            FROM documents) t
      GROUP BY seq
    ),{rounds}
    {finals}
    """


@query("text_bpe_merges", oracle=_bpe_merges_oracle())
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, the actual iterative loop: 3
    count-pairs → argmax → merge rounds over word-frequency-weighted
    symbol sequences (Sennrich et al. 2016).  One corpus scan builds
    the vocab (word, count) table; every subsequent round runs on that
    VOCAB-sized frame — the classical reason BPE training is tractable
    at corpus scale (the corpus weights, the vocabulary carries the
    sequences).  Each round's argmax is a single collected row (the
    kmeans/IVF constant-folding discipline); the merge itself is a
    per-row replace().  Merge application uses space-padded first-match
    semantics — replace() scans left-to-right non-overlapping
    identically in Spark and DuckDB, so consecutive-overlap corner
    cases ('l l l') resolve the same way on both engines."""
    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("seq"), "cnt"
        )
    )
    merges: list[tuple[int, str, int]] = []
    for r in range(1, BPE_MERGE_ROUNDS + 1):
        pairs = (
            vocab.select(F.split("seq", " ").alias("toks"), "cnt")
            .filter(F.size("toks") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(toks) - 1), i -> "
                        "concat(element_at(toks, i), ' ', "
                        "element_at(toks, i + 1)))"
                    )
                ).alias("pair"),
                "cnt",
            )
            .groupBy("pair")
            .agg(F.sum("cnt").alias("freq"))
        )
        best = pairs.orderBy(F.col("freq").desc(), "pair").first()
        merges.append((r, best["pair"], int(best["freq"])))
        merged = best["pair"].replace(" ", "")
        vocab = vocab.select(
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("seq"), F.lit(" ")),
                    F.lit(f" {best['pair']} "),
                    F.lit(f" {merged} "),
                )
            ).alias("seq"),
            "cnt",
        )
    return spark.createDataFrame(
        merges, "merge_round long, pair string, freq long"
    )


@query(
    "text_c4_filters",
    oracle=r"""
    WITH feat AS (
      SELECT doc_id, source,
             regexp_matches(trim(text), '[.!?"]$')             AS ends_terminal,
             contains(lower(text), 'lorem ipsum')              AS has_lorem,
             contains(text, '{')                               AS has_brace,
             contains(lower(text), 'javascript')               AS has_js,
             len(string_split_regex(trim(text), '\s+'))        AS n_words
      FROM documents
    )
    SELECT doc_id, ends_terminal, has_lorem, has_brace, has_js,
           CAST(n_words AS BIGINT) AS n_words,
           (ends_terminal AND NOT has_lorem AND NOT has_brace
            AND NOT has_js AND n_words >= 5) AS passes_c4
    FROM feat
    """,
)
def text_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style document heuristics (Raffel et al. 2020 §2.2): terminal
    punctuation, lorem-ipsum / curly-brace / javascript markers, and a
    minimum word count, combined into the keep/drop decision.

    Pure per-row string predicates — zero shuffles, whole-stage codegen,
    embarrassingly parallel at 100 TB (the real C4 pipeline adds a
    line-level pass; the document-level decision shape is identical)."""
    d = load(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    ends_terminal = F.trim(F.col("text")).rlike('[.!?"]$')
    has_lorem = lower.contains("lorem ipsum")
    has_brace = F.col("text").contains("{")
    has_js = lower.contains("javascript")
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    return d.select(
        "doc_id",
        ends_terminal.alias("ends_terminal"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_js.alias("has_js"),
        n_words.alias("n_words"),
        (
            ends_terminal
            & ~has_lorem
            & ~has_brace
            & ~has_js
            & (n_words >= 5)
        ).alias("passes_c4"),
    )


@query(
    "text_bigram_logprob",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents
    ),
    big0 AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> {'w1': w[i], 'w2': w[i + 1]})) AS p
      FROM d
    ),
    big AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM big0),
    bc AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2),
    uc AS (SELECT w1, count(*) AS cu FROM big GROUP BY w1),
    v AS (SELECT count(DISTINCT w1) AS nv FROM
          (SELECT w1 FROM big UNION ALL SELECT w2 FROM big) u(w1)),
    scored AS (
      SELECT b.doc_id,
             ln((bc.c + 1) / CAST(uc.cu + v.nv AS DOUBLE)) AS lp
      FROM big b
      JOIN bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
      JOIN uc ON uc.w1 = b.w1
      CROSS JOIN v
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(lp), 6) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with Laplace smoothing — the
    next-order statistical quality signal after text_unigram_logprob
    (KenLM-filter family): ln((c(w1,w2)+1)/(c(w1)+|V|)) averaged per
    document.

    Scale shape: bigram generation is a zero-shuffle array transform
    inside the scan (sequence + struct, no window sort); the trained
    bigram/context tables are vocabulary-sized — broadcast back for
    scoring — so the only corpus-wide shuffles are the model groupBys
    and the final per-doc aggregation."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w"),
    )
    big = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), "
                "i -> struct(w[i - 1] AS w1, w[i] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # r9 (guide §2.4): ONE corpus-wide groupBy trains the model; the
    # context counts and vocab size both reduce the vocab²-bounded pair
    # table instead of re-scanning the corpus (cu(w1) = Σ_w2 c(w1,w2)
    # exactly, and the distinct-token set of the corpus IS the distinct
    # key set of the pair table — every token ≥2 chars appears in some
    # bigram because bigrams exist only for docs with ≥2 tokens, and
    # every token of such a doc occupies a w1 or w2 slot).  The pair
    # table is materialized once; the pre-r9 shape re-ran the
    # tokenize+explode pipeline four times (5 corpus scans).
    bc = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    uc = bc.groupBy("w1").agg(F.sum("c").alias("cu"))
    v = (
        bc.select("w1")
        .unionAll(bc.select(F.col("w2").alias("w1")))
        .agg(F.countDistinct("w1").alias("nv"))
    )
    scored = (
        big.join(broadcast_if_small(bc, sf_dir, "documents"), ["w1", "w2"])
        .join(broadcast_if_small(uc, sf_dir, "documents"), "w1")
        .join(F.broadcast(v))
        .select(
            "doc_id",
            F.log(
                (F.col("c") + 1) / (F.col("cu") + F.col("nv")).cast("double")
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )


DSIR_BUCKETS = 1024
DSIR_SEED = 7


@query(
    "text_dsir_importance",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents
    ),
    feats AS (
      SELECT doc_id, lang,
             (('0x' || substr(md5(g || '#{DSIR_SEED}'),
                              1, 8))::BIGINT % {DSIR_BUCKETS}) AS b
      FROM (
        SELECT doc_id, lang,
               unnest(list_transform(generate_series(1, len(w) - 1),
                                     i -> w[i] || ' ' || w[i + 1])) AS g
        FROM tok) t
    ),
    ct AS (SELECT b, count(*) AS c FROM feats WHERE lang = 'en' GROUP BY b),
    cr AS (SELECT b, count(*) AS c FROM feats GROUP BY b),
    nt AS (SELECT count(*) AS n FROM feats WHERE lang = 'en'),
    nr AS (SELECT count(*) AS n FROM feats),
    scored AS (
      SELECT f.doc_id,
             ((1000000::HUGEINT * (coalesce(ct.c, 0) + 1) * (nr.n + {DSIR_BUCKETS}))
              // ((cr.c + 1)::HUGEINT * (nt.n + {DSIR_BUCKETS}))) AS lr_micro
      FROM feats f
      LEFT JOIN ct ON ct.b = f.b
      JOIN cr ON cr.b = f.b
      CROSS JOIN nt CROSS JOIN nr
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_feats,
           CAST(sum(lr_micro) // count(*) AS BIGINT) AS dsir_weight_micro
    FROM scored GROUP BY doc_id
    """,
)
def text_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    documents are featurized as HASHED BIGRAMS (md5 → one of 1024
    buckets), a target distribution (here lang='en' docs) and the raw
    corpus distribution are estimated over the buckets with add-1
    smoothing, and each document's weight is its mean bucket likelihood
    ratio p_target/p_raw (the integer-exact variant of the paper's mean
    log-ratio — monotone per feature, and immune to the JVM-vs-libm
    ln() ulp differences that flipped rounding boundaries at sf0.1).
    Resampling by these weights skews a pretraining mixture toward the
    target domain.

    100 TB shape: the bucketed feature space is CONSTANT-sized (1024
    rows) however large the corpus, so both count passes partially
    aggregate map-side into one narrow shuffle each, and scoring is a
    broadcast join — the only corpus-wide shuffle is the per-doc
    aggregation."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n = F.size(toks)
    # bigrams via arrays_zip of two slices, NOT transform(sequence(...),
    # element_at) — the lambda-HOF form runs interpreted with per-element
    # allocation and measured 4x the cold time (8 s vs 2 s at sf0.1) for
    # the identical output
    pairs = F.when(
        n >= 2, F.arrays_zip(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1))
    ).otherwise(F.array().cast("array<struct<`0`:string,`1`:string>>"))
    feats = d.select(
        "doc_id", "lang", F.explode(pairs).alias("p")
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.concat_ws(" ", F.col("p.0"), F.col("p.1")),
                            F.lit(f"#{DSIR_SEED}"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % DSIR_BUCKETS
        ).alias("b"),
    )
    # ONE stats pass builds both distributions (bucket-conditional
    # counts), and the totals reduce the 1024-row stats frame — the
    # corpus is scanned exactly twice (train pass + score pass), not
    # once per distribution
    stats = (
        feats.groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("c_r"),
            F.count(F.when(F.col("lang") == "en", 1)).alias("c_t"),
        )
        # 1024-row frame consumed twice (totals + score-back broadcast);
        # materialized so the train scan runs once — the unmaterialized
        # `tot` branch replayed the whole featurize+groupBy pipeline
        .localCheckpoint(eager=True)
    )
    tot = stats.agg(
        F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t")
    )
    # per-feature log-ratios floor-quantize to integer MICRO-units
    # before the per-doc sum: float summation is partition-order-
    # dependent and a boundary doc rounds differently between engines;
    # integer sums are exact in any order (the repo's micro-unit
    # discipline)
    scored = (
        feats.join(F.broadcast(stats), "b")
        .join(F.broadcast(tot))
        .select(
            "doc_id",
            # per-feature likelihood RATIO in integer micro-units — all
            # integer ops, so no float sum order, decimal-literal typing
            # or JVM-vs-libm ln() ulp difference can flip a value (the
            # sf0.1 sweep caught exactly that with the ln form; ratio vs
            # log-ratio is monotone per feature).  128-bit arithmetic
            # (DECIMAL(38,0) here, HUGEINT in the oracle): the BIGINT
            # form overflowed at sf100 — 1e6·(c_t+1)·(n_r+1024) passes
            # 9.2e18 once the corpus holds ~1e9 bigram features (the
            # r8-f201a70 floor-div overflow class, found again by the
            # r9 sweep as DuckDB OutOfRangeException).  The quotient is
            # ~1e6-scale and lands back in BIGINT.
            F.expr(
                f"CAST((CAST(1000000 AS DECIMAL(38,0)) * (c_t + 1) * "
                f"(n_r + {DSIR_BUCKETS})) div "
                f"(CAST(c_r + 1 AS DECIMAL(38,0)) * (n_t + {DSIR_BUCKETS})) "
                f"AS BIGINT)"
            ).alias("lr_micro"),
        )
    )
    # integer end to end: the mean stays in micro-units via integer
    # division — round() of a float mean diverges between engines on
    # exact half-decimal boundaries (the repo has measured this three
    # times now; see ml_gd_linear_probe)
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_feats"),
        F.expr("CAST(sum(lr_micro) div count(*) AS BIGINT)").alias(
            "dsir_weight_micro"
        ),
    )


def _bpe_encode_oracle() -> str:
    """Training CTEs (the same 3 rounds as text_bpe_merges) feed the
    ENCODE side: every document's words are character-split and each
    trained merge is applied in rank order via the identical
    space-padded replace, then token counts roll up per doc."""
    rounds = ",".join(
        _BPE_ROUND_SQL.format(r=r, w=f"w{r - 1}" if r > 1 else "w0")
        for r in range(1, BPE_MERGE_ROUNDS + 1)
    )
    seq = "trim(regexp_replace(w, '(.)', '\\1 ', 'g'))"
    for r in range(1, BPE_MERGE_ROUNDS + 1):
        seq = (
            f"trim(replace(' ' || {seq} || ' ', "
            f"' ' || (SELECT pair FROM b{r}) || ' ', "
            f"' ' || replace((SELECT pair FROM b{r}), ' ', '') || ' '))"
        )
    return f"""
    WITH w0 AS (
      SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq,
             count(*) AS cnt
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
            FROM documents) t
      GROUP BY seq
    ),{rounds},
    words AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
        FROM documents) t
      WHERE length(w) >= 1
    ),
    enc AS (
      SELECT doc_id, w,
             len(string_split({seq}, ' ')) AS n_tok,
             length(w) AS n_chr
      FROM words
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)    AS n_words,
           CAST(sum(n_chr) AS BIGINT)  AS n_chars,
           CAST(sum(n_tok) AS BIGINT)  AS n_tokens,
           CAST(sum(n_chr) - sum(n_tok) AS BIGINT) AS merged_away
    FROM enc
    GROUP BY doc_id
    """


@query("text_bpe_encode", oracle=_bpe_encode_oracle())
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer ENCODE — the other half of the BPE pair: train the
    merge table (the same 3 corpus-weighted rounds as text_bpe_merges),
    then apply the merges in rank order to every document and report
    per-doc token statistics.  Character-split each word, run each
    merge as the space-padded replace (identical left-to-right
    non-overlapping semantics in Spark, DuckDB and Sennrich's
    reference), count the surviving symbols; merged_away = chars -
    tokens is exactly the number of merge applications.

    Scale shape: training runs on the VOCAB-sized frame (one corpus
    scan + 3 vocab-local rounds, argmax rows collected driver-side —
    metadata-sized); encoding is a per-row JVM codegen chain (k merges
    → k chained replace()s, no Python, no shuffle until the per-doc
    rollup).  With a production-sized merge table (10k+), the same
    semantics move into an Arrow-batched pandas UDF with the merge
    ranks broadcast — the plan shape (scan → per-row encode → rollup)
    is unchanged."""
    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("seq"), "cnt"
        )
    )
    merges: list[str] = []
    for _ in range(BPE_MERGE_ROUNDS):
        pairs = (
            vocab.select(F.split("seq", " ").alias("toks"), "cnt")
            .filter(F.size("toks") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(toks) - 1), i -> "
                        "concat(element_at(toks, i), ' ', "
                        "element_at(toks, i + 1)))"
                    )
                ).alias("pair"),
                "cnt",
            )
            .groupBy("pair")
            .agg(F.sum("cnt").alias("freq"))
        )
        best = pairs.orderBy(F.col("freq").desc(), "pair").first()
        merges.append(best["pair"])
        vocab = vocab.select(
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("seq"), F.lit(" ")),
                    F.lit(f" {best['pair']} "),
                    F.lit(f" {best['pair'].replace(' ', '')} "),
                )
            ).alias("seq"),
            "cnt",
        )
    words = d.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("w"),
    ).filter(F.length("w") >= 1)
    seq = F.trim(F.regexp_replace("w", "(.)", "$1 "))
    for pair in merges:
        seq = F.trim(
            F.replace(
                F.concat(F.lit(" "), seq, F.lit(" ")),
                F.lit(f" {pair} "),
                F.lit(f" {pair.replace(' ', '')} "),
            )
        )
    enc = words.select(
        "doc_id",
        F.size(F.split(seq, " ")).alias("n_tok"),
        F.length("w").alias("n_chr"),
    )
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("n_chr").cast("long").alias("n_chars"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        (F.sum("n_chr") - F.sum("n_tok")).cast("long").alias("merged_away"),
    )


@query(
    "text_charset_scrub",
    oracle=r"""
    SELECT doc_id,
           CAST(length(text) - length(regexp_replace(text,
                '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')) AS BIGINT)
               AS n_control,
           CAST(length(regexp_replace(text, '[\x20-\x7E]', '', 'g'))
               AS BIGINT) AS n_non_printable_ascii,
           contains(text, chr(65533)) AS has_replacement_char,
           CAST(length(regexp_replace(text,
                '[^\x20-\x7E\x09\x0A\x0D]', '', 'g')) AS BIGINT)
               AS clean_len,
           (length(regexp_replace(text, '[\x20-\x7E]', '', 'g')) = 0
            AND NOT contains(text, chr(65533))) AS passes_charset
    FROM documents
    """,
)
def text_charset_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset hygiene — the mojibake/control-character scrub every
    web-scrape ingest runs before training: count C0/DEL control
    characters, non-printable-ASCII weight, U+FFFD replacement-char
    presence (the classic double-decode fingerprint), the post-scrub
    length, and the combined keep decision.

    Pure per-row regexp projections: zero shuffles, whole-stage
    codegen, embarrassingly parallel at 100 TB.  On a multilingual
    corpus the printable-ASCII class widens to Unicode categories; the
    plan shape is identical."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    ctrl = F.length(t) - F.length(
        F.regexp_replace(t, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    )
    non_print = F.length(F.regexp_replace(t, r"[\x20-\x7E]", ""))
    has_fffd = t.contains("�")
    clean_len = F.length(
        F.regexp_replace(t, r"[^\x20-\x7E\x09\x0A\x0D]", "")
    )
    return d.select(
        "doc_id",
        ctrl.cast("long").alias("n_control"),
        non_print.cast("long").alias("n_non_printable_ascii"),
        has_fffd.alias("has_replacement_char"),
        clean_len.cast("long").alias("clean_len"),
        ((non_print == 0) & ~has_fffd).alias("passes_charset"),
    )
