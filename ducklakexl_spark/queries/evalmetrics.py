"""Evaluation & statistics operators for pipeline quality measurement
(SURVEY.md §2.D): ranking-quality metrics (nDCG@k / MRR) for the ANN
index, tie-aware ROC AUC for the quality classifier family, chi-squared
independence testing, Markov transition matrices over event streams,
seasonal decomposition, and group-aware k-fold splitting.

Reference scope: the reference (ducklakexl.py:394) inherits arbitrary
SQL over lake tables; these are the evaluation readouts a curation
pipeline runs before shipping an index / filter / split.  All are
declarative DataFrame plans — no Python UDFs, no collects over data-
sized frames.

Determinism discipline (the cross-engine hash gate):
- nDCG gains are integer micro-units (``round(1e6 / log2(r+1))`` as
  BIGINT) summed in integer arithmetic, so float summation order can't
  perturb the score; the ideal DCG is the same literal expression.
- AUC uses the tie-aware Mann-Whitney form over per-score count
  aggregates — everything integer until the single final division.
- chi-squared terms are rounded before the (bounded, cells-sized) sum.

Scale notes (100 TB):
- ndcg/mrr join two request-sized rankings — cost is the index runs.
- AUC aggregates per distinct score FIRST (one corpus shuffle onto a
  bounded key), then windows over the score-cardinality frame — never
  a global row-level sort of the corpus.
- markov transitions shuffle once on user_id for the lead() window,
  then once on the (state, state') pair — both natural keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ducklakexl_spark.queries import ORACLES, load, query

# registration side-effect: the parent oracles composed below must exist
from ducklakexl_spark.queries import similarity as _similarity  # noqa: F401

# ---------------------------------------------------------------------------
# nDCG@5 + MRR of the IVF ANN ranking vs the brute-force ground truth
# ---------------------------------------------------------------------------

# integer micro-unit discounted gain at rank r — same literal text runs
# in Spark and DuckDB, so the per-rank constants are bit-identical
_GAIN = "CAST(round(1000000 / log2({r} + 1)) AS BIGINT)"
_IDCG5 = " + ".join(_GAIN.format(r=i) for i in range(1, 6))


@query(
    "retrieval_ndcg_mrr",
    # composition: oracle assembled below from the two parent oracles
    oracle=None,
)
def retrieval_ndcg_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality readout for the ANN index: binary-relevance
    nDCG@5 and MRR of the IVF ranking against the brute-force exact
    top-5 (the relevant set), per query.  Complements sim_ivf_recall:
    recall says *how many* true neighbors the index found, nDCG/MRR say
    *how early* it ranked them.  Pure composition of two registered
    operators; the join is (qid, neighbor)-keyed on request-sized
    frames, so at 100 TB the cost is the two index runs."""
    from ducklakexl_spark.queries import QUERIES

    ivf = QUERIES["sim_ivf_topk"](spark, sf_dir).select(
        "qid", "neighbor_id", "rnk"
    )
    bf = QUERIES["sim_bruteforce_topk"](spark, sf_dir).select(
        "qid", "neighbor_id", F.lit(1).alias("rel")
    )
    j = ivf.join(bf, ["qid", "neighbor_id"], "left")
    gain = F.when(
        F.col("rel").isNotNull(), F.expr(_GAIN.format(r="rnk"))
    ).otherwise(F.lit(0).cast("long"))
    perq = j.groupBy("qid").agg(
        F.sum(gain).alias("dcg_micro"),
        F.min(F.when(F.col("rel").isNotNull(), F.col("rnk"))).alias(
            "first_hit"
        ),
    )
    return perq.select(
        "qid",
        F.round(
            F.col("dcg_micro").cast("double") / F.expr(f"({_IDCG5})"), 6
        ).alias("ndcg_at_5"),
        F.round(
            F.coalesce(
                F.lit(1).cast("double") / F.col("first_hit"), F.lit(0.0)
            ),
            6,
        ).alias("mrr"),
    )


ORACLES["retrieval_ndcg_mrr"] = f"""
    WITH ivf AS (SELECT * FROM ({ORACLES["sim_ivf_topk"]}) t),
         bf  AS (SELECT * FROM ({ORACLES["sim_bruteforce_topk"]}) t),
         j AS (
           SELECT ivf.qid, ivf.rnk,
                  bf.neighbor_id IS NOT NULL AS hit
           FROM ivf LEFT JOIN bf ON ivf.qid = bf.qid
                                AND ivf.neighbor_id = bf.neighbor_id
         ),
         perq AS (
           SELECT qid,
                  sum(CASE WHEN hit THEN {_GAIN.format(r="rnk")}
                           ELSE CAST(0 AS BIGINT) END) AS dcg_micro,
                  min(CASE WHEN hit THEN rnk END) AS first_hit
           FROM j GROUP BY qid
         )
    SELECT qid,
           round(CAST(dcg_micro AS DOUBLE) / ({_IDCG5}), 6) AS ndcg_at_5,
           round(coalesce(CAST(1 AS DOUBLE) / first_hit, 0.0), 6) AS mrr
    FROM perq
"""


# ---------------------------------------------------------------------------
# tie-aware ROC AUC (Mann-Whitney) of a document score vs a label
# ---------------------------------------------------------------------------

@query(
    "ml_auc_quality",
    oracle="""
    WITH per AS (
      SELECT n_chars AS s,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p,
             sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS q
      FROM documents GROUP BY n_chars
    ),
    cum AS (
      SELECT p, q,
             coalesce(sum(q) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cq
      FROM per
    )
    SELECT CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(q) AS BIGINT) AS n_neg,
           round(CAST(sum(p * (2 * cq + q)) AS DOUBLE)
                 / (2.0 * sum(p) * sum(q)), 6) AS auc
    FROM cum
    """,
)
def ml_auc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-aware ROC AUC (Mann-Whitney U form) of the document-length
    score as a detector for lang='en' — the evaluation every quality
    classifier needs before it gates a corpus.  Shape: aggregate to
    per-distinct-score (pos, neg) counts FIRST (one corpus shuffle onto
    the bounded score key), then a running-negatives window over the
    score-cardinality frame; every term stays integer until the final
    division, so engines can't disagree.  A row-level rank() over the
    corpus — the textbook formulation — would be a global sort; this
    is the same number without one."""
    d = load(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("s"),
        (F.col("lang") == "en").alias("pos"),
    )
    per = d.groupBy("s").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("p"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("q"),
    )
    w = W.orderBy("s").rowsBetween(W.unboundedPreceding, -1)
    cum = per.withColumn(
        "cq", F.coalesce(F.sum("q").over(w), F.lit(0))
    )
    return cum.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("q").cast("long").alias("n_neg"),
        F.round(
            F.sum(F.col("p") * (2 * F.col("cq") + F.col("q"))).cast("double")
            / (2.0 * F.sum("p") * F.sum("q")),
            6,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# chi-squared independence test: event_type x time-of-day quadrant
# ---------------------------------------------------------------------------

@query(
    "stats_chi_squared",
    oracle="""
    WITH o AS (
      SELECT event_type AS et, CAST(hour(ts) // 6 AS BIGINT) AS b,
             count(*) AS o
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT et, b, o,
             sum(o) OVER (PARTITION BY et) AS rt,
             sum(o) OVER (PARTITION BY b) AS ct,
             sum(o) OVER () AS n
      FROM o
    ),
    terms AS (
      SELECT n,
             round(pow(o - CAST(rt AS DOUBLE) * ct / n, 2)
                   / (CAST(rt AS DOUBLE) * ct / n), 6) AS term,
             count(*) OVER (PARTITION BY et) AS nb,
             count(*) OVER (PARTITION BY b) AS nr
      FROM tot
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST((max(nb) - 1) * (max(nr) - 1) AS BIGINT) AS dof,
           round(sum(term), 4) AS chi2,
           round(sqrt(sum(term) / (max(n)
                 * least(max(nb) - 1, max(nr) - 1))), 6) AS cramers_v
    FROM terms
    """,
)
def stats_chi_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence test between event_type and time-of-day
    quadrant (hour DIV 6), plus Cramér's V effect size — the categorical
    A/B readout next to stats_welch_ttest's continuous one.  One corpus
    aggregation onto the (type, quadrant) key; row/column/grand totals
    are windows over the CELLS frame (bounded by the category product,
    never corpus-sized).  Per-cell terms are rounded before the bounded
    sum so float order can't move the 4-dp statistic."""
    ev = load(spark, sf_dir, "events")
    o = ev.groupBy(
        F.col("event_type").alias("et"),
        (F.hour("ts") / 6).cast("int").cast("long").alias("b"),
    ).agg(F.count("*").alias("o"))
    tot = o.select(
        "et",
        "b",
        "o",
        F.sum("o").over(W.partitionBy("et")).alias("rt"),
        F.sum("o").over(W.partitionBy("b")).alias("ct"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    e = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    terms = tot.select(
        "n",
        F.round(F.pow(F.col("o") - e, 2) / e, 6).alias("term"),
        F.count("*").over(W.partitionBy("et")).alias("nb"),
        F.count("*").over(W.partitionBy("b")).alias("nr"),
    )
    chi2 = F.sum("term")
    return terms.agg(
        F.max("n").cast("long").alias("n"),
        ((F.max("nb") - 1) * (F.max("nr") - 1)).cast("long").alias("dof"),
        F.round(chi2, 4).alias("chi2"),
        F.round(
            F.sqrt(
                chi2
                / (F.max("n") * F.least(F.max("nb") - 1, F.max("nr") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event streams
# ---------------------------------------------------------------------------

@query(
    "events_markov_transitions",
    oracle="""
    WITH pairs AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    cnt AS (
      SELECT src, dst, count(*) AS n FROM pairs
      WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY src), 6) AS prob
    FROM cnt
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream (the user-journey model behind funnel design and synthetic
    session generation).

    SEGMENTED shape (VERDICT-r8 task 8, same discipline as
    events_pattern_match): the r8 lead()-window version sorted each
    user's whole stream in one task — a hot-key straggler at sf100.
    Consecutive-pair extraction decomposes exactly: bucket each user's
    events into 60-s time chunks (equal-ts ties stay in one chunk, so
    (ts, event_id) order is preserved across boundaries), emit each
    chunk's internal adjacent pairs from its bounded ordered array
    (zip with its own tail), and stitch the chunk-boundary pairs
    (chunk k's last event -> chunk k+1's first event) from a per-user
    fold over ≤43k (chunk, first, last) summaries.  The (src, dst)
    count partial-aggregates map-side into the 5x5 category square;
    row normalization is a window over that square (tiny at any corpus
    size).

    r9 optimization (guide §2.4 / §1.2): the first segmented shape kept
    in-chunk pairs and boundary stitching as two separate DAG branches,
    and each branch re-evaluated the per-(user, chunk) collect_list
    pipeline from its own events scan — 2 corpus scans, 5 exchanges.
    Boundary pairs only need the PREVIOUS chunk's tail, so the stitch
    is now a lag() window over the chunk summaries (partitioned by
    user, ordered by chunk_id — rows per partition = chunk count,
    bounded at any corpus size, never the raw stream), concatenated
    with the in-chunk pairs and exploded once: 1 scan, 3 exchanges.
    Pair multiset identical (both stitch consecutive EXISTING chunks);
    verified exact vs the unchanged oracle at sf0.001/0.01/0.1/sf1."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    per_chunk = (
        ev.withColumn(
            "chunk_id", F.floor(F.unix_timestamp("ts") / F.lit(60))
        )
        .groupBy("user_id", "chunk_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s.event_type,
            ).alias("seq")
        )
    )
    adjacent = lambda arr: F.zip_with(  # noqa: E731 — (x_i, x_{i+1}) pairs
        arr,
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("src"), b.alias("dst")),
    )
    wu = W.partitionBy("user_id").orderBy("chunk_id")
    with_prev = per_chunk.select(
        "seq", F.lag(F.element_at("seq", -1)).over(wu).alias("prev_tail")
    )
    pairs_arr = F.concat(
        adjacent(F.col("seq")),
        F.when(
            F.col("prev_tail").isNotNull(),
            F.array(
                F.struct(
                    F.col("prev_tail").alias("src"),
                    F.element_at("seq", 1).alias("dst"),
                )
            ),
        ).otherwise(F.array().cast("array<struct<src:string,dst:string>>")),
    )
    pairs = (
        with_prev.select(F.explode(pairs_arr).alias("p"))
        .select("p.src", "p.dst")
        .filter(F.col("dst").isNotNull())
    )
    cnt = pairs.groupBy("src", "dst").agg(F.count("*").alias("n"))
    return cnt.select(
        "src",
        "dst",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(W.partitionBy("src")),
            6,
        ).alias("prob"),
    )


# ---------------------------------------------------------------------------
# seasonal decomposition: hour-of-day profile + seasonal index
# ---------------------------------------------------------------------------

@query(
    "events_seasonal_decompose",
    oracle="""
    WITH hod AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
             count(*) AS n,
             sum(CAST(round(value * 1000000) AS BIGINT)) AS sm
      FROM events GROUP BY 1, 2
    ),
    m4 AS (
      SELECT event_type, hod, n,
             -- (sm*1e4)//(n*1e6) == sm//(n*100) exactly (common 1e4
             -- factor cancels in floor division); the unreduced form
             -- overflowed BIGINT at sf100 (tsm*10000 ~ 1e19 > 2^63)
             sm // (n * 100) AS mean4,
             sum(sm) OVER (PARTITION BY event_type)
               // (sum(n) OVER (PARTITION BY event_type) * 100)
               AS tmean4
      FROM hod
    )
    SELECT event_type, hod, CAST(n AS BIGINT) AS n,
           CAST(mean4 AS DOUBLE) / 10000 AS hod_mean,
           CAST((mean4 * 10000) // tmean4 AS DOUBLE) / 10000
             AS seasonal_idx
    FROM m4
    """,
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per event type: mean value per
    (type, hour) plus the seasonal index (hour mean / type mean) — the
    classical-decomposition seasonal component, the baseline behind the
    z-score anomaly op.  One corpus aggregation onto the bounded
    (type, hour) key; the type-level mean is reassembled from the
    already-aggregated cells (a window over ≤ types×24 rows), so the
    corpus is scanned exactly once.  Values accumulate as integer
    micro-units and the 4-dp means come from integer FLOOR division —
    never a float sum and never a round() on a decimal boundary, where
    Spark (shortest-string HALF_UP) and DuckDB (binary-value rounding)
    legitimately disagree by one ulp."""
    ev = load(spark, sf_dir, "events")
    hod = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hod")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("sm"),
    )
    wt = W.partitionBy("event_type")
    m4 = hod.withColumn("tsm", F.sum("sm").over(wt)).withColumn(
        "tn", F.sum("n").over(wt)
    ).select(
        "event_type",
        "hod",
        "n",
        # reduced form: the 1e4 factor cancels exactly in floor
        # division; (tsm * 10000) overflowed BIGINT at sf100
        F.expr("sm DIV (n * 100)").alias("mean4"),
        F.expr("tsm DIV (tn * 100)").alias("tmean4"),
    )
    return m4.select(
        "event_type",
        "hod",
        F.col("n").cast("long").alias("n"),
        (F.col("mean4").cast("double") / 10000).alias("hod_mean"),
        (
            F.expr("(mean4 * 10000) DIV tmean4").cast("double") / 10000
        ).alias("seasonal_idx"),
    )


# ---------------------------------------------------------------------------
# group-aware k-fold split (no user straddles folds)
# ---------------------------------------------------------------------------

from ducklakexl_spark.queries.text import _hash_pct_sql  # noqa: E402

_FOLD_SQL = f"CAST({_hash_pct_sql('user_id')} % 5 AS BIGINT)"


@query(
    "split_group_kfold",
    oracle=f"""
    WITH tagged AS (
      SELECT {_FOLD_SQL} AS fold, user_id, value FROM events
    )
    SELECT fold,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_value
    FROM tagged GROUP BY fold
    """,
)
def split_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware 5-fold split: every event lands in the fold of its
    USER (portable md5 bucket), so no user's history straddles a
    train/eval boundary — the leakage-free cross-validation split
    (GroupKFold).  Assignment is a per-row hash (no shuffle); the
    per-fold audit is one aggregation.  Leakage-freedom holds by
    construction: the fold is a pure function of user_id."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(F.expr(_FOLD_SQL).alias("fold"), "user_id", "value")
        .groupBy("fold")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count("*").alias("n_events"),
            # exact-cents sum (see agg_having): 20M-row folds at sf100
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# OLS linear regression from one-pass sufficient statistics
# ---------------------------------------------------------------------------

@query(
    "stats_linear_regression",
    oracle="""
    WITH s AS (
      SELECT event_type,
             count(*) AS n,
             sum(hour(ts)) AS sx,
             sum(hour(ts) * hour(ts)) AS sxx,
             sum(CAST(round(value * 100) AS BIGINT)) AS sy,
             sum(CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS BIGINT)) AS syy,
             sum(hour(ts) * CAST(round(value * 100) AS BIGINT)) AS sxy
      FROM events GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (n * sxx - sx * sx) / 100, 6) AS slope,
           round((CAST(sy AS DOUBLE) / 100
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / (n * sxx - sx * sx) / 100 * sx) / n, 6) AS intercept,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
    FROM s
    """,
)
def stats_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS regression of value on hour-of-day, computed
    entirely from ONE-PASS sufficient statistics (n, Σx, Σx², Σy, Σy²,
    Σxy) — the only shape that regresses 100 TB: a single partial-
    aggregated scan, slope/intercept/R² assembled from six numbers per
    group.  y accumulates as exact centi-unit integers and x is an
    integer hour, so every sufficient statistic is an exact BIGINT —
    float summation order cannot move the coefficients."""
    ev = load(spark, sf_dir, "events")
    x = F.hour("ts").cast("long")
    y = F.round(F.col("value") * 100).cast("long")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    # the combine products (n*syy, sy*sy ~ 4e22 at sf10) overflow
    # BIGINT; DuckDB silently widens to HUGEINT, Spark needs the exact
    # 128-bit arithmetic spelled as DECIMAL(38,0)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = dec("n") * dec("sxy") - dec("sx") * dec("sy")
    dxx = dec("n") * dec("sxx") - dec("sx") * dec("sx")
    dyy = dec("n") * dec("syy") - dec("sy") * dec("sy")
    slope = num.cast("double") / dxx / 100
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy").cast("double") / 100 - slope * F.col("sx"))
            / F.col("n"),
            6,
        ).alias("intercept"),
        F.round(
            num.cast("double") * num.cast("double")
            / (dxx.cast("double") * dyy.cast("double")),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# filter-agreement confusion matrix + precision/recall/F1
# ---------------------------------------------------------------------------

@query(
    "ml_confusion_f1",
    # composition: oracle assembled below from the two filter oracles
    oracle=None,
)
def ml_confusion_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall/F1 of the C4 keep/drop
    decision treated as a predictor of the quality-score gate — the
    filter-agreement audit run before swapping one corpus filter for a
    cheaper one.  Every metric is a ratio of exact integer counts.

    r9 (guide §2.4): the two filter operators are both zero-shuffle
    projections of the SAME documents scan, so composing them as a
    doc_id equi-join cost two full text scans plus two corpus-wide
    doc-keyed exchanges just to line each document up with itself.  The
    fused form evaluates both keep/drop predicates (expression-identical
    to text_c4_filters.passes_c4 / text_quality_score.passes_quality —
    the composed oracle pins them) in ONE projection: one scan, zero
    data-sized shuffles; the only aggregation is the 1-row count frame."""
    d = load(spark, sf_dir, "documents")
    text = F.col("text")
    lower = F.lower(text)
    n_words = F.size(F.split(F.trim(text), r"\s+"))
    pred = (
        F.trim(text).rlike('[.!?"]$')
        & ~lower.contains("lorem ipsum")
        & ~text.contains("{")
        & ~lower.contains("javascript")
        & (n_words.cast("long") >= 5)
    )
    punct_ratio = (
        F.length(F.regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("double")
        / F.length(text)
    )
    actual = n_words.between(20, 1000) & (punct_ratio < 0.1)
    j = d.select(pred.alias("pred"), actual.alias("actual"))
    agg = j.agg(
        F.count_if(F.col("pred") & F.col("actual")).alias("tp"),
        F.count_if(F.col("pred") & ~F.col("actual")).alias("fp"),
        F.count_if(~F.col("pred") & F.col("actual")).alias("fn"),
        F.count_if(~F.col("pred") & ~F.col("actual")).alias("tn"),
    )
    prec = F.col("tp").cast("double") / F.nullif(
        F.col("tp") + F.col("fp"), F.lit(0)
    )
    rec = F.col("tp").cast("double") / F.nullif(
        F.col("tp") + F.col("fn"), F.lit(0)
    )
    return agg.select(
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        F.round(F.coalesce(prec, F.lit(0.0)), 6).alias("precision_"),
        F.round(F.coalesce(rec, F.lit(0.0)), 6).alias("recall_"),
        F.round(
            F.coalesce(2 * prec * rec / F.nullif(prec + rec, F.lit(0.0)),
                       F.lit(0.0)),
            6,
        ).alias("f1"),
        F.round(
            (F.col("tp") + F.col("tn")).cast("double")
            / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")),
            6,
        ).alias("accuracy"),
    )


ORACLES["ml_confusion_f1"] = """
    WITH c4 AS (SELECT doc_id, passes_c4 AS pred FROM ({c4}) t),
         q  AS (SELECT doc_id, passes_quality AS actual FROM ({q}) t),
         m AS (
           SELECT sum(CASE WHEN pred AND actual THEN 1 ELSE 0 END) AS tp,
                  sum(CASE WHEN pred AND NOT actual THEN 1 ELSE 0 END) AS fp,
                  sum(CASE WHEN NOT pred AND actual THEN 1 ELSE 0 END) AS fn,
                  sum(CASE WHEN NOT pred AND NOT actual THEN 1 ELSE 0 END)
                    AS tn
           FROM c4 JOIN q USING (doc_id)
         ),
         r AS (
           SELECT tp, fp, fn, tn,
                  CAST(tp AS DOUBLE) / nullif(tp + fp, 0) AS prec,
                  CAST(tp AS DOUBLE) / nullif(tp + fn, 0) AS rec
           FROM m
         )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           round(coalesce(prec, 0.0), 6) AS precision_,
           round(coalesce(rec, 0.0), 6) AS recall_,
           round(coalesce(2 * prec * rec / nullif(prec + rec, 0.0), 0.0), 6)
             AS f1,
           round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6)
             AS accuracy
    FROM r
"""


# ---------------------------------------------------------------------------
# calibration curve (reliability bins) of a length-based quality score
# ---------------------------------------------------------------------------

@query(
    "ml_calibration_bins",
    # composition: label comes from the registered C4 filter
    oracle=None,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram data for a [0,1] length-based quality score
    against the C4 keep decision: 10 fixed-width bins, per bin the
    count, exact integer mean score (floor-division), and observed
    positive rate — the calibration audit run before a score becomes a
    sampling weight.  All ratios from exact integers.

    r9 (guide §2.4): the C4 label is a zero-shuffle predicate over the
    same documents table as the score column, so the former doc_id
    self-equi-join (2 scans + 2 corpus exchanges) fuses into ONE
    projection computing (nc, label) together — one scan, and the only
    shuffle is the 10-key bin aggregation (expression pinned by the
    composed oracle)."""
    text = F.col("text")
    lower = F.lower(text)
    label = (
        F.trim(text).rlike('[.!?"]$')
        & ~lower.contains("lorem ipsum")
        & ~text.contains("{")
        & ~lower.contains("javascript")
        & (F.size(F.split(F.trim(text), r"\s+")).cast("long") >= 5)
    )
    j = load(spark, sf_dir, "documents").select(
        F.least(F.col("n_chars"), F.lit(999)).alias("nc"),
        label.alias("label"),
    )
    return (
        j.groupBy(F.expr("nc DIV 100").alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.sum("nc").alias("snc"),
            F.count_if(F.col("label")).alias("npos"),
        )
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.col("n").cast("long").alias("n"),
            (F.expr("snc DIV n").cast("double") / 1000).alias("mean_score"),
            F.round(F.col("npos").cast("double") / F.col("n"), 6).alias(
                "frac_positive"
            ),
        )
    )


ORACLES["ml_calibration_bins"] = """
    WITH d AS (
      SELECT doc_id, least(n_chars, 999) AS nc FROM documents
    ),
    c4 AS (SELECT doc_id, passes_c4 AS label FROM ({c4}) t),
    g AS (
      SELECT nc // 100 AS bin, count(*) AS n, sum(nc) AS snc,
             sum(CASE WHEN label THEN 1 ELSE 0 END) AS npos
      FROM d JOIN c4 USING (doc_id)
      GROUP BY 1
    )
    SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
           CAST(snc // n AS DOUBLE) / 1000 AS mean_score,
           round(CAST(npos AS DOUBLE) / n, 6) AS frac_positive
    FROM g
"""

from ducklakexl_spark.queries import text as _text  # noqa: E402,F401

ORACLES["ml_confusion_f1"] = ORACLES["ml_confusion_f1"].format(
    c4=ORACLES["text_c4_filters"], q=ORACLES["text_quality_score"]
)
ORACLES["ml_calibration_bins"] = ORACLES["ml_calibration_bins"].format(
    c4=ORACLES["text_c4_filters"]
)
