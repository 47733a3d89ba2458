"""Data-quality / distribution-drift monitoring (SURVEY.md §2.D extension
surface): the metrics an ML-ops pipeline computes on every ingest batch
before letting it into a training set — Population Stability Index
between time periods, and robust (median/MAD) per-segment statistics
that outliers can't drag the way mean/stddev can.

Scale shape shared by both: the raw scan reduces to a BOUNDED aggregate
(10 bins, |event_type| groups) in one map-side-partial shuffle; all the
arithmetic after that runs on metadata-sized frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ducklakexl_spark.queries import load, query

# Fixed-width value bins (deterministic — unlike quantile-derived cut
# points, a bin edge can never move by 1 ulp between engines) and a
# mid-month split of the fixture's single month of events.
BIN_W = 50
N_BINS = 10
SPLIT = "2024-01-16"


@query(
    "drift_psi",
    oracle=f"""
    WITH counts AS (
      SELECT least(CAST(floor(value / {BIN_W}) AS BIGINT), {N_BINS - 1}) AS bin,
             CAST(sum(CASE WHEN ts < TIMESTAMP '{SPLIT}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ref,
             CAST(sum(CASE WHEN ts < TIMESTAMP '{SPLIT}' THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_cur
      FROM events GROUP BY 1
    ),
    grid AS (
      SELECT g.bin, coalesce(c.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur
      FROM (SELECT unnest(generate_series(0, {N_BINS - 1})) AS bin) g
      LEFT JOIN counts c ON c.bin = g.bin
    ),
    probs AS (
      -- explicit DOUBLE literals: Spark parses a bare 0.5 as DECIMAL,
      -- and decimal division would change the output type (not values)
      SELECT bin, n_ref, n_cur,
             (n_ref + CAST(0.5 AS DOUBLE))
               / (sum(n_ref) OVER () + CAST({N_BINS / 2.0} AS DOUBLE)) AS p_ref,
             (n_cur + CAST(0.5 AS DOUBLE))
               / (sum(n_cur) OVER () + CAST({N_BINS / 2.0} AS DOUBLE)) AS p_cur
      FROM grid
    )
    SELECT bin, n_ref, n_cur,
           round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
           round((p_ref - p_cur) * ln(p_ref / p_cur), 6) AS psi_term
    FROM probs
    """,
)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index terms of the event-value distribution,
    first half of the month (reference) vs second half (current) — the
    standard go/no-go drift gate in front of a model retrain.

    One events scan folds into a 10-row (bin x [ref,cur]) contingency
    table — conditional aggregation, map-side partial, one shuffle whose
    cardinality is the BIN COUNT, not the data size.  The dense bin grid
    comes from a generated range (absent bins must exist to be scored),
    probabilities are Laplace-smoothed so an empty bin can't produce
    ln(0), and the window totals run over the 10-row frame — driver-free
    and constant-cost at any corpus size.  Fixed-width bins keep the
    edges bit-identical across engines (quantile-derived edges can differ
    by 1 ulp and flip boundary values between bins).
    """
    ev = load(spark, sf_dir, "events").select("value", "ts")
    is_ref = (F.col("ts") < F.lit(SPLIT).cast("timestamp")).cast("long")
    counts = (
        ev.select(
            F.least(
                F.floor(F.col("value") / BIN_W).cast("long"), F.lit(N_BINS - 1)
            ).alias("bin"),
            is_ref.alias("r"),
        )
        .groupBy("bin")
        .agg(
            F.sum("r").alias("n_ref"),
            F.sum(1 - F.col("r")).alias("n_cur"),
        )
    )
    grid = (
        spark.range(0, N_BINS)
        .select(F.col("id").alias("bin"))
        .join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    w = Window.partitionBy()
    p_ref = (F.col("n_ref") + 0.5) / (F.sum("n_ref").over(w) + N_BINS / 2.0)
    p_cur = (F.col("n_cur") + 0.5) / (F.sum("n_cur").over(w) + N_BINS / 2.0)
    return grid.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_ref - p_cur) * F.log(p_ref / p_cur), 6).alias("psi_term"),
    )


@query(
    "robust_stats_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, count(*) AS n,
             round(quantile_cont(value, 0.5), 6) AS median_value
      FROM events GROUP BY event_type
    )
    SELECT m.event_type, m.n, m.median_value,
           round(quantile_cont(abs(e.value - m.median_value), 0.5), 6)
             AS mad
    FROM events e JOIN med m ON e.event_type = m.event_type
    GROUP BY m.event_type, m.n, m.median_value
    """,
)
def robust_stats_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median and median-absolute-deviation of event values per event
    type — the outlier-robust location/scale pair data-quality rules
    threshold against (|x - median| > k * MAD).

    Two passes by definition (MAD needs the median first): pass one
    aggregates the exact interpolated median per type; pass two joins it
    back (broadcast — |event_type| rows) and aggregates the absolute
    deviations.  Both shuffles key on event_type with map-side partials.
    The median is ROUNDED to 6 dp before the join-back so both engines
    measure deviations from the bit-identical pivot; both compute the
    even-count midpoint as lower + (upper - lower) * 0.5.
    """
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.median("value"), 6).alias("median_value"),
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "n", "median_value")
        .agg(
            F.round(
                F.median(F.abs(F.col("value") - F.col("median_value"))), 6
            ).alias("mad")
        )
        .select("event_type", "n", "median_value", "mad")
    )


@query(
    "stats_welch_ttest",
    oracle="""
    WITH g AS (
      SELECT event_type,
             count(*) AS n,
             sum(value) AS s,
             sum(value * value) AS ss
      FROM events GROUP BY event_type
    ),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.s / a.n AS m1, b.s / b.n AS m2,
             (a.ss - a.s * a.s / a.n) / (a.n - 1) AS v1,
             (b.ss - b.s * b.s / b.n) / (b.n - 1) AS v2,
             a.n AS n1, b.n AS n2
      FROM g a JOIN g b ON a.event_type < b.event_type
    )
    SELECT type_a, type_b,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
           round(pow(v1 / n1 + v2 / n2, 2)
                 / (pow(v1 / n1, 2) / (n1 - 1)
                    + pow(v2 / n2, 2) / (n2 - 1)), 2) AS welch_df,
           (abs((m1 - m2) / sqrt(v1 / n1 + v2 / n2)) > 1.96)
             AS significant_95
    FROM p
    """,
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test over every event-type pair — the
    A/B-experiment readout (does metric `value` differ between
    variants?): per-group sufficient statistics (n, sum, sum-of-squares)
    from ONE corpus pass, then the t statistic and Welch-Satterthwaite
    degrees of freedom assembled on the 10-row pair frame.  At 100 TB
    the corpus is touched once with map-side partial aggregation; the
    test itself is metadata-sized.  significant_95 uses the asymptotic
    normal threshold (df > 1000 here).

    r9 (guide §2.4): the pair frame is generated by double-exploding ONE
    collected array of the per-type stats instead of theta-self-joining
    the aggregate — the old plan re-ran the corpus aggregation for each
    join side (2 events scans) and stitched them with a
    BroadcastNestedLoopJoin; now the corpus is scanned once and the
    pairing is a linear Generate chain over 5 metadata rows."""
    g = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.sum(F.col("value") * F.col("value")).alias("ss"),
        )
    )
    gs = g.agg(
        F.collect_list(F.struct("event_type", "n", "s", "ss")).alias("gs")
    )
    p = (
        gs.select(F.explode("gs").alias("a"), "gs")
        .select("a", F.explode("gs").alias("b"))
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.n").alias("n1"),
            F.col("a.s").alias("s1"),
            F.col("a.ss").alias("ss1"),
            F.col("b.n").alias("n2"),
            F.col("b.s").alias("s2"),
            F.col("b.ss").alias("ss2"),
        )
        .withColumn("m1", F.col("s1") / F.col("n1"))
        .withColumn("m2", F.col("s2") / F.col("n2"))
        .withColumn(
            "v1",
            (F.col("ss1") - F.col("s1") * F.col("s1") / F.col("n1"))
            / (F.col("n1") - 1),
        )
        .withColumn(
            "v2",
            (F.col("ss2") - F.col("s2") * F.col("s2") / F.col("n2"))
            / (F.col("n2") - 1),
        )
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    t = (F.col("m1") - F.col("m2")) / F.sqrt(se2)
    df_w = F.pow(se2, 2) / (
        F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
        + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
    )
    return p.select(
        "type_a",
        "type_b",
        F.round(t, 4).alias("t_stat"),
        F.round(df_w, 2).alias("welch_df"),
        (F.abs(t) > 1.96).alias("significant_95"),
    )
