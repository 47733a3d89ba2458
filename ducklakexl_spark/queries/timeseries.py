"""Time-series operators over the events/lineitem tables (SURVEY.md §2.D
extension surface): gap-filling with last-observation-carried-forward,
exponential moving averages, and rolling correlation — the hypertable /
continuous-aggregate workload the reference's query plane reaches through
DuckDB pass-through (/root/reference/ducklakexl/ducklakexl.py:394) and a
feature-store pipeline runs on every ingest.

Scale notes common to all three: every shuffle is keyed on the series id
(user_id / l_suppkey), partial aggregation runs map-side, and the dense
grid for gap-filling is *generated* per-series with ``sequence`` — the
grid never crosses a shuffle at event granularity, and AQE reuses one
exchange layout across the agg → span → join → window chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ducklakexl_spark.queries import load, query


@query(
    "events_gapfill_locf",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(round(sum(CAST(value AS DECIMAL(18,2))), 6) AS DOUBLE)
               AS v
      FROM events WHERE user_id % 10 = 0
      GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM span
    )
    SELECT g.user_id,
           strftime(g.h, '%Y-%m-%d %H:00') AS hour,
           last_value(o.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v_filled,
           o.v IS NULL AS was_gap
    FROM grid g
    LEFT JOIN hourly o ON g.user_id = o.user_id AND g.h = o.h
    """,
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill an hourly per-user rollup to a dense grid and fill holes
    with the last observed value (LOCF) — the TimescaleDB
    ``time_bucket_gapfill`` + ``locf`` shape.

    Scale shape (r9, guide §2.4): the hourly rollup is ONE shuffle on
    (user_id, hour) with map-side partial sums; then every observation
    row generates its own gap-run map-side — ``lead(h)`` names the next
    observation and ``sequence(h, next - 1h)`` emits the observed hour
    plus the gap hours it carries forward, which IS
    last-observation-carried-forward by construction.  The old shape
    derived a span aggregate and a dense grid from a second reference to
    the rollup (replaying the corpus groupBy), left-joined the two, and
    ran an ignore-nulls window; all three collapse into one ``lead``
    window over the user-hour-sized rollup.  The user filter (``% 10``)
    stands in for the series predicate a dashboard would push — it
    reaches the parquet scan.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        # exact-cents sum (see agg_having): reduce-order-stable at sf100
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 6)
        .cast("double")
        .alias("v")
    )
    wl = Window.partitionBy("user_id").orderBy("h")
    return (
        hourly.select(
            "user_id", "h", "v", F.lead("h").over(wl).alias("h_next")
        )
        .select(
            "user_id",
            "v",
            F.col("h").alias("h_obs"),
            F.explode(
                F.sequence(
                    "h",
                    F.coalesce(
                        F.col("h_next") - F.expr("INTERVAL 1 HOUR"),
                        F.col("h"),
                    ),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("g"),
        )
        .select(
            "user_id",
            F.date_format("g", "yyyy-MM-dd HH:00").alias("hour"),
            F.col("v").alias("v_filled"),
            (F.col("g") != F.col("h_obs")).alias("was_gap"),
        )
    )


@query(
    "events_ewma",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           round(list_reduce(list(value ORDER BY ts, event_id),
                             (acc, x) -> acc * 0.7 + x * 0.3), 6) AS ewma
    FROM events
    GROUP BY user_id
    """,
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average (alpha = 0.3) over the event
    value series, seeded at the first observation — the classic
    smoothing recurrence no built-in window function expresses.

    Expressed as ONE groupBy(user_id) collecting the ordered series into
    an array, then a JVM-side higher-order ``aggregate`` fold — no Python
    in the loop, one shuffle, map-side partial collect.  The fold is
    sequential per series by definition (each EWMA value depends on the
    previous), so an array fold inside the row is exactly the right
    parallelism: series × partitions run concurrently, the recurrence
    itself stays local.  Order is pinned by (ts, event_id) on both
    engines, and both fold left-to-right in doubles, so results are
    bit-identical before the final rounding.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s.value,
    )
    ewma = F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1),
        lambda acc, x: acc * 0.7 + x * 0.3,
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(ewma, 6).alias("ewma"),
        )
    )


# Day-number anchor for the RANGE frame: both engines order by an integer
# day offset so the 30-day trailing frame is the same closed interval.
_EPOCH = "1992-01-01"


@query(
    "supplier_rolling_corr",
    oracle=f"""
    WITH ranked AS (
      SELECT l_suppkey,
             count(*) OVER w AS n_frame,
             sum(CAST(l_quantity AS DOUBLE)) OVER w AS sx,
             sum(l_extendedprice) OVER w AS sy,
             sum(CAST(l_quantity AS DOUBLE) * l_extendedprice) OVER w AS sxy,
             sum(CAST(l_quantity AS DOUBLE) * l_quantity) OVER w AS sxx,
             sum(l_extendedprice * l_extendedprice) OVER w AS syy,
             row_number() OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC
             ) AS rn
      FROM lineitem
      WINDOW w AS (
        PARTITION BY l_suppkey
        ORDER BY date_diff('day', DATE '{_EPOCH}', l_shipdate)
        RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
      )
    )
    SELECT l_suppkey, n_frame,
           round((n_frame * sxy - sx * sy)
                 / nullif(sqrt((n_frame * sxx - sx * sx)
                               * (n_frame * syy - sy * sy)), 0),
                 6) AS rolling_corr
    FROM ranked WHERE rn = 1
    """,
)
def supplier_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day rolling correlation of quantity vs price per
    supplier, reported at each supplier's latest shipment — the
    risk-metrics window shape (rolling beta/corr over a time RANGE, not a
    row count).

    The RANGE frame orders by an integer day offset so the trailing
    window is a value interval: suppliers shipping on sparse days get
    exactly the last 30 calendar days, not the last N rows.  One shuffle
    on l_suppkey serves all six frame sums and the latest-row pick.  The
    correlation assembles from plain SUM/COUNT window aggregates (the
    textbook co-moment identity) rather than the ``corr`` window
    function: Spark's ANSI-mode corr raises DIVIDE_BY_ZERO on 1-row
    frames, while the explicit form null-guards the denominator — and
    identical sums on both engines make the 6-dp rounding exact (the
    operands here keep variance ~ mean², so the subtraction loses no
    meaningful precision).
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    d = F.datediff("l_shipdate", F.lit(_EPOCH).cast("date"))
    wf = (
        Window.partitionBy("l_suppkey").orderBy(d.alias("d")).rangeBetween(-29, 0)
    )
    wr = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_shipdate").desc(), F.col("l_orderkey").desc(),
        F.col("l_linenumber").desc(),
    )
    n = F.count(F.lit(1)).over(wf)
    sx = F.sum("x").over(wf)
    sy = F.sum("y").over(wf)
    sxy = F.sum(F.col("x") * F.col("y")).over(wf)
    sxx = F.sum(F.col("x") * F.col("x")).over(wf)
    syy = F.sum(F.col("y") * F.col("y")).over(wf)
    denom = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return (
        li.select(
            "l_suppkey",
            n.alias("n_frame"),
            F.round(
                (n * sxy - sx * sy) / F.nullif(denom, F.lit(0.0)), 6
            ).alias("rolling_corr"),
            F.row_number().over(wr).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("l_suppkey", "n_frame", "rolling_corr")
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH q_t AS (
      SELECT event_type, ts, event_id,
             CAST(floor(value * 1048576.0) AS BIGINT) AS q
      FROM events
    ),
    framed AS (
      SELECT event_type, q / 1048576.0 AS value,
             count(*) OVER w AS n,
             CAST(sum(q) OVER w AS DOUBLE) / 1048576.0 AS s1,
             CAST(sum(CAST(q AS DECIMAL(19,0)) * q) OVER w AS DOUBLE)
               / (1048576.0 * 1048576.0) AS s2
      FROM q_t
      WINDOW w AS (
        PARTITION BY event_type ORDER BY ts, event_id
        ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING
      )
    ),
    scored AS (
      SELECT event_type,
             round((value - s1 / n)
                   / nullif(sqrt(greatest((s2 - s1 * s1 / n) / (n - 1),
                                          0)), 0),
                   4) AS z
      FROM framed WHERE n >= 10
    )
    SELECT event_type,
           count(*)                                           AS n_scored,
           CAST(count(*) FILTER (WHERE abs(z) > 3) AS BIGINT) AS n_anomalies,
           max(abs(z))                                        AS max_abs_z
    FROM scored
    GROUP BY event_type
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection per event_type: each
    value is scored against the mean/std of the PRECEDING 19 events of
    its series (current row excluded, so the point can't mask itself),
    flagged when |z| > 3 — the streaming-metrics outlier shape.

    Variance assembles from co-moment window SUMs — the proven
    supplier_rolling_corr pattern: identical frame contents on both
    engines make the 4-dp rounding exact, and the explicit form
    null-guards 0-variance frames where ANSI ``stddev`` semantics
    differ.

    SEGMENTED shape (VERDICT-r8 task 8): event_type has cardinality 5,
    so a plain PARTITION BY event_type window sorts ~corpus/5 rows in
    ONE task (20M at sf100, 2B at 100x).  The trailing 19-row frame
    needs only the previous 19 events, so the window re-partitions by
    (event_type, hour-chunk) with an explicit OVERLAP CARRY:

      1. per (event_type, chunk): the chunk's last-19 (ts, event_id, q)
         tail — a bounded ordered collect;
      2. per event_type: fold the ≤720 chunk tails in order into a
         running last-19-so-far, emitting each chunk's carry (the 19
         events that precede its first row) — metadata-sized state;
      3. union the carry rows (flagged) back with the chunk's events,
         run the SAME frame inside (event_type, chunk) partitions —
         every row's frame content is identical to the global window's,
         carries are dropped after scoring.

    Max task size is bounded by the per-type hourly rate regardless of
    corpus size; the per-type serial state is 720 chunk summaries.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type", "ck")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, -1)
    )
    # DECIMAL sufficient stats: double sums depend on addition ORDER
    # (DuckDB's window aggregation trees vs Spark's incremental frames
    # differ by an ulp), and a z at the |z|>3 boundary then counts on
    # one engine only — the sf1 sweep caught exactly one such row in
    # 198k.  Decimal window sums are EXACT in both engines, so z is
    # bit-identical at any scale; the doubles return only after the
    # (identical) exact sums.
    # Quantize by an EXACT power-of-two scale: value * 2^20 never
    # rounds in IEEE and floor() is engine-identical, unlike a
    # double->DECIMAL cast, whose half-even boundary at 0.5e-6 resolves
    # differently per engine for arbitrary (non-grid) doubles — the
    # sf10 sweep caught ~2 such rows in 10M, each polluting 19 frames.
    # Sums of the BIGINT quanta (squares in DECIMAL(38,0) — q^2 ~ 1e18
    # overflows BIGINT over a frame) are exact in both engines.
    q = F.floor(F.col("value") * 1048576.0).cast("long")
    ev_q = ev.select(
        "event_type",
        "ts",
        "event_id",
        q.alias("q"),
        F.floor(F.unix_timestamp("ts") / F.lit(3600)).alias("ck"),
    )
    _EVT = "array<struct<ts:timestamp,event_id:bigint,q:bigint>>"
    tail19 = lambda arr: F.when(  # noqa: E731 — slice(-19) is [] on short arrays
        F.size(arr) > 19, F.slice(arr, -19, 19)
    ).otherwise(arr)
    chunk_tails = ev_q.groupBy("event_type", "ck").agg(
        tail19(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "q")))
        ).alias("tl")
    )
    # running carry: for each chunk, the last-19 events of everything
    # before it — a per-type fold over the ordered chunk tails
    carry_fold = F.aggregate(
        F.array_sort(F.collect_list(F.struct("ck", "tl"))),
        F.struct(
            F.array().cast(_EVT).alias("run"),
            F.array().cast(f"array<struct<ck:bigint,carry:{_EVT}>>").alias(
                "out"
            ),
        ),
        lambda acc, c: F.struct(
            tail19(F.concat(acc.run, c.tl)).alias("run"),
            F.concat(
                acc.out,
                F.array(F.struct(c.ck.alias("ck"), acc.run.alias("carry"))),
            ).alias("out"),
        ),
    ).getField("out")
    carry_rows = (
        chunk_tails.groupBy("event_type")
        .agg(carry_fold.alias("carries"))
        .select("event_type", F.explode("carries").alias("e"))
        .select(
            "event_type",
            F.col("e.ck").alias("ck"),
            F.explode("e.carry").alias("c"),
        )
        .select(
            "event_type",
            "ck",
            F.col("c.ts").alias("ts"),
            F.col("c.event_id").alias("event_id"),
            F.col("c.q").alias("q"),
            F.lit(True).alias("is_carry"),
        )
    )
    unioned = ev_q.withColumn("is_carry", F.lit(False)).unionByName(
        carry_rows
    )
    framed = unioned.select(
        "event_type",
        "is_carry",
        (F.col("q") / 1048576.0).alias("value"),
        F.count(F.lit(1)).over(w).alias("n"),
        (F.sum("q").over(w).cast("double") / 1048576.0).alias("s1"),
        (
            F.sum(F.col("q").cast("decimal(19,0)") * F.col("q")).over(w)
            .cast("double") / (1048576.0 * 1048576.0)
        ).alias("s2"),
    ).filter((~F.col("is_carry")) & (F.col("n") >= 10))
    # z computed AFTER the n >= 10 filter so the n=0 leading rows never
    # reach the divisions (ANSI mode raises on x/0); greatest(.., 0)
    # absorbs FP-negative variance before sqrt on both engines.
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    var = F.greatest((s2 - s1 * s1 / n) / (n - 1), F.lit(0.0))
    scored = framed.select(
        "event_type",
        F.round(
            (F.col("value") - s1 / n) / F.nullif(F.sqrt(var), F.lit(0.0)), 4
        ).alias("z"),
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.count_if(F.abs("z") > 3).cast("long").alias("n_anomalies"),
        F.max(F.abs("z")).alias("max_abs_z"),
    )
