"""Behavioral-analytics operators over the events table (SURVEY.md §2.D
extension surface): ordered funnel conversion and cohort retention — the
two queries every product-analytics workload runs hourly.

Both are expressed as join cascades / re-aggregations over frames that are
already reduced to user granularity, so the big events scan is touched
once per step with its filter pushed to parquet, and everything that
crosses a shuffle afterwards is user-sized, not event-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducklakexl_spark.queries import load, query

FUNNEL_STEPS = ("view", "click", "purchase")


@query(
    "events_funnel_steps",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t
      GROUP BY e.user_id
    )
    SELECT step, step_name, n_users,
           round(CAST(n_users AS DOUBLE)
                 / max(n_users) OVER (), 6) AS pct_of_top
    FROM (
      SELECT 1 AS step, 'view' AS step_name, count(*) AS n_users FROM s1
      UNION ALL
      SELECT 2, 'click', count(*) FROM s2
      UNION ALL
      SELECT 3, 'purchase', count(*) FROM s3
    ) t
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose earliest 'view' precedes an earliest
    subsequent 'click' precedes an earliest subsequent 'purchase'.

    The classic SQL funnel shape (reference query plane reached it via
    DuckDB pass-through, /root/reference/ducklakexl/ducklakexl.py:394):
    each step is `events ⋈ prior-step` on user_id with a strictly-later
    timestamp predicate, then min(ts) per user.  Scale shape: the events
    scan is read once per step WITH the event_type filter pushed to
    parquet (a step touches only its own type's rows); the join input on
    the right is the prior step's user-level aggregate — monotonically
    shrinking, user-sized, hash-partitionable on user_id.  Every shuffle
    key is user_id, so AQE reuses one exchange layout across steps.  The
    final step counts are single-row aggregates unioned driver-free.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")

    steps: list[DataFrame] = []
    prior: DataFrame | None = None
    for name in FUNNEL_STEPS:
        stage = ev.filter(F.col("event_type") == name)
        if prior is not None:
            stage = stage.join(
                prior.select("user_id", F.col("t").alias("prev_t")), "user_id"
            ).filter(F.col("ts") > F.col("prev_t"))
        # each step frame is consumed TWICE (next step's join + its own
        # count row); materializing the user-sized aggregate means every
        # events scan runs exactly once — the unmaterialized cascade
        # replayed step k's whole upstream per reference (6 events scans
        # for 3 steps).  Same localCheckpoint discipline as
        # operators/graph.py.
        cur = (
            stage.groupBy("user_id")
            .agg(F.min("ts").alias("t"))
            .localCheckpoint(eager=True)
        )
        steps.append(cur)
        prior = cur

    counts = None
    for i, (name, s) in enumerate(zip(FUNNEL_STEPS, steps), start=1):
        row = s.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step"),
            F.lit(name).alias("step_name"),
            F.col("n_users").cast("long"),
        )
        counts = row if counts is None else counts.unionAll(row)

    from pyspark.sql import Window as W

    top = F.max("n_users").over(W.partitionBy())
    return counts.select(
        "step",
        "step_name",
        "n_users",
        F.round(F.col("n_users").cast("double") / top, 6).alias("pct_of_top"),
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS active_week
      FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) / 7
                AS BIGINT) AS week_offset,
           count(*) AS n_active
    FROM active a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    in each later week they were active.

    Scale shape (r9, guide §2.4): ONE corpus pass.  ``date_trunc`` is
    monotone, so the cohort week ``trunc(week, min(ts))`` equals
    ``min(trunc(week, ts))`` — the per-user minimum of the ALREADY
    distinct (user_id, week) rows.  The old two-branch form scanned
    events twice (min-ts aggregate + distinct) and joined the results;
    now the single distinct frame gets its cohort week from a
    user-partitioned MIN window over user-week-sized rows, and the
    events table is scanned once with no join at all.  Both engines
    truncate weeks to Monday and the diff is an exact multiple of 7 days
    (both sides are week-truncated), so the integer division is exact.
    """
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("active_week")
    ).distinct()
    return (
        active.select(
            "active_week",
            F.min("active_week")
            .over(W.partitionBy("user_id"))
            .alias("cohort_week"),
        )
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@query(
    "events_pattern_match",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id, length(seq) AS seq_len,
           regexp_matches(seq, 'v[^e]*c[^e]*p') AS matched
    FROM seqs
    """,
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern matching over per-user event streams — the
    MATCH_RECOGNIZE / funnel-with-exclusion shape: did the user
    view -> click -> purchase with no intervening error?

    SEGMENTED rewrite (VERDICT-r8 task 2): the r8 shape collapsed each
    user's whole stream into one collect_list task, and the 30%-hot user
    (30M events at sf100) made that a ~25-min single-task straggler and
    an executor-memory risk at 100×.  The pattern `v[^e]*c[^e]*p` is a
    MONOTONE 4-state DFA (q0 → seen-v → seen-v..c → matched, where 'e'
    kills all unfinished progress — [^e]* cannot cross an 'e'), so a
    chunk's effect on the scan is a state-transition function, and
    transition functions COMPOSE associatively.  Plan:

      1. bucket each user's events into fixed 60-s time chunks
         (equal-ts ties land in one chunk, so (ts, event_id) order is
         preserved across boundaries);
      2. per (user, chunk): ordered-collect ONLY the chunk (bounded:
         hot-user-rate × 60 s ≈ 700 events at sf100) and derive the
         chunk's transition function as closed-form regex features —
         m0/m1/m2 = "matches starting from state 0/1/2" and f0/f1/f2 =
         "non-match final state from 0/1/2" — all JVM codegen, no UDF;
      3. per user: fold the ≤43k chunk functions in chunk order with
         F.aggregate (matched is sticky; progress steps through the
         CASE table).

    Max task size is now bounded by the chunk span regardless of key
    skew; the per-user fold state is one (bool, int) pair.  Order is
    pinned by (ts, event_id) on both engines; the character classes
    ([^e], literals) behave identically in Java regex and RE2.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    chunked = ev.withColumn(
        "chunk_id", F.floor(F.unix_timestamp("ts") / F.lit(60))
    )
    seq = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda s: F.substring(s.event_type, 1, 1),
        ),
        "",
    )
    s = F.col("s")
    has_e = s.contains("e")
    tail = F.regexp_extract(s, "[^e]*$", 0)  # suffix after the last 'e'
    t_prog = (
        F.when(tail.rlike("v.*c"), F.lit(2))
        .when(tail.contains("v"), F.lit(1))
        .otherwise(F.lit(0))
    )
    per_chunk = (
        chunked.groupBy("user_id", "chunk_id")
        .agg(seq.alias("s"))
        .select(
            "user_id",
            "chunk_id",
            F.length("s").alias("chunk_len"),
            # match completing from carried state 0 / 1 (have v) / 2
            # (have v..c); a fresh in-chunk match (m0) also completes
            # any carried state since the DFA is monotone
            s.rlike("v[^e]*c[^e]*p").alias("m0"),
            s.rlike("^[^e]*c[^e]*p").alias("m1"),
            s.rlike("^[^e]*p").alias("m2"),
            # non-match final state from carried state 0/1/2: any 'e'
            # kills the carry, so the final state is the fresh progress
            # over the post-last-'e' tail; an e-free chunk keeps the
            # carry alive (state 1 + any 'c' → 2; state 2 stays 2)
            t_prog.alias("f0"),
            F.when(has_e, t_prog)
            .otherwise(
                F.greatest(
                    t_prog,
                    F.when(s.contains("c"), F.lit(2)).otherwise(F.lit(1)),
                )
            )
            .alias("f1"),
            F.when(has_e, t_prog).otherwise(F.lit(2)).alias("f2"),
        )
    )
    fold = F.aggregate(
        F.array_sort(
            F.collect_list(
                F.struct("chunk_id", "m0", "m1", "m2", "f0", "f1", "f2")
            )
        ),
        F.struct(F.lit(False).alias("m"), F.lit(0).alias("p")),
        lambda acc, c: F.struct(
            (
                acc.m
                | c.m0
                | ((acc.p >= 1) & c.m1)
                | ((acc.p == 2) & c.m2)
            ).alias("m"),
            F.when(acc.p == 0, c.f0)
            .when(acc.p == 1, c.f1)
            .otherwise(c.f2)
            .alias("p"),
        ),
    )
    return (
        per_chunk.groupBy("user_id")
        .agg(
            F.sum("chunk_len").alias("seq_len"),
            fold.getField("m").alias("matched"),
        )
        .select("user_id", "seq_len", "matched")
    )
