"""Composite join operators Spark has no native keyword for (SURVEY §2.C
"joins" row: AS-OF and POSITIONAL are composite patterns):

- as-of join: union + partitioned last-non-null carry-forward (one sort
  per key partition, no range explosion — the 100 TB-safe formulation);
- positional join: row_number zip;
- range join: broadcast nested-loop against a small interval table.

DuckDB implements ASOF JOIN / POSITIONAL JOIN natively, so the oracles in
queries/ use the real keywords — the strongest possible parity check for
a composite implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "left",
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.right_ts <= left.left_ts`` (``<`` when ``strict``) within the
    same ``on`` key(s); ``direction='forward'`` flips the comparison —
    the EARLIEST right row with ``right_ts >= left_ts`` (``>`` when
    strict).  ``how='inner'`` drops left rows with no match (DuckDB's
    plain ``ASOF JOIN``); ``'left'`` keeps them NULL-padded.

    Implementation: tag and union both sides, sort per key by (ts,
    side-priority), carry the right side's values forward with
    ``last(..., ignorenulls=True)`` (forward direction: ``first`` over
    the mirrored following-frame), keep left rows.  Exactly one shuffle
    on the key — never a range cross-product, and skew on the key is
    AQE-handled like any other sort."""
    keys = [on] if isinstance(on, str) else list(on)
    forward = direction == "forward"
    lt = left.withColumn("__ts", F.col(left_ts).cast("timestamp")).withColumn(
        "__side", F.lit(1)
    )
    # Backward: inclusive match sorts right rows BEFORE left at equal ts
    # (side 0) so the preceding-frame carry sees them; strict sorts them
    # AFTER (side 2), invisible.  Forward mirrors: the frame FOLLOWS the
    # current row, so inclusive needs right AFTER left (side 2), strict
    # right BEFORE (side 0).
    right_side = (0 if strict else 2) if forward else (2 if strict else 0)
    rt = (
        right.withColumn("__m", F.lit(1))
        .select(
            *[F.col(k) for k in keys],
            F.col(right_ts).cast("timestamp").alias("__ts"),
            *[F.col(c).alias(f"__r_{c}") for c in [*right_cols, "__m"]],
        )
        .withColumn("__side", F.lit(right_side))
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)
    carry = [*right_cols, "__m"]
    if forward:
        # mirrored GROWING frame: order DESC and carry with last() over
        # [unboundedPreceding, 0].  Spark evaluates growing frames
        # incrementally (O(n) per partition) but re-scans shrinking
        # [current, unboundedFollowing] frames per row (O(n^2)) — on a
        # skewed key (sf10's 3M-row hot user) the naive forward frame
        # never finishes.  At equal ts, DESC on __side keeps the same
        # inclusive/strict visibility as the ASC formulation.
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col("__ts").desc(), F.col("__side").desc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        pick = F.last
    else:
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col("__ts"), F.col("__side"))
            .rowsBetween(W.unboundedPreceding, 0)
        )
        pick = F.last
    carried = merged.select(
        "*",
        *[
            pick(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in carry
        ],
    )
    out = carried.filter(F.col("__side") == 1).drop(
        "__side", "__ts", "__m", *[f"__r_{c}" for c in carry]
    )
    for c in right_cols:
        out = out.withColumnRenamed(f"__asof_{c}", c)
    if how == "inner":
        out = out.filter(F.col("__asof___m").isNotNull())
    return out.drop("__asof___m")


def positional_join(
    left: DataFrame, right: DataFrame, left_order: list, right_order: list
) -> DataFrame:
    """Zip two relations row-by-row under explicit total orders (DuckDB's
    POSITIONAL JOIN requires physical order; a distributed engine must
    order explicitly — same results when the order is total)."""
    wl = W.orderBy(*left_order)
    wr = W.orderBy(*right_order)
    ln = left.withColumn("__rn", F.row_number().over(wl))
    rn = right.withColumn("__rn", F.row_number().over(wr))
    return ln.join(rn, "__rn", "full").drop("__rn")


def range_join(
    rows: DataFrame, intervals: DataFrame, value: Column, lo: Column, hi: Column,
    how: str = "inner",
) -> DataFrame:
    """Join rows into [lo, hi) intervals.  The interval table is
    broadcast (it is small by construction — bucket/band definitions);
    Catalyst executes a BroadcastNestedLoopJoin, which is the right plan:
    no shuffle of the big side at all."""
    return rows.join(F.broadcast(intervals), (value >= lo) & (value < hi), how)
