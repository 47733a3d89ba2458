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
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.right_ts <= left.left_ts`` (``<`` when ``strict``) within the
    same ``on`` key(s).  ``how='inner'`` drops left rows with no match
    (DuckDB's plain ``ASOF JOIN``); ``'left'`` keeps them NULL-padded.

    Implementation: tag and union both sides, sort per key by (ts,
    side-priority), carry the right side's values forward with
    ``last(..., ignorenulls=True)``, keep left rows.  Exactly one shuffle
    on the key — never a range cross-product, and skew on the key is
    AQE-handled like any other sort."""
    keys = [on] if isinstance(on, str) else list(on)
    lt = left.withColumn("__ts", F.col(left_ts).cast("timestamp")).withColumn(
        "__side", F.lit(1)
    )
    # inclusive match: right rows sort BEFORE left rows at equal ts (side 0)
    # strict match: right rows sort AFTER left rows at equal ts (side 2),
    # so an equal-ts right row is invisible to the carry-forward window.
    rt = (
        right.withColumn("__m", F.lit(1))
        .select(
            *[F.col(k) for k in keys],
            F.col(right_ts).cast("timestamp").alias("__ts"),
            *[F.col(c).alias(f"__r_{c}") for c in [*right_cols, "__m"]],
        )
        .withColumn("__side", F.lit(2 if strict else 0))
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)
    carry = [*right_cols, "__m"]
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = merged.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
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
