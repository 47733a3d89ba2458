"""Representation canaries (VERDICT-r7 task 3).

Round 7's only red gate was a *representation* drift: q01/q03 emitted the
same values as round 6 but typed DECIMAL(29/33/35,2) instead of DOUBLE,
and the driver's order-insensitive value hash failed while every
value-level compare (including four decades of in-repo sweeps) passed.
We cannot see the driver's hash function, so these four tiny queries pin
down *empirically* which output representations it accepts: each emits
the same five rows keyed by r_regionkey, differing only in the declared
type of the value columns, each with a trivially-identical oracle (same
casts on both sides).  Values deliberately include trailing-zero
fractions (x.10, x.50, x.00) — the case where Decimal repr ('3.50') and
float repr ('3.5') diverge, which is the leading hypothesis for the r7
hash failure (an engine-side pandas/Arrow conversion turning one side's
DECIMAL into float).

Reading CORRECTNESS_r08:
- ``repr_canary_double`` green (expected): DOUBLE is the proven contract.
- ``repr_canary_decimal`` green ⇒ type-ALIGNED decimals (all four DuckDB
  storage classes: int32-backed 9,2 / int64 18,2 / hugeint 29,2 + 38,2)
  are safe, and only precision-MISMATCHED decimals (Spark aggregate
  widening 29,2 vs DuckDB 38,2) were the r7 problem.
- ``repr_canary_decimal`` red ⇒ the driver's hash floats one side's
  decimals ⇒ no decimal may ever appear in an output column; the
  registry-wide no-decimal-outputs test in test_round8_fixes.py already
  enforces that policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducklakexl_spark.queries import load, query


@query(
    "repr_canary_double",
    oracle="""
    SELECT r_regionkey,
           CAST(CAST((r_regionkey + 1) * 1.10 AS DECIMAL(18,2)) AS DOUBLE)
               AS v_dbl
    FROM region
    """,
)
def repr_canary_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact decimal math internally, one deterministic cast to DOUBLE at
    # the end — the production output contract (bare `* 1.10` would type
    # DECIMAL in DuckDB but double in Spark, and 3 * 1.1 as IEEE doubles
    # is 3.3000000000000003 while Decimal('3.30') casts to 3.3)
    r = load(spark, sf_dir, "region")
    return r.select(
        "r_regionkey",
        ((F.col("r_regionkey") + 1) * F.lit(1.10))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("v_dbl"),
    )


@query(
    "repr_canary_decimal",
    oracle="""
    SELECT r_regionkey,
           CAST((r_regionkey + 1) * 1.10 AS DECIMAL(9,2))  AS v_dec9,
           CAST((r_regionkey + 1) * 1.10 AS DECIMAL(18,2)) AS v_dec18,
           CAST((r_regionkey + 1) * 1.10 AS DECIMAL(29,2)) AS v_dec29,
           CAST((r_regionkey + 1) * 1.10 AS DECIMAL(38,2)) AS v_dec38,
           CAST((r_regionkey + 1) * 0.25 AS DOUBLE)        AS v_dbl
    FROM region
    """,
)
def repr_canary_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one query covers every DuckDB decimal storage class (int32-backed
    # 9,2 / int64-backed 18,2 / hugeint-backed 29,2+38,2) plus a mixed
    # double column, all type-ALIGNED on both sides.  The driver hash is
    # per-query, so the outcome is deliberately binary: green ⇒ aligned
    # decimal outputs are safe in principle (the no-decimal-outputs
    # policy stays as belt-and-braces); red ⇒ the driver floats one
    # side's decimals and no decimal may ever reach an output column.
    # (Two window slots were reclaimed vs the 4-canary draft so every
    # operator family keeps its one driver-window representative —
    # test_driver_window_samples_every_family.)
    r = load(spark, sf_dir, "region")
    base = (F.col("r_regionkey") + 1) * F.lit(1.10)
    return r.select(
        "r_regionkey",
        base.cast("decimal(9,2)").alias("v_dec9"),
        base.cast("decimal(18,2)").alias("v_dec18"),
        base.cast("decimal(29,2)").alias("v_dec29"),
        base.cast("decimal(38,2)").alias("v_dec38"),
        ((F.col("r_regionkey") + 1) * F.lit(0.25)).cast("double").alias("v_dbl"),
    )
