"""Skew-mitigation operators (SURVEY §2.C "aggregation"/"join physical"
scale notes; the reference delegates all execution to DuckDB —
ducklakexl.py:394 — so these are pure Spark-side physical strategies).

AQE's skew-join splitting handles most cases at runtime; these helpers
cover the two places AQE can't: a single hot *aggregation* key (one
reducer owns the key no matter how AQE splits files) and a hot *join*
key against a non-broadcastable build side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column | tuple[Column, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage (salted) aggregation for skewed keys.

    Stage 1 groups by (key, salt) — the hot key fans out over ``n_salts``
    reducers; stage 2 re-aggregates the per-salt partials by key alone.
    ``aggs`` maps output column name -> a *decomposable* aggregate over
    input columns, either a bare Column (partials re-fold with ``sum`` —
    right for sum/count) or ``(column, "sum"|"min"|"max")`` naming the
    re-fold explicitly (avg must be expressed as sum+count by the caller
    — the classic partial-aggregation restriction).  The re-fold is part
    of the declared spec, never inferred from engine internals, so the
    operator works identically under Spark Connect.

    The second shuffle moves only |keys| x n_salts rows, so the cost is
    one extra narrow stage, and no single reducer ever sees the full hot
    key.  (For most workloads Spark's own map-side partial aggregation
    makes this unnecessary — use it when the *distinct grouped values*
    per hot key are still too large for one task, e.g. collect-style or
    high-cardinality-distinct aggregates.)
    """
    _REFOLDS = {"sum": F.sum, "min": F.min, "max": F.max}
    spec: dict[str, tuple[Column, str]] = {}
    for name, v in aggs.items():
        col, refold = v if isinstance(v, tuple) else (v, "sum")
        if refold not in _REFOLDS:
            raise ValueError(f"salted_agg: unknown refold {refold!r}")
        spec[name] = (col, refold)

    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(f"__p_{name}") for name, (c, _r) in spec.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            _REFOLDS[r](f"__p_{name}").alias(name)
            for name, (_c, r) in spec.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the big side's key,
    replicate the small side across all ``n_salts`` salt values, join on
    (key, salt).  The hot key's rows spread over ``n_salts`` tasks at the
    cost of replicating the small side ``n_salts``x — use when the small
    side is too big to broadcast but n_salts copies still fit a shuffle.
    """
    b = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")
