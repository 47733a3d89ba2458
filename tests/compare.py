"""Spark-vs-DuckDB comparison harness replicating the driver's t2 gate:
row count + column-name set + order-insensitive value comparison with
columns sorted by name (see /root/repo/__spark_entry__.py docstring).

Round-8 hardening (VERDICT-r7 task 2): the r7 regression was a
*representation* drift (q01/q03 output dtypes moved DOUBLE→DECIMAL; the
values were bit-identical but the driver's hash failed) that the old
float-canonicalizing compare could not see.  The harness is now strictly
AT LEAST as strict as the driver:

1. **Output-dtype parity** (``schema_types_compare``): every column's
   Spark dtype must map to the DuckDB result type under ONE documented
   family mapping — ints of any width are one family (driver-verified
   tolerant: grouping() is tinyint in Spark / BIGINT in DuckDB and
   passed four decades of sweeps), but float vs decimal is a mismatch,
   and decimal requires EXACT (precision, scale) equality so that an
   aggregate-widened DECIMAL(29,2)-vs-DECIMAL(38,2) pair — the exact r7
   failure — cannot ship.
2. **Repr-strict values**: Decimals stay Decimals (compared by str, so
   Decimal('3.50') vs float 3.5 is a MISMATCH), floats must pair with
   floats, ints with ints.

If a query only passes with the old float-canonicalized compare, it
would be at risk under the driver's value hash too.
"""

from __future__ import annotations

import datetime as dt
import math
import re
from decimal import Decimal

# ---------------------------------------------------------------------------
# Documented Spark-dtype ↔ DuckDB-type family mapping (one source of truth)
# ---------------------------------------------------------------------------
#   int      : Spark tinyint/smallint/int/bigint  ↔ Duck TINYINT…HUGEINT
#              (width-insensitive — the driver hashes VALUES; int widths
#              never change a value's repr)
#   float    : Spark float/double                  ↔ Duck FLOAT/DOUBLE
#   decimal  : exact (p, s) match required on both sides
#   str/bool/date/timestamp/binary: 1:1
#   array/struct/map: coarse family match (element drift is caught by the
#              repr-strict value compare, which types every nested scalar)

_SPARK_FAMILY = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool", "date": "date",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    "binary": "binary", "void": "null",
}

_DUCK_FAMILY = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "HUGEINT": "int", "UTINYINT": "int", "USMALLINT": "int",
    "UINTEGER": "int", "UBIGINT": "int",
    "FLOAT": "float", "DOUBLE": "float", "REAL": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
    # Spark has no JSON type — the engine models JSON columns as strings
    # (catalog keeps the declared tag); values compare as document text
    "JSON": "str",
    "TIMESTAMP": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamp",
    "TIMESTAMP_NS": "timestamp", "TIMESTAMP_MS": "timestamp",
    "TIMESTAMP_S": "timestamp",
    "BLOB": "binary", "TIME": "time", "INTERVAL": "interval",
    '"NULL"': "null", "NULL": "null", "SQLNULL": "null",
}

_DEC_RE = re.compile(r"^decimal\((\d+),\s*(-?\d+)\)$", re.IGNORECASE)


def spark_type_family(dtype: str):
    t = dtype.lower()
    m = _DEC_RE.match(t)
    if m:
        return ("decimal", int(m.group(1)), int(m.group(2)))
    if re.match(r"^time(\(\d+\))?$", t):
        return "time"
    if t.startswith("array<"):
        return "array"
    if t.startswith("struct<"):
        return "struct"
    if t.startswith("map<"):
        return "map"
    return _SPARK_FAMILY.get(t, t)


def duck_type_family(dtype) -> object:
    t = str(dtype).strip()
    up = t.upper()
    m = re.match(r"^DECIMAL\((\d+),\s*(-?\d+)\)$", up)
    if m:
        return ("decimal", int(m.group(1)), int(m.group(2)))
    if up.endswith("[]"):
        return "array"
    if up.startswith("STRUCT(") or up.startswith("STRUCT<"):
        return "struct"
    if up.startswith("MAP(") or up.startswith("MAP<"):
        return "map"
    if up.startswith("ENUM") or up.startswith("UNION"):
        return "str"
    return _DUCK_FAMILY.get(up, up.lower())


def schema_types_compare(df, duck_result, name="query"):
    """Assert per-column type-family parity between a Spark DataFrame and a
    DuckDB result (columns matched by name; both sides must agree on the
    name set — the driver sorts by name before hashing)."""
    stypes = dict(df.dtypes)
    dtypes = dict(zip(duck_result.columns, duck_result.types))
    assert sorted(stypes) == sorted(dtypes), (
        f"{name}: column-name mismatch\n spark={sorted(stypes)}\n"
        f" duck ={sorted(dtypes)}"
    )
    bad = []
    for c in sorted(stypes):
        sf, dfam = spark_type_family(stypes[c]), duck_type_family(dtypes[c])
        if sf != dfam:
            bad.append(f"  {c}: spark={stypes[c]} ({sf}) vs duck={dtypes[c]} ({dfam})")
    assert not bad, (
        f"{name}: output-dtype drift (the r7 q01/q03 failure class):\n"
        + "\n".join(bad)
    )


# ---------------------------------------------------------------------------
# Value canonicalization
# ---------------------------------------------------------------------------


def canon_value(v, strict=True):
    """Canonical form for one scalar.  strict=True keeps the value's type
    family visible (Decimal ≠ float, int ≠ float); strict=False is the
    legacy float-canonicalizing mode kept for diagnosing *which* kind of
    mismatch a failure is (values vs representation)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        if not strict:
            v = float(v)
        else:
            return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # -0.0 == 0.0
        return v
    if isinstance(v, int):
        # tag ints so strict mode distinguishes 3 from 3.0 (int == float
        # in Python; the driver's hash of their reprs differs)
        return ("i", v) if strict else v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, dt.time):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x, strict) for x in v)
    if isinstance(v, dict):
        return tuple(
            sorted((k, canon_value(x, strict)) for k, x in v.items())
        )
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x)), str(x)) for x in row
    )


def spark_rows(df, strict=True):
    cols = sorted(df.columns)
    return cols, [
        tuple(canon_value(r[c], strict) for c in cols) for r in df.collect()
    ]


def duck_rows(con, sql, strict=True):
    return _duck_rel_rows(con.sql(sql), strict)


def _duck_rel_rows(res, strict=True):
    names = res.columns
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    return cols, [
        tuple(canon_value(row[i], strict) for i in order)
        for row in res.fetchall()
    ]


def compare(df, con, oracle_sql, name="query", strict=True, check_types=True):
    # run the oracle ONCE and reuse the relation for both the type check
    # and the row fetch — multi-statement oracles (CREATE MACRO/TABLE +
    # SELECT) are not idempotent
    res = con.sql(oracle_sql)
    if check_types:
        schema_types_compare(df, res, name=name)
    # execute the ORACLE side first: duckdb's temp-spill files are freed
    # at fetchall, so the Spark side's shuffle spill then reuses that
    # disk — running Spark first leaves its shuffle files on disk while
    # duckdb spills the same pipeline, and the PEAK is the sum of both
    # engines' scratch (observed: sf100 dedup filled the disk)
    d_cols, d_rows = _duck_rel_rows(res, strict)
    s_cols, s_rows = spark_rows(df, strict)
    assert s_cols == d_cols, (
        f"{name}: column mismatch\n spark={s_cols}\n duck ={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_rows.sort(key=_sort_key)
    d_rows.sort(key=_sort_key)
    mism = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mism, (
        f"{name}: {len(mism)}/{len(s_rows)} row mismatches; first 5:\n"
        + "\n".join(f"  [{i}]\n   spark={a}\n   duck ={b}" for i, a, b in mism[:5])
    )


def compare_via_parquet(df, con, oracle_sql, name, scratch_dir):
    """Multiset compare for corpus-sized outputs that cannot be fetched
    into driver Python (e.g. window_lag_lead at sf100: 100M output rows
    ~40 GB per side as Python tuples).  Both sides materialize to
    parquet and DuckDB checks multiset equality natively:

        (spark EXCEPT ALL duck) UNION ALL (duck EXCEPT ALL spark) = empty

    Equivalence to ``compare``: the schema gate is the identical
    ``schema_types_compare``; the value gate is AT LEAST as strict —
    set-operation equality is bit-exact on doubles (strict canon is
    too), NULLs compare equal in set ops (canon keeps None), and int
    widths coerce by position (canon is width-insensitive).  Only
    usable for single-SELECT oracles with no Decimal/NaN/-0.0 outputs
    (those need canon's representation rules); callers opt in per row.
    """
    import os
    import shutil

    res = con.sql(oracle_sql)
    schema_types_compare(df, res, name=name)
    cols = ", ".join(f'"{c}"' for c in sorted(df.columns))
    os.makedirs(scratch_dir, exist_ok=True)
    duck_pq = os.path.join(scratch_dir, f"{name}_duck.parquet")
    spark_pq = os.path.join(scratch_dir, f"{name}_spark_pq")
    try:
        con.execute(
            f"COPY (SELECT {cols} FROM ({oracle_sql}) _o) TO '{duck_pq}' "
            "(FORMAT PARQUET)"
        )
        df.selectExpr(*[f"`{c}`" for c in sorted(df.columns)]).write.mode(
            "overwrite"
        ).parquet(spark_pq)
        n_s = con.execute(
            f"SELECT count(*) FROM read_parquet('{spark_pq}/*.parquet')"
        ).fetchone()[0]
        n_d = con.execute(
            f"SELECT count(*) FROM read_parquet('{duck_pq}')"
        ).fetchone()[0]
        assert n_s == n_d, (
            f"{name}: row count mismatch spark={n_s} duck={n_d}"
        )
        mism = con.execute(
            f"""
            WITH s AS (SELECT {cols} FROM read_parquet('{spark_pq}/*.parquet')),
                 d AS (SELECT {cols} FROM read_parquet('{duck_pq}'))
            SELECT * FROM (
              (SELECT 'spark-only' AS side, * FROM (SELECT * FROM s EXCEPT ALL SELECT * FROM d))
              UNION ALL
              (SELECT 'duck-only' AS side, * FROM (SELECT * FROM d EXCEPT ALL SELECT * FROM s))
            ) LIMIT 5
            """
        ).fetchall()
        assert not mism, f"{name}: multiset mismatch; first 5: {mism}"
    finally:
        shutil.rmtree(spark_pq, ignore_errors=True)
        if os.path.exists(duck_pq):
            os.remove(duck_pq)
