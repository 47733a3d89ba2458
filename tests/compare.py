"""Spark-vs-DuckDB comparison harness replicating the driver's t2 gate:
row count + column-name set + order-insensitive value comparison with
columns sorted by name (see /root/repo/__spark_entry__.py docstring).

Strict by default: values must match exactly after canonicalization
(floats repr'd, Decimals floated) — if a query only passes with an
epsilon, it would fail the driver's value hash too.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal


def canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # -0.0 == 0.0
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x)), str(x)) for x in row
    )


def spark_rows(df):
    cols = sorted(df.columns)
    return cols, [
        tuple(canon_value(r[c]) for c in cols) for r in df.collect()
    ]


def duck_rows(con, sql):
    res = con.sql(sql)
    names = res.columns
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    return cols, [
        tuple(canon_value(row[i]) for i in order) for row in res.fetchall()
    ]


def compare(df, con, oracle_sql, name="query"):
    s_cols, s_rows = spark_rows(df)
    d_cols, d_rows = duck_rows(con, oracle_sql)
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
