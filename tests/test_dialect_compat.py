"""Dialect-compatibility gate: the engine must run the DuckDB oracle
corpus DIRECTLY — every registry oracle is real DuckDB SQL a reference
user could have written, so feeding the oracle text itself through
``DuckLakeSpark.sql()`` and matching DuckDB's answer is the strongest
switching-cost guarantee the repo can make.

Excluded: ``lakehouse_*`` / ``stream_*`` oracles (constant VALUES tables
documenting stateful flows, not user dialect).
"""

from __future__ import annotations

import tempfile

import duckdb
import pytest

from ducklakexl_spark import queries as qmod
from ducklakexl_spark.engine import DuckLakeSpark

qmod.load_all()

SF = "/root/testdata/sf0.001"

NAMES = sorted(
    n for n in qmod.ORACLES if not n.startswith(("lakehouse_", "stream_"))
)


@pytest.fixture(scope="module")
def compat(spark):
    qmod.register_views(spark, SF)
    tmp = tempfile.mkdtemp(prefix="lake_dialect_")
    lake = DuckLakeSpark(
        spark=spark, data_path=f"{tmp}/d", local_catalog=f"{tmp}/c"
    )
    con = duckdb.connect()
    for t in qmod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return lake, con


@pytest.mark.parametrize("name", NAMES)
def test_engine_runs_oracle_sql_verbatim(compat, name):
    lake, con = compat
    osql = qmod.ORACLES[name]
    sdf = lake.sql(osql)
    scols = sdf.columns
    sidx = sorted(range(len(scols)), key=lambda i: scols[i])
    # str() compare: decimal-literal typing differs (Spark and DuckDB
    # both type 1.0 as DECIMAL but widen division differently); values
    # must agree
    s2 = sorted(tuple(str(r[i]) for i in sidx) for r in sdf.collect())
    d = con.execute(osql).fetchall()
    dcols = [c[0] for c in con.description]
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
    d2 = sorted(tuple(str(r[i]) for i in didx) for r in d)
    assert len(s2) == len(d2), f"{name}: {len(s2)} vs {len(d2)} rows"
    assert s2 == d2, f"{name}: value mismatch"
