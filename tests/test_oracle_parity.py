"""Every registered (query, oracle) pair must hash-match DuckDB — the
local twin of the driver's CORRECTNESS gate, run at sf0.001 for speed
(driver uses sf0.01; set SPARK_GRAFT_TEST_SF_DIR to override)."""

from __future__ import annotations

import pytest

from ducklakexl_spark import queries as qmod
from tests.compare import compare
from tests.conftest import SF_DIR, register_duck_views

qmod.load_all()


@pytest.fixture(scope="module")
def duck_views(duck):
    register_duck_views(duck, SF_DIR)
    return duck


ORACLE_NAMES = sorted(qmod.ORACLES)
ROWS_ONLY_NAMES = sorted(set(qmod.QUERIES) - set(qmod.ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(name, spark, duck_views):
    df = qmod.QUERIES[name](spark, SF_DIR)
    compare(df, duck_views, qmod.ORACLES[name], name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(name, spark):
    df = qmod.QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
