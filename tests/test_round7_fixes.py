"""Round-7 regression tests for the r6 ADVICE findings plus the
VERDICT r6 dialect tasks (RHS NOCASE, commit-lock staleness clock,
GROUPS-offset star leak, windowed enum min/max, nested percentage
LIMITs, unaliased ASOF through sql())."""

from __future__ import annotations

import os
import time

import duckdb
import pytest

from ducklakexl_spark.engine import DuckLakeSpark


@pytest.fixture()
def lake(spark, tmp_path):
    return DuckLakeSpark(
        spark=spark,
        data_path=str(tmp_path / "data"),
        local_catalog=str(tmp_path / "catalog"),
    )


def rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------- ADVICE r6 #1
def test_nocase_collate_on_rhs_folds_both_sides(lake):
    """`a = b COLLATE NOCASE` (collation annotated on the RIGHT
    operand) must fold BOTH sides — previously only the RHS folded via
    the bare-key pass, silently returning false for 'ABC' = 'abc'."""
    lake.sql("CREATE TABLE nct(s VARCHAR, t VARCHAR)")
    lake.sql(
        "INSERT INTO nct VALUES ('ABC','abc'), ('x','y'), ('Mix','mIX')"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE nct(s VARCHAR, t VARCHAR); INSERT INTO nct "
        "VALUES ('ABC','abc'), ('x','y'), ('Mix','mIX')"
    )
    for q in [
        "SELECT s, (s = t COLLATE NOCASE) AS eq FROM nct ORDER BY s",
        "SELECT s FROM nct WHERE s = t COLLATE NOCASE ORDER BY s",
        "SELECT s, (s COLLATE NOCASE = t) AS eq FROM nct ORDER BY s",
        "SELECT count(*) AS n FROM nct WHERE 'ABC' = 'abc' COLLATE NOCASE",
    ]:
        assert rows(lake.sql(q)) == sorted(
            tuple(r) for r in con.execute(q).fetchall()
        ), q


# ---------------------------------------------------------- ADVICE r6 #2
def test_commit_lock_stale_holder_is_broken(lake, tmp_path):
    """A lockfile whose mtime is older than the timeout is presumed
    crashed and broken — the staleness test must compare wall-clock
    mtime against wall-clock now (it used time.monotonic(), which is
    seconds-since-boot, so recovery could never fire)."""
    store = lake.catalog.store
    lock = store.path + ".lock"
    with open(lock, "w") as f:
        f.write("99999")
    old = time.time() - 3600
    os.utime(lock, (old, old))
    t0 = time.time()
    with store.commit_lock(timeout=5.0):
        pass
    # must have broken the stale lock immediately, not waited out 5s
    assert time.time() - t0 < 2.0
    assert not os.path.exists(lock)


# ---------------------------------------------------------- ADVICE r6 #3
def test_groups_offset_frame_with_bare_star(lake):
    """`SELECT *, agg OVER (... GROUPS n PRECEDING)` must not leak the
    helper __grpN dense-rank column into the result."""
    lake.sql("CREATE TABLE gsb(k INTEGER, v INTEGER)")
    lake.sql("INSERT INTO gsb VALUES (1,10),(1,20),(2,30),(3,40)")
    df = lake.sql(
        "SELECT *, sum(v) OVER (ORDER BY k GROUPS 1 PRECEDING) AS s"
        " FROM gsb ORDER BY k, v"
    )
    assert df.columns == ["k", "v", "s"]
    # GROUPS 1 PRECEDING: current peer group + one preceding group
    assert [tuple(r) for r in df.collect()] == [
        (1, 10, 30),
        (1, 20, 30),
        (2, 30, 60),
        (3, 40, 70),
    ]
    # qualified star over the (aliased) source relation too
    df2 = lake.sql(
        "SELECT gsb.*, sum(v) OVER (ORDER BY k GROUPS 1 PRECEDING) AS s"
        " FROM gsb ORDER BY k, v"
    )
    assert df2.columns == ["k", "v", "s"]


# ---------------------------------------------------------- ADVICE r6 #4
def test_enum_min_max_over_window(lake):
    """min/max of an enum column UNDER a window spec keeps the OVER
    attached to the aggregate (try_element_at is not a window fn)."""
    lake.sql("CREATE TYPE mood7 AS ENUM ('sad','ok','happy')")
    lake.sql("CREATE TABLE emw(g INTEGER, m mood7)")
    lake.sql(
        "INSERT INTO emw VALUES (1,'happy'),(1,'sad'),(2,'ok'),(2,'happy')"
    )
    df = lake.sql(
        "SELECT g, m, min(m) OVER (PARTITION BY g) AS lo,"
        " max(m) OVER (PARTITION BY g) AS hi FROM emw ORDER BY g, m"
    )
    got = [tuple(r) for r in df.collect()]
    # ORDER BY m is declaration order too: sad < ok < happy
    assert got == [
        (1, "sad", "sad", "happy"),
        (1, "happy", "sad", "happy"),
        (2, "ok", "ok", "happy"),
        (2, "happy", "ok", "happy"),
    ]
    # plain (non-window) aggregate still works alongside
    assert rows(lake.sql("SELECT min(m) AS lo, max(m) AS hi FROM emw")) == [
        ("sad", "happy")
    ]


# --------------------------------------------------- VERDICT r6 task 6
def test_nested_percentage_limits(lake):
    """Percentage LIMITs at two nesting depths (innermost-first
    materialization lifts the single-level restriction)."""
    lake.sql("CREATE TABLE npl(x INTEGER)")
    lake.sql(
        "INSERT INTO npl SELECT * FROM range(1, 21)"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE npl(x INT); INSERT INTO npl "
        "SELECT * FROM range(1, 21)"
    )
    for q in [
        # depth 2: inner 50% of 20 = 10 rows, then 50% of 10 = 5
        "SELECT count(*) AS n FROM (SELECT x FROM "
        "(SELECT x FROM npl ORDER BY x LIMIT 50%) ti ORDER BY x"
        " LIMIT 50%) t",
        "SELECT sum(x) AS s FROM (SELECT x FROM "
        "(SELECT x FROM npl ORDER BY x LIMIT 50%) ti ORDER BY x"
        " LIMIT 50%) t",
        # depth 2 with an outer top-level percentage too
        "SELECT x FROM (SELECT x FROM npl ORDER BY x LIMIT 50%) t"
        " ORDER BY x LIMIT 30%",
    ]:
        assert rows(lake.sql(q)) == sorted(
            tuple(r) for r in con.execute(q).fetchall()
        ), q


def test_percentage_limit_inner_cache_released(lake):
    """The inner-subquery persists are tracked and released on the
    next percentage-LIMIT statement (ADVICE r6 #5 leak)."""
    lake.sql("CREATE TABLE plr(x INTEGER)")
    lake.sql("INSERT INTO plr VALUES (1),(2),(3),(4)")
    lake.sql(
        "SELECT count(*) AS n FROM (SELECT x FROM plr ORDER BY x"
        " LIMIT 50%) t"
    ).collect()
    held = list(getattr(lake, "_limit_pct_inner", []))
    assert len(held) == 1 and held[0].is_cached
    lake.sql(
        "SELECT count(*) AS n FROM (SELECT x FROM plr ORDER BY x"
        " LIMIT 25%) t"
    ).collect()
    assert not held[0].is_cached  # previous statement's persist freed
    assert len(lake._limit_pct_inner) == 1


# --------------------------------------------------- VERDICT r6 task 5
def test_scope_correct_enum_and_bracket_resolution(lake):
    """Alias-qualified columns bind to their OWN table's type, not a
    name union across referenced tables: same-named enum-vs-varchar and
    map-vs-varchar columns across a join each keep their semantics."""
    con = duckdb.connect()
    for s in [
        "CREATE TYPE lvl7 AS ENUM ('low','mid','high')",
        "CREATE TABLE se1(k INTEGER, v lvl7)",
        "CREATE TABLE se2(k INTEGER, v VARCHAR)",
        "INSERT INTO se1 VALUES (1,'mid'),(2,'high'),(3,'low')",
        "INSERT INTO se2 VALUES (1,'apple'),(2,'zebra'),(3,'mango')",
        "CREATE TABLE sm1(k INTEGER, x MAP(VARCHAR, INTEGER))",
        "CREATE TABLE sm2(k INTEGER, x VARCHAR)",
        "INSERT INTO sm1 VALUES (1, MAP {'b': 7}), (2, MAP {'c': 9})",
        "INSERT INTO sm2 VALUES (1, 'hello'), (2, 'world')",
    ]:
        lake.sql(s)
        con.execute(s)
    for q in [
        # ORDER BY the varchar side is LEXICAL even though se1.v is enum
        "SELECT b.v AS v FROM se1 a JOIN se2 b ON a.k = b.k"
        " ORDER BY b.v",
        # ORDER BY the enum side is declaration order
        "SELECT b.v AS v FROM se1 a JOIN se2 b ON a.k = b.k"
        " ORDER BY a.v",
        # min/max: enum side ordinal, varchar side lexical
        "SELECT min(a.v) AS ma, max(a.v) AS xa, min(b.v) AS mb,"
        " max(b.v) AS xb FROM se1 a JOIN se2 b ON a.k = b.k",
        # subscripts: map side list-wrapped, varchar side characters
        "SELECT a.x['b'] AS mv, b.x[2] AS ch, b.x[2:4] AS sl"
        " FROM sm1 a JOIN sm2 b ON a.k = b.k ORDER BY a.k",
    ]:
        got = [tuple(r) for r in lake.sql(q).collect()]
        exp = [tuple(r) for r in con.execute(q).fetchall()]
        assert got == exp, f"{q}\n spark={got}\n duck ={exp}"


def test_time_columns_end_to_end(lake):
    """TIME-typed columns (round-7 feature): logical TimeType in-memory,
    ISO-string physical parquet (Spark has no parquet TIME writer),
    scan casts back.  Covers file-backed and inlined rows, filtering,
    min/max, UPDATE, and VARCHAR casts — differential fuzz family
    ``time_type`` (0 finds at seed 424242)."""
    import datetime as dt

    lake.sql("CREATE TABLE tt7(id INTEGER, t TIME)")
    lake.sql(
        "INSERT INTO tt7 VALUES (1, TIME '01:02:03'),"
        " (2, TIME '23:59:59.999999'), (3, NULL), (4, TIME '13:45:09.5')"
    )
    assert rows(lake.sql("SELECT id, t FROM tt7 WHERE t > TIME '02:00:00'")) == [
        (2, dt.time(23, 59, 59, 999999)),
        (4, dt.time(13, 45, 9, 500000)),
    ]
    assert rows(lake.sql("SELECT min(t) AS lo, max(t) AS hi FROM tt7")) == [
        (dt.time(1, 2, 3), dt.time(23, 59, 59, 999999))
    ]
    lake.sql("UPDATE tt7 SET t = TIME '05:06:07' WHERE id = 1")
    assert rows(
        lake.sql("SELECT CAST(t AS VARCHAR) AS s FROM tt7 WHERE id = 1")
    ) == [("05:06:07",)]
    # catalog type round-trips
    assert rows(
        lake.sql("SELECT column_name, column_type FROM (DESCRIBE tt7) "
                 "WHERE column_name = 't'")
    ) == [("t", "TIME")]


def test_collate_nocase_positions(lake):
    """COLLATE NOCASE in comparison (either side), ORDER BY, and
    combined with functions — fuzz family ``collate_pos`` (0 finds)."""
    lake.sql("CREATE TABLE nct7(k INTEGER, s VARCHAR)")
    lake.sql(
        "INSERT INTO nct7 VALUES (1,'alpha'), (2,'ALPHA'), (3,'Beta')"
    )
    assert rows(
        lake.sql("SELECT k FROM nct7 WHERE s = 'Alpha' COLLATE NOCASE")
    ) == [(1,), (2,)]
    assert rows(
        lake.sql("SELECT k FROM nct7 WHERE s COLLATE NOCASE = 'beta'")
    ) == [(3,)]
    assert rows(
        lake.sql("SELECT k, (trim(s) = 'alpha' COLLATE NOCASE) AS r "
                 "FROM nct7")
    ) == [(1, True), (2, True), (3, False)]
    got = [
        tuple(r)
        for r in lake.sql(
            "SELECT s FROM nct7 ORDER BY s COLLATE NOCASE, k"
        ).collect()
    ]
    assert got == [("alpha",), ("ALPHA",), ("Beta",)]


def test_lateral_depth_chain(lake):
    """Depth-3 chained correlated LATERALs, each referencing earlier
    stages and the base relation — fuzz family ``lateral_depth``
    (0 finds)."""
    out = lake.sql(
        "SELECT t.i, l3.z FROM range(3) t(i),"
        " LATERAL (SELECT t.i + 1 AS x) l1,"
        " LATERAL (SELECT l1.x * 2 AS y) l2,"
        " LATERAL (SELECT l2.y - t.i AS z) l3 ORDER BY 1"
    )
    assert [tuple(r) for r in out.collect()] == [(0, 2), (1, 3), (2, 4)]
