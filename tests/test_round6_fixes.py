"""Round-6 regression tests for the r5 ADVICE findings plus the
VERDICT r5 dialect tasks (map-column subscripts, forward ASOF via
sql(), GROUPS offset frames, EXPORT/IMPORT DATABASE)."""

from __future__ import annotations

import duckdb
import pytest

from ducklakexl_spark.engine import (
    DuckLakeSpark,
    rewrite_decimal_div,
    _subquery_has_outer_refs,
)


@pytest.fixture()
def lake(spark, tmp_path):
    return DuckLakeSpark(
        spark=spark,
        data_path=str(tmp_path / "data"),
        local_catalog=str(tmp_path / "catalog"),
    )


def rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------- ADVICE r5 #1
def test_external_csv_backslash_n_stays_text(lake, tmp_path):
    """An external CSV whose field genuinely contains the two
    characters \\N reads as the STRING '\\N' (DuckDB default
    nullstr=''), while unquoted-empty stays NULL and quoted "" stays
    the empty string."""
    p = tmp_path / "ext.csv"
    p.write_text('a,b\n\\N,x\n"",y\n,z\n')
    out = [
        tuple(r)
        for r in lake.sql(
            f"SELECT a, b FROM read_csv('{p}') ORDER BY b"
        ).collect()
    ]
    assert out == [("\\N", "x"), ("", "y"), (None, "z")]
    # DuckDB agrees on the \N row (it reads quoted "" as NULL — its own
    # empty-string COPY output doesn't roundtrip; ours keeps them apart,
    # a documented intentional divergence from the r5 IO fuzz)
    con = duckdb.connect()
    ref = [
        tuple(r)
        for r in con.execute(
            f"SELECT a, b FROM read_csv('{p}') ORDER BY b"
        ).fetchall()
    ]
    assert ref[0] == ("\\N", "x") and ref[2] == (None, "z")


# ---------------------------------------------------------- ADVICE r5 #2
def test_copy_from_header_numeric_boolean(lake, tmp_path):
    p = tmp_path / "h.csv"
    p.write_text("1,alpha\n2,beta\n")
    lake.sql("CREATE TABLE ht(id INTEGER, val VARCHAR)")
    lake.sql(f"COPY ht FROM '{p}' (FORMAT CSV, HEADER 0)")
    assert rows(lake.sql("SELECT * FROM ht")) == [(1, "alpha"), (2, "beta")]
    out = rows(lake.sql(f"SELECT * FROM read_csv('{p}', header=0)"))
    assert [r[:1] for r in out] == [("1",), ("2",)] or out == [
        (1, "alpha"),
        (2, "beta"),
    ]


# ---------------------------------------------------------- ADVICE r5 #3
def test_decimal_div_block_comment_quote_safe():
    s = "SELECT /* don't */ 10 / 4 AS r"
    out = rewrite_decimal_div(s)
    assert "/* don't */" in out
    assert "CAST(4 AS DOUBLE)" in out
    # idempotent
    assert rewrite_decimal_div(out) == out


def test_decimal_div_block_comment_engine(lake):
    out = lake.sql("SELECT /* it's a comment */ 1.5 / 2 AS r")
    assert rows(out) == [(0.75,)]


# ---------------------------------------------------------- ADVICE r5 #4
def test_copy_to_single_file_any_extension(lake, tmp_path):
    lake.sql("CREATE TABLE sf1(k INTEGER)")
    lake.sql("INSERT INTO sf1 VALUES (1), (2)")
    out = tmp_path / "out.txt"
    lake.sql(f"COPY sf1 TO '{out}' (FORMAT CSV)")
    assert out.is_file()
    assert out.read_text().startswith("k\n")
    ndj = tmp_path / "o.ndjson"
    lake.sql(f"COPY sf1 TO '{ndj}'")
    assert ndj.is_file() and '"k":1' in ndj.read_text()


def test_copy_to_single_file_clobbers_stale_directory(lake, tmp_path):
    lake.sql("CREATE TABLE sf2(k INTEGER)")
    lake.sql("INSERT INTO sf2 VALUES (7)")
    dest = tmp_path / "o.csv"
    dest.mkdir()
    (dest / "stale").write_text("x")
    lake.sql(f"COPY sf2 TO '{dest}'")
    assert dest.is_file() and "7" in dest.read_text()


# ---------------------------------------------------------- ADVICE r5 #5
def test_correlated_in_subquery_detector():
    assert _subquery_has_outer_refs("SELECT x FROM t WHERE t.a = o.b")
    assert not _subquery_has_outer_refs("SELECT t.x FROM t WHERE t.a = 1")
    assert not _subquery_has_outer_refs(
        "SELECT d.x FROM (SELECT 1 AS x) d"
    )
    assert not _subquery_has_outer_refs(
        "SELECT s.x FROM sch.tbl s JOIN u ON s.k = u.k"
    )


# ------------------------------------------------- VERDICT r5 task 8
GROUPS_OFFSET_CASES = [
    # (engine GROUPS statement, DuckDB dense_rank+RANGE oracle) —
    # DuckDB 1.0 does not parse GROUPS mode, so the oracle is the
    # explicit group-index formulation the rewrite itself emits
    (
        "SELECT k, v, sum(v) OVER (PARTITION BY k ORDER BY v GROUPS"
        " BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM gof ORDER BY k, v",
        "SELECT k, v, sum(v) OVER (PARTITION BY k ORDER BY gi RANGE"
        " BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM (SELECT *,"
        " dense_rank() OVER (PARTITION BY k ORDER BY v) gi FROM gof)"
        " ORDER BY k, v",
    ),
    (
        "SELECT v, sum(v) OVER (ORDER BY v GROUPS 2 PRECEDING) AS s"
        " FROM gof WHERE k = 1 ORDER BY v",
        "SELECT v, sum(v) OVER (ORDER BY gi RANGE BETWEEN 2 PRECEDING"
        " AND CURRENT ROW) AS s FROM (SELECT *, dense_rank() OVER"
        " (ORDER BY v) gi FROM gof WHERE k = 1) ORDER BY v",
    ),
    (
        "SELECT k, v, sum(v) OVER (PARTITION BY k ORDER BY v GROUPS"
        " BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS s FROM gof"
        " ORDER BY k, v",
        "SELECT k, v, sum(v) OVER (PARTITION BY k ORDER BY gi RANGE"
        " BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS s FROM"
        " (SELECT *, dense_rank() OVER (PARTITION BY k ORDER BY v) gi"
        " FROM gof) ORDER BY k, v",
    ),
    (
        "SELECT k, v, sum(v) OVER (PARTITION BY k ORDER BY v DESC"
        " GROUPS 1 PRECEDING) AS s FROM gof ORDER BY k, v",
        "SELECT k, v, sum(v) OVER (PARTITION BY k ORDER BY gi RANGE"
        " BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM (SELECT *,"
        " dense_rank() OVER (PARTITION BY k ORDER BY v DESC) gi FROM"
        " gof) ORDER BY k, v",
    ),
]


def test_groups_offset_frames(lake):
    lake.sql("CREATE TABLE gof(k INTEGER, v INTEGER)")
    lake.sql(
        "INSERT INTO gof VALUES (1,10),(1,10),(1,20),(1,30),(1,30),"
        "(2,5),(2,6),(2,6),(2,7)"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE gof(k INT, v INT); INSERT INTO gof VALUES "
        "(1,10),(1,10),(1,20),(1,30),(1,30),(2,5),(2,6),(2,6),(2,7)"
    )
    def norm(rows_):
        return [
            tuple(None if x is None else float(x) for x in r)
            for r in rows_
        ]

    for q, oq in GROUPS_OFFSET_CASES:
        s = norm(lake.sql(q).collect())
        d = norm(con.execute(oq).fetchall())
        assert s == d, q
    # two different frames sharing one group index plus an outer LIMIT
    out = [
        tuple(r)
        for r in lake.sql(
            "SELECT k, v, sum(v) OVER (PARTITION BY k ORDER BY v GROUPS"
            " BETWEEN 1 PRECEDING AND CURRENT ROW) AS s, count(*) OVER"
            " (PARTITION BY k ORDER BY v GROUPS BETWEEN CURRENT ROW AND"
            " 1 FOLLOWING) AS c FROM gof ORDER BY k, v LIMIT 3"
        ).collect()
    ]
    assert out == [(1, 10, 20, 3), (1, 10, 20, 3), (1, 20, 40, 3)]


def test_groups_offset_frames_randomized(lake):
    """Randomized family (fixed seed): arbitrary duplicate-heavy data,
    random bounds, engine GROUPS vs DuckDB dense_rank+RANGE oracle."""
    import random

    rng = random.Random(6)
    vals = [(rng.randint(1, 3), rng.randint(1, 5)) for _ in range(40)]
    lake.sql("CREATE TABLE gor(k INTEGER, v INTEGER)")
    lake.sql(
        "INSERT INTO gor VALUES "
        + ", ".join(f"({k},{v})" for k, v in vals)
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE gor(k INT, v INT)")
    con.executemany("INSERT INTO gor VALUES (?,?)", vals)
    bounds = ["UNBOUNDED PRECEDING", "2 PRECEDING", "1 PRECEDING",
              "CURRENT ROW", "1 FOLLOWING", "2 FOLLOWING",
              "UNBOUNDED FOLLOWING"]
    for _ in range(12):
        li = rng.randint(0, 4)
        hi = rng.randint(max(li, 2), 6)
        lo_b, hi_b = bounds[li], bounds[hi]
        if "UNBOUNDED" in lo_b and "UNBOUNDED" in hi_b:
            continue
        agg = rng.choice(["sum(v)", "count(*)", "min(v)", "max(v)"])
        frame = f"GROUPS BETWEEN {lo_b} AND {hi_b}"
        q = (
            f"SELECT k, v, {agg} OVER (PARTITION BY k ORDER BY v"
            f" {frame}) AS a FROM gor ORDER BY k, v, a"
        )
        oq = (
            f"SELECT k, v, {agg} OVER (PARTITION BY k ORDER BY gi"
            f" {frame.replace('GROUPS', 'RANGE')}) AS a FROM (SELECT *,"
            f" dense_rank() OVER (PARTITION BY k ORDER BY v) gi FROM"
            f" gor) ORDER BY k, v, a"
        )
        s = [
            tuple(None if x is None else int(x) for x in r)
            for r in lake.sql(q).collect()
        ]
        d = [
            tuple(None if x is None else int(x) for x in r)
            for r in con.execute(oq).fetchall()
        ]
        assert s == d, q


# ------------------------------------------------- VERDICT r5 task 4
def test_forward_asof_through_sql_text(lake):
    lake.sql("CREATE TABLE al(ts INTEGER, k INTEGER)")
    lake.sql("INSERT INTO al VALUES (1,1),(5,1),(9,1),(2,2)")
    lake.sql("CREATE TABLE ar(ts INTEGER, k INTEGER, v VARCHAR)")
    lake.sql("INSERT INTO ar VALUES (2,1,'a'),(6,1,'b'),(2,2,'c')")
    out = [
        tuple(r)
        for r in lake.sql(
            "SELECT l.ts AS lts, r.v AS v FROM al l ASOF LEFT JOIN ar r"
            " ON l.k = r.k AND l.ts <= r.ts ORDER BY lts"
        ).collect()
    ]
    assert out == [(1, "a"), (2, "c"), (5, "b"), (9, None)]
    # strict forward, inner: equal-ts right row invisible
    out2 = [
        tuple(r)
        for r in lake.sql(
            "SELECT l.ts AS lts, r.v AS v FROM al l ASOF JOIN ar r"
            " ON l.k = r.k AND l.ts < r.ts ORDER BY lts"
        ).collect()
    ]
    assert out2 == [(1, "a"), (5, "b")]


# ------------------------------------------------- VERDICT r5 task 3
def test_map_column_subscript_list_wraps(lake):
    """``m[k]`` on a MAP-typed COLUMN takes DuckDB's list-wrapped
    semantics ([v] on hit, [] on miss) — previously only syntactic
    ``map(...)[k]`` did (the r5 documented gap, engine.py)."""
    lake.sql(
        "CREATE TABLE mtab AS SELECT map(['a','b'], [1, 2]) AS m, 1 AS id"
    )
    out = rows(lake.sql("SELECT m['a'] AS v, m['z'] AS miss FROM mtab"))
    assert out == [(([1]), [])] or out == [([1], [])]
    # DuckDB 1.0 parity (literal and column agree)
    con = duckdb.connect()
    con.execute("CREATE TABLE mtab AS SELECT map(['a','b'],[1,2]) m, 1 id")
    ref = con.execute("SELECT m['a'] AS v, m['z'] AS miss FROM mtab").fetchall()
    assert [tuple(r) for r in ref] == [([1], [])]
    # alias-qualified operand and expression contexts
    out2 = rows(
        lake.sql("SELECT t.m['b'] AS v FROM mtab t WHERE t.m['a'] = [1]")
    )
    assert out2 == [([2],)]
    # array columns keep element semantics
    lake.sql("CREATE TABLE atab AS SELECT array(10, 20) AS arr")
    assert rows(lake.sql("SELECT arr[1] AS v FROM atab")) == [(10,)]


def test_slice_semantics_exhaustive(lake):
    """Every slice bound combo (open/0/1/2/4/9/-1/-2/-9) over a string
    literal, a list literal, and a catalog STRING column, live against
    DuckDB — the full semantics table the round-6 normalization was
    built from."""
    lake.sql("CREATE TABLE sx(sv VARCHAR)")
    lake.sql("INSERT INTO sx VALUES ('abcdef')")
    con = duckdb.connect()
    con.execute("CREATE TABLE sx(sv VARCHAR); INSERT INTO sx VALUES"
                " ('abcdef')")
    bounds = ["", "0", "1", "2", "4", "9", "-1", "-2", "-9"]
    for lo in bounds:
        for hi in bounds:
            for base in ("'abcdef'", "([10,20,30,40])", "sv"):
                q = f"SELECT {base}[{lo}:{hi}] AS r FROM sx"
                s = [tuple(r) for r in lake.sql(q).collect()]
                d = con.execute(q).fetchall()
                assert s == d, (q, s, d)
    # single subscripts incl. 0 and negatives
    for i in ("0", "1", "4", "9", "-1", "-9"):
        for base in ("'abcdef'", "([10,20,30,40])", "sv"):
            q = f"SELECT {base}[{i}] AS r FROM sx"
            s = [tuple(r) for r in lake.sql(q).collect()]
            d = con.execute(q).fetchall()
            assert s == d, (q, s, d)


def test_enum_definition_order(lake, spark, tmp_path):
    """DuckDB enums order by DEFINITION order (ORDER BY, min/max) even
    though the engine stores them as VARCHAR — ordinal rewrite via the
    persisted enumcol registry.  Direct comparisons stay lexical
    (DuckDB 1.0's own enum-vs-varchar behavior, verified live)."""
    from ducklakexl_spark.engine import DuckLakeSpark

    con = duckdb.connect()
    for s in [
        "CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')",
        "CREATE TABLE emt(id INTEGER, m mood)",
        "INSERT INTO emt VALUES (1, 'happy'), (2, 'sad'), (3, 'ok'),"
        " (4, NULL)",
    ]:
        lake.sql(s)
        con.execute(s)
    for q in [
        "SELECT id, m FROM emt ORDER BY m",
        "SELECT id, m FROM emt ORDER BY m DESC, id",
        "SELECT min(m) AS lo, max(m) AS hi FROM emt",
        "SELECT m, count(*) AS c FROM emt GROUP BY m ORDER BY m",
        "SELECT id, row_number() OVER (ORDER BY m, id) AS rn FROM emt"
        " ORDER BY id",
        "SELECT id, m FROM emt ORDER BY m NULLS FIRST, id LIMIT 2",
    ]:
        assert [tuple(r) for r in lake.sql(q).collect()] == [
            tuple(r) for r in con.execute(q).fetchall()
        ], q
    # the registry persists across a reopen
    lake2 = DuckLakeSpark(
        spark=spark,
        data_path=lake.data_path,
        local_catalog=lake.catalog.store.path,
    )
    assert [tuple(r) for r in lake2.sql(
        "SELECT min(m) AS lo FROM emt"
    ).collect()] == [("sad",)]


def test_percentage_limit_in_subquery(lake):
    """r5 documented gap #4: percentage LIMIT inside a subquery now
    materializes the subquery (innermost-first) instead of raising."""
    lake.sql("CREATE TABLE pl6(x INTEGER)")
    lake.sql(
        "INSERT INTO pl6 VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10)"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pl6(x INT); INSERT INTO pl6 VALUES "
        "(1),(2),(3),(4),(5),(6),(7),(8),(9),(10)"
    )
    for q in [
        "SELECT count(*) AS n FROM (SELECT x FROM pl6 ORDER BY x"
        " LIMIT 30%) t",
        "SELECT sum(x) AS s FROM (SELECT x FROM pl6 ORDER BY x"
        " LIMIT 50%) t",
        "SELECT max(t.x) AS m FROM (SELECT x FROM pl6 ORDER BY x DESC"
        " LIMIT 40%) t",
    ]:
        assert rows(lake.sql(q)) == [
            tuple(r) for r in con.execute(q).fetchall()
        ], q


# ------------------------------------------------- VERDICT r5 task 9
def test_export_import_views_macros_sequences(lake, spark, tmp_path):
    """EXPORT DATABASE carries views, macros and sequences (at their
    current next value) alongside tables; IMPORT replays them all."""
    from ducklakexl_spark.engine import DuckLakeSpark

    lake.sql(
        "CREATE SEQUENCE sq START 5 INCREMENT 2;"
        "CREATE MACRO twice(x) AS x * 2;"
        "CREATE TABLE base(id INTEGER, v VARCHAR);"
        "INSERT INTO base VALUES (1, 'a'), (2, 'b');"
        "CREATE VIEW bview AS SELECT id, upper(v) AS uv FROM base"
    )
    lake.sql("SELECT nextval('sq')")  # advance to 7
    dump = str(tmp_path / "dump")
    lake.sql(f"EXPORT DATABASE '{dump}'")
    other = DuckLakeSpark(
        spark=spark,
        data_path=str(tmp_path / "d2"),
        local_catalog=str(tmp_path / "c2"),
    )
    other.sql(f"IMPORT DATABASE '{dump}'")
    assert rows(other.sql("SELECT * FROM bview")) == [(1, "A"), (2, "B")]
    assert rows(other.sql("SELECT twice(21) AS t")) == [(42,)]
    # sequence resumes at the exported cursor, not at 5
    assert rows(other.sql("SELECT nextval('sq') AS n")) == [(7,)]


def test_correlated_projected_in_keeps_native_form(lake):
    """A correlated IN in a projected position must still PLAN (the 3VL
    probe rewrite would make Spark's decorrelation reject it)."""
    lake.sql("CREATE TABLE cin_a(k INTEGER, g INTEGER)")
    lake.sql("CREATE TABLE cin_b(k INTEGER, g INTEGER)")
    lake.sql("INSERT INTO cin_a VALUES (1, 1), (2, 2)")
    lake.sql("INSERT INTO cin_b VALUES (1, 1), (3, 2)")
    out = rows(
        lake.sql(
            "SELECT a.k, a.k IN (SELECT b.k FROM cin_b b WHERE b.g = a.g)"
            " AS hit FROM cin_a a ORDER BY a.k"
        )
    )
    assert out == [(1, True), (2, False)]


def test_update_tuple_set_and_case(lake):
    """SET (a, b) = (v1, v2) tuple form; case-insensitive column
    resolution; unknown columns raise LOUDLY (all three were silent
    no-ops before — round-6 probe find)."""
    import pytest as _pt

    lake.sql("CREATE TABLE u6(x INTEGER, y VARCHAR)")
    lake.sql("INSERT INTO u6 VALUES (1, 'a')")
    lake.sql("UPDATE u6 SET (x, y) = (9, 'z') WHERE x = 1")
    assert rows(lake.sql("SELECT * FROM u6")) == [(9, "z")]
    lake.sql("UPDATE u6 SET X = x + 1")
    assert rows(lake.sql("SELECT * FROM u6")) == [(10, "z")]
    with _pt.raises(ValueError, match="no column named"):
        lake.sql("UPDATE u6 SET nope = 1")
