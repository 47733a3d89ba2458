"""Exploratory CSV/parquet INTEROP fuzzing.

Not collected by pytest — run by hand per work session:

    python tests/fuzz_io.py [n_tables] [seed]

Generates tables of adversarial values (quotes, commas, newlines,
unicode, empty strings, NULLs, extreme numerics) and round-trips them
across the engine/DuckDB boundary in all four directions:

  1. DuckDB COPY TO csv   → engine read_csv        == source
  2. engine COPY TO csv   → DuckDB read_csv        == source
  3. DuckDB COPY TO parquet → engine read_parquet  == source
  4. engine COPY TO parquet → DuckDB read_parquet  == source

Format-boundary bugs (quoting, escapes, NULL markers, header
inference) live exactly here; finds get pinned in test_lakehouse.
"""

from __future__ import annotations

import random
import shutil
import sys
import tempfile

import duckdb

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

from ducklakexl_spark.engine import DuckLakeSpark  # noqa: E402
from ducklakexl_spark.session import get_spark  # noqa: E402

rng = random.Random()

_NASTY = [
    "plain", "", " lead", "trail ", "two  spaces",
    'quo"te', "com,ma", "semi;colon", "tab\tchar", "line\nbreak",
    "crlf\r\nbreak", "'single'", '""', "NULL", "null", "ünïcode✓",
    "back\\slash", "|pipe|", "-1.5e3", "0", "     ",
]


def _values(n: int) -> str:
    rows = []
    for i in range(n):
        s = _NASTY[rng.randrange(len(_NASTY))].replace("'", "''")
        v = rng.choice([str(rng.randint(-10**9, 10**9)), "NULL",
                        str(rng.randint(-5, 5))])
        d = rng.choice(["1.5", "-0.25", "NULL", "1e10", "0.0",
                        str(rng.random())[:8]])
        rows.append(f"({i}, {v}, {d}, '{s}')")
    return ", ".join(rows)


def _canon_rows(rows) -> list:
    from decimal import Decimal

    out = []
    for r in rows:
        canon = []
        for v in r:
            if v is None:
                canon.append("NULL")
            elif isinstance(v, (float, Decimal)):
                canon.append(f"{float(v):.6g}")
            else:
                canon.append(str(v))
        out.append(tuple(canon))
    out.sort()
    return out


def _nested_values(n: int) -> str:
    rows = []
    for i in range(n):
        li = "[" + ", ".join(
            rng.choice([str(rng.randint(-9, 9)), "NULL"])
            for _ in range(rng.randint(0, 4))
        ) + "]"
        s = _NASTY[rng.randrange(len(_NASTY))].replace("'", "''")
        st = f"{{'a': {rng.randint(-5, 5)}, 'b': '{s}'}}"
        mp = rng.choice([
            f"MAP(['x', 'y'], [{rng.randint(0, 9)}, NULL])",
            "MAP([], [])",
            f"MAP(['k{i}'], [{rng.randint(-9, 9)}])",
        ])
        rows.append(f"({i}, {li}, {st}, {mp})")
    return ", ".join(rows)


def _canon_cell(v) -> str:
    from decimal import Decimal

    if v is None:
        return "NULL"
    if isinstance(v, (float, Decimal)):
        return f"{float(v):.6g}"
    if isinstance(v, dict):
        # duckdb's client returns MAP as {'key': [...], 'value': [...]}
        # arrays — zip back into entries before canonicalizing
        if set(v) == {"key", "value"} and isinstance(v["key"], list):
            v = dict(zip(v["key"], v["value"]))
        # struct (pyspark Row.asDict / duckdb dict) and map both land
        # here — canonicalize key-sorted
        return "{" + ", ".join(
            f"{k}: {_canon_cell(x)}"
            for k, x in sorted(v.items(), key=lambda kv: str(kv[0]))
        ) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def _run_nested(lake, con, ti: int) -> int:
    """Parquet-only nested-type roundtrips (LIST / STRUCT / MAP)."""
    import tempfile as _tf

    vals = _nested_values(rng.randint(1, 6))
    src = f"SELECT * FROM (VALUES {vals}) t(k, li, st, mp)"
    con.execute(f"CREATE OR REPLACE TABLE nsrc AS {src}")

    def canon_duck(rows):
        return sorted(tuple(_canon_cell(v) for v in r) for r in rows)

    def canon_spark(rows):
        out = []
        for r in rows:
            canon = []
            for v in r:
                if hasattr(v, "asDict"):
                    v = v.asDict()
                canon.append(_canon_cell(v))
            out.append(tuple(canon))
        out.sort()
        return out

    want = canon_duck(con.execute("SELECT * FROM nsrc").fetchall())
    io = _tf.mkdtemp(prefix="iofuzz_n_")
    finds = 0
    con.execute(f"COPY nsrc TO '{io}/n.parquet' (FORMAT PARQUET)")
    try:
        got = canon_spark(
            tuple(r) for r in lake.sql(
                f"SELECT * FROM read_parquet('{io}/n.parquet')"
            ).collect()
        )
        if got != want:
            print(f"\n=== duck-pq->engine NESTED DIVERGENCE table {ti} ===\n"
                  f"values: {vals[:300]}\n got : {got}\n want: {want}\n")
            finds += 1
    except Exception as e:
        print(f"\n=== duck-pq->engine NESTED ERROR table {ti} ===\n"
              f"{str(e)[:250]}\nvalues: {vals[:300]}\n")
        finds += 1
    try:
        lake.sql(f"COPY ({src}) TO '{io}/en.parquet' (FORMAT PARQUET)")
        got = canon_duck(
            con.execute(
                f"SELECT * FROM read_parquet('{io}/en.parquet')"
            ).fetchall()
        )
        if got != want:
            print(f"\n=== engine-pq->duck NESTED DIVERGENCE table {ti} ===\n"
                  f"values: {vals[:300]}\n got : {got}\n want: {want}\n")
            finds += 1
    except Exception as e:
        print(f"\n=== engine-pq->duck NESTED ERROR table {ti} ===\n"
              f"{str(e)[:250]}\nvalues: {vals[:300]}\n")
        finds += 1
    shutil.rmtree(io, ignore_errors=True)
    return finds


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else random.randrange(1 << 30)
    print(f"seed={seed} n_tables={n}")
    rng.seed(seed)

    spark = get_spark(app_name="fuzz_io", master="local[8]",
                      shuffle_partitions=8)
    tmp = tempfile.mkdtemp(prefix="lake_iofuzz_")
    lake = DuckLakeSpark(
        spark=spark, data_path=f"{tmp}/d", local_catalog=f"{tmp}/c"
    )
    con = duckdb.connect()
    finds = 0
    sel_cols = "k, v, d, s"
    for ti in range(n):
        vals = _values(rng.randint(2, 12))
        src = (f"SELECT * FROM (VALUES {vals}) "
               f"t(k, v, d, s)")
        con.execute(f"CREATE OR REPLACE TABLE src AS {src}")
        want = _canon_rows(con.execute(f"SELECT {sel_cols} FROM src").fetchall())

        io = tempfile.mkdtemp(prefix="iofuzz_")
        checks = []
        # 1. duck csv -> engine read_csv — sometimes under non-default
        # writer options the reader must mirror (delim/nullstr/header)
        delim = rng.choice([",", "|", ";", "\t"])
        nullstr = rng.choice(["", "NA", "\\N"])
        hdr = rng.random() < 0.8
        dopts = f"HEADER {str(hdr).lower()}, DELIMITER '{delim}'"
        ropts = f", delim='{delim}', header={str(hdr).lower()}"
        if nullstr:
            # FORCE_QUOTE keeps empty strings quoted ("") under a
            # custom nullstr — Spark's univocity reader cannot give ''
            # for an UNQUOTED empty field (parser nullValue and
            # converter nullValue are one option); documented gap
            dopts += f", NULL '{nullstr}', FORCE_QUOTE *"
            ropts += f", nullstr='{nullstr}'"
        if not hdr:
            ropts += (", columns={'k': 'BIGINT', 'v': 'BIGINT', "
                      "'d': 'DOUBLE', 's': 'VARCHAR'}")
        con.execute(f"COPY src TO '{io}/d.csv' ({dopts})")
        checks.append(("duck-csv->engine",
                       f"SELECT {sel_cols} FROM read_csv('{io}/d.csv'{ropts})"))
        # 3. duck parquet -> engine read_parquet
        con.execute(f"COPY src TO '{io}/d.parquet' (FORMAT PARQUET)")
        checks.append(("duck-pq->engine",
                       f"SELECT {sel_cols} FROM read_parquet('{io}/d.parquet')"))
        # 5. duck json -> engine read_json
        con.execute(f"COPY src TO '{io}/d.json' (FORMAT JSON)")
        checks.append(("duck-json->engine",
                       f"SELECT {sel_cols} FROM read_json('{io}/d.json')"))
        for label, q in checks:
            try:
                got = _canon_rows(
                    tuple(r) for r in lake.sql(q).collect()
                )
            except Exception as e:
                print(f"\n=== {label} ERROR table {ti} ===\n{q}\n"
                      f"{str(e)[:250]}\nvalues: {vals[:300]}\n")
                finds += 1
                continue
            if got != want:
                print(f"\n=== {label} DIVERGENCE table {ti} ===\n"
                      f"values: {vals[:300]}\n got : {got}\n want: {want}\n")
                finds += 1
        # 2. engine csv -> duck ; 4. engine parquet -> duck
        wchecks = []
        try:
            lake.sql(f"COPY ({src}) TO '{io}/e_csv' (FORMAT CSV, HEADER)")
            # allow_quoted_nulls=false: DuckDB's DEFAULT reader maps a
            # quoted "" to NULL (its own COPY roundtrip is lossy there);
            # the check here is that the engine's CSV is RFC-faithful
            # explicit types: duck sniffs each part file separately and
            # a NULL-only column in one file unions the whole column to
            # VARCHAR — a duck multi-file artifact, not a write bug
            wchecks.append((
                "engine-csv->duck",
                f"SELECT {sel_cols} FROM read_csv('{io}/e_csv/*.csv', "
                f"allow_quoted_nulls=false, types={{'k': 'BIGINT', "
                f"'v': 'BIGINT', 'd': 'DOUBLE', 's': 'VARCHAR'}})",
            ))
            lake.sql(f"COPY ({src}) TO '{io}/e_pq' (FORMAT PARQUET)")
            wchecks.append(("engine-pq->duck",
                            f"SELECT {sel_cols} FROM read_parquet('{io}/e_pq/*.parquet')"))
            lake.sql(f"COPY ({src}) TO '{io}/e.json' (FORMAT JSON)")
            wchecks.append((
                "engine-json->duck",
                f"SELECT {sel_cols} FROM read_json('{io}/e.json', "
                f"columns={{'k': 'BIGINT', 'v': 'BIGINT', "
                f"'d': 'DOUBLE', 's': 'VARCHAR'}})",
            ))
        except Exception as e:
            print(f"\n=== engine COPY ERROR table {ti} ===\n{str(e)[:250]}\n"
                  f"values: {vals[:300]}\n")
            finds += 1
        for label, q in wchecks:
            try:
                got = _canon_rows(con.execute(q).fetchall())
            except Exception as e:
                print(f"\n=== {label} ERROR table {ti} ===\n{q}\n"
                      f"{str(e)[:250]}\nvalues: {vals[:300]}\n")
                finds += 1
                continue
            if got != want:
                print(f"\n=== {label} DIVERGENCE table {ti} ===\n"
                      f"values: {vals[:300]}\n got : {got}\n want: {want}\n")
                finds += 1
        shutil.rmtree(io, ignore_errors=True)
        finds += _run_nested(lake, con, ti)
        if (ti + 1) % 5 == 0:
            print(f"{ti + 1}/{n} tables done, {finds} finds")
    print(f"\nTOTAL: {n} tables, {finds} finds")
    return 1 if finds else 0


if __name__ == "__main__":
    sys.exit(main())
