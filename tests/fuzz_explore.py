"""Exploratory (randomized) differential fuzz sweep.

Not collected by pytest — run by hand per work session:

    python tests/fuzz_explore.py [n_per_family] [seed] [family_prefix]

Reuses test_fuzz_differential's grammars but draws FRESH random
examples (the CI tests are derandomized for determinism; this is the
search half of the loop), plus plain-``random`` grammar families for
seams the hypothesis grammars don't reach (ordered aggregates,
GROUP/ORDER BY ALL, IN-list 3VL, lambda capture, ranking windows,
decimal arithmetic, LIKE escapes).  Divergences print with their
statement and both result sets; every find should be fixed in the
engine and pinned into REGRESSION_STATEMENTS.
"""

from __future__ import annotations

import random
import sys
import tempfile

import duckdb

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

import test_fuzz_differential as fz  # noqa: E402
from ducklakexl_spark.engine import DuckLakeSpark  # noqa: E402
from ducklakexl_spark.session import get_spark  # noqa: E402

rng = random.Random()


def pick(*xs):
    return rng.choice(xs)


def _int_atom() -> str:
    return pick("i", "j", "k", str(rng.randint(-9, 99)), "nullif(1, 1)")


def _int_e(depth: int = 2) -> str:
    if depth <= 0 or rng.random() < 0.35:
        return _int_atom()
    a, b = _int_e(depth - 1), _int_e(depth - 1)
    return pick(
        f"({a} + {b})", f"({a} - {b})", f"({a} * {b})",
        f"abs({a})", f"coalesce({a}, {b})", f"greatest({a}, {b})",
        f"least({a}, {b})",
    )


def _str_atom() -> str:
    return pick("s", "'alpha'", "'Beta Gamma'", "''", "' pad '",
                "nullif('x', 'x')")


# ---------------------------------------------------------------- families
# each returns a full SQL statement over fz._FROM (t(k, i, j, s, b))

def fam_ordered_agg() -> str:
    inner = pick("s", "upper(s)", "coalesce(s, '?')")
    key = pick("k", "i NULLS LAST", "length(s), k", "j DESC NULLS LAST, k")
    agg = pick(
        f"string_agg({inner}, '|' ORDER BY {key})",
        f"array_to_string(array_agg({inner} ORDER BY {key}), '|')",
        f"array_to_string(list({inner} ORDER BY {key}), ',')",
        f"first({inner} ORDER BY {key})",
        f"last({inner} ORDER BY {key})",
        f"arg_max(s, coalesce(i, -999))",
        f"arg_min(s, coalesce(i, 999))",
    )
    grp = pick("", " GROUP BY b ORDER BY b NULLS LAST")
    pre = "b, " if grp else ""
    return f"SELECT {pre}{agg} AS r {fz._FROM}{grp}"


def fam_group_all() -> str:
    key = pick("b", "length(s)", "coalesce(j, -1) % 3", "(i IS NULL)")
    agg = pick("count(*)", "sum(coalesce(i, 0))", "min(k)",
               "count(DISTINCT j)")
    form = pick("ALL", "explicit")
    if form == "ALL":
        return (f"SELECT {key} AS g, {agg} AS a {fz._FROM} "
                f"GROUP BY ALL ORDER BY ALL")
    return (f"SELECT {key} AS g, {agg} AS a {fz._FROM} "
            f"GROUP BY {key} ORDER BY g NULLS LAST, a")


def fam_in_3vl() -> str:
    lhs = pick("i", "j", "coalesce(i, j)", "k - 2")
    items = ", ".join(
        pick(str(rng.randint(-5, 9)), "NULL", "i", "j")
        for _ in range(rng.randint(1, 4))
    )
    neg = pick("", "NOT ")
    form = pick("list", "between", "subq")
    if form == "list":
        cond = f"{lhs} {neg}IN ({items})"
    elif form == "between":
        cond = f"{lhs} {neg}BETWEEN {_int_e(1)} AND {_int_e(1)}"
    else:
        cond = (f"{lhs} {neg}IN (SELECT j {fz._FROM.replace('t(', 'u(')} "
                f"WHERE u.k < 4)")
    out = pick("WHERE", "SELECT")
    if out == "WHERE":
        return f"SELECT k {fz._FROM} WHERE {cond} ORDER BY k"
    return f"SELECT k, ({cond}) AS r {fz._FROM} ORDER BY k"


def fam_lambda_capture() -> str:
    base = pick("[i, j, k]", "[j, NULL, 2]", "[k]", "[1, 2, 3]")
    e = pick(
        f"list_transform({base}, x -> x + k)",
        f"list_transform({base}, x -> coalesce(x, 0) * coalesce(i, 1))",
        f"list_filter({base}, x -> x > j)",
        f"list_filter({base}, x -> x IS NOT NULL)",
        f"list_transform(list_filter({base}, x -> x IS NOT NULL), "
        f"x -> x - k)",
        f"list_reduce([1, 2, 3, coalesce(j, 4)], (a, x) -> a + x)",
        f"list_sum(list_transform({base}, x -> CASE WHEN x > 0 THEN x "
        f"ELSE 0 END))",
        f"len(list_filter({base}, x -> x % 2 = 0))",
    )
    return f"SELECT k, {e} AS r {fz._FROM} ORDER BY k"


def fam_rank_windows() -> str:
    key = pick("i", "j", "coalesce(i, 0) % 3", "length(s)")
    order = f"ORDER BY {key} NULLS LAST, k"
    part = pick("", "PARTITION BY b ")
    e = pick(
        f"ntile({rng.randint(1, 4)}) OVER ({part}{order})",
        f"percent_rank() OVER ({part}{order})",
        f"cume_dist() OVER ({part}{order})",
        f"dense_rank() OVER ({part}{order})",
        f"nth_value(k, {rng.randint(1, 3)}) OVER ({part}{order} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
        f"count(*) OVER ({part}{order} RANGE BETWEEN UNBOUNDED PRECEDING "
        f"AND CURRENT ROW)",
        # value-offset RANGE frames over a numeric sort key (peers by
        # key distance, not row position)
        f"sum(coalesce(j, 0)) OVER (ORDER BY coalesce(i, 0) "
        f"RANGE BETWEEN {rng.randint(1, 5)} PRECEDING AND "
        f"{rng.randint(0, 5)} FOLLOWING)",
        f"count(*) OVER (ORDER BY k RANGE BETWEEN 2 PRECEDING AND "
        f"CURRENT ROW)",
        f"min(k) OVER (PARTITION BY b ORDER BY coalesce(j, 0) "
        f"RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)",
    )
    return f"SELECT k, {e} AS r {fz._FROM} ORDER BY k"


def fam_decimal() -> str:
    lit = pick("0.5", "1.25", "2.50", "0.125", "10.2")
    e = pick(
        f"CAST({_int_e(1)} AS DECIMAL(18, 3)) + {lit}",
        f"CAST({lit} AS DECIMAL(10, 3)) * coalesce({_int_atom()}, 2)",
        f"CAST({_int_e(1)} AS DECIMAL(12, 2)) / 4",
        f"round(CAST({_int_e(1)} AS DECIMAL(18, 4)) / 8, 2)",
        f"CAST({lit} AS DECIMAL(8, 3)) - CAST({lit} AS DECIMAL(8, 1))",
    )
    return f"SELECT k, {e} AS r {fz._FROM} ORDER BY k"


def fam_like_patterns() -> str:
    pat = pick("'%a%'", "'_e%'", "'%ta'", "'%'", "'_'", "'%a_a%'",
               "'Z%'", "'% %'", "'%''%'")
    op = pick("LIKE", "NOT LIKE", "ILIKE", "NOT ILIKE")
    subj = pick("s", "upper(s)", "s || 'x'")
    return (f"SELECT k, ({subj} {op} {pat}) AS r {fz._FROM} ORDER BY k")


def fam_quantile_agg() -> str:
    # mode() is EXCLUDED: DuckDB breaks frequency ties by input
    # encounter order (engine-defined, not reproducible relationally) —
    # documented gap, Spark's mode() ties differently
    e = pick(
        "median(coalesce(i, 0))",
        "quantile_disc(coalesce(i, 0), 0.5)",
        "quantile_disc(k, 0.25)",
        "bool_and(coalesce(b, TRUE))",
        "bool_or(coalesce(b, FALSE))",
        "bit_and(coalesce(i, -1))",
        "bit_or(coalesce(j, 0))",
        "bit_xor(k)",
        "product(coalesce(j, 1))",
    )
    grp = pick("", " GROUP BY b ORDER BY b NULLS LAST")
    pre = "b, " if grp else ""
    return f"SELECT {pre}{e} AS r {fz._FROM}{grp}"


def fam_varchar_casts() -> str:
    e = pick(
        f"CAST({_int_e(1)} AS VARCHAR)",
        "CAST(' 42 ' AS INTEGER)",
        "CAST('0011' AS INTEGER)",
        "try_cast(s AS INTEGER)",
        "try_cast('12.9' AS INTEGER)",
        "CAST('true' AS BOOLEAN)",
        "CAST(' FALSE ' AS BOOLEAN)",
        "try_cast(s AS DATE)",
        "CAST(b AS VARCHAR)",
        "CAST(b AS INTEGER)",
        "CAST(DATE '2024-02-29' AS VARCHAR)",
        f"concat({_int_e(1)}, '-', s)",
        f"({_int_e(1)})::VARCHAR || s",
    )
    return f"SELECT k, {e} AS r {fz._FROM} ORDER BY k"


def fam_list_fns2() -> str:
    base = pick("[i, j, k]", "[j, NULL, 2, j]", "[3, 1, 2]", "[k, k]")
    e = pick(
        f"list_position({base}, {_int_atom()})",
        f"list_unique({base})",
        f"flatten([{base}, [5, k]])",
        f"list_sort({base}, 'DESC')",
        f"list_sort({base}, 'ASC', 'NULLS FIRST')",
        f"list_reverse_sort({base})",
        f"list_slice({base}, 2, 3)",
        f"list_slice({base}, -2, -1)",
        # struct-element stringification excluded (rendering gap);
        # scalar arrays stringify per element like DuckDB
        f"array_to_string({base}, ',')",
        f"len(list_zip({base}, [7, 8]))",
        f"list_aggregate({base}, 'sum')",
        f"list_aggregate({base}, 'min')",
        f"len(list_distinct({base}))",
        f"list_contains(list_append({base}, 9), 9)",
        f"list_contains(list_prepend(0, {base}), 0)",
    )
    return f"SELECT k, {e} AS r {fz._FROM} ORDER BY k"


def fam_nested_case() -> str:
    inner = pick(
        f"CASE WHEN i IN (1, 7, {_int_atom()}) THEN 'a' WHEN j BETWEEN "
        f"{_int_e(1)} AND {_int_e(1)} THEN 'b' ELSE 'c' END",
        f"CASE coalesce(j, 0) WHEN 2 THEN 'two' WHEN -5 THEN 'neg' "
        f"ELSE 'other' END",
        f"CASE WHEN b THEN upper(s) WHEN NOT b THEN lower(s) END",
        f"CASE WHEN i > j THEN CASE WHEN k % 2 = 0 THEN 'ee' ELSE 'eo' "
        f"END ELSE 'le' END",
    )
    return f"SELECT k, {inner} AS r {fz._FROM} ORDER BY k"


def fam_date2() -> str:
    e = pick(
        f"make_date(2020 + (k % 5), 1 + (k % 12), 1 + (k % 28))",
        # bare age()/timezone() excluded: duckdb's Python client
        # flattens INTERVAL to timedelta and renders TIMESTAMPTZ with
        # an offset — representation, not semantics
        "date_part('day', age(TIMESTAMP '2024-03-15 10:00:00', "
        "TIMESTAMP '2021-01-01 00:00:00'))",
        f"time_bucket(INTERVAL 7 DAY, DATE '2024-03-15' + k * 3)",
        f"date_trunc('week', DATE '2024-01-01' + k * 17)",
        f"date_trunc('quarter', DATE '2024-01-01' + k * 29)",
        f"datepart('quarter', DATE '2024-01-01' + k * 29)",
        f"dayofweek(DATE '2024-03-15' + k)",
        f"weekofyear(DATE '2024-01-01' + k * 11)",
        f"yearweek(DATE '2024-01-01' + k * 11)",
        f"greatest(DATE '2024-01-31', DATE '2024-01-01' + k * 9)",
        "date_diff('month', DATE '2023-01-31', DATE '2024-03-01')",
        "date_add(DATE '2024-02-29', INTERVAL 1 YEAR)",
        f"(DATE '2024-03-15' + k) - (DATE '2024-01-01')",
    )
    return f"SELECT k, {e} AS r {fz._FROM} ORDER BY k"


def fam_where_3vl() -> str:
    cond = pick(
        f"i IN (1, NULL, {_int_atom()})",
        f"i NOT IN (2, NULL)",
        f"j NOT IN (SELECT u.j {fz._FROM.replace('t(', 'u(')} WHERE u.k < 3)",
        f"NOT (b AND i > {_int_e(1)})",
        f"b OR j IS NULL",
        f"(i > j) IS NULL",
        f"(i = NULL) IS NOT DISTINCT FROM NULL",
        f"i IS DISTINCT FROM j",
    )
    return f"SELECT k {fz._FROM} WHERE {cond} ORDER BY k"


def fam_regex() -> str:
    pat = pick("'[aeiou]+'", "'^[A-Z]'", "'a.a'", "'\\w+'", "'(a)(l)'",
               "'z+'", "' '")
    e = pick(
        f"regexp_matches(s, {pat})",
        f"regexp_extract(s, {pat})",
        f"regexp_extract(s, '([a-z])([a-z])', 2)",
        f"regexp_replace(s, {pat}, '_')",
        f"regexp_replace(s, {pat}, '_', 'g')",
        # split excludes ^-anchored patterns: RE2's Consume loop
        # re-anchors ^ after each contiguous match ('ZETA' splits on
        # '^[A-Z]' four times) — engine quirk, documented gap
        f"len(regexp_split_to_array(s, {pat.replace('^', '')}))",
        f"regexp_full_match(s, '[a-zA-Z ]*')",
    )
    return f"SELECT k, {e} AS r {fz._FROM} ORDER BY k"


_UREL = ("(VALUES (0, 5, 2), (1, NULL, 7), (2, -3, NULL), (3, 8, 1), "
         "(4, 0, 4)) u(k, i, j)")


def fam_correlated_subq() -> str:
    inner = pick(
        f"(SELECT max(u.j) FROM {_UREL} WHERE u.k < t.k)",
        f"(SELECT count(*) FROM {_UREL} WHERE u.j > t.j)",
        f"(SELECT min(u.i) FROM {_UREL} WHERE u.k % 2 = t.k % 2)",
        f"(SELECT sum(u.i) FROM {_UREL} WHERE u.k <= t.k)",
        f"EXISTS (SELECT 1 FROM {_UREL} WHERE u.i = t.i)",
        f"NOT EXISTS (SELECT 1 FROM {_UREL} WHERE u.j = t.j AND u.k < 3)",
    )
    out = pick("SELECT", "WHERE")
    if out == "SELECT":
        return f"SELECT k, {inner} AS r {fz._FROM} ORDER BY k"
    cond = inner if "EXISTS" in inner else f"coalesce({inner}, -99) > j"
    return f"SELECT k {fz._FROM} WHERE {cond} ORDER BY k"


def fam_cte_chain() -> str:
    cond = pick("i IS NOT NULL", "coalesce(j, 0) > -2", "k < 5", "b")
    agg = pick("sum(coalesce(a.i, 0))", "count(*)", "min(a.k)")
    final = pick(
        "SELECT a.k, b.i2 FROM a JOIN b ON a.k = b.k ORDER BY a.k",
        f"SELECT {agg} AS r FROM a LEFT JOIN b ON a.k = b.k",
        "SELECT b.i2 FROM b WHERE b.i2 > (SELECT avg(coalesce(i, 0)) "
        "FROM a) ORDER BY b.i2, b.k",
    )
    return (
        f"WITH a AS (SELECT k, i, j, b {fz._FROM} WHERE {cond}), "
        f"b AS (SELECT k, coalesce(i, 0) + 1 AS i2 FROM a "
        f"WHERE k % {rng.randint(2, 3)} = 0) "
        + final
    )


def fam_three_join() -> str:
    j1 = pick("JOIN", "LEFT JOIN", "INNER JOIN")
    j2 = pick("JOIN", "LEFT JOIN", "FULL JOIN")
    vrel = ("(VALUES (0, 'p'), (2, 'q'), (4, 'r'), (6, NULL)) v(k, tag)")
    proj = pick(
        "t.k, u.i, v.tag",
        "t.k, coalesce(u.j, -1) AS uj, coalesce(v.tag, '?') AS vt",
        "count(*) AS n",
    )
    tail = "" if proj == "count(*) AS n" else " ORDER BY 1 NULLS LAST, 2 NULLS LAST, 3 NULLS LAST"
    return (
        f"SELECT {proj} FROM (VALUES (0, 7, 3), (1, -4, 2), (2, 0, -5), "
        f"(3, NULL, 9), (4, 123, NULL), (5, -99, 4)) t(k, i, j) "
        f"{j1} {_UREL} ON t.k = u.k "
        f"{j2} {vrel} ON u.k = v.k{tail}"
    )


def fam_map_subscript() -> str:
    """Map-typed COLUMN subscripts (round-6: resolve-before-rewrite via
    catalog types) — hit/miss keys, alias-qualified operands, chained
    [k][1], element_at parity, WHERE-position use.  Runs against the
    ``__mt`` fixture table created in main()."""
    key = pick("'a'", "'b'", "'zz'", "'k1'", "'k3'")
    alias = pick("", "t2.")
    frm = "FROM __mt t2" if alias else "FROM __mt"
    return pick(
        f"SELECT id, {alias}m[{key}] AS r {frm} ORDER BY id",
        f"SELECT id, {alias}m[{key}][1] AS r {frm} ORDER BY id",
        f"SELECT id, element_at({alias}m, {key}) AS r {frm} ORDER BY id",
        f"SELECT id {frm} WHERE {alias}m[{key}] = [id] ORDER BY id",
        f"SELECT id, coalesce({alias}m[{key}][1], -1) AS r {frm} "
        f"ORDER BY id",
        f"SELECT id, {alias}m['k' || CAST(id AS VARCHAR)][1] AS r {frm} "
        f"ORDER BY id",
    )


def fam_slices() -> str:
    """String/list bracket slices with randomized bounds — negatives,
    open ends, zero, out-of-range, both-open — over literals,
    list expressions, and CATALOG string columns (``__st``; a VALUES
    alias column's type is unresolvable at the text layer — the
    documented boundary of the catalog-driven str_cols resolution)."""
    def bound():
        return pick("", "1", "2", "3", "-1", "-2", "0", "9",
                    str(rng.randint(-4, 7)))

    lo, hi = bound(), bound()
    base = pick("'abcdef'", "[i, j, k, 4]", "[k]",
                "list_sort([j, k, i])", "__ST", "__STCAT")
    if base == "__ST":
        # catalog string column: resolved via str_cols
        return (
            f"SELECT id, sv[{lo}:{hi}] AS r FROM __st ORDER BY id"
        )
    if base == "__STCAT":
        return (
            f"SELECT id, ('ab' || sv)[{lo}:{hi}] AS r FROM __st "
            f"ORDER BY id"
        )
    e = f"{base}[{lo}:{hi}]"
    if rng.random() < 0.3:
        e = f"upper({e})" if base.startswith("'") else f"len({e})"
    return f"SELECT k, {e} AS r {fz._FROM} ORDER BY k"


def fam_pivot() -> str:
    """PIVOT / UNPIVOT statement forms over a VALUES-derived relation
    (ORDER BY pins row order — a bare PIVOT's output order is
    engine-internal on both sides)."""
    agg = pick("sum(i)", "count(*)", "min(j)", "max(i)", "count(i)")
    if rng.random() < 0.6:
        return (
            f"PIVOT (SELECT s, i, j {fz._FROM}) ON s USING {agg} "
            f"GROUP BY j ORDER BY j NULLS LAST"
        )
    return (
        f"UNPIVOT (SELECT k, i, j {fz._FROM} WHERE k <= "
        f"{rng.randint(1, 4)}) "
        f"ON i, j INTO NAME which VALUE v ORDER BY k, which"
    )


def fam_interval2() -> str:
    """Interval/date arithmetic breadth: scaled intervals, mixed units,
    to_days/to_hours composition, epoch round-trips."""
    n = rng.randint(-40, 90)
    unit = pick("DAY", "HOUR", "MINUTE", "MONTH", "SECOND")
    d = pick("DATE '1994-03-05'", "TIMESTAMP '1997-06-30 11:22:33'",
             "DATE '2000-02-29'")
    e = pick(
        f"{d} + INTERVAL {n} {unit}",
        f"{d} - INTERVAL {n} {unit}",
        f"CAST({d} + INTERVAL (k) DAY AS DATE)",
        f"date_trunc('{pick('day', 'month', 'week', 'hour')}', "
        f"{d} + INTERVAL {n} {unit})",
        f"datediff('day', DATE '1994-01-01', {d} + INTERVAL (i) DAY)",
        f"extract({pick('year', 'month', 'dow', 'doy', 'hour')} FROM "
        f"{d} + INTERVAL {n} {unit})",
        f"to_days(CAST(greatest(i, 0) + 1 AS INTEGER)) + {d}",
    )
    return f"SELECT k, {e} AS r {fz._FROM} ORDER BY k"


def fam_structs() -> str:
    """Struct literals, nested field access, struct_extract/pack, and
    struct-in-list compositions."""
    inner = pick("{'c': j, 'd': s}", "{'c': [i, j]}", "{'c': i + 1}")
    lit = f"{{'a': i, 'b': {inner}}}"
    e = pick(
        f"({lit}).a",
        f"({lit}).b.c",
        f"struct_extract({lit}, 'a')",
        f"struct_extract(struct_extract({lit}, 'b'), 'c')",
        f"struct_pack(x := i, y := j).x",
        f"struct_pack(x := i, y := j).y",
        f"([{lit}, {lit}])[1].a",
        f"({lit}).b.c" if "[i, j]" not in inner else
        f"(({lit}).b.c)[1]",
    )
    return f"SELECT k, {e} AS r {fz._FROM} ORDER BY k"


def fam_enum() -> str:
    """Enum definition-order semantics over the ``__et`` fixture:
    ORDER BY, min/max, grouping, windows, IN-lists, casts."""
    lit = pick("'red'", "'green'", "'blue'", "'violet'")
    return pick(
        "SELECT id, c FROM __et ORDER BY c, id",
        "SELECT id, c FROM __et ORDER BY c DESC, id",
        f"SELECT min(c) AS lo, max(c) AS hi FROM __et",
        f"SELECT c, count(*) AS n FROM __et GROUP BY c ORDER BY c",
        f"SELECT id FROM __et WHERE c = {lit} ORDER BY id",
        f"SELECT id FROM __et WHERE c IN ({lit}, 'red') ORDER BY id",
        "SELECT id, rank() OVER (ORDER BY c, id) AS rk FROM __et"
        " ORDER BY id",
        "SELECT id, CAST(c AS VARCHAR) AS cv FROM __et ORDER BY id",
        f"SELECT max(c) AS m FROM __et WHERE id % "
        f"{rng.randint(2, 4)} = 0",
    )


def fam_time_type() -> str:
    """TIME-typed columns over the ``__tt`` fixture (round-7 feature:
    logical TimeType, string-physical parquet): ordering, comparisons,
    grouping, min/max, casts, null handling."""
    lit = pick("TIME '01:02:03'", "TIME '12:00:00'",
               "TIME '23:59:59.999999'", "TIME '00:00:00'",
               "TIME '13:45:09.5'")
    return pick(
        "SELECT id, t FROM __tt ORDER BY t NULLS LAST, id",
        "SELECT id, t FROM __tt ORDER BY t DESC NULLS LAST, id",
        f"SELECT id FROM __tt WHERE t > {lit} ORDER BY id",
        f"SELECT id FROM __tt WHERE t <= {lit} ORDER BY id",
        f"SELECT id FROM __tt WHERE t = {lit} ORDER BY id",
        f"SELECT id FROM __tt WHERE t BETWEEN TIME '01:00:00' AND {lit}"
        " ORDER BY id",
        "SELECT min(t) AS lo, max(t) AS hi FROM __tt",
        "SELECT count(t) AS n, count(*) AS total FROM __tt",
        "SELECT id, CAST(t AS VARCHAR) AS s FROM __tt ORDER BY id",
        f"SELECT id, coalesce(t, {lit}) AS t2 FROM __tt ORDER BY id",
        f"SELECT id, t IS NULL AS miss FROM __tt ORDER BY id",
        f"SELECT t, count(*) AS n FROM __tt GROUP BY t ORDER BY t NULLS LAST",
        f"SELECT id, nullif(t, {lit}) AS t2 FROM __tt ORDER BY id",
        "SELECT id, greatest(t, TIME '06:00:00') AS g FROM __tt"
        " WHERE t IS NOT NULL ORDER BY id",
        "SELECT id, least(t, TIME '06:00:00') AS g FROM __tt"
        " WHERE t IS NOT NULL ORDER BY id",
    )


def fam_collate_pos() -> str:
    """COLLATE NOCASE in every position DuckDB accepts it: either
    comparison operand, ORDER BY keys (with direction), GROUP BY keys,
    and combined with functions."""
    op = pick("=", "<>", "<", ">", "<=", ">=")
    lit = pick("'alpha'", "'ALPHA'", "'Beta Gamma'", "'beta gamma'", "s")
    return pick(
        f"SELECT k, (s {op} {lit} COLLATE NOCASE) AS r {fz._FROM} ORDER BY k",
        f"SELECT k, (s COLLATE NOCASE {op} {lit}) AS r {fz._FROM} ORDER BY k",
        f"SELECT k FROM ({fz._FROM[5:]}) t2 WHERE s {op} {lit} COLLATE NOCASE"
        " ORDER BY k",
        f"SELECT k, s {fz._FROM} ORDER BY s COLLATE NOCASE, k",
        f"SELECT k, s {fz._FROM} ORDER BY s COLLATE NOCASE DESC, k",
        f"SELECT upper(s) AS u, count(*) AS n {fz._FROM}"
        " GROUP BY upper(s) ORDER BY u",
        f"SELECT k, (trim(s) = {lit} COLLATE NOCASE) AS r {fz._FROM}"
        " ORDER BY k",
    )


def fam_lateral_depth() -> str:
    """Chained correlated LATERALs (depth 2-3): each stage references
    the previous one and/or the base relation; with scalar exprs and
    aggregates inside the lateral subquery."""
    e1 = _int_e(1)
    return pick(
        f"SELECT t.k, l1.x FROM (SELECT * {fz._FROM}) t,"
        f" LATERAL (SELECT t.i + 1 AS x) l1 ORDER BY t.k",
        f"SELECT t.k, l2.y FROM (SELECT * {fz._FROM}) t,"
        " LATERAL (SELECT t.i + 1 AS x) l1,"
        " LATERAL (SELECT l1.x * 2 AS y) l2 ORDER BY t.k",
        f"SELECT t.k, l3.z FROM (SELECT * {fz._FROM}) t,"
        " LATERAL (SELECT t.i + t.j AS x) l1,"
        " LATERAL (SELECT l1.x - t.i AS y) l2,"
        " LATERAL (SELECT l2.y * l1.x AS z) l3 ORDER BY t.k",
        f"SELECT t.k, l1.x, l2.y FROM (SELECT * {fz._FROM}) t,"
        f" LATERAL (SELECT coalesce(t.i, 0) + {e1} AS x) l1,"
        " LATERAL (SELECT CASE WHEN l1.x > 2 THEN l1.x ELSE -l1.x END AS y)"
        " l2 ORDER BY t.k",
        f"SELECT t.k, l2.y FROM (SELECT * {fz._FROM}) t,"
        " LATERAL (SELECT t.s || '!' AS x) l1,"
        " LATERAL (SELECT length(l1.x) + t.i AS y) l2 ORDER BY t.k",
    )


NEW_FAMILIES = {
    "time_type": fam_time_type,
    "collate_pos": fam_collate_pos,
    "lateral_depth": fam_lateral_depth,
    "enum": fam_enum,
    "structs": fam_structs,
    "map_subscript": fam_map_subscript,
    "slices": fam_slices,
    "pivot": fam_pivot,
    "interval2": fam_interval2,
    "correlated_subq": fam_correlated_subq,
    "cte_chain": fam_cte_chain,
    "three_join": fam_three_join,
    "list_fns2": fam_list_fns2,
    "nested_case": fam_nested_case,
    "date2": fam_date2,
    "where_3vl": fam_where_3vl,
    "regex": fam_regex,
    "ordered_agg": fam_ordered_agg,
    "group_all": fam_group_all,
    "in_3vl": fam_in_3vl,
    "lambda_capture": fam_lambda_capture,
    "rank_windows": fam_rank_windows,
    "decimal": fam_decimal,
    "like_patterns": fam_like_patterns,
    "quantile_agg": fam_quantile_agg,
    "varchar_casts": fam_varchar_casts,
}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else random.randrange(1 << 30)
    only = sys.argv[3] if len(sys.argv) > 3 else ""
    print(f"seed={seed} n_per_family={n}")
    rng.seed(seed)

    spark = get_spark(app_name="fuzz_explore", master="local[8]",
                      shuffle_partitions=8)
    tmp = tempfile.mkdtemp(prefix="lake_fuzzx_")
    lake = DuckLakeSpark(
        spark=spark, data_path=f"{tmp}/d", local_catalog=f"{tmp}/c"
    )
    con = duckdb.connect()
    # map-column fixture for fam_map_subscript (same text both engines)
    _mt_sql = (
        "CREATE TABLE __mt AS SELECT i AS id, "
        "map(['a', 'b', 'k' || CAST(i AS VARCHAR)], [i, i * 2, i * 3]) "
        "AS m FROM range(6) t(i)"
    )
    lake.sql(_mt_sql)
    con.execute(_mt_sql)
    # string-column fixture for fam_slices
    _st_sql = (
        "CREATE TABLE __st AS SELECT i AS id, "
        "CASE WHEN i = 0 THEN '' ELSE repeat('xy', i) || 'z' END AS sv "
        "FROM range(5) t(i)"
    )
    lake.sql(_st_sql)
    con.execute(_st_sql)
    # enum fixture for fam_enum (values deliberately NOT in lexical
    # order so definition-order divergences surface)
    for _sql in (
        "CREATE TYPE rgb AS ENUM ('red', 'green', 'blue', 'violet')",
        "CREATE TABLE __et(id INTEGER, c rgb)",
        "INSERT INTO __et VALUES (1,'blue'), (2,'red'), (3,'violet'),"
        " (4,'green'), (5,'red'), (6,NULL)",
    ):
        lake.sql(_sql)
        con.execute(_sql)

    # TIME fixture for fam_time_type (values off the second grid,
    # a NULL, and a duplicate for grouping)
    for _sql in (
        "CREATE TABLE __tt(id INTEGER, t TIME)",
        "INSERT INTO __tt VALUES (1, TIME '01:02:03'),"
        " (2, TIME '23:59:59.999999'), (3, NULL),"
        " (4, TIME '13:45:09.5'), (5, TIME '01:02:03'),"
        " (6, TIME '00:00:00')",
    ):
        lake.sql(_sql)
        con.execute(_sql)

    def draw(strategy):
        # hypothesis strategies support .example(); randomize via its
        # internal entropy by reseeding the global Random hypothesis uses
        return strategy.example()

    families = {
        "expr": lambda: f"SELECT k, {draw(fz._EXPR)} AS r {fz._FROM} ORDER BY k",
        "agg": lambda: (
            f"SELECT {draw(fz._AGGS)} AS r {fz._FROM} "
            f"WHERE coalesce({draw(fz._bool_exprs(1))}, TRUE)"
        ),
        "window": lambda: f"SELECT k, {draw(fz._WINDOWS)} AS r {fz._FROM} ORDER BY k",
        "list": lambda: f"SELECT k, {draw(fz._LIST_EXPRS)} AS r {fz._FROM} ORDER BY k",
        "date": lambda: f"SELECT k, {draw(fz._DATE_EXPRS)} AS r {fz._FROM} ORDER BY k",
        "strfn": lambda: f"SELECT k, {draw(fz._STRFN_EXPRS)} AS r {fz._FROM} ORDER BY k",
    }
    families.update(NEW_FAMILIES)
    if only:
        families = {k: v for k, v in families.items() if k.startswith(only)}

    import hypothesis

    finds: list[str] = []
    checked = 0
    seen: set[str] = set()
    for fam, gen in families.items():
        for i in range(n):
            hypothesis.seed(rng.randrange(1 << 62))
            try:
                stmt = gen()
            except Exception:
                continue
            if stmt in seen:
                continue
            seen.add(stmt)
            checked += 1
            wrap = rng.random()
            if wrap < 0.15 and ";" not in stmt:
                # view-wrapped execution: stores the statement text and
                # re-resolves it through the full dialect chain on read
                # — idempotence and view-plane parity in one shot
                try:
                    lake.sql(f"CREATE OR REPLACE VIEW __fv AS {stmt}")
                    con.execute(f"CREATE OR REPLACE VIEW __fv AS {stmt}")
                    stmt = "SELECT * FROM __fv"
                except Exception:
                    pass  # either side rejecting the view form: skip wrap
            elif wrap < 0.25 and ";" not in stmt:
                # table-macro-wrapped: lazy-template expansion re-enters
                # the chain at call time (DuckDB CREATE MACRO … AS TABLE)
                try:
                    lake.sql("DROP MACRO TABLE IF EXISTS __fm")
                except Exception:
                    pass
                try:
                    con.execute("DROP MACRO TABLE IF EXISTS __fm")
                except Exception:
                    pass
                try:
                    lake.sql(f"CREATE MACRO __fm() AS TABLE ({stmt})")
                    con.execute(f"CREATE MACRO __fm() AS TABLE ({stmt})")
                    stmt = "SELECT * FROM __fm()"
                except Exception:
                    pass  # either side rejecting the macro form: skip
            elif wrap < 0.32 and ";" not in stmt:
                # prepared-statement wrap: the stored text re-enters the
                # chain at EXECUTE time
                try:
                    lake.sql(f"PREPARE __fp AS {stmt}")
                    con.execute(f"PREPARE __fp AS {stmt}")
                    stmt = "EXECUTE __fp"
                except Exception:
                    pass
            try:
                fz._run_both(lake, con, stmt)
            except AssertionError as e:
                finds.append(str(e))
                print(f"\n=== DIVERGENCE [{fam}] ===\n{e}\n")
            except Exception as e:
                # both-engine errors are fine; one-engine errors are finds
                try:
                    con.execute(stmt).fetchall()
                    finds.append(f"spark-only error on: {stmt}\n  {e}")
                    print(f"\n=== SPARK-ONLY ERROR [{fam}] ===\n{stmt}\n{str(e)[:300]}\n")
                except Exception:
                    pass  # duckdb rejects it too — grammar artifact
        print(f"family {fam} done ({checked} total checked, {len(finds)} finds)")
    print(f"\nTOTAL: {checked} checked, {len(finds)} finds")
    return 1 if finds else 0


if __name__ == "__main__":
    sys.exit(main())
