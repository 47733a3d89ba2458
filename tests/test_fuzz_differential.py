"""Differential grammar fuzzing: hypothesis generates random DuckDB-
dialect expression trees (integer/string/boolean/CASE/cast nests over a
literal VALUES relation), and every generated statement must produce
byte-identical canonical results through ``DuckLakeSpark.sql()`` and
DuckDB itself.

This is the adversarial complement to the curated dialect-compat corpus:
the corpus proves the oracle texts the repo ships run verbatim; the
fuzzer searches the COMPOSITION space (nested CASE inside substr inside
||, `//` under coalesce, …) where single-rewrite bugs hide — exactly the
class ADVICE r4 found by hand (`**` in literals, sign() re-wrap).

Determinism: ``derandomize=True`` makes hypothesis derive examples from
the test's own source, so CI never flakes on a fresh random seed; bugs
found by ad-hoc exploratory runs get pinned in REGRESSION_STATEMENTS.

Scope is integer-exact on purpose — float formatting differences are a
known, documented representation gap, not a semantics gap, and would
drown the signal.
"""

from __future__ import annotations

import tempfile

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ducklakexl_spark.engine import DuckLakeSpark

# the shared literal relation: ints (negative/zero/NULL), strings
# (empty, spaces, mixed case), booleans (NULL too) — embedded in every
# generated statement so both engines parse identical text
_ROWS = (
    "(0, 7, 3, 'alpha', TRUE), "
    "(1, -4, 2, 'Beta Gamma', FALSE), "
    "(2, 0, -5, '', NULL), "
    "(3, NULL, 9, 'delta', TRUE), "
    "(4, 123, NULL, ' pad ', FALSE), "
    "(5, -99, 4, 'ZETA zeta', NULL)"
)
_FROM = f"FROM (VALUES {_ROWS}) t(k, i, j, s, b)"


def _int_exprs(depth: int):
    # typed NULL (nullif), not the bare literal: Spark promotes VOID
    # through arithmetic to DOUBLE while DuckDB types it INTEGER, so
    # abs(NULL % NULL) renders 1.0-vs-1 once it reaches coalesce/arrays.
    # Bare-literal-NULL arithmetic is a documented representation gap
    # (no real dialect corpus statement does it); direct abs(NULL) and
    # boolean/string NULL contexts ARE translated and stay in grammar.
    base = st.sampled_from(
        ["i", "j", "k", "0", "1", "-3", "42", "nullif(0, 0)"]
    )
    if depth <= 0:
        return base
    sub = _int_exprs(depth - 1)
    boolean = _bool_exprs(depth - 1)
    string = _str_exprs(depth - 1)
    return st.one_of(
        base,
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        # DuckDB integer division / modulo (NULL on zero divisor is the
        # engine's documented DuckDB-semantics translation)
        st.tuples(sub, st.sampled_from(["//", "%"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        sub.map(lambda e: f"abs({e})"),
        sub.map(lambda e: f"-({e})"),
        st.tuples(sub, sub).map(lambda t: f"least({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"greatest({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"coalesce({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"nullif({t[0]}, {t[1]})"),
        string.map(lambda e: f"length({e})"),
        st.tuples(boolean, sub, sub).map(
            lambda t: f"(CASE WHEN {t[0]} THEN {t[1]} ELSE {t[2]} END)"
        ),
        string.map(lambda e: f"try_cast({e} AS INTEGER)"),
    )


def _str_exprs(depth: int):
    base = st.sampled_from(["s", "'lit'", "''", "'X Y'", "NULL"])
    if depth <= 0:
        return base
    sub = _str_exprs(depth - 1)
    num = _int_exprs(depth - 1)
    boolean = _bool_exprs(depth - 1)
    return st.one_of(
        base,
        sub.map(lambda e: f"upper({e})"),
        sub.map(lambda e: f"lower({e})"),
        sub.map(lambda e: f"trim({e})"),
        sub.map(lambda e: f"reverse({e})"),
        st.tuples(sub, sub).map(lambda t: f"({t[0]} || {t[1]})"),
        st.tuples(sub, st.integers(1, 4), st.integers(0, 5)).map(
            lambda t: f"substr({t[0]}, {t[1]}, {t[2]})"
        ),
        st.tuples(sub, st.integers(0, 4)).map(
            lambda t: f"left({t[0]}, {t[1]})"
        ),
        st.tuples(sub, st.integers(0, 4)).map(
            lambda t: f"right({t[0]}, {t[1]})"
        ),
        sub.map(lambda e: f"replace({e}, 'a', 'o')"),
        num.map(lambda e: f"CAST({e} AS VARCHAR)"),
        st.tuples(boolean, sub, sub).map(
            lambda t: f"(CASE WHEN {t[0]} THEN {t[1]} ELSE {t[2]} END)"
        ),
        st.tuples(sub, sub).map(lambda t: f"coalesce({t[0]}, {t[1]})"),
    )


def _bool_exprs(depth: int):
    base = st.sampled_from(["b", "TRUE", "FALSE", "NULL"])
    if depth <= 0:
        return base
    sub = _bool_exprs(depth - 1)
    num = _int_exprs(depth - 1)
    string = _str_exprs(depth - 1)
    return st.one_of(
        base,
        st.tuples(num, st.sampled_from(["<", "<=", "=", "<>", ">=", ">"]), num).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        st.tuples(string, string).map(lambda t: f"({t[0]} = {t[1]})"),
        string.map(lambda e: f"({e} LIKE '%a%')"),
        num.map(lambda e: f"({e} IS NULL)"),
        num.map(lambda e: f"({e} IS NOT NULL)"),
        st.tuples(sub, sub).map(lambda t: f"({t[0]} AND {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"({t[0]} OR {t[1]})"),
        sub.map(lambda e: f"(NOT {e})"),
        st.tuples(num, num, num).map(
            lambda t: f"({t[0]} BETWEEN {t[1]} AND {t[2]})"
        ),
        st.tuples(num, num, num).map(
            lambda t: f"({t[0]} IN ({t[1]}, {t[2]}))"
        ),
    )


_EXPR = st.one_of(
    _int_exprs(3),
    _str_exprs(3),
    _bool_exprs(3),
    # int result but through a VARCHAR cast roundtrip
    _int_exprs(2).map(lambda e: f"try_cast(CAST({e} AS VARCHAR) AS BIGINT)"),
)


# divergences found by exploratory fuzzing get PINNED here (and fixed in
# the engine) so they can never regress silently
REGRESSION_STATEMENTS = [
    # round-6 finds #29-#33: slice/subscript bound normalization
    # (DuckDB 1-based inclusive, 0 → 1, negatives from end, clamps,
    # NULL propagation), string[0] → '', list[0] → NULL, date_trunc's
    # DATE return type on TIMESTAMP inputs, UNPIVOT NULL-cell drop,
    # PIVOT count-family zero fill
    f"SELECT k, ([10, 20, 30, 40])[0:-2] AS r {_FROM} ORDER BY k",
    f"SELECT k, ([10, 20, 30, 40])[-2:9] AS r {_FROM} ORDER BY k",
    f"SELECT k, ([10, 20, 30, 40])[9:] AS r {_FROM} ORDER BY k",
    f"SELECT k, 'abcdef'[-9:3] AS r {_FROM} ORDER BY k",
    f"SELECT k, 'abcdef'[4:2] AS r {_FROM} ORDER BY k",
    f"SELECT k, upper('abcdef'[2:-2]) AS r {_FROM} ORDER BY k",
    f"SELECT k, 'abcdef'[0] AS r {_FROM} ORDER BY k",
    f"SELECT k, ([10, 20])[0] AS r {_FROM} ORDER BY k",
    f"SELECT k, ([10, 20, 30])[j:] AS r {_FROM} ORDER BY k",
    f"SELECT k, ([10, 20, 30])[1:j] AS r {_FROM} ORDER BY k",
    f"SELECT k, date_trunc('week', TIMESTAMP '1997-06-30 11:22:33')"
    f" AS r {_FROM} ORDER BY k",
    f"SELECT k, date_trunc('month', TIMESTAMP '1997-06-30 01:02:03')"
    f" AS r {_FROM} ORDER BY k",
    f"UNPIVOT (SELECT k, i, j {_FROM} WHERE k <= 4) ON i, j"
    f" INTO NAME which VALUE v ORDER BY k, which",
    f"PIVOT (SELECT s, i, j {_FROM}) ON s USING count(*) GROUP BY j"
    f" ORDER BY j NULLS LAST",
    # finds #34-#35: quantified comparisons over LIST operands (any
    # operator, exists/forall HOFs) and NOCASE collation (comparison
    # folds BOTH sides; sort keys fold alone)
    f"SELECT k, (i > ANY([1, 5])) AS r {_FROM} ORDER BY k",
    f"SELECT k, (j <= ALL([2, 9])) AS r {_FROM} ORDER BY k",
    f"SELECT k, (k = ANY([0, 2, 4])) AS r {_FROM} ORDER BY k",
    f"SELECT k, ('abc' COLLATE NOCASE = 'ABC') AS r {_FROM} ORDER BY k",
    f"SELECT k, s FROM (VALUES (1, 'b'), (2, 'A'), (3, 'C')) t(k, s)"
    f" ORDER BY s COLLATE NOCASE",
    # sign() re-wrap class (ADVICE r4): rewrite output must be stable
    # under composition
    f"SELECT k, (CASE WHEN (i % j) IS NULL THEN -1 ELSE (i // j) END) AS r {_FROM} ORDER BY k",
    f"SELECT k, replace(upper(s || 'a'), 'A', 'o') AS r {_FROM} ORDER BY k",
    f"SELECT k, substr(reverse(s), 2, 3) AS r {_FROM} ORDER BY k",
    f"SELECT k, try_cast(CAST((i * j) AS VARCHAR) AS BIGINT) AS r {_FROM} ORDER BY k",
    f"SELECT k, least(coalesce(i, j), nullif(j, 0)) AS r {_FROM} ORDER BY k",
    f"SELECT k, (s LIKE '%a%' AND (i // 2) BETWEEN -3 AND j) AS r {_FROM} ORDER BY k",
    # fuzz find #1: bare NULL in a boolean condition position — DuckDB
    # types it contextually, Spark rejects VOID.  Searched CASE rewrites;
    # a simple CASE's WHEN NULL is a comparand and must NOT be touched.
    f"SELECT k, CAST(-((CASE WHEN NULL THEN i ELSE i END)) AS VARCHAR) AS r {_FROM} ORDER BY k",
    f"SELECT k, (CASE WHEN NULL THEN 'a' WHEN b THEN s ELSE 'z' END) AS r {_FROM} ORDER BY k",
    f"SELECT k, (CASE i WHEN NULL THEN 99 ELSE j END) AS r {_FROM} ORDER BY k",
    f"SELECT k, (CASE i WHEN NULL THEN 99 WHEN (CASE WHEN NULL THEN 0 ELSE 7 END) THEN -1 ELSE j END) AS r {_FROM} ORDER BY k",
    f"SELECT count(*) AS r FROM (SELECT k {_FROM} WHERE NULL) z",
    f"SELECT k, 'CASE WHEN NULL THEN' AS lit {_FROM} WHERE NULL ORDER BY k",
    # fuzz find #2: list_contains NULL semantics — DuckDB returns plain
    # false on a miss even with in-list NULLs (Spark's array_contains
    # 3VL gives NULL), NULL needle → NULL (Spark errors on VOID)
    f"SELECT k, list_contains([nullif(i, i)], i) AS r {_FROM} ORDER BY k",
    f"SELECT k, list_contains([-(i)], 1) AS r {_FROM} ORDER BY k",
    f"SELECT k, list_contains([-(1)], NULL) AS r {_FROM} ORDER BY k",
    f"SELECT k, list_contains([i, NULL, j], j) AS r {_FROM} ORDER BY k",
    # fuzz find #3: abs(NULL) must stay integer-typed like DuckDB so
    # array rendering agrees ([1, NULL], not [1.0, None])
    f"SELECT k, list_sort([coalesce(1, k), abs(NULL)]) AS r {_FROM} ORDER BY k",
    # fuzz find #4: QUALIFY may reference base columns the projection
    # dropped — the rewrite must splice the predicate into the original
    # scope, not evaluate it over the projected output
    f"SELECT k {_FROM} QUALIFY row_number() OVER (ORDER BY coalesce(i, 99), k) <= 1 ORDER BY k",
    f"SELECT k, row_number() OVER (ORDER BY k) AS rn {_FROM} QUALIFY rn <= 2 ORDER BY k",
    f"SELECT s {_FROM} QUALIFY rank() OVER (ORDER BY i NULLS LAST) <= 2 AND b IS NOT NULL ORDER BY s",
    # fuzz find #5: DuckDB defaults to NULLS LAST on both ASC and DESC;
    # Spark to NULLS FIRST on ASC — visible wherever NULL sort keys meet
    # row_number()/rank() or ORDER BY … LIMIT
    f"SELECT k {_FROM} QUALIFY row_number() OVER (ORDER BY j, k) <= 2 ORDER BY k",
    f"SELECT k {_FROM} QUALIFY row_number() OVER (PARTITION BY (i IS NULL) ORDER BY j, k) <= 1 ORDER BY k",
    f"SELECT k, rank() OVER (ORDER BY i) AS r {_FROM} ORDER BY k",
    f"SELECT k FROM (SELECT k, j {_FROM} ORDER BY j LIMIT 3) z ORDER BY k",
    f"SELECT k FROM (SELECT k, i {_FROM} ORDER BY i DESC LIMIT 2) z ORDER BY k",
    f"SELECT k, lag(i, 1) OVER (ORDER BY j, k) AS r {_FROM} ORDER BY k",
    # fuzz find #6 (string-escaping probe): DuckDB-lexed literals vs
    # Spark's raw-mode lexer — SQL-standard '' escapes, trailing
    # backslashes, and LIKE's default-\ escape mismatch
    "SELECT 'it''s' AS r",
    "SELECT length('\\') AS r",
    "SELECT 'c:\\' || 'x' AS r",
    "SELECT replace('it''s a test', '''', '!') AS r",
    "SELECT s FROM (VALUES ('a\\b'), ('100%'), ('c:\\dir\\file')) t(s) "
    "WHERE s LIKE '%\\%' ORDER BY s",
    "SELECT s FROM (VALUES ('100%'), ('100x')) t(s) "
    "WHERE s LIKE '100!%' ESCAPE '!' ORDER BY s",
    "SELECT s, split_part(s, '\\', 2) AS p FROM (VALUES ('a\\b'), "
    "('c:\\dir\\file')) t(s) ORDER BY s",
    # fuzz find #7 (round 5): DISTINCT ON must keep presentation order
    # even when the ORDER BY references base columns the projection
    # dropped (helper __ob columns); NULLS LAST default applies
    f"SELECT DISTINCT ON (b) k {_FROM} ORDER BY b, k",
    f"SELECT DISTINCT ON ((j IS NULL)) k {_FROM} ORDER BY (j IS NULL), i DESC NULLS LAST, k",
    # fuzz find #8 (round 5): map[k] subscript on a map(...) operand is
    # LIST-wrapped like element_at/map_extract ([] on a miss)
    f"SELECT k, map([1, 2], [i, 9])[2] AS r {_FROM} ORDER BY k",
    f"SELECT k, map([1, 2], [i, 9])[5] AS r {_FROM} ORDER BY k",
    f"SELECT k, map([1, 2], [i, 9])[2][1] AS r {_FROM} ORDER BY k",
    # fuzz find #9 (round 5): DuckDB rounds numeric→integer casts half
    # away from zero; Spark truncates.  CAST and :: forms both covered.
    "SELECT CAST(1.5 AS INTEGER) AS a, CAST(2.5 AS INTEGER) AS b, "
    "CAST(-1.5 AS INTEGER) AS c, CAST(1.999 AS BIGINT) AS d, "
    "1.5::INTEGER AS e, try_cast('1.5' AS INTEGER) AS f, "
    "CAST(TRUE AS INTEGER) AS g, CAST('12' AS INTEGER) AS h, "
    "CAST(9007199254740993 AS BIGINT) AS i2",
    f"SELECT k, CAST((i + 0.5) AS INTEGER) AS r {_FROM} ORDER BY k",
    f"SELECT k, (j * 1.5)::BIGINT AS r {_FROM} ORDER BY k",
    # fuzz find #10 (round 5): expression intervals INTERVAL (expr) UNIT
    "SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (1 + 2) DAYS AS r",
    "SELECT DATE '2024-01-31' + INTERVAL (2) MONTH AS r",
    f"SELECT k, TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (k) HOUR AS r "
    f"{_FROM} ORDER BY k",
    # fuzz find #11 (round 5): ~ / !~ are FULL regex match in DuckDB
    # (regexp_full_match), not partial; ~~ family are the LIKE aliases
    "SELECT 'abc' ~ 'b' AS a, 'abc' ~ 'a.*' AS b, 'abc' !~ 'x' AS c",
    f"SELECT k {_FROM} WHERE s ~ '[A-Za-z ]+' ORDER BY k",
    "SELECT 'abc' ~~ 'a%' AS a, 'abc' !~~ 'x%' AS b, "
    "'ABC' ~~* 'a%' AS c, 'ABC' !~~* 'x%' AS d",
    # fuzz find #12 (round 5): %- strftime codes strip zero padding
    "SELECT strftime(DATE '2024-03-05', '%a %b %-d') AS r, "
    "strftime(TIMESTAMP '2024-03-05 07:09:01', '%-H:%-M:%-S') AS r2",
    # fuzz find #13 (round 5 sweep): bit_count counts within the
    # operand's declared width in DuckDB (INTEGER -4 → 30), while Spark
    # evaluates the 64-bit pattern (→ 62) — masked via typeof()
    f"SELECT k, bit_count(coalesce(i, 0)) AS a, "
    f"bit_count(CAST(coalesce(j, -1) AS BIGINT)) AS b, "
    f"bit_count(CAST(coalesce(i, -2) % 100 AS SMALLINT)) AS c "
    f"{_FROM} ORDER BY k",
    # …and least/greatest promote INTEGER→BIGINT in DuckDB (bit_count
    # over them sees 64 bits even for INT inputs)
    f"SELECT k, bit_count(coalesce(least(i, -3), 0)) AS a, "
    f"bit_count(greatest(coalesce(j, 0), -1)) AS b {_FROM} ORDER BY k",
    # fuzz find #14 (round 5 sweep): list()/array_agg() KEEP NULL
    # elements in DuckDB; Spark's collect_list drops them
    f"SELECT list_sort(list(j)) AS a, list_sort(array_agg(i)) AS b, "
    f"list_sort(list(nullif(k, k))) AS c {_FROM}",
    # fuzz find #15 (round 5 sweep): date_part microsecond/millisecond
    # are sub-minute values incl. whole seconds; Spark's extract has
    # neither field
    "SELECT date_part('microsecond', TIMESTAMP '2023-07-04 10:20:30.123456') AS us, "
    "date_part('milliseconds', TIMESTAMP '2023-07-04 10:20:30.123456') AS ms, "
    "microsecond(TIMESTAMP '1960-02-29 23:59:59.5') AS pre, "
    "millisecond(TIMESTAMP '2024-01-01 00:00:00') AS z",
    # fuzz find #16 (round 5 sweep): FROM-position UNNEST with implicit
    # lateral correlation — Spark needs the LATERAL keyword
    f"SELECT k, u AS r {_FROM}, UNNEST([coalesce(i, -1), j]) AS z(u) "
    f"ORDER BY k, r NULLS LAST",
    f"SELECT k, u AS r FROM (VALUES (0, 7)) t(k, i) "
    f"CROSS JOIN UNNEST([i, 2]) AS z(u) ORDER BY k, r",
    "SELECT a.k AS ak, u AS r FROM (VALUES (1, 2)) a(k, x) "
    "JOIN (VALUES (1, 3)) b(k2, y) ON a.k = b.k2, "
    "UNNEST([a.x, b.y]) AS z(u) ORDER BY r",
    # fuzz find #17 (round 5 sweep): date_part('second') is integer in
    # DuckDB (fraction truncated), DECIMAL(8,6) in Spark; dow aliases
    # dayofweek/weekday are Sunday=0 in DuckDB but Sunday=1 in Spark's
    # native field; EXTRACT is sugar for date_part and must route
    # through the same field translations (incl. fields Spark lacks:
    # decade/century/millennium/era/isoyear/julian/yearweek)
    # fuzz find #18 (round 5 sweep): scalar-position range() /
    # generate_series() return a LIST (empty when the step can't reach
    # the stop — Spark's sequence() errors or runs descending); the
    # FROM-rewrite must not consume a SELECT-list comma prefix; RANGE
    # is a window keyword but range(…)[i] is a subscripted call; and
    # string-valued function calls subscript characters
    "SELECT generate_series(2) AS a, generate_series(-1) AS b, "
    "generate_series(5, 1) AS c, generate_series(5, 1, -2) AS d, "
    "range(3) AS e, range(0) AS f, range(5, 1) AS g, range(1, 7, 2) AS h",
    "SELECT k, range(-1, 2) AS r FROM (VALUES (0), (1)) t(k) ORDER BY k",
    "SELECT range(DATE '2024-01-01', DATE '2024-01-04', INTERVAL 1 DAY) AS r, "
    "generate_series(DATE '2024-01-01', DATE '2024-01-04', INTERVAL 1 DAY) AS g",
    "SELECT range(1, 5)[2] AS a, range(2, 9)[2:4] AS b, "
    "left('abcdef', 3)[2] AS c, upper('xyz')[1] AS d",
    # fuzz find #19 (round 5 sweep): list_intersect drops NULLs even
    # when shared (order is engine-defined on both sides — sort)
    "SELECT list_sort(list_intersect([7, 3], [3, 7, 2])) AS a, "
    "list_sort(list_intersect([1, NULL, 2], [NULL, 2, 9])) AS b, "
    "list_intersect([], [1]) AS c",
    # fuzz find #20 (ordered_agg family): ordered aggregates must honor
    # NULLS FIRST/LAST and multi-key DESC orders; DuckDB defaults
    # NULLS LAST on BOTH directions inside aggregate ORDER BY (Spark's
    # struct array_sort and WITHIN GROUP default NULLS FIRST on ASC)
    "SELECT array_to_string(list(s ORDER BY j DESC NULLS LAST, k), ',') AS a, "
    "string_agg(coalesce(s, '?'), '|' ORDER BY j DESC NULLS LAST, k) AS b, "
    "string_agg(s, '|' ORDER BY i) AS c, "
    "first(coalesce(s, '?') ORDER BY i NULLS LAST) AS d, "
    "last(upper(s) ORDER BY i NULLS LAST) AS e, "
    "first(s ORDER BY i) AS f, "
    "any_value(i ORDER BY j DESC NULLS FIRST, k) AS g, "
    "array_to_string(array_agg(s ORDER BY i NULLS LAST), '|') AS h "
    "FROM (VALUES (0, 7, 3, 'alpha'), (1, -4, 2, 'Beta'), (2, 0, -5, ''), "
    "(3, NULL, 9, 'delta'), (4, 123, NULL, ' pad '), (5, -99, 4, 'ZETA')) "
    "t(k, i, j, s)",
    # fuzz find #21 (in_3vl family): Spark's IN-(subquery) is 2-valued
    # in a projected position (NULL lhs / NULL-bearing miss → FALSE,
    # not NULL); the engine rewrites projected [NOT] IN (SELECT …) to a
    # 3VL CASE with an uncorrelated has-NULL probe
    "SELECT k, (i NOT IN (SELECT j FROM (VALUES (0, 3), (1, 2), (2, -5), "
    "(3, 9)) u(k, j))) AS a, "
    "(i IN (SELECT j FROM (VALUES (0, 3), (4, NULL)) u2(k, j))) AS b, "
    "(i IN (SELECT j FROM (VALUES (0, 3)) u3(k, j) WHERE u3.k > 99)) AS c "
    "FROM (VALUES (0, 3), (1, 8), (2, NULL)) t(k, i) ORDER BY k",
    # fuzz find #22 (decimal family): DuckDB's / ALWAYS divides as
    # DOUBLE (decimal operands included), and CAST of a DECIMAL source
    # to a smaller-scale DECIMAL truncates toward zero where Spark
    # rounds HALF_UP (double/string sources round in both engines)
    "SELECT k, CAST(coalesce(k, 0) AS DECIMAL(12, 2)) / 4 AS a, "
    "round(CAST(k AS DECIMAL(18, 4)) / 8, 2) AS b, "
    "1.5 / 2 AS c, "
    "CAST(1.25 AS DECIMAL(8, 3)) - CAST(1.25 AS DECIMAL(8, 1)) AS d, "
    "1.25::DECIMAL(8, 1) AS e, CAST('1.25' AS DECIMAL(8, 1)) AS f "
    "FROM (VALUES (0), (1), (5)) t(k) ORDER BY k",
    # fuzz find #28 (sweep 4): date_part over an INTERVAL extracts the
    # calendar COMPONENT — age()'s rendered text is parsed back
    # (absent components are 0)
    "SELECT date_part('day', age(TIMESTAMP '2024-03-15 10:20:30.5', "
    "TIMESTAMP '2021-01-01')) AS a, "
    "date_part('year', age(TIMESTAMP '2024-03-15 10:20:30.5', "
    "TIMESTAMP '2021-01-01')) AS b, "
    "date_part('month', age(TIMESTAMP '2024-03-15 10:20:30.5', "
    "TIMESTAMP '2021-01-01')) AS c, "
    "date_part('hour', age(TIMESTAMP '2024-03-15 10:20:30.5', "
    "TIMESTAMP '2021-01-01')) AS d, "
    "date_part('minute', age(TIMESTAMP '2024-03-15 10:20:30.5', "
    "TIMESTAMP '2021-01-01')) AS e, "
    "date_part('second', age(TIMESTAMP '2024-03-15 10:20:30.5', "
    "TIMESTAMP '2021-01-01')) AS f, "
    "date_part('day', age(TIMESTAMP '2024-01-01 05:00:00', "
    "TIMESTAMP '2024-01-01')) AS g",
    # fuzz finds #25-#27 (sweep 3): list_sort's string-literal
    # ASC/DESC + NULLS modifiers (default NULLS LAST both directions);
    # array_to_string stringifies elements of ANY type (Spark's
    # array_join is STRING-only); DATE-DATE integer days also for flat
    # paren operands starting with a DATE literal
    "SELECT k, list_sort([1, NULL, 3, 2], 'DESC') AS a, "
    "list_sort([1, NULL, 3, 2], 'ASC', 'NULLS FIRST') AS b, "
    "list_sort([k, NULL, 2], 'DESC', 'NULLS FIRST') AS c, "
    "list_sort([k, 9], 'ASC') AS d, "
    "array_to_string([1, NULL, 2], ',') AS e, "
    "array_to_string([k, 4], '|') AS f, "
    "(DATE '2024-03-15' + k) - (DATE '2024-01-01') AS g "
    "FROM (VALUES (0), (1), (5)) t(k) ORDER BY k",
    # fuzz find #24 (strfn family, sweep 2): DuckDB's split_part never
    # returns NULL — NULL string/index → '', NULL separator → no split
    # (whole string at part ±1, '' otherwise), '' separator splits into
    # CHARACTERS; Spark propagates NULLs and no-splits on ''
    "SELECT split_part(substr(NULL, 4, 0), ' ', 1) AS a, "
    "split_part('a b', NULL, 1) AS b, split_part('a b', ' ', NULL) AS c, "
    "split_part('abc', '', 2) AS d, split_part('abc', '', -1) AS e, "
    "split_part('a b c', ' ', -1) AS f, split_part('a b', ' ', 5) AS g, "
    "split_part('x,y,z', ',', 2) AS h, split_part('a b', NULL, -1) AS i2",
    # fuzz find #23 (quantile_agg family): quantile_disc returns the
    # ELEMENT at 1-based index ceil(q*n) of the NULL-stripped sorted
    # values in the element's own type (Spark's percentile_disc is
    # always DOUBLE); works on strings too
    "SELECT quantile_disc(i, 0.5) AS a, quantile_disc(k, 0.25) AS b, "
    "quantile_disc(s, 0.5) AS c, quantile_disc(i, 0.9) AS d "
    "FROM (VALUES (0, 7, 'alpha'), (1, -4, 'Beta'), (2, 0, ''), "
    "(3, NULL, 'delta'), (4, 123, ' pad '), (5, -99, 'ZETA')) t(k, i, s)",
    "SELECT date_part('second', TIMESTAMP '2023-01-01 10:20:30.9') AS a, "
    "extract(second FROM TIMESTAMP '2023-01-01 10:20:30.9') AS b, "
    "extract(dayofweek FROM DATE '2024-03-05') AS c, "
    "date_part('weekday', DATE '2024-03-03') AS d, "
    "weekday(DATE '1969-12-31') AS e, "
    "extract(decade FROM DATE '1994-03-05') AS f, "
    "extract(era FROM DATE '2024-01-01') AS g, "
    "date_part('isoyear', DATE '2021-01-01') AS h, "
    "extract(yearweek FROM DATE '2021-01-01') AS i2, "
    "extract(microsecond FROM TIMESTAMP '2023-07-04 10:20:30.123456') AS j2",
]


@pytest.fixture(scope="module")
def engines(spark):
    tmp = tempfile.mkdtemp(prefix="lake_fuzz_")
    lake = DuckLakeSpark(
        spark=spark, data_path=f"{tmp}/d", local_catalog=f"{tmp}/c"
    )
    con = duckdb.connect()
    return lake, con


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "t" if v else "f"
    return str(v)


def _run_both(lake, con, stmt: str):
    sdf = lake.sql(stmt)
    srows = [tuple(_canon(v) for v in r) for r in sdf.collect()]
    drows = [
        tuple(_canon(v) for v in r) for r in con.execute(stmt).fetchall()
    ]
    assert srows == drows, (
        f"divergence on:\n  {stmt}\n  spark={srows}\n  duck ={drows}"
    )


@settings(
    max_examples=80,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(expr=_EXPR)
def test_fuzz_expression_parity(engines, expr):
    lake, con = engines
    _run_both(lake, con, f"SELECT k, {expr} AS r {_FROM} ORDER BY k")


# --- aggregate / window / list / date grammars --------------------------
# these hit the translation layer's riskiest seams: frame rewrites,
# list_* family mapping, DuckDB date arithmetic

_AGG_INNER = _int_exprs(2)
_AGGS = st.one_of(
    _AGG_INNER.map(lambda e: f"sum({e})"),
    _AGG_INNER.map(lambda e: f"min({e})"),
    _AGG_INNER.map(lambda e: f"max({e})"),
    _AGG_INNER.map(lambda e: f"count({e})"),
    _AGG_INNER.map(lambda e: f"count(DISTINCT {e})"),
    _bool_exprs(2).map(lambda e: f"count(*) FILTER (WHERE {e})"),
    _AGG_INNER.map(lambda e: f"sum({e}) FILTER (WHERE i > 0)"),
)

_FRAMES = st.sampled_from([
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
    "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
    "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
])
_WIN_KEYS = st.sampled_from(["k", "j, k", "i, k", "j DESC, k"])
_WINDOWS = st.one_of(
    st.tuples(_int_exprs(1), _FRAMES, _WIN_KEYS).map(
        lambda t: f"sum({t[0]}) OVER (ORDER BY {t[2]} {t[1]})"
    ),
    st.tuples(_int_exprs(1), _FRAMES, _WIN_KEYS).map(
        lambda t: f"min({t[0]}) OVER (ORDER BY {t[2]} {t[1]})"
    ),
    _WIN_KEYS.map(lambda ks: f"row_number() OVER (ORDER BY {ks})"),
    st.tuples(_int_exprs(1), _WIN_KEYS).map(
        lambda t: f"lag({t[0]}, 1) OVER (ORDER BY {t[1]})"
    ),
    st.tuples(_int_exprs(1), _WIN_KEYS).map(
        lambda t: f"lead({t[0]}, 2) OVER (ORDER BY {t[1]})"
    ),
    st.tuples(_int_exprs(1), _int_exprs(0)).map(
        lambda t: f"first_value({t[0]}) OVER (ORDER BY k ROWS BETWEEN 1 "
                  f"PRECEDING AND CURRENT ROW)"
    ),
    st.just("rank() OVER (ORDER BY (i IS NULL), i)"),
    st.just("rank() OVER (ORDER BY i)"),
)

_LIST_BASE = st.one_of(
    st.just("[i, j, k]"),
    st.just("[j, 2, NULL]"),
    st.just("[]"),
    _int_exprs(1).map(lambda e: f"[{e}]"),
    st.tuples(_int_exprs(1), _int_exprs(1)).map(
        lambda t: f"[{t[0]}, {t[1]}]"
    ),
)
_LIST_EXPRS = st.one_of(
    _LIST_BASE.map(lambda e: f"len({e})"),
    _LIST_BASE.map(lambda e: f"list_sum({e})"),
    _LIST_BASE.map(lambda e: f"list_sort({e})"),
    st.tuples(_LIST_BASE, _int_exprs(0)).map(
        lambda t: f"list_contains({t[0]}, {t[1]})"
    ),
    st.tuples(_LIST_BASE, st.integers(-3, 3)).map(
        lambda t: f"{t[0]}[{t[1]}]" if t[1] else f"{t[0]}[1]"
    ),
    _LIST_BASE.map(lambda e: f"list_reverse({e})"),
    st.tuples(_LIST_BASE, _LIST_BASE).map(
        lambda t: f"list_concat({t[0]}, {t[1]})"
    ),
    _LIST_BASE.map(lambda e: f"list_transform({e}, x -> x * 2)"),
    _LIST_BASE.map(lambda e: f"list_filter({e}, x -> x > 1)"),
)

_DATE_EXPRS = st.one_of(
    # DuckDB's +(DATE, n) binds INTEGER only, so the offset is cast
    _int_exprs(1).map(
        lambda e: f"DATE '2024-03-15' + CAST(coalesce({e}, 0) % 400 "
                  f"AS INTEGER)"
    ),
    _int_exprs(1).map(
        lambda e: f"date_part('year', DATE '2024-03-15' + "
                  f"CAST(coalesce({e}, 0) % 400 AS INTEGER))"
    ),
    st.sampled_from(["year", "month", "day", "dow", "doy", "week"]).map(
        lambda p: f"date_part('{p}', DATE '2021-11-05' + j)"
    ),
    st.sampled_from(["year", "month", "day"]).map(
        lambda p: f"date_trunc('{p}', DATE '2021-11-05' + i % 50)"
    ),
    st.just("datediff('day', DATE '2024-01-01', DATE '2024-03-15' + j)"),
    st.just("strftime(DATE '2024-02-29' + j % 300, '%Y-%m-%d')"),
    st.just("last_day(DATE '2024-01-15' + i % 365)"),
)


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(agg=_AGGS, cond=_bool_exprs(1))
def test_fuzz_aggregate_parity(engines, agg, cond):
    lake, con = engines
    _run_both(
        lake, con,
        f"SELECT {agg} AS r {_FROM} WHERE coalesce({cond}, FALSE)",
    )


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(win=_WINDOWS)
def test_fuzz_window_parity(engines, win):
    lake, con = engines
    _run_both(lake, con, f"SELECT k, {win} AS r {_FROM} ORDER BY k")


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(expr=_LIST_EXPRS)
def test_fuzz_list_parity(engines, expr):
    lake, con = engines
    _run_both(lake, con, f"SELECT k, {expr} AS r {_FROM} ORDER BY k")


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(expr=_DATE_EXPRS)
def test_fuzz_date_parity(engines, expr):
    lake, con = engines
    _run_both(lake, con, f"SELECT k, {expr} AS r {_FROM} ORDER BY k")


# --- relational statement grammars --------------------------------------
# joins (incl. DuckDB's bare SEMI/ANTI), GROUP BY, set ops, subqueries,
# QUALIFY — the statement-level rewrite seams

_U_ROWS = "(0, 3, 'x'), (1, NULL, 'y'), (2, 3, 'x'), (3, 7, NULL), (5, -4, 'zz')"
_FROM_U = f"(VALUES {_U_ROWS}) u(k2, m, v)"
_T_REL = f"(VALUES {_ROWS}) t(k, i, j, s, b)"

_JOIN_TYPES = st.sampled_from(
    ["JOIN", "INNER JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]
)
_JOIN_CONDS = st.sampled_from([
    "t.k = u.k2",
    "t.k = u.k2 AND u.m > 0",
    "t.i = u.m",
    "t.k % 3 = u.k2 % 3",
    "abs(coalesce(t.i, 0)) > abs(coalesce(u.m, 0))",
])


@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(jt=_JOIN_TYPES, cond=_JOIN_CONDS, proj=_int_exprs(1))
def test_fuzz_join_parity(engines, jt, cond, proj):
    lake, con = engines
    _run_both(
        lake, con,
        f"SELECT t.k AS tk, u.k2 AS uk, coalesce({proj}, -1) + "
        f"coalesce(u.m, 0) AS r FROM {_T_REL} {jt} {_FROM_U} ON {cond} "
        f"ORDER BY tk NULLS FIRST, uk NULLS FIRST, r NULLS FIRST",
    )


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(jt=st.sampled_from(["SEMI", "ANTI"]), cond=_JOIN_CONDS)
def test_fuzz_semi_anti_parity(engines, jt, cond):
    # DuckDB's bare SEMI/ANTI JOIN keywords (Spark spells LEFT SEMI)
    lake, con = engines
    _run_both(
        lake, con,
        f"SELECT t.k AS tk FROM {_T_REL} {jt} JOIN {_FROM_U} ON {cond} "
        f"ORDER BY tk",
    )


_GROUP_KEYS = st.sampled_from([
    "coalesce(i, 0) % 3", "(i IS NULL)", "length(s) % 2",
    "CASE WHEN i > 0 THEN 'p' WHEN i < 0 THEN 'n' ELSE 'z' END",
])


@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(key=_GROUP_KEYS, agg=_AGGS)
def test_fuzz_groupby_parity(engines, key, agg):
    lake, con = engines
    _run_both(
        lake, con,
        f"SELECT {key} AS g, {agg} AS r {_FROM} GROUP BY g "
        f"ORDER BY g NULLS FIRST",
    )


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(op=st.sampled_from(
    ["UNION", "UNION ALL", "INTERSECT", "EXCEPT", "INTERSECT ALL",
     "EXCEPT ALL"]),
    lhs=st.sampled_from(["i", "j", "k", "coalesce(i, j)"]),
    rhs=st.sampled_from(["m", "k2", "coalesce(m, 0)"]),
)
def test_fuzz_setop_parity(engines, op, lhs, rhs):
    lake, con = engines
    _run_both(
        lake, con,
        f"SELECT * FROM (SELECT {lhs} AS x {_FROM} {op} "
        f"SELECT {rhs} FROM {_FROM_U}) z ORDER BY x NULLS FIRST",
    )


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(cond=st.sampled_from([
    "u.m = t.i", "u.k2 < t.k", "u.m > t.j AND u.v IS NOT NULL"]),
    form=st.sampled_from(["EXISTS", "NOT EXISTS"]),
)
def test_fuzz_subquery_parity(engines, cond, form):
    lake, con = engines
    _run_both(
        lake, con,
        f"SELECT t.k AS tk FROM {_T_REL} WHERE {form} "
        f"(SELECT 1 FROM {_FROM_U} WHERE {cond}) ORDER BY tk",
    )


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(n=st.integers(1, 5), key=st.sampled_from(
    ["k", "coalesce(i, 99)", "length(s)"]))
def test_fuzz_qualify_parity(engines, n, key):
    lake, con = engines
    _run_both(
        lake, con,
        f"SELECT k {_FROM} QUALIFY row_number() OVER (ORDER BY {key}, k) "
        f"<= {n} ORDER BY k",
    )


@pytest.mark.parametrize("stmt", REGRESSION_STATEMENTS)
def test_fuzz_regressions(engines, stmt):
    lake, con = engines
    _run_both(lake, con, stmt)


# --------------------------------------------------------- round-5 grammars
# new search spaces: string-function nests, HAVING over expression keys,
# DISTINCT ON, struct/map literals, GROUPING SETS shapes

_STRFN_EXPRS = st.one_of(
    st.tuples(_str_exprs(1), st.integers(0, 8), st.sampled_from(["'.'", "'xy'", "''"])).map(
        lambda t: f"lpad({t[0]}, {t[1]}, {t[2]})"
    ),
    st.tuples(_str_exprs(1), st.integers(0, 8), st.sampled_from(["'.'", "'xy'"])).map(
        lambda t: f"rpad({t[0]}, {t[1]}, {t[2]})"
    ),
    st.tuples(_str_exprs(1), st.integers(-1, 3)).map(
        lambda t: f"repeat({t[0]}, {t[1]})"
    ),
    st.tuples(_str_exprs(1), st.sampled_from(["' '", "'a'", "'e'"]), st.integers(1, 3)).map(
        lambda t: f"split_part({t[0]}, {t[1]}, {t[2]})"
    ),
    st.tuples(_str_exprs(1), st.sampled_from(["'a'", "'A'", "'zz'", "''"])).map(
        lambda t: f"strpos({t[0]}, {t[1]})"
    ),
    st.tuples(_str_exprs(1), _str_exprs(0)).map(
        lambda t: f"contains({t[0]}, {t[1]})"
    ),
    st.tuples(_str_exprs(1), _str_exprs(0)).map(
        lambda t: f"starts_with({t[0]}, {t[1]})"
    ),
    st.tuples(_str_exprs(1), _str_exprs(0)).map(
        lambda t: f"ends_with({t[0]}, {t[1]})"
    ),
    _str_exprs(1).map(lambda e: f"ascii({e})"),
    _str_exprs(1).map(lambda e: f"md5({e})"),
    st.tuples(_str_exprs(1), st.sampled_from(["'a'", "'ab'", "' '"])).map(
        lambda t: f"ltrim({t[0]}, {t[1]})"
    ),
    st.tuples(_str_exprs(1), st.sampled_from(["'a'", "'ab'", "' '"])).map(
        lambda t: f"rtrim({t[0]}, {t[1]})"
    ),
    st.tuples(_str_exprs(1), _str_exprs(1)).map(
        lambda t: f"greatest({t[0]}, {t[1]})"
    ),
    st.tuples(_str_exprs(1), st.integers(1, 3)).map(
        lambda t: f"array_to_string(string_split({t[0]}, 'a'), '|')"
    ),
)


@settings(max_examples=50, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(expr=_STRFN_EXPRS)
def test_fuzz_string_fn_parity(engines, expr):
    lake, con = engines
    _run_both(lake, con, f"SELECT k, {expr} AS r {_FROM} ORDER BY k")


_GROUP_KEYS = st.sampled_from(
    ["b", "length(s)", "(i IS NULL)", "coalesce(j, -1) % 3", "upper(left(s, 1))"]
)
_HAVING = st.sampled_from([
    "count(*) > 1", "min(k) >= 0", "sum(coalesce(i, 0)) <> 0",
    "count(i) = count(*)", "max(k) - min(k) > 1",
])


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(key=_GROUP_KEYS, agg=_AGGS, hav=_HAVING)
def test_fuzz_having_parity(engines, key, agg, hav):
    lake, con = engines
    _run_both(
        lake, con,
        f"SELECT {key} AS g, {agg} AS a {_FROM} GROUP BY {key} "
        f"HAVING {hav} ORDER BY g NULLS LAST",
    )


@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(key=st.sampled_from(["b", "(j IS NULL)", "length(s) % 2"]),
       ob=st.sampled_from(["k", "i DESC NULLS LAST, k", "j, k"]))
def test_fuzz_distinct_on_parity(engines, key, ob):
    # DuckDB's DISTINCT ON keeps the first row per key under ORDER BY
    lake, con = engines
    _run_both(
        lake, con,
        f"SELECT DISTINCT ON ({key}) k {_FROM} ORDER BY {key}, {ob}",
    )


_STRUCT_EXPRS = st.one_of(
    st.tuples(_int_exprs(1), _str_exprs(1)).map(
        lambda t: f"{{'a': {t[0]}, 'b': {t[1]}}}.a"
    ),
    st.tuples(_int_exprs(1), _str_exprs(1)).map(
        lambda t: f"struct_extract({{'a': {t[0]}, 'b': {t[1]}}}, 'b')"
    ),
    _int_exprs(1).map(
        lambda e: f"map([1, 2], [{e}, 9])[2]"
    ),
    st.tuples(_int_exprs(0), _int_exprs(0)).map(
        lambda t: f"cardinality(map([1, 2], [{t[0]}, {t[1]}]))"
    ),
)


@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(expr=_STRUCT_EXPRS)
def test_fuzz_struct_map_parity(engines, expr):
    lake, con = engines
    _run_both(lake, con, f"SELECT k, {expr} AS r {_FROM} ORDER BY k")


_CAST_TARGETS = st.sampled_from(
    ["INTEGER", "BIGINT", "SMALLINT", "INT4", "INT8"]
)
_NUMERICISH = st.one_of(
    _int_exprs(2),
    st.tuples(_int_exprs(1), st.sampled_from(["0.5", "1.5", "2.25"])).map(
        lambda t: f"({t[0]} + {t[1]})"
    ),
    st.tuples(_int_exprs(1), st.sampled_from(["1.5", "0.25"])).map(
        lambda t: f"({t[0]} * {t[1]})"
    ),
)


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(expr=_NUMERICISH, tgt=_CAST_TARGETS,
       form=st.sampled_from(["cast", "colon"]))
def test_fuzz_int_cast_parity(engines, expr, tgt, form):
    lake, con = engines
    e = (f"CAST({expr} AS {tgt})" if form == "cast"
         else f"({expr})::{tgt}")
    _run_both(lake, con, f"SELECT k, {e} AS r {_FROM} ORDER BY k")


_INTERVAL_UNITS = st.sampled_from(
    ["DAY", "HOUR", "MINUTE", "MONTH", "WEEK", "DAYS", "HOURS"]
)


@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n=_int_exprs(1), unit=_INTERVAL_UNITS)
def test_fuzz_interval_parity(engines, n, unit):
    lake, con = engines
    _run_both(
        lake, con,
        f"SELECT k, TIMESTAMP '2024-03-15 06:30:00' + "
        f"INTERVAL (coalesce({n}, 0) % 1000) {unit} AS r {_FROM} ORDER BY k",
    )


@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    shape=st.sampled_from([
        "ROLLUP (b, length(s))",
        "CUBE (b, (i IS NULL))",
        "GROUPING SETS ((b), (length(s)), ())",
        "GROUPING SETS ((b, length(s)), (b), ())",
    ]),
    agg=_AGGS,
)
def test_fuzz_grouping_sets_parity(engines, shape, agg):
    lake, con = engines
    keycols = "b, length(s)" if "length" in shape else "b, (i IS NULL)"
    first = keycols.split(",")[0].strip()
    _run_both(
        lake, con,
        f"SELECT {keycols}, {agg} AS a {_FROM} GROUP BY {shape} "
        f"ORDER BY ALL NULLS LAST",
    )
