"""Round-9 regression pins: the ADVICE-r8 findings and the VERDICT-r8
task-2 segmented pattern-match rewrite."""

from __future__ import annotations

import random
import re

import pytest

from ducklakexl_spark.engine import (
    rewrite_ansi_fetch_and_json_arrow,
    values_alias_column_classes,
)
from tests.conftest import SF_DIR_ORACLE, register_duck_views


# --------------------------------------------------- ADVICE r8 #1
def test_json_arrow_in_first_hof_argument_is_rewritten():
    """`list_filter(j -> 'arr', x -> x > 1)` with JSON column j: the
    lambda-param exemption must NOT apply to argument 1 of a HOF call —
    lambdas never occupy the collection slot, so a first-arg bare-ident
    arrow is JSON extraction (DuckDB-verified precedence)."""
    out = rewrite_ansi_fetch_and_json_arrow(
        "SELECT list_filter(j -> 'arr', x -> x > 1) FROM t",
        json_cols=frozenset({"j"}),
    )
    assert "try_variant_get(try_parse_json(j)" in out, out
    # the actual lambda in argument 2 is untouched
    assert "x -> x > 1" in out, out
    # a bare JSON-column ident in a LATER argument position still reads
    # as the lambda parameter (it shadows the column)
    out2 = rewrite_ansi_fetch_and_json_arrow(
        "SELECT list_transform(arr, j -> 'x') FROM t",
        json_cols=frozenset({"j"}),
    )
    assert "try_parse_json" not in out2, out2


# --------------------------------------------------- ADVICE r8 #2
def test_values_alias_map_class_requires_map_constructor():
    """Only a MAP constructor classifies a VALUES column as 'map'; a
    map_*() function call (map_keys returns a LIST) must keep default
    semantics."""
    assert values_alias_column_classes(
        "SELECT c FROM (VALUES (MAP {'a': 1})) v(c)"
    ) == {"v.c": "map"}
    assert values_alias_column_classes(
        "SELECT c FROM (VALUES (MAP('a', 1))) v(c)"
    ) == {"v.c": "map"}
    # map_keys(...) is a LIST — no 'map' class may be emitted
    assert (
        values_alias_column_classes(
            "SELECT c FROM (VALUES (map_keys(MAP {'a': 1}))) v(c)"
        )
        == {}
    )


# --------------------------------------------------- VERDICT r8 task 2
PATTERN = re.compile("v[^e]*c[^e]*p")


def _chunk_features(s: str):
    """Python mirror of the per-chunk closed-form features in
    queries/funnel.py::events_pattern_match."""
    tail = s.rsplit("e", 1)[-1]
    t_prog = 2 if re.search("v.*c", tail) else (1 if "v" in tail else 0)
    has_e = "e" in s
    return {
        "m0": bool(PATTERN.search(s)),
        "m1": bool(re.search("^[^e]*c[^e]*p", s)),
        "m2": bool(re.search("^[^e]*p", s)),
        "f0": t_prog,
        "f1": t_prog if has_e else max(t_prog, 2 if "c" in s else 1),
        "f2": t_prog if has_e else 2,
    }


def _fold(chunks):
    m, p = False, 0
    for c in chunks:
        f = _chunk_features(c)
        m = m or f["m0"] or (p >= 1 and f["m1"]) or (p == 2 and f["m2"])
        p = (f["f0"], f["f1"], f["f2"])[p]
    return m


def test_segmented_pattern_fold_equals_regex_exhaustive():
    """The chunked transition-function fold must equal a whole-string
    regex match for EVERY string up to length 6 over the event alphabet
    and every 2-way chunking of it (exhaustive), plus random longer
    strings with random chunkings."""
    alphabet = "vcpse"
    # exhaustive short strings, all split points
    from itertools import product

    for n in range(7):
        for tup in product(alphabet, repeat=n):
            s = "".join(tup)
            want = bool(PATTERN.search(s))
            for cut in range(n + 1):
                assert _fold([x for x in (s[:cut], s[cut:]) if x]) == want, (
                    s,
                    cut,
                )
    # random long strings, random multi-chunkings
    rng = random.Random(9)
    for _ in range(500):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 80)))
        want = bool(PATTERN.search(s))
        cuts = sorted(
            rng.sample(range(1, len(s)), k=min(len(s) - 1, rng.randint(0, 7)))
        ) if len(s) > 1 else []
        chunks = [
            s[a:b] for a, b in zip([0, *cuts], [*cuts, len(s)]) if s[a:b]
        ]
        assert _fold(chunks) == want, (s, cuts)


@pytest.mark.parametrize(
    "name",
    [
        "events_pattern_match",
        "sessionize_events",
        "events_markov_transitions",
        "events_anomaly_zscore",
        "text_inverted_index",
    ],
)
def test_segmented_rewrites_oracle_parity_sf001(spark, duck, name):
    """End-to-end: every r9 segmented plan strict-matches its unchanged
    whole-partition DuckDB oracle (the compare the sweeps run).  sf0.01
    exercises the chunk machinery hard: the 30-day fixture splits into
    ~720 hour chunks / ~43k minute chunks with mostly-sparse chunks, so
    carries and boundary stitches dominate."""
    from ducklakexl_spark import queries as qmod
    from tests.compare import compare

    qmod.load_all()
    register_duck_views(duck, SF_DIR_ORACLE)
    compare(
        qmod.QUERIES[name](spark, SF_DIR_ORACLE),
        duck,
        qmod.ORACLES[name],
        name,
    )


def test_parquet_multiset_compare_passes_and_detects(spark, duck, tmp_path):
    """The corpus-sized-output compare path (tests/compare.py
    compare_via_parquet, used by the sf100 sweep for window_lag_lead)
    is equivalent to the strict compare: it passes on the real
    window_lag_lead row at sf0.001 and it DETECTS a single-value
    perturbation (so an sf100 OK(parquet-multiset compare) line is a
    real verification, not a vacuous one)."""
    from ducklakexl_spark import queries as qmod
    from tests.compare import compare_via_parquet

    qmod.load_all()
    register_duck_views(duck, "/root/testdata/sf0.001")
    df = qmod.QUERIES["window_lag_lead"](spark, "/root/testdata/sf0.001")
    compare_via_parquet(
        df, duck, qmod.ORACLES["window_lag_lead"], "window_lag_lead",
        str(tmp_path),
    )
    # perturb one value on the Spark side: must raise
    from pyspark.sql import functions as F

    bad = df.withColumn(
        "delta_value",
        F.when(F.col("event_id") == df.select(F.min("event_id")).first()[0],
               F.col("delta_value") + 1.0).otherwise(F.col("delta_value")),
    )
    with pytest.raises(AssertionError):
        compare_via_parquet(
            bad, duck, qmod.ORACLES["window_lag_lead"], "window_lag_lead",
            str(tmp_path),
        )
