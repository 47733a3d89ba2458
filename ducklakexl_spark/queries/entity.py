"""Entity resolution / record linkage (SURVEY.md §2.D extension surface):
blocking + bounded-edit-distance verification over the customer table —
the fuzzy-matching primitive every master-data / training-data-cleaning
pipeline runs before deduplicating entities whose keys don't line up.

Same scale discipline as the near-dup dedup family: candidate pairs are
generated ONLY inside equi-join blocks (never all-vs-all), the expensive
string metric runs on block-mates alone, and the plan is guarded against
BNLJ/cartesian fallbacks in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducklakexl_spark.queries import load, query

MAX_EDIT = 2


@query(
    "er_blocked_match",
    oracle=f"""
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           a.c_nationkey AS nationkey, a.c_mktsegment AS mktsegment,
           levenshtein(a.c_name, b.c_name) AS edit_dist
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= {MAX_EDIT}
    """,
)
def er_blocked_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate entity matches: customers in the same (nation, segment)
    block whose names are within Levenshtein distance {2}.

    Blocking is the classical record-linkage move: the pair space shrinks
    from C(n, 2) to sum-over-blocks C(|block|, 2), and the generation is
    an EQUI-join on the block key — Catalyst picks hash join, never a
    cartesian.  The edit-distance verify (quadratic in string length)
    touches only block-mates.  At 100 TB block sizes are the knob: a skewed
    block (one mega-city) gets salted or sub-blocked by a name prefix, the
    same remedy operators/skew.py applies to hot aggregation keys.
    ``levenshtein`` is JVM-side codegen on both engines with the textbook
    unit-cost definition, so distances agree exactly.
    """
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    a, b = c.alias("a"), c.alias("b")
    dist = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .filter(dist <= MAX_EDIT)
        .select(
            F.col("a.c_custkey").alias("key_a"),
            F.col("b.c_custkey").alias("key_b"),
            F.col("a.c_nationkey").alias("nationkey"),
            F.col("a.c_mktsegment").alias("mktsegment"),
            dist.alias("edit_dist"),
        )
    )


@query(
    "er_entity_clusters",
    oracle=f"""
    WITH RECURSIVE edges AS (
      SELECT a.c_custkey AS key_a, b.c_custkey AS key_b
      FROM customer a JOIN customer b
        ON a.c_nationkey = b.c_nationkey
       AND a.c_mktsegment = b.c_mktsegment
       AND a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= {MAX_EDIT}
    ),
    nodes AS (SELECT key_a AS n FROM edges UNION SELECT key_b FROM edges),
    sym AS (SELECT key_a AS a, key_b AS b FROM edges
            UNION SELECT key_b, key_a FROM edges),
    reach(s, t) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.s, y.b FROM reach r JOIN sym y ON r.t = y.a
    ),
    cc AS (SELECT s AS custkey, min(t) AS cluster_id
           FROM reach GROUP BY s)
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           min(custkey) AS representative
    FROM cc GROUP BY cluster_id
    """,
)
def er_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive entity merge: the pairwise matches from
    er_blocked_match chained into entities via connected components
    (A~B, B~C must land A and C in one entity even when their names
    differ by more than the pair threshold) — the step that turns a
    match list into a golden-record grouping.  Composition of two
    registered operators; the CC driver loop runs over the MATCH graph
    (pairs-sized, not table-sized), verified against DuckDB's actual
    recursive CTE."""
    from ducklakexl_spark.operators.graph import connected_components
    from ducklakexl_spark.queries import QUERIES

    pairs = QUERIES["er_blocked_match"](spark, sf_dir).select(
        "key_a", "key_b"
    )
    cc = connected_components(pairs, src="key_a", dst="key_b")
    return cc.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min("node").alias("representative"),
    )
