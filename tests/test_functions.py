"""UDF registration surface tests (functions/__init__.py): SQL-callable
pandas UDFs, grouped-agg UDAF shape, and agreement with the JVM built-in
twin where one exists."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ducklakexl_spark.functions import register_all
from ducklakexl_spark.queries import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _register(spark):
    register_all(spark)
    load(spark, SF, "documents").createOrReplaceTempView("documents")
    load(spark, SF, "embeddings").createOrReplaceTempView("embeddings")


def test_bpe_token_count_matches_builtin(spark):
    rows = spark.sql(
        """
        SELECT doc_id,
               bpe_token_count(text) AS udf_n,
               size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0))
                 AS builtin_n
        FROM documents LIMIT 50
        """
    ).collect()
    assert rows and all(r.udf_n == r.builtin_n for r in rows)


def test_quality_score_bounds(spark):
    rows = spark.sql(
        "SELECT quality_score(text) AS q FROM documents"
    ).collect()
    assert rows and all(0.0 <= r.q <= 1.0 for r in rows)


def test_l2_normalize_unit_norm(spark):
    rows = spark.sql(
        "SELECT l2_normalize(embedding) AS v FROM embeddings LIMIT 20"
    ).collect()
    for r in rows:
        norm = math.sqrt(sum(x * x for x in r.v))
        assert abs(norm - 1.0) < 1e-3


def test_geo_mean_grouped_agg(spark):
    # NB: Spark disallows mixing grouped-agg pandas UDFs with built-in
    # aggregates in one agg, so the arithmetic-mean twin runs separately.
    g = {
        r.lang: r.g
        for r in spark.sql(
            "SELECT lang, geo_mean(CAST(n_chars AS DOUBLE)) AS g "
            "FROM documents GROUP BY lang"
        ).collect()
    }
    a = {
        r.lang: r.a
        for r in spark.sql(
            "SELECT lang, avg(n_chars) AS a FROM documents GROUP BY lang"
        ).collect()
    }
    assert g and g.keys() == a.keys()
    for lang in g:
        assert 0 < g[lang] <= a[lang]  # AM-GM


def test_udf_in_dataframe_api(spark):
    from ducklakexl_spark.functions import quality_score

    df = load(spark, SF, "documents").select(
        "doc_id", quality_score(F.col("text")).alias("q")
    )
    assert df.count() > 0
