"""Iterative ML-on-Spark operators (SURVEY.md §2.D extension surface):
Lloyd's k-means over the embedding corpus — the canonical
driver-coordinates / executors-sweep iterative algorithm, and the full
version of the coarse-quantizer training step the IVF / SemDeDup
operators share (similarity._ivf_scored trains one round from labels;
this trains from scratch).

Numerical discipline follows the proven similarity-module pattern: every
per-row fold (norms, dots) runs left-to-right in doubles on both engines,
trained centroids quantize to 6 dp per round so row-order summation drift
cannot compound, and collected centroid constants fold into whole-stage
codegen expressions (k x DIM doubles is metadata-sized at any corpus
scale — k-means at 100 TB is bounded by the assignment sweeps, which here
are single scans with zero joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducklakexl_spark.queries import load, query
from ducklakexl_spark.queries.similarity import DIM, dot_lit_sql

K = 4
ITERS = 2

_ENORM_SQL = (
    "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * "
    "CAST(x AS DOUBLE)), 0D, (acc, x) -> acc + x)"
)
_DUCK_ENORM = (
    "list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * "
    "CAST(x AS DOUBLE)))"
)
_DUCK_DOT_CVEC = (
    f"list_sum(list_transform(generate_series(1, {DIM}), "
    "i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i]))"
)
_DUCK_CNORM2 = "list_sum(list_transform(c.cvec, x -> x * x))"

# Squared L2 distance via the |e|^2 - 2 e.c + |c|^2 identity: each of the
# three terms is a fold both engines execute in the identical order, so
# the assembled distance is bit-identical and argmin ties (ORDER BY dist,
# cell) resolve the same way.
_DUCK_DIST = f"(({_DUCK_ENORM}) - 2.0 * ({_DUCK_DOT_CVEC}) + ({_DUCK_CNORM2}))"


def _duck_assign(cent_cte: str) -> str:
    return f"""
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_DUCK_DIST}, c.cell) AS rn
        FROM embeddings e CROSS JOIN {cent_cte} c) t
      WHERE rn = 1
    """


def _kmeans_oracle() -> str:
    return f"""
    WITH init AS MATERIALIZED (
      SELECT vec_id AS cell,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
      FROM embeddings WHERE vec_id < {K}
    ),
    a1 AS MATERIALIZED ({_duck_assign("init")}),
    c1 AS MATERIALIZED (
      SELECT cell, list(v ORDER BY i) AS cvec
      FROM (SELECT a1.cell, i,
                   round(avg(CAST(e.embedding[i] AS DOUBLE)), 6) AS v
            FROM a1 JOIN embeddings e USING (vec_id),
                 generate_series(1, {DIM}) t(i)
            GROUP BY a1.cell, i)
      GROUP BY cell
    ),
    a2 AS MATERIALIZED ({_duck_assign("c1")})
    SELECT a2.cell AS cluster, count(*) AS n,
           any_value(round(sqrt(list_sum(list_transform(c.cvec, x -> x * x))),
                           6)) AS centroid_norm
    FROM a2 JOIN c1 c ON c.cell = a2.cell
    GROUP BY a2.cell
    """


@query("ml_kmeans_iter", oracle=_kmeans_oracle())
def ml_kmeans_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k-means (k = {4}) on the embedding corpus,
    seeded from the first k vectors; reports per-cluster size and the
    trained centroid's norm.

    Scale shape per iteration: centroids collect to the driver (k x DIM
    doubles — metadata) and fold into ONE constant-unrolled assignment
    expression, so the E-step is a single corpus scan with no join and no
    shuffle; the M-step is posexplode + groupBy(cell, dim) — one narrow
    shuffle with map-side partial aggregation, output k x DIM rows.  That
    is the identical dataflow MLlib's KMeans runs (broadcast centers +
    treeAggregate); expressed relationally it stays whole-stage-codegen
    JVM work end-to-end with no Python in the loop.
    """
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    init = sorted(
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in e.filter(F.col("vec_id") < K).collect()
    )
    cents: list[tuple[int, list[float]]] = init

    assigned = None
    for _ in range(ITERS):
        structs = [
            F.struct(
                F.expr(
                    f"({_ENORM_SQL}) - 2.0D * ({dot_lit_sql('embedding', cv)})"
                    f" + {sum(v * v for v in cv)!r}D"
                ).alias("dist"),
                F.lit(int(cell)).cast("long").alias("cell"),
            )
            for cell, cv in cents
        ]
        assigned = e.select(
            "vec_id",
            "embedding",
            F.array_min(F.array(*structs)).getField("cell").alias("cell"),
        )
        if _ < ITERS - 1:
            rows = (
                assigned.select("cell", F.posexplode("embedding").alias("pos", "val"))
                .groupBy("cell", "pos")
                .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("v"))
                .groupBy("cell")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "v"))),
                        lambda s: s.v,
                    ).alias("cvec")
                )
                .collect()
            )
            cents = sorted((r["cell"], list(r["cvec"])) for r in rows)

    import math

    norm = {c: round(math.sqrt(sum(v * v for v in cv)), 6) for c, cv in cents}
    norm_col = F.create_map(
        *[x for c in norm for x in (F.lit(int(c)), F.lit(norm[c]))]
    )
    return (
        assigned.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("cell").alias("cluster"),
            "n",
            norm_col[F.col("cell")].alias("centroid_norm"),
        )
    )


# ---------------------------------------------------------------------------
# Hashed linear quality classifier (fasttext-style scoring, hashing trick)
# ---------------------------------------------------------------------------

_N_BUCKETS = 64
# Pseudo-weights on a 1/512 grid: ((b * 2654435761) % 1024) / 512 - 1 lies
# in [-1, 1) and is exactly representable in binary FP, so per-doc weight
# sums are EXACT regardless of accumulation order — no rounding epsilon
# between engines, and the sign-of-mean decision boundary is bit-stable.
_HASH_MULT = 2654435761  # Knuth multiplicative constant

_DUCK_BUCKET = f"(('0x' || substr(md5(t), 1, 8))::BIGINT % {_N_BUCKETS})"
_DUCK_W = (
    f"CAST(({_DUCK_BUCKET} * {_HASH_MULT}) % 1024 AS DOUBLE) / 512.0 - 1.0"
)


@query(
    "ml_linear_quality_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang,
             len(toks) AS n_tokens,
             list_sum(list_transform(toks, t -> {_DUCK_W})) AS w_sum
      FROM tok
    )
    SELECT lang,
           count(*)                                             AS n_docs,
           CAST(count(*) FILTER (WHERE w_sum > 0) AS BIGINT)    AS n_positive,
           round(avg(w_sum / n_tokens), 6)                      AS mean_score
    FROM scored
    GROUP BY lang
    """,
)
def ml_linear_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fasttext-style linear text classifier via the hashing trick: each
    token hashes (portable md5 prefix) into one of 64 weight buckets, the
    document score is the mean bucket weight, and the decision is its
    sign — the exact dataflow of a learned linear quality filter (e.g.
    CCNet/fasttext binary quality models), with a deterministic
    pseudo-weight table standing in for learned weights (this container
    has no fasttext; the weight LOOKUP, not the training, is the scale
    path).

    Scale shape: tokenize → hash → weight-sum is ONE map-side fold per
    document (a single whole-stage-codegen'd higher-order aggregate —
    no explode, no shuffle at token granularity); the only exchange is
    the final 5-row per-language rollup.  A learned model swaps the
    arithmetic weight formula for a broadcast 64-float array lookup —
    identical plan.  Weights live on a 1/512 grid so per-doc sums are
    exact in FP on both engines (order-independent), making the
    w_sum > 0 decision boundary bit-stable.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    scored = d.select(
        "lang",
        F.size(toks).alias("n_tokens"),
        F.aggregate(
            F.transform(
                toks,
                lambda t: (
                    (
                        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast(
                            "long"
                        )
                        % _N_BUCKETS
                    )
                    * _HASH_MULT
                    % 1024
                ).cast("double")
                / 512.0
                - 1.0,
            ),
            F.lit(0.0),
            lambda acc, w: acc + w,
        ).alias("w_sum"),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("w_sum") > 0).cast("long").alias("n_positive"),
        F.round(F.avg(F.col("w_sum") / F.col("n_tokens")), 6).alias(
            "mean_score"
        ),
    )


# ---------------------------------------------------------------------------
# per-dimension feature scaling (z-score normalization) of the embeddings
# ---------------------------------------------------------------------------

@query(
    "ml_feature_scaling",
    oracle="""
    WITH ex AS (
      SELECT i AS dim_idx,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
               AS xm,
             CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, unnest(generate_series(1, 8)) t(i)
    ),
    stats AS (
      SELECT dim_idx, count(*) AS n,
             CAST(sum(xm) AS BIGINT) AS sm,
             CAST(sum(xm * xm) AS BIGINT) AS ssq
      FROM ex GROUP BY dim_idx
    ),
    pivots AS (
      SELECT dim_idx, n,
             CAST(sm // n AS DOUBLE) / 1000000 AS mu,
             round(sqrt(CAST(ssq AS DOUBLE) / n / 1e12
                        - pow(CAST(sm AS DOUBLE) / n / 1e6, 2)), 6)
               AS sigma
      FROM stats
    )
    SELECT p.dim_idx, CAST(p.n AS BIGINT) AS n, p.mu, p.sigma,
           round(min((e.x - p.mu) / p.sigma), 4) AS min_z,
           round(max((e.x - p.mu) / p.sigma), 4) AS max_z
    FROM ex e JOIN pivots p USING (dim_idx)
    GROUP BY p.dim_idx, p.n, p.mu, p.sigma
    """,
)
def ml_feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score feature scaling of the embedding corpus
    (first 8 dims), the preprocessing step in front of any distance-
    based model: per-dim mean/std plus the post-scale min/max z as the
    range audit.  Mean/variance accumulate in exact integer micro-units
    (one corpus-scan aggregation onto the 8-valued dim key — bounded,
    partial-aggregated map-side).

    r9 (guide §2.4): z = (x - mu) / sigma is weakly monotone in x (IEEE
    subtraction and positive division preserve order), so min_z / max_z
    are exactly the z of the per-dim min(x) / max(x) — which ride the
    SAME stats aggregation.  The old second scan + broadcast join-back
    (the generic MAD pivot discipline) is unnecessary here because the
    audited statistic is order-preserving; values are bit-identical
    (same subtraction/division on the same extreme x).  One corpus
    scan, zero joins, zero corpus-sized shuffles."""
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "xf")
    ).select(
        (F.col("pos") + 1).cast("long").alias("dim_idx"),
        F.round(F.col("xf").cast("double") * 1000000)
        .cast("long")
        .alias("xm"),
        F.col("xf").cast("double").alias("x"),
    )
    stats = ex.groupBy("dim_idx").agg(
        F.count("*").alias("n"),
        F.sum("xm").alias("sm"),
        F.sum(F.col("xm") * F.col("xm")).alias("ssq"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    )
    mu = (F.expr("sm DIV n").cast("double") / 1000000).alias("mu")
    sigma = F.round(
        F.sqrt(
            F.col("ssq").cast("double") / F.col("n") / 1e12
            - F.pow(F.col("sm").cast("double") / F.col("n") / 1e6, 2)
        ),
        6,
    ).alias("sigma")
    return stats.select(
        "dim_idx", "n", mu, sigma, "mn", "mx"
    ).select(
        "dim_idx",
        F.col("n").cast("long").alias("n"),
        "mu",
        "sigma",
        F.round((F.col("mn") - F.col("mu")) / F.col("sigma"), 4).alias(
            "min_z"
        ),
        F.round((F.col("mx") - F.col("mu")) / F.col("sigma"), 4).alias(
            "max_z"
        ),
    )


# ---------------------------------------------------------------------------
# full-batch gradient descent (linear probe), driver-coordinated
# ---------------------------------------------------------------------------

GD_ITERS = 2


def _gd_oracle() -> str:
    """Unrolled 2-iteration GD: weights flow through 1-row CTEs, each
    round's gradient sums are exact integers (per-row terms quantized to
    micro-units), and the learning rate is 1/8 (binary-exact) so the
    weight update is a single IEEE division of exact integers — no
    round() on the weights at all, hence bit-identical recurrences."""
    rounds = []
    prev = "w0"
    for k in range(1, GD_ITERS + 1):
        rounds.append(f"""
    g{k} AS (
      SELECT count(*) AS n,
             sum(CAST(round(1000000 * ((w.a + w.b * x.x) - x.y))
                      AS BIGINT)) AS s0,
             sum(CAST(round(1000000 * (((w.a + w.b * x.x) - x.y) * x.x))
                      AS BIGINT)) AS s1,
             sum(CAST(round(1000000 * (((w.a + w.b * x.x) - x.y)
                                       * ((w.a + w.b * x.x) - x.y)))
                      AS BIGINT)) AS sl,
             max(w.a) AS a, max(w.b) AS b
      FROM x CROSS JOIN {prev} w
    ),
    w{k} AS (
      SELECT a - CAST(s0 AS DOUBLE) / (4.0 * n * 1000000) AS a,
             b - CAST(s1 AS DOUBLE) / (4.0 * n * 1000000) AS b
      FROM g{k}
    )""")
        prev = f"w{k}"
    finals = " UNION ALL ".join(
        f"""SELECT CAST({k} AS BIGINT) AS iter,
               floor(w{k}.a * 1000000) / 1000000 AS w0,
               floor(w{k}.b * 1000000) / 1000000 AS w1,
               CAST(g{k}.sl // g{k}.n AS DOUBLE) / 1000000 AS mse_before
        FROM w{k} CROSS JOIN g{k}"""
        for k in range(1, GD_ITERS + 1)
    )
    return f"""
    WITH x AS (
      SELECT CAST(n_chars AS DOUBLE) / 1000 AS x,
             CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DOUBLE) AS y
      FROM documents
    ),
    w0 AS (SELECT CAST(0 AS DOUBLE) AS a, CAST(0 AS DOUBLE) AS b),
    {",".join(rounds)}
    {finals}
    """


@query("ml_gd_linear_probe", oracle=_gd_oracle())
def ml_gd_linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed full-batch gradient descent, the driver-coordinated /
    executor-swept optimization loop (the shape of every Spark ML
    trainer): a linear probe y(=lang-en) ~ w0 + w1 * n_chars/1000 under
    squared loss, 2 iterations.  Each round is ONE partial-aggregated
    corpus scan producing exact-integer gradient sums (per-row terms
    quantized to micro-units, so summation order is irrelevant); the
    weight update runs on the driver with a binary-exact learning rate
    (1/8) as a single division of those integers — the recurrence is
    bit-identical across engines WITHOUT per-round quantization of the
    weights themselves.  At 100 TB: iterations x one scan, six numbers
    of driver state."""
    d = load(spark, sf_dir, "documents")
    x = (F.col("n_chars").cast("double") / 1000).alias("x")
    y = (
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("double")
    ).alias("y")
    xy = d.select(x, y)
    a, b = 0.0, 0.0
    rows = []
    for k in range(1, GD_ITERS + 1):
        r = (F.lit(a) + F.lit(b) * F.col("x")) - F.col("y")
        g = xy.agg(
            F.count("*").alias("n"),
            F.sum(F.round(1000000 * r).cast("long")).alias("s0"),
            F.sum(F.round(1000000 * (r * F.col("x"))).cast("long")).alias(
                "s1"
            ),
            F.sum(F.round(1000000 * (r * r)).cast("long")).alias("sl"),
        ).collect()[0]
        n = g["n"]
        # floor-quantized emission: round() on a rational that lands
        # exactly on a half-decimal boundary diverges between Spark
        # (shortest-string HALF_UP) and DuckDB (binary value) -- floor
        # of the identical double cannot
        mse = (g["sl"] // n) / 1000000
        a = a - g["s0"] / (4.0 * n * 1000000)
        b = b - g["s1"] / (4.0 * n * 1000000)
        import math as _math

        rows.append(
            (k, _math.floor(a * 1000000) / 1000000,
             _math.floor(b * 1000000) / 1000000, mse)
        )
    return spark.createDataFrame(
        rows, "iter long, w0 double, w1 double, mse_before double"
    )
