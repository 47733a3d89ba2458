"""Deduplication operators for LLM training-data pipelines (SURVEY.md §2.D):

- exact dedup (content-hash groupBy),
- n-gram Jaccard near-dup (word 3-gram shingles),
- MinHash + LSH near-dup (the scale path: candidate generation via banded
  signatures → verification only on candidates),
- SimHash near-dup (bit-signature hamming distance).

Every operator is expressed with built-in column functions (md5-based
hashing is byte-identical across Spark and DuckDB, which makes the oracles
exact).  The LSH design is the one that survives 100 TB: signatures are
computed per-row (no shuffle), candidates come from an equi-join on
(band, band_key) — a hash-partitionable key — and the quadratic verify
step only touches candidate pairs, never the full cross product.

The plain pairwise-Jaccard query exists as the *correctness baseline* for
the LSH variant; it is quadratic by construction and intentionally not part
of the bench headline set.
"""

from __future__ import annotations

import weakref

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ducklakexl_spark.queries import (
    broadcast_if_small,
    load,
    query,
    shuffle_hash_if_large,
)

N_MINHASH = 8  # 4 bands x 2 rows -> ~0.5 jaccard threshold knee
N_BANDS = 4
ROWS_PER_BAND = 2
JACCARD_THRESHOLD = 0.8

# affine minhash mixing: one md5 per shingle, then h_j = (h%P)*A_j+B_j mod P.
# P = 2^31-1 keeps (h%P)*A_j < 2^62 — no BIGINT overflow in either engine.
MINHASH_P = 2_147_483_647
MINHASH_A = [982_451_653, 941_083_987, 899_809_343, 857_531_537,
             715_225_741, 674_506_111, 633_910_099, 593_441_861]
MINHASH_B = [122_949_829, 198_491_329, 295_075_153, 373_587_911,
             472_882_049, 533_000_401, 613_651_369, 694_847_539]


# ---------------------------------------------------------------------------
# Portable building blocks (identical numeric results in Spark and DuckDB)
# ---------------------------------------------------------------------------


def portable_hash(col: Column, seed: int) -> Column:
    """Deterministic 60-bit hash from md5 — identical in Spark and DuckDB.

    Spark:  conv(substr(md5(s || '#seed'), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(s || '#seed'), 1, 15))::BIGINT
    """
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f"#{seed}"))), 1, 15), 16, 10
    ).cast("long")


def _sql_hash(expr: str, seed: int) -> str:
    return f"('0x' || substr(md5({expr} || '#{seed}'), 1, 15))::BIGINT"


def shingles_col(text: Column) -> Column:
    """Distinct word 3-gram shingles of a text column (JVM-side).

    Built from arrays_zip of three slices + one transform over the
    zipped structs rather than transform(sequence, element_at): the
    per-index lambda form evaluates interpreted with per-element
    element_at dispatch and measured 10x slower (7.6 s vs 0.7 s for the
    sf0.1 explode) for byte-identical output."""
    toks = F.split(F.trim(text), r"\s+")
    n = F.size(toks)
    z = F.arrays_zip(
        F.slice(toks, 1, n - 2), F.slice(toks, 2, n - 2), F.slice(toks, 3, n - 2)
    )
    grams = F.transform(
        z, lambda s: F.concat_ws(" ", s["0"], s["1"], s["2"])
    )
    return F.when(n >= 3, F.array_distinct(grams)).otherwise(F.array(F.trim(text)))


_SQL_SHINGLES = """
  CASE WHEN len(toks) >= 3
       THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
       ELSE [trim(text)] END
"""


def word_ngrams_col(toks: Column, k: int) -> Column:
    """Word k-grams joined by single spaces, via arrays_zip of k shifted
    slices + ONE struct-transform.  The transform(sequence(...),
    element_at-per-index) form produces identical output but evaluates
    interpreted with per-element dispatch — measured 10x slower (see
    shingles_col).  Callers must guard size(toks) >= k."""
    n = F.size(toks)
    z = F.arrays_zip(*[F.slice(toks, i + 1, n - (k - 1)) for i in range(k)])
    return F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(k)])
    )


def jaccard_cols(sh_a: Column, sh_b: Column) -> Column:
    """Jaccard over two already-distinct shingle arrays."""
    inter = F.size(F.array_intersect(sh_a, sh_b))
    return inter.cast("double") / (F.size(sh_a) + F.size(sh_b) - inter)


_SQL_JACCARD = (
    "CAST(len(list_filter({a}, x -> list_contains({b}, x))) AS DOUBLE) / "
    "(len({a}) + len({b}) - len(list_filter({a}, x -> list_contains({b}, x))))"
)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS content_key
      FROM documents
    )
    SELECT content_key,
           count(*)                        AS n_copies,
           CAST(min(doc_id) AS BIGINT)     AS keeper_doc_id
    FROM keyed
    GROUP BY content_key
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one shuffle on a 128-bit key, keeper =
    min doc_id per group.  At 100 TB this is the cheapest dedup — the md5
    key is computed map-side and the groupBy partial-aggregates before the
    shuffle."""
    d = load(spark, sf_dir, "documents")
    key = F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "))
    return (
        d.select(F.col("doc_id"), key.alias("content_key"))
        .groupBy("content_key")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
    )


@query(
    "dedup_exact_summary",
    oracle="""
    SELECT count(*)                                         AS n_docs,
           count(DISTINCT md5(text))                        AS n_distinct,
           count(*) - count(DISTINCT md5(text))             AS n_removed
    FROM documents
    """,
)
def dedup_exact_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5("text"))).alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# Pairwise n-gram Jaccard (correctness baseline; quadratic by design)
# ---------------------------------------------------------------------------


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh
      FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
            FROM documents)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round({_SQL_JACCARD.format(a="a.sh", b="b.sh")}, 6) AS jaccard
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE {_SQL_JACCARD.format(a="a.sh", b="b.sh")} >= {JACCARD_THRESHOLD}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r10: the (doc_id, shingle-set) frame feeds BOTH sides of the
    # quadratic join; checkpointing it (doc-sized) tokenizes the corpus
    # once instead of once per side and drops the plan to 0 parquet
    # rescans — the sibling discipline (guide §5).  The O(n²) compare
    # itself stays: it IS the ground-truth audit.
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", shingles_col(F.col("text")).alias("sh"))
        .localCheckpoint(eager=True)
    )
    # the ground-truth audit is quadratic BY DESIGN (see docstring) but
    # must still use every core: the documents fixture is one parquet
    # file = one input partition, and the broadcast-NLJ streams that
    # single partition through one task — repartition the streamed side
    # so the O(n^2) comparisons parallelize (observed: 1 core pinned
    # for 20+ min at sf0.1 before this, minutes across 16 after)
    par = spark.sparkContext.defaultParallelism * 2
    a = d.repartition(par).alias("a")
    b = d.alias("b")
    j = jaccard_cols(F.col("a.sh"), F.col("b.sh"))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            j.alias("j_raw"),
        )
        .filter(F.col("j_raw") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round("j_raw", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path)
# ---------------------------------------------------------------------------


def minhash_signature(hsh: Column) -> list[Column]:
    """N_MINHASH min-hashes from a pre-hashed shingle array (one md5 per
    shingle upstream; here only integer mixing — per-row, no shuffle)."""
    def _mix(j: int):
        # NB: transform() interprets a 2-arg lambda as (element, index),
        # so capture j via factory, not a default argument
        return lambda h: (h % MINHASH_P) * MINHASH_A[j] % MINHASH_P + MINHASH_B[j]

    return [
        F.array_min(F.transform(hsh, _mix(j))).alias(f"mh{j}")
        for j in range(N_MINHASH)
    ]


def _minhash_lsh_oracle() -> str:
    mh_sql = ",\n             ".join(
        f"list_min(list_transform(hsh, h -> (h % {MINHASH_P}) * {MINHASH_A[j]} "
        f"% {MINHASH_P} + {MINHASH_B[j]})) AS mh{j}"
        for j in range(N_MINHASH)
    )
    band_keys = "\n             ".join(
        f"WHEN {b} THEN md5(mh{2 * b}::VARCHAR || ':' || mh{2 * b + 1}::VARCHAR)"
        for b in range(N_BANDS)
    )
    return f"""
    WITH sh_t AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh
      FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
            FROM documents)
    ),
    hashed AS (
      SELECT doc_id, sh,
             list_transform(sh, s -> {_sql_hash("s", 0)}) AS hsh
      FROM sh_t
    ),
    sig AS (
      SELECT doc_id, sh,
             {mh_sql}
      FROM hashed
    ),
    bands AS (
      SELECT doc_id, b,
             CASE b
             {band_keys}
             END AS band_key
      FROM sig, generate_series(0, {N_BANDS - 1}) t(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.b = b.b AND a.band_key = b.band_key
                               AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           round({_SQL_JACCARD.format(a="sa.sh", b="sb.sh")}, 6) AS jaccard
    FROM cand
    JOIN sig sa ON sa.doc_id = doc_a
    JOIN sig sb ON sb.doc_id = doc_b
    WHERE {_SQL_JACCARD.format(a="sa.sh", b="sb.sh")} >= {JACCARD_THRESHOLD}
    """


# The (doc_id, shingle-hash) table and the per-doc signature table are
# the DEDUP INDEX: in a deployment they are written artifacts built once
# per corpus snapshot and reused by every near-dup consumer (LSH pairs,
# clustering, canonical pick, recall audits).  The per-session persist
# models that — without it, one LSH query plan evaluates the 175M-row
# (at sf10) shingle pipeline ~5x: once per DAG branch (signature, sizes,
# and both sides of the candidate-verify join).
_SHINGLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)
_SIG_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)
# The banded-LSH candidate-pair frame (doc_a, doc_b, n_a, n_b) is the
# third member of the dedup index (r9 "not yet optimized" item): the
# verify-prefilter's build side (distinct candidate ids) otherwise
# replays the doc-sized band self-join a second time inside the same
# plan.  Pair-graph-sized (sparse by LSH design), so persisting it is
# cheap; every consumer (LSH pairs, clusters, canonical pick, recall)
# reads the band join's output exactly once per corpus snapshot.
_CAND_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)
_DEDUP_CACHES = (_SHINGLE_CACHE, _SIG_CACHE, _CAND_CACHE)


def _evict_other_sf_dirs(spark: SparkSession, sf_dir: str) -> None:
    """Cap the dedup index to ONE sf_dir per session: crossing to a new
    corpus unpersists the old index (both tables together — the
    signature plan references the shingle table).  Without this, executor
    storage memory grows unbounded across sf_dirs in one session (ADVICE
    r7), and the multi-SF sweep/bench harnesses would stack sf0.01+sf0.1+
    sf1 indexes.  Within one sf_dir nothing changes — the persist is the
    deliberate model of a written per-corpus-snapshot artifact."""
    for cache in _DEDUP_CACHES:
        per_session = cache.get(spark)
        if not per_session:
            continue
        for other in [k for k in per_session if k != sf_dir]:
            per_session.pop(other).unpersist()


def invalidate_dedup_index(spark: SparkSession) -> None:
    """Drop every cached shingle/signature table for ``spark`` (e.g.
    after regenerating a documents fixture mid-session — the cache keys
    on sf_dir only and would otherwise serve stale results)."""
    for cache in _DEDUP_CACHES:
        per_session = cache.pop(spark, None)
        if per_session:
            for df in per_session.values():
                df.unpersist()


def shingle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, h) rows where ``h`` is the 60-bit portable hash of
    a word 3-gram shingle — the row-oriented twin of ``shingles_col``.

    Grams come from exploding an index sequence over the tokenized array
    and picking tokens positionally with ``element_at`` — everything stays
    in whole-stage codegen (no per-element lambda interpretation, and no
    per-doc window sort: the previous posexplode + lead() formulation paid
    a full sort-shuffle of every token just to see its two neighbors).
    The shingle *string* dies immediately after hashing: the distinct, the
    signature groupBy, and the verify intersection all key on the long —
    at 100 TB that's an 8-byte shuffle key instead of a ~30-byte string,
    and long equi-joins beat string equi-joins."""
    _evict_other_sf_dirs(spark, sf_dir)
    per_session = _SHINGLE_CACHE.setdefault(spark, {})
    cached = per_session.get(sf_dir)
    if cached is not None:
        return cached
    docs = load(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
    idx = F.when(
        F.size("toks") >= 3, F.sequence(F.lit(1), F.size("toks") - 2)
    ).otherwise(F.array().cast("array<int>"))
    grams = base.select(
        "doc_id", "toks", F.explode(idx).alias("i")
    ).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.element_at("toks", F.col("i")),
            F.element_at("toks", F.col("i") + 1),
            F.element_at("toks", F.col("i") + 2),
        ).alias("shingle"),
    )
    short = docs.filter(F.size(F.split(F.trim("text"), r"\s+")) < 3).select(
        "doc_id", F.trim("text").alias("shingle")
    )
    out = (
        grams.unionByName(short)
        .select("doc_id", portable_hash(F.col("shingle"), 0).alias("h"))
        .distinct()
        .persist()
    )
    per_session[sf_dir] = out
    return out




def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature + shingle count (doc_id, mh0..mhN,
    n_sh) — persisted per session like the shingle table (one tiny
    row per doc; used by the band explode AND the size lookup)."""
    _evict_other_sf_dirs(spark, sf_dir)
    per_session = _SIG_CACHE.setdefault(spark, {})
    cached = per_session.get(sf_dir)
    if cached is not None:
        return cached
    sh = shingle_rows(spark, sf_dir)
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(
                (F.col("h") % MINHASH_P) * MINHASH_A[j] % MINHASH_P
                + MINHASH_B[j]
            ).alias(f"mh{j}")
            for j in range(N_MINHASH)
        ],
        F.count(F.lit(1)).alias("n_sh"),
    ).persist()
    per_session[sf_dir] = sig
    return sig


def lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH candidate pairs (doc_a, doc_b, n_a, n_b) — the band
    self-join's distinct output, persisted per session as the third
    dedup-index table (pair-graph-sized).  n_sh rides the band explode
    so both Jaccard denominators come out attached — no join back onto
    the signature table."""
    _evict_other_sf_dirs(spark, sf_dir)
    per_session = _CAND_CACHE.setdefault(spark, {})
    cached = per_session.get(sf_dir)
    if cached is not None:
        return cached
    sig = minhash_signatures(spark, sf_dir)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("b"),
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col(f"mh{2 * b}").cast("string"),
                        F.col(f"mh{2 * b + 1}").cast("string"),
                    )
                ).alias("band_key"),
            )
            for b in range(N_BANDS)
        ]
    )
    bands = sig.select(
        "doc_id", "n_sh", F.explode(band_structs).alias("bk")
    ).select(
        "doc_id",
        "n_sh",
        F.col("bk.b").alias("b"),
        F.col("bk.band_key").alias("band_key"),
    )
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.b") == F.col("y.b"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.n_sh").alias("n_a"),
            F.col("y.n_sh").alias("n_b"),
        )
        .distinct()
        .persist()
    )
    per_session[sf_dir] = cand
    return cand


@query("dedup_minhash_lsh", oracle=_minhash_lsh_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection, end to end and fully codegen'd:

    1. distinct (doc_id, h) shingle-hash rows; ONE md5 per shingle, then
       only 8-byte longs move; the N_MINHASH signature =
       groupBy(doc_id).min of affine mixes (map-side partial
       aggregation — the shuffle moves 8 longs/doc);
    2. explode into N_BANDS (band, band_key) rows; equi-join on the band
       key for candidate pairs (uniform 128-bit key, AQE-skew-safe) —
       computed once and persisted (lsh_candidate_pairs);
    3. verify candidates with exact Jaccard: each candidate doc's
       distinct shingle-hash SET moves once as a bounded array
       (set size ∝ doc length), two doc-keyed equi-joins attach both
       sets to each pair, and |A∩B| = size(array_intersect(...)) in
       codegen — no per-shingle fan-out, no pair-keyed shuffle of
       shingle rows (r10; see the verify comment below).

    At 100 TB nothing here touches a cross product, and the only
    array state crossing a shuffle is the per-doc shingle set —
    bounded by document length, the §8 move-heavy-bytes-once payload.
    """
    sh = shingle_rows(spark, sf_dir)
    cand = lsh_candidate_pairs(spark, sf_dir)
    # Verify-side prefilter (guide §3.2): the full shingle table is the
    # one corpus-sized frame here, and the exact-Jaccard verify joins
    # would shuffle it twice (by doc_a, then by (doc_b, h)).  LSH
    # candidates are sparse by design, so shrink the shingle table to
    # candidate docs FIRST with a semi-join whose build side reads the
    # PERSISTED candidate frame (r9 paid a band-join replay here; the
    # r10 candidate cache erases it).  The hint is size-gated like every
    # linearly-growing broadcast in this repo; past the cap AQE decides.
    cand_ids = (
        cand.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
        ).distinct()
    )
    sh_cand = sh.join(
        broadcast_if_small(cand_ids, sf_dir, "documents"), "doc_id", "semi"
    )
    # Exact-Jaccard verify, r10 shape (guide §2.3 project-before-the-
    # exchange + §8 move-heavy-bytes-once).  The r9 relational verify
    # joined candidate pairs onto the shingle ROWS — its intermediate
    # was Σ_pairs |A| rows (≈1.3B at sf100, 25M pairs × ~52 shingles)
    # with the pair metadata repeated on EVERY shingle row across two
    # pair-keyed shuffles; the SMJ sort of that spilled ~50 GB and
    # could not complete on the bench box, and the static planner's
    # alternative (broadcasting the 12 GiB shingle side — its semi-join
    # estimate collapses over a cached build) dies on the 8 GiB cap.
    # Instead each candidate doc's DISTINCT shingle-hash set crosses
    # the wire once, as one bounded array row (set size ∝ doc length):
    # two doc-keyed equi-joins attach hs_a/hs_b to the pairs and
    # |A∩B| is size(array_intersect(...)) per pair in codegen — no
    # aggregation, no per-shingle fan-out, ~5× fewer shuffle bytes.
    # Past broadcast scale both array joins are hinted SHUFFLE_HASH
    # with the pair/array sides as bounded per-partition builds; under
    # the cap the hints are withheld and AQE broadcasts as before.
    arrs = sh_cand.groupBy("doc_id").agg(F.collect_set("h").alias("hs"))
    arrs_a = shuffle_hash_if_large(
        arrs.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a")),
        sf_dir,
        "documents",
    )
    arrs_b = shuffle_hash_if_large(
        arrs.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b")),
        sf_dir,
        "documents",
    )
    inter = (
        cand.join(arrs_a, "doc_a")
        .join(arrs_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_b",
            F.size(F.array_intersect("hs_a", "hs_b")).alias("n_inter"),
        )
    )
    j = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        inter.select("doc_a", "doc_b", j.alias("j_raw"))
        .filter(F.col("j_raw") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round("j_raw", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Dedup clustering (connected components over near-dup pairs)
# ---------------------------------------------------------------------------


def _dedup_clusters_ctes() -> str:
    """The recursive-closure CTE prologue shared by dedup_clusters and
    the operators composed on top of it (a WITH RECURSIVE can't nest
    inside a derived table, so extensions append CTEs instead)."""
    return f"""edges AS ({_minhash_lsh_oracle()}),
    nodes AS (SELECT doc_a AS n FROM edges UNION SELECT doc_b FROM edges),
    sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
            UNION SELECT doc_b, doc_a FROM edges),
    reach(s, t) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.s, y.b FROM reach r JOIN sym y ON r.t = y.a
    )"""


def _dedup_clusters_oracle() -> str:
    return f"""
    WITH RECURSIVE {_dedup_clusters_ctes()}
    SELECT s AS doc_id, min(t) AS cluster_id
    FROM reach GROUP BY s
    """


@query("dedup_clusters", oracle=_dedup_clusters_oracle())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the MinHash-LSH pair
    graph (pairs chain A-B-C without A-C, so "keep one per cluster"
    needs transitive closure).  Spark SQL has no WITH RECURSIVE — the
    component labels come from the iterative min-label-propagation driver
    loop (operators/graph.py), verified here against DuckDB's actual
    recursive CTE: the strongest cross-engine check an iterative
    operator can get.  cluster_id = min doc_id in the component."""
    from ducklakexl_spark.operators.graph import connected_components

    pairs = dedup_minhash_lsh(spark, sf_dir)
    cc = connected_components(pairs, src="doc_a", dst="doc_b")
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


@query(
    "dedup_canonical_pick",
    oracle=f"""
    WITH RECURSIVE {_dedup_clusters_ctes()},
    cc AS (SELECT s AS doc_id, min(t) AS cluster_id
           FROM reach GROUP BY s),
    r AS (
      SELECT cc.cluster_id, cc.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY cc.cluster_id
                                ORDER BY d.n_chars DESC, cc.doc_id) AS rn,
             count(*) OVER (PARTITION BY cc.cluster_id) AS n_members
      FROM cc JOIN documents d USING (doc_id)
    )
    SELECT cluster_id, doc_id AS canonical_doc,
           CAST(n_chars AS BIGINT) AS canonical_chars,
           CAST(n_members AS BIGINT) AS n_members
    FROM r WHERE rn = 1
    """,
)
def dedup_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection per near-dup cluster: instead
    of blindly keeping the lowest doc_id, keep the LONGEST member
    (n_chars, doc_id tiebreak) — the curation policy that retains the
    most complete copy of duplicated content.  Composition: cluster
    labels from the registered connected-components operator, joined to
    the documents metadata (broadcast: the cluster frame is pair-graph-
    sized, not corpus-sized), ranked inside each cluster.  At 100 TB
    the window partitions by cluster_id — cluster-bounded state, never
    a corpus sort."""
    from pyspark.sql import Window as W

    from ducklakexl_spark.queries import QUERIES

    cc = QUERIES["dedup_clusters"](spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = cc.join(docs, "doc_id")
    w = W.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_members", F.count("*").over(W.partitionBy("cluster_id"))
        )
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("canonical_doc"),
            F.col("n_chars").cast("long").alias("canonical_chars"),
            F.col("n_members").cast("long").alias("n_members"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash (bit-signature near-dup)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32
HAMMING_MAX = 3


def _simhash_oracle() -> str:
    bit_sums = ",\n             ".join(
        f"CASE WHEN sum(CASE WHEN (th >> {j}) & 1 = 1 THEN w ELSE -w END) > 0 "
        f"THEN CAST(1 AS BIGINT) << {j} ELSE 0 END AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    total = " + ".join(f"b{j}" for j in range(SIMHASH_BITS))
    return f"""
    WITH tok AS (
      SELECT doc_id, lower(t.tok) AS tok, count(*)::BIGINT AS w
      FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
            FROM documents) t
      GROUP BY doc_id, lower(t.tok)
    ),
    hashed AS (
      SELECT doc_id, w, {_sql_hash("tok", 0)} AS th FROM tok
    ),
    sig AS (
      SELECT doc_id,
             {bit_sums}
      FROM hashed
      GROUP BY doc_id
    ),
    fp AS (SELECT doc_id, {total} AS simhash FROM sig)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
    """


SIMHASH_BLOCKS = HAMMING_MAX + 1  # pigeonhole: ≤3 flipped bits can't touch all 4
SIMHASH_BLOCK_BITS = SIMHASH_BITS // SIMHASH_BLOCKS


@query("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: per-token 60-bit hash → weighted bit votes →
    SIMHASH_BITS-bit fingerprint → hamming ≤ HAMMING_MAX pairs.

    The fingerprint build is groupBy(doc_id) over exploded tokens (one
    shuffle, partial-aggregated map-side).  Pairing is Hamming-ball
    BANDED, never all-pairs: the fingerprint splits into HAMMING_MAX+1
    bit blocks, and by pigeonhole two fingerprints within hamming
    HAMMING_MAX agree exactly on at least one block — so an equi-join on
    (block_index, block_value) generates every qualifying pair (recall
    is exact, the oracle is the plain quadratic definition) while only
    ever joining on a hash-partitionable key.  Exact hamming then
    verifies candidates.  At 100 TB this is the same candidate-join
    shape as dedup_minhash_lsh; no cross product anywhere.
    """
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok_raw"),
        )
        .select("doc_id", F.lower("tok_raw").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    hashed = tok.select("doc_id", "w", portable_hash(F.col("tok"), 0).alias("th"))
    votes = [
        F.when(
            F.sum(
                F.when(F.shiftright("th", j).bitwiseAND(F.lit(1)) == 1, F.col("w"))
                .otherwise(-F.col("w"))
            )
            > 0,
            F.lit(1).cast("long") * (2**j),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    sig = hashed.groupBy("doc_id").agg(*votes)
    total = sum([F.col(f"b{j}") for j in range(SIMHASH_BITS)], F.lit(0).cast("long"))
    fp = sig.select("doc_id", total.alias("simhash"))

    mask = (1 << SIMHASH_BLOCK_BITS) - 1
    blocks = F.array(
        *[
            F.struct(
                F.lit(b).alias("b"),
                F.shiftright("simhash", b * SIMHASH_BLOCK_BITS)
                .bitwiseAND(F.lit(mask))
                .alias("v"),
            )
            for b in range(SIMHASH_BLOCKS)
        ]
    )
    bl = fp.select("doc_id", "simhash", F.explode(blocks).alias("bk")).select(
        "doc_id", "simhash", F.col("bk.b").alias("b"), F.col("bk.v").alias("v")
    )
    # r9 (guide §2.4): the block self-join's sides are the SAME
    # fingerprint pipeline.  Left to AQE at fixture scale one side
    # becomes a BroadcastExchange and the tokenize+vote aggregation runs
    # TWICE (2 documents scans); hinting the join to sort-merge makes
    # both sides identical (b, v) shuffles, which ReuseExchange
    # collapses — the corpus pipeline executes once and the join reads
    # the one shuffle twice.  At 100 TB SMJ is the strategy anyway.
    cand = (
        bl.alias("x")
        .hint("merge")
        .join(
            bl.alias("y"),
            (F.col("x.b") == F.col("y.b"))
            & (F.col("x.v") == F.col("y.v"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("x.simhash").alias("sh_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("y.simhash").alias("sh_b"),
        )
        .distinct()  # a pair can agree on several blocks
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= HAMMING_MAX)
    )


# ---------------------------------------------------------------------------
# End-to-end dedup outcome (survivor corpus)
# ---------------------------------------------------------------------------


def _dedup_survivors_oracle() -> str:
    return f"""
    WITH RECURSIVE edges AS ({_minhash_lsh_oracle()}),
    nodes AS (SELECT doc_a AS n FROM edges UNION SELECT doc_b FROM edges),
    sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
            UNION SELECT doc_b, doc_a FROM edges),
    reach(s, t) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.s, y.b FROM reach r JOIN sym y ON r.t = y.a
    ),
    labels AS (SELECT s AS doc_id, min(t) AS cluster_id FROM reach GROUP BY s)
    SELECT CAST(count(*) AS BIGINT) AS n_before,
           CAST(count(*) FILTER (WHERE l.cluster_id IS NULL
                                    OR l.cluster_id = d.doc_id) AS BIGINT)
               AS n_after,
           CAST(sum(d.n_chars) AS BIGINT) AS chars_before,
           CAST(sum(d.n_chars) FILTER (WHERE l.cluster_id IS NULL
                                          OR l.cluster_id = d.doc_id)
                AS BIGINT) AS chars_after
    FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
    """


@query("dedup_survivors", oracle=_dedup_survivors_oracle())
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END fuzzy-dedup outcome: shingle → MinHash → LSH bands
    → verified pairs → connected components → keep the min-id doc per
    cluster, reported as the corpus summary every training-data pipeline
    publishes (docs and chars, before and after).  The keep-rule join is
    a broadcast of the (tiny) cluster labels against the full corpus; at
    100 TB the only full-corpus passes remain the signature scan and the
    final filter."""
    from ducklakexl_spark.operators.graph import connected_components

    pairs = dedup_minhash_lsh(spark, sf_dir)
    labels = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("node").alias("l_doc"), F.col("component").alias("cluster_id")
    )
    d = load(spark, sf_dir, "documents")
    keep = F.col("cluster_id").isNull() | (
        F.col("cluster_id") == F.col("doc_id")
    )
    return (
        d.join(
            broadcast_if_small(labels, sf_dir, "documents"),
            d.doc_id == labels.l_doc,
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n_before"),
            F.count(F.when(keep, 1)).alias("n_after"),
            F.sum("n_chars").alias("chars_before"),
            F.sum(F.when(keep, F.col("n_chars"))).alias("chars_after"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-document exact n-gram span duplication (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better": find exact
# token spans shared across documents; here the per-doc duplication
# profile a span-removal pass would consume)
# ---------------------------------------------------------------------------

SPAN_N = 8  # span length in tokens


def _ngram_spans_oracle() -> str:
    gh = _sql_hash("g", 97)
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len(toks) - {SPAN_N - 1}),
               i -> array_to_string(list_slice(toks, i, i + {SPAN_N - 1}), ' ')
             )) AS gs
      FROM toks WHERE len(toks) >= {SPAN_N}
    ),
    exploded AS (
      SELECT doc_id, {gh} AS gh
      FROM (SELECT doc_id, unnest(gs) AS g FROM grams)
    ),
    counts AS (SELECT gh, count(*) AS n_docs FROM exploded GROUP BY gh),
    perdoc AS (
      SELECT e.doc_id, count(*) AS n_dup
      FROM exploded e JOIN counts c ON e.gh = c.gh
      WHERE c.n_docs >= 2
      GROUP BY e.doc_id
    )
    SELECT g.doc_id,
           CAST(len(g.gs) AS BIGINT)                  AS n_grams,
           CAST(coalesce(p.n_dup, 0) AS BIGINT)       AS n_dup_grams,
           round(CAST(coalesce(p.n_dup, 0) AS DOUBLE) / len(g.gs), 6) AS dup_frac
    FROM grams g LEFT JOIN perdoc p ON g.doc_id = p.doc_id
    """


@query("dedup_ngram_spans", oracle=_ngram_spans_oracle())
def dedup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document exact-duplicate span profile: how many of a doc's
    distinct word 8-grams also occur in at least one OTHER document (or
    twice anywhere).

    Scale shape (the part that matters at 100 TB): grams never leave the
    row until a single explode; only 60-bit md5-derived longs cross the
    wire; the gram-frequency groupBy and the dup-gram join share the
    same key, so the exchange is reused (co-partitioned equi-join, no
    broadcast of anything corpus-sized); the final per-doc rollup is one
    narrow shuffle on doc_id.  No cross product anywhere — this is the
    candidate-free exact-span analogue of the MinHash pipeline above."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(toks)
    grams = F.array_distinct(word_ngrams_col(toks, SPAN_N))
    base = docs.filter(n >= SPAN_N).select("doc_id", grams.alias("gs"))
    # r9 (guide §2.3/§2.4): the narrow (doc_id, gh) gram table is
    # consumed three ways (frequency pass, dup probe, per-doc gram
    # count); materialized once so the tokenize+ngram+explode pipeline
    # runs exactly once — the pre-r9 shape replayed it per reference
    # (3 documents scans).  n_grams falls out of the same frame
    # (count per doc of the distinct grams = size(gs); every doc with
    # n >= SPAN_N has >= 1 gram, so no row is lost).
    ex = (
        base.select("doc_id", F.explode("gs").alias("g"))
        .select("doc_id", portable_hash(F.col("g"), 97).alias("gh"))
        .localCheckpoint(eager=True)
    )
    dup = (
        ex.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("gh")
    )
    perdoc = (
        ex.join(dup, "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    return (
        ex.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_grams"))
        .join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.round(
                F.coalesce("n_dup", F.lit(0)) / F.col("n_grams"), 6
            ).alias("dup_frac"),
        )
    )


def _span_removal_oracle() -> str:
    gh = _sql_hash("g", 97)
    n = SPAN_N
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(toks) - {n - 1}),
               i -> struct_pack(p := i,
                 h := ('0x' || substr(md5(
                   array_to_string(list_slice(toks, i, i + {n - 1}), ' ')
                   || '#97'), 1, 15))::BIGINT)) AS gs
      FROM toks WHERE len(toks) >= {n}
    ),
    exploded AS (SELECT doc_id, u.p AS p, u.h AS h
                 FROM (SELECT doc_id, unnest(gs) AS u FROM grams)),
    dups AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd
                            FROM exploded GROUP BY h) WHERE nd >= 2),
    dup_pos AS (
      SELECT e.doc_id, list(e.p ORDER BY e.p) AS dp
      FROM exploded e JOIN dups d ON e.h = d.h
      GROUP BY e.doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens_before,
           CAST(len(kept) AS BIGINT)   AS n_tokens_after,
           md5(coalesce(array_to_string(kept, ' '), '')) AS clean_md5
           -- DuckDB array_to_string([]) is NULL, not ''
    FROM (
      SELECT t.doc_id, t.toks,
             list_transform(
               list_filter(generate_series(1, len(t.toks)),
                 i -> len(list_filter(coalesce(d.dp, []),
                        p -> p >= i - {n - 1} AND p <= i)) = 0),
               i -> t.toks[i]) AS kept
      FROM toks t LEFT JOIN dup_pos d ON d.doc_id = t.doc_id
      WHERE len(t.toks) >= {n}
    ) t
    """


@query("dedup_span_removal", oracle=_span_removal_oracle())
def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate SPAN REMOVAL (the second half of Lee et al. 2022):
    cut every token covered by a cross-document duplicate 8-gram and emit
    the cleaned corpus (md5-proven per doc).

    Same scale shape as dedup_ngram_spans — only 60-bit gram hashes cross
    shuffles, frequency groupBy and dup join share a key — plus one
    narrow per-doc rollup collecting duplicate START positions (a small
    int array per doc, bounded by doc length); the token cut is then a
    per-row higher-order filter with no further shuffle."""
    n = SPAN_N
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.filter(F.size(toks) >= n).select(
        "doc_id", toks.alias("toks")
    )
    # posexplode of the zipped-slices grams keeps the 1-based start
    # position without building per-index structs in an interpreted
    # lambda (see word_ngrams_col)
    grams = base.select(
        "doc_id",
        F.posexplode(word_ngrams_col(F.col("toks"), n)).alias("pos", "g"),
    ).select(
        "doc_id",
        (F.col("pos") + 1).alias("p"),
        portable_hash(F.col("g"), 97).alias("h"),
        # narrow (doc_id, p, h) frame consumed twice (frequency pass +
        # dup-position rollup); materialized so tokenize+posexplode runs
        # once.  The token payload itself is re-read only in the final
        # cut pass (shuffle metadata, not payloads — guide §2.3).
    ).localCheckpoint(eager=True)
    dups = (
        grams.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    dup_pos = (
        grams.join(dups, "h")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("p")).alias("dp"))
    )
    joined = base.join(dup_pos, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce("dp", F.array().cast("array<int>")).alias("dp"),
    )
    kept = F.transform(
        F.filter(
            F.sequence(F.lit(1), F.size("toks")),
            lambda i: F.size(
                F.filter(
                    F.col("dp"),
                    lambda p: (p >= i - F.lit(n - 1)) & (p <= i),
                )
            )
            == 0,
        ),
        lambda i: F.element_at(F.col("toks"), i),
    )
    return joined.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens_before"),
        F.size(kept).cast("long").alias("n_tokens_after"),
        F.md5(F.array_join(kept, " ")).alias("clean_md5"),
    )


BLOOM_BITS = 1 << 14     # m: filter size in bits (256 64-bit words)
BLOOM_HASHES = 3         # k
BLOOM_SPLIT = 250        # doc_id < split = existing corpus; rest = incoming
BLOOM_PREFIX = 64        # prefix-fingerprint key (catches templated heads)


@query(
    "dedup_incremental_bloom",
    # The oracle computes the exact containment join directly: the bloom
    # stage is a PREFILTER with zero false negatives (and its false
    # positives die in the exact verify join), so the final answer is
    # by construction identical to the plain exact join — which is
    # precisely what this checks.
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             md5(substr(trim(lower(text)), 1, {BLOOM_PREFIX})) AS k
      FROM documents
    ),
    existing AS (SELECT * FROM keyed WHERE doc_id < {BLOOM_SPLIT}),
    incoming AS (SELECT * FROM keyed WHERE doc_id >= {BLOOM_SPLIT})
    SELECT i.doc_id AS new_doc_id, min(e.doc_id) AS dup_of
    FROM incoming i JOIN existing e ON i.k = e.k
    GROUP BY i.doc_id
    """,
)
def dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup with a relational Bloom prefilter — the standard
    shape for "dedupe today's crawl against the 100 TB historical corpus":

    1. build: each existing content key sets {BLOOM_HASHES} bits of a
       2^14-bit filter, materialized as ≤256 OR-aggregated 64-bit words
       (one partial-aggregated groupBy; the filter is KBs regardless of
       corpus size — at 100 TB you size m up, it stays broadcastable);
    2. probe: incoming keys compute the same bit positions map-side and
       join the BROADCAST word table; a key is bloom-positive iff all k
       bits are set (count == k);
    3. verify: only bloom-positive candidates — an e^-kn/m-thin slice of
       the incoming set — reach the exact key equi-join against the
       existing corpus, so the expensive shuffle join runs on a fraction
       of the data while the result stays exact (no false negatives by
       construction; false positives die here).

    Spark's own runtime bloom (``spark.sql.optimizer.runtime.bloomFilter``)
    applies the same idea automatically inside joins; this operator makes
    the filter a first-class, reusable artifact (persist the word table,
    reuse it for every future increment)."""
    d = load(spark, sf_dir, "documents")
    key = F.md5(F.substring(F.trim(F.lower(F.col("text"))), 1, BLOOM_PREFIX))
    # narrow (doc_id, key) frame read three ways (filter build, probe,
    # exact verify); materialized once so the md5-keying scan runs once
    # — and at 100 TB this IS the persisted key artifact the docstring
    # describes
    keyed = d.select("doc_id", key.alias("k")).localCheckpoint(eager=True)
    existing = keyed.filter(F.col("doc_id") < BLOOM_SPLIT)
    incoming = keyed.filter(F.col("doc_id") >= BLOOM_SPLIT)

    def bit_positions(df: DataFrame) -> DataFrame:
        # k seeded xxhash64 positions; pmod keeps them in [0, m)
        pos = F.array(
            *[
                F.pmod(F.xxhash64(F.col("k"), F.lit(i)), F.lit(BLOOM_BITS))
                for i in range(BLOOM_HASHES)
            ]
        )
        return df.select(
            "doc_id",
            "k",
            F.explode(pos).alias("p"),
        ).select(
            "doc_id",
            "k",
            F.shiftright(F.col("p"), 6).alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias(
                "bit"
            ),
        )

    words = (
        bit_positions(existing)
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
    )
    probes = bit_positions(incoming)
    bloom_positive = (
        probes.join(F.broadcast(words), "w")
        .filter(F.col("bits").bitwiseAND(F.col("bit")) != 0)
        .groupBy("doc_id", "k")
        .agg(F.count(F.lit(1)).alias("nbits"))
        .filter(F.col("nbits") == BLOOM_HASHES)
        .select("doc_id", "k")
    )
    return (
        bloom_positive.join(
            existing.select(F.col("doc_id").alias("e_doc_id"), "k"), "k"
        )
        .groupBy(F.col("doc_id").alias("new_doc_id"))
        .agg(F.min("e_doc_id").alias("dup_of"))
    )


@query(
    "dedup_lsh_recall",
    # composition of two registered operators; oracle assembled below
    oracle=None,
)
def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-index quality evaluation: recall of the banded MinHash-LSH
    pair set against the exact n-gram Jaccard ground truth — the number
    that decides (bands, rows-per-band) tuning before a dedup pipeline
    ships.  Pure composition of two registered operators; the evaluation
    join is pair-keyed on the (small) near-dup pair sets, so at corpus
    scale the cost is the two index runs, not the comparison.  (The
    exact baseline is quadratic by design and stays out of production
    paths and the bench — this is an offline audit.)"""
    from ducklakexl_spark.queries import QUERIES

    lsh = QUERIES["dedup_minhash_lsh"](spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("hit")
    )
    ex = QUERIES["dedup_ngram_jaccard"](spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    return ex.join(lsh, ["doc_a", "doc_b"], "left").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(F.coalesce("hit", F.lit(0))).alias("n_hit"),
        F.round(
            F.sum(F.coalesce("hit", F.lit(0))) / F.count(F.lit(1)), 6
        ).alias("recall"),
    )


from ducklakexl_spark.queries import ORACLES as _ORACLES  # noqa: E402

_ORACLES["dedup_lsh_recall"] = f"""
    WITH lsh AS (SELECT doc_a, doc_b FROM ({_ORACLES["dedup_minhash_lsh"]}) t),
         ex  AS (SELECT doc_a, doc_b FROM ({_ORACLES["dedup_ngram_jaccard"]}) t)
    SELECT count(*) AS n_exact,
           CAST(sum(CASE WHEN l.doc_a IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           round(sum(CASE WHEN l.doc_a IS NOT NULL THEN 1 ELSE 0 END)
                 / count(*), 6) AS recall
    FROM ex LEFT JOIN lsh l ON l.doc_a = ex.doc_a AND l.doc_b = ex.doc_b
"""


SOURCE_CAP = 20


@query(
    "dedup_per_source_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rn
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rn <= {SOURCE_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn > {SOURCE_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped
    FROM ranked GROUP BY source
    """,
)
def dedup_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document capping — the standard pretraining guard
    against a single hot domain dominating the mixture (the C4/RefinedWeb
    per-host caps): keep at most {20} documents per source, selected by
    a deterministic portable priority (md5 of doc_id — a seedless
    shuffle both engines reproduce), and report kept/dropped per source.

    100 TB shape: one window partitioned by source (a single shuffle on
    the domain key); a pathological hot domain skews that shuffle, which
    AQE skew-join splitting handles — and because only rank-vs-cap
    survives, the alternative two-phase count-then-sample form stays
    available without changing results."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select("source", F.row_number().over(w).alias("rn"))
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("rn") <= SOURCE_CAP, 1).otherwise(0)
        ).cast("long").alias("n_kept"),
        F.sum(
            F.when(F.col("rn") > SOURCE_CAP, 1).otherwise(0)
        ).cast("long").alias("n_dropped"),
    )
