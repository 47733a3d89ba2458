"""Deterministic Nx expansion of /root/testdata/sf0.1 → scale_sf1/ or
scale_sf10/ — the scale-stress corpora (VERDICT r5 task 1, r6 task 1).

Facts (lineitem, orders, events, documents, embeddings) replicate Nx
with key shifts that preserve referential integrity; dimensions stay
dim-sized (that IS the realistic shape at scale — facts grow, dims
don't).  Injected skew (identical shape at every N):

- events.user_id: in copies 1..N-1, 30% of rows remap to hot user 42
  (deterministic on event_id) — ~(30*(N-1)/N)% of all events on one
  key, the shape AQE skew-join / salting has to absorb.
- lineitem.l_orderkey: in copies 1..N-1, 5% of rows attach to hot
  order 1 (the matching orders row exists in copy 0), so orderkey
  joins and aggs see a ~5% single-key hot spot.

Copy 0 is byte-identical to sf0.1, so request-sized anchors
(vec_id < 10 query vectors, doc_id probes) keep their meaning.
Documents: copies within the same decade (g.i // 10) share identical
text, copies in different decades get a ' vK' suffix — duplicate
CLUSTERS stay size ≤10 at every N (real web dup-cluster size does not
grow with corpus size), so banded-LSH bucket fan-out stays bounded
while the corpus grows Nx.  At N=10 every copy is in decade 0, which
reproduces the round-6 sf1 documents/embeddings byte-for-byte; orders
does NOT reproduce round 6 — the o_totalprice sub-cent perturbation
modulus changed 9999991 -> 4999999 in round 7 (half-cent-boundary
safety for the double->DECIMAL casts), and the round-7+ sf1/sf10
SWEEP/BENCH artifacts were regenerated against the new corpus.
Everything is a pure function of the source rows — rerunning
regenerates identical files (no RNG, no clock).

Usage: python tests/make_scale_sf1.py [out_dir] [copies]
  copies=10 (default) → sf1 (~6M-row lineitem)
  copies=100          → sf10 (~60M-row lineitem)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
SHIFT = 10_000_000  # per-copy key shift, far above any sf0.1 key


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_sf1",
    )
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    if copies > 100:
        # at copies=1000 (sf100, 600M-row lineitem) duckdb's
        # order-preserving COPY buffers the whole result in RAM (~100GB
        # observed, 0 bytes written) before OOM; dropping insertion
        # order lets COPY stream.  Row order inside the parquet then
        # depends on thread scheduling — fine for this corpus: every
        # consumer (sweep compare, bench, the queries themselves) is
        # order-insensitive, and no sf100 query joins POSITIONALLY on a
        # fact table.  Gated above 100 so sf1/sf10 stay byte-reproducible
        # against the committed r6/r7 artifacts.
        con.execute("SET preserve_insertion_order = false")
        con.execute("SET memory_limit = '48GB'")

    def gen(table: str, select: str) -> None:
        dst = os.path.join(out, f"{table}.parquet")
        con.execute(
            f"COPY ({select}) TO '{dst}' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    # dimensions: unchanged
    for t in ("region", "nation", "customer", "supplier", "part"):
        gen(t, f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')")

    gen(
        "orders",
        f"""
        SELECT o_orderkey + g.i * {SHIFT} AS o_orderkey,
               o_custkey, o_orderstatus,
               -- hash-keyed sub-cent perturbation: duplication would
               -- otherwise make every price an N-way tie and
               -- arg_max/arg_min nondeterministic in BOTH engines; a
               -- LINEAR epsilon is no fix (key-grid deltas land exactly
               -- on the 0.01 price grid) — a hashed one has no grid.
               -- Modulus 4999999 (not 9999991) keeps δ < 0.005 with a
               -- ≥2e-9 margin from the half-cent boundary, so
               -- double→DECIMAL(x,2) casts round identically in every
               -- engine (at the boundary, DuckDB's scaled-multiply
               -- rounding and Spark's exact BigDecimal conversion can
               -- disagree within ~2e-11) — required by the sf10
               -- DECIMAL-sufficient-stats aggregates
               o_totalprice
                 + (hash(o_orderkey + g.i * {SHIFT}) % 4999999) * 1e-9
                 AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet'), range({copies}) g(i)
        """,
    )
    gen(
        "lineitem",
        f"""
        SELECT CASE WHEN g.i > 0 AND l_orderkey % 20 = 0 THEN 1
                    ELSE l_orderkey + g.i * {SHIFT} END AS l_orderkey,
               -- hot-order rows also collapse onto 50 partkeys: the
               -- orderkey hot spot stays ~270k rows (the AQE skew
               -- target), but the co-purchase graph sees a 50-part
               -- clique, not a 20k-part one (triangle counting on a
               -- 20k-clique is ~1e12 triangles — no engine finishes)
               CASE WHEN g.i > 0 AND l_orderkey % 20 = 0
                    THEN 1 + l_partkey % 50
                    ELSE l_partkey END AS l_partkey,
               l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet'), range({copies}) g(i)
        """,
    )
    gen(
        "events",
        f"""
        SELECT event_id + g.i * {SHIFT} AS event_id, ts,
               CASE WHEN g.i > 0 AND event_id % 10 < 3 THEN 42
                    ELSE user_id END AS user_id,
               event_type, value, props
        FROM read_parquet('{SRC}/events.parquet'), range({copies}) g(i)
        """,
    )
    gen(
        "documents",
        f"""
        -- per-decade text variant keeps NEAR-dup clusters at size ≤10
        -- at any N: copies within a decade (g.i // 10) are identical,
        -- but different decades tag every 3rd token, so every 3-gram
        -- shingle contains a changed token and cross-decade Jaccard
        -- drops to ~0 (a mere suffix left all N copies at Jaccard≈0.99
        -- and banded LSH correctly — but uselessly for a bounded-shape
        -- corpus — emitted C(N,2) pairs per source doc).  n_chars is
        -- recomputed from the variant text.
        SELECT doc_id + g.i * {SHIFT} AS doc_id,
               CASE WHEN g.i // 10 = 0 THEN text
                    ELSE array_to_string(
                           list_transform(
                             string_split_regex(trim(text), '\\s+'),
                             (t, ix) -> CASE WHEN ix % 3 = 0
                                        THEN t || '~' || (g.i // 10)
                                        ELSE t END),
                           ' ')
               END AS text,
               lang, source,
               CASE WHEN g.i // 10 = 0 THEN n_chars
                    ELSE length(array_to_string(
                           list_transform(
                             string_split_regex(trim(text), '\\s+'),
                             (t, ix) -> CASE WHEN ix % 3 = 0
                                        THEN t || '~' || (g.i // 10)
                                        ELSE t END),
                           ' '))
               END AS n_chars
        FROM read_parquet('{SRC}/documents.parquet'), range({copies}) g(i)
        """,
    )
    gen(
        "embeddings",
        f"""
        -- per-decade sign-flip on a hashed half of the dimensions:
        -- copies within a decade stay identical (exact-dup clusters of
        -- 10), but cross-decade cosine drops to ~0, so vector near-dup
        -- cluster size stays bounded at any N (same discipline as the
        -- documents' per-decade token tag — identical replication made
        -- every ANN/near-dup bucket grow as C(N,2))
        SELECT vec_id + g.i * {SHIFT} AS vec_id,
               CASE WHEN g.i // 10 = 0 THEN embedding
                    ELSE list_transform(embedding,
                           (x, d) -> CASE WHEN hash(d + (g.i // 10) * 1009)
                                               % 2 = 0
                                     THEN -x ELSE x END)
               END AS embedding,
               label
        FROM read_parquet('{SRC}/embeddings.parquet'), range({copies}) g(i)
        """,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
