"""Multimodal-column plumbing (SURVEY.md §2.D): image/audio/video payloads
are opaque ``binary`` columns with a typed metadata struct.  The container
has no image/audio codecs, so the decode step is a clearly-marked
deterministic stub — but the Spark-side plumbing (schema, Arrow batch
shape, ``mapInPandas`` signature, partitioning) is real and is exactly what
a production decode/feature-extract stage uses at 100 TB: per-partition
Arrow batches into pandas, no shuffle, column-pruned input.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducklakexl_spark.queries import load, query

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, head_hex string, byte_sum bigint, "
    "fake_width bigint, fake_height bigint"
)


def decode_image(payload: bytes) -> dict:
    """STUB: a real implementation would decode with PIL/ffmpeg — not
    available in this container.  Deterministic fake derived from the
    bytes so tests are stable."""
    if payload is None:
        raise NotImplementedError("real codec path requires PIL/ffmpeg")
    return {
        "fake_width": (len(payload) % 64) + 1,
        "fake_height": (sum(payload[:16]) % 64) + 1,
    }


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["content"]
        feats = [decode_image(p) for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len),
                "head_hex": payloads.map(lambda b: b[:4].hex().upper()),
                "byte_sum": payloads.map(lambda b: sum(b) % 100000),
                "fake_width": [f["fake_width"] for f in feats],
                "fake_height": [f["fake_height"] for f in feats],
            }
        )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Synthesize the multimodal shape from text docs: binary payload +
    typed metadata struct (mime/size/checksum) — the storage schema a
    100 TB multimodal table uses (payload column prunable, metadata
    scannable without touching payload bytes)."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).cast("long").alias("size_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


@query(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
           md5(text)                                  AS checksum,
           'text/plain'                               AS mime,
           upper(substr(md5(text), 1, 8))             AS checksum_prefix
    FROM documents
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.col("meta.size_bytes").alias("size_bytes"),
        F.col("meta.checksum").alias("checksum"),
        F.col("meta.mime").alias("mime"),
        F.upper(F.substring(F.col("meta.checksum"), 1, 8)).alias("checksum_prefix"),
    )


@query("mm_feature_extract")  # mapInPandas stage → rows-only check
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    return d.select("doc_id", "content").mapInPandas(
        _extract_batches, schema=FEATURE_SCHEMA
    )
