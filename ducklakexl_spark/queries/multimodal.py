"""Multimodal-column plumbing (SURVEY.md §2.D): image/audio/video payloads
are opaque ``binary`` columns with a typed metadata struct.

Codec status: REAL codecs, pure Python —

- container formats: spec-valid BMP (mm_bmp_roundtrip) and RIFF/WAV
  (mm_wav_roundtrip) are written and re-parsed from bytes;
- a COMPRESSED image format: mm_png_roundtrip writes genuine PNG
  (RFC 2083 — DEFLATE-compressed IDAT via stdlib zlib, CRC-32-guarded
  chunks, all five scanline filter types) and decodes it back by
  inflating and un-filtering the bytes;
- a lossy AUDIO codec: mm_mulaw_roundtrip runs real ITU-T G.711 μ-law
  companding (segment/mantissa quantization) whose integer arithmetic
  the DuckDB oracle reproduces bit-for-bit;
- the perceptual hash (mm_phash_dedup) is the published blockhash
  algorithm over actual payload bytes.

Only codecs that genuinely require external native libraries
(JPEG/MP3/H.264) remain clearly-marked deterministic stubs.  Either way
the Spark-side plumbing (schema, Arrow batch shape, ``mapInPandas``
signature, partitioning) is exactly what a production
decode/feature-extract stage uses at 100 TB: per-partition Arrow
batches into pandas, no shuffle, column-pruned input.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
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


@query(
    "mm_feature_extract",
    # The stub features are pure byte arithmetic over the utf-8 payload,
    # so the oracle reproduces them relationally.  The fixture documents
    # are ASCII (verified: octet_length == length for every row), which
    # makes ord(char) == byte value — DuckDB can't slice BLOBs directly.
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           array_to_string(list_transform(generate_series(1, least(4, length(text))),
               i -> printf('%02X', ord(substr(text, i, 1)))), '') AS head_hex,
           CAST(coalesce(list_sum(list_transform(generate_series(1, length(text)),
               i -> ord(substr(text, i, 1)))), 0) % 100000 AS BIGINT) AS byte_sum,
           CAST((length(text) % 64) + 1 AS BIGINT) AS fake_width,
           CAST((coalesce(list_sum(list_transform(generate_series(1, least(16, length(text))),
               i -> ord(substr(text, i, 1)))), 0) % 64) + 1 AS BIGINT) AS fake_height
    FROM documents
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    return d.select("doc_id", "content").mapInPandas(
        _extract_batches, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = (
    "doc_id bigint, out_bytes binary, out_width bigint, out_height bigint,"
    " in_bytes bigint"
)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """STUB: a real implementation decodes with PIL, resizes, re-encodes.
    Deterministic fake: truncate/pad the payload to width*height bytes so
    batch shapes and output sizes behave like a real resize."""
    if payload is None:
        raise NotImplementedError("real resize requires PIL")
    target = width * height
    return payload[:target].ljust(target, b"\0")


def resize_stage(df, width: int = 16, height: int = 16):
    """mapInPandas resize stage: per-partition Arrow batches, payload
    column pruned in, fixed-size payload out — the exact plumbing a PIL
    resize uses at 100 TB (swap ``resize_image`` only)."""
    from collections.abc import Iterator

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["content"].map(lambda b: resize_image(b, width, height))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_bytes": out,
                    "out_width": width,
                    "out_height": height,
                    # input size rides along so downstream audits never
                    # need to re-join (and re-scan) the payload table —
                    # guide §2.3 "shuffle metadata, not payloads"
                    "in_bytes": pdf["content"].map(len),
                }
            )

    return df.select("doc_id", "content").mapInPandas(_batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_bytes binary"


def frame_sample_stage(df, n_frames: int = 4, frame_size: int = 32):
    """mapInPandas frame-sampling stage (video → N evenly-spaced frames).
    STUB decode: slice the payload into ``n_frames`` evenly-spaced
    ``frame_size``-byte windows — one output row per frame, the 1→N
    row-explosion shape ffmpeg frame extraction produces."""
    from collections.abc import Iterator

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                if payload is None:
                    raise NotImplementedError("real decode requires ffmpeg")
                stride = max(1, (len(payload) - frame_size) // max(1, n_frames - 1))
                for i in range(n_frames):
                    start = min(i * stride, max(0, len(payload) - frame_size))
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(payload[start : start + frame_size].ljust(frame_size, b"\0"))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return df.select("doc_id", "content").mapInPandas(_batches, schema=FRAME_SCHEMA)


@query(
    "mm_resize_summary",
    oracle="""
    SELECT CAST(16*16 AS BIGINT)          AS out_size,
           count(*)                        AS n_images,
           CAST(sum(CASE WHEN octet_length(encode(text)) >= 256
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated
    FROM documents
    """,
)
def mm_resize_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-stage output audit: every payload lands at exactly
    width*height bytes; count how many were truncated vs padded.  The
    oracle reproduces the stub's size arithmetic relationally.

    r9 (guide §2.3/§2.4): the stage now emits the input size alongside
    the resized payload, so the audit aggregates the stage output alone
    — the former doc_id join back onto the payload table (a second full
    documents scan + a corpus-keyed exchange carrying binary payloads)
    is gone: one scan, one Python pass, zero joins."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    resized = resize_stage(d, 16, 16)
    return resized.agg(
        F.first(F.length("out_bytes").cast("long")).alias("out_size"),
        F.count(F.lit(1)).alias("n_images"),
        F.sum(F.when(F.col("in_bytes") >= 256, 1).otherwise(0))
        .cast("long")
        .alias("n_truncated"),
    )


@query(
    "mm_frame_sample_counts",
    oracle="""
    SELECT CAST(4 AS BIGINT)   AS frames_per_doc,
           count(*)             AS n_docs,
           CAST(count(*) * 4 AS BIGINT) AS n_frames
    FROM documents
    """,
)
def mm_frame_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample-stage audit: the 1→N explosion yields exactly
    n_frames rows per doc."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    frames = frame_sample_stage(d, 4, 32)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("fpd")
    ).agg(
        F.first("fpd").cast("long").alias("frames_per_doc"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("fpd").cast("long").alias("n_frames"),
    )


PHASH_BITS = 32
# 5 disjoint bit blocks (7+7+6+6+6 = 32); pigeonhole: hamming <= 4 =>
# at least one block is identical, so banded equi-join candidates are
# EXACT for the threshold (same guarantee family as dedup_simhash)
PHASH_BANDS = [(0, 7), (7, 7), (14, 6), (20, 6), (26, 6)]  # (offset, width)
PHASH_MAX_HAMMING = 4
PHASH_SCHEMA = "doc_id bigint, phash bigint"


PHASH_GRID = 32         # payload's first 1024 bytes as a 32x32 grid


def _phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Blockhash-style perceptual hash over the payload's ACTUAL bytes
    (Yang et al.'s block mean-vs-median method — the DCT-free pHash
    family): the WHOLE payload is resized into a 32x32 grid by stride
    sampling (grid cell p reads byte floor(p*len/1024) — the nearest-
    neighbor resize of the real algorithm; the byte→luma decode is the
    only stand-in, no codecs in this container), the grid splits into
    32 spatial blocks of 8x4, and bit i is set iff block i's sum
    exceeds the median block sum.  Integer-exact, so the DuckDB oracle
    reproduces it relationally bit-for-bit.  The plumbing is the
    production shape: Arrow batches in, one fingerprint row out per
    payload, no shuffle."""
    import numpy as np

    n_cells = PHASH_GRID * PHASH_GRID
    cell_idx = np.arange(n_cells, dtype=np.int64)
    for pdf in batches:
        hashes = []
        for b in pdf["content"]:
            raw = np.frombuffer(bytes(b), dtype=np.uint8)
            if raw.size == 0:
                hashes.append(0)
                continue
            arr = raw[(cell_idx * raw.size) // n_cells]
            # (row//8, col//4) blocking: reshape 32x32 -> (4,8,8,4),
            # block id = brow*8 + bcol after summing the in-block axes
            sums = (
                arr.reshape(4, 8, 8, 4).sum(axis=(1, 3), dtype=np.int64).ravel()
            )
            med = int(np.sort(sums)[15])  # lower median of 32 block sums
            ph = 0
            for i in range(PHASH_BITS):
                if int(sums[i]) > med:
                    ph |= 1 << i
            hashes.append(ph)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": hashes})


@query(
    "mm_phash_dedup",
    # ASCII fixture ⇒ ord(char) == payload byte (same equivalence
    # mm_feature_extract documents); the oracle recomputes the 32x32
    # grid, the 8x4 block sums, the median threshold, the banding, and
    # the hamming verify relationally.
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, p,
             CASE WHEN length(text) = 0 THEN 0
                  ELSE ord(substr(text,
                       CAST((p * length(text)) // {PHASH_GRID * PHASH_GRID}
                            AS BIGINT) + 1, 1)) END AS byte_v,
             ((p // {PHASH_GRID}) // 8) * 8 + ((p % {PHASH_GRID}) // 4) AS blk
      FROM documents, generate_series(0, {PHASH_GRID * PHASH_GRID - 1}) t(p)
    ),
    bsum AS (
      SELECT doc_id, blk, sum(byte_v) AS s FROM pos GROUP BY doc_id, blk
    ),
    med AS (
      SELECT doc_id, s AS med FROM (
        SELECT doc_id, s,
               row_number() OVER (PARTITION BY doc_id ORDER BY s) AS rn
        FROM bsum) t WHERE rn = 16
    ),
    ph AS (
      SELECT b.doc_id,
             CAST(coalesce(sum(CASE WHEN b.s > m.med
                  THEN CAST(1 AS BIGINT) << b.blk ELSE 0 END), 0)
                AS BIGINT) AS phash
      FROM bsum b JOIN med m USING (doc_id)
      GROUP BY b.doc_id
    ),
    bands AS (
      SELECT * FROM (VALUES {", ".join(f"({j}, {off}, {(1 << w) - 1})" for j, (off, w) in enumerate(PHASH_BANDS))})
             w(j, boff, bmask)
    ),
    blocks AS (
      SELECT doc_id, phash, j, (phash >> boff) & bmask AS bv
      FROM ph, bands
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.phash AS pa, b.phash AS pb
      FROM blocks a JOIN blocks b
        ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(pa, pb)) <= {PHASH_MAX_HAMMING}
    """,
)
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection over the multimodal BINARY payload:
    decode→fingerprint via Arrow-batched ``mapInPandas`` (the pHash
    stage), then the banded hamming join — NEVER all-pairs.

    Same pigeonhole scheme as dedup_simhash: hamming ≤ 4 on a 32-bit
    fingerprint means at least one of 5 disjoint bit blocks (7/7/6/6/6)
    is identical, so candidates come from 5 equi-joins on (block, value)
    expressed as one exploded equi-join; exact hamming (bit_count of
    xor) verifies only bucket-mates.  At 100 TB the fingerprint table is 12 bytes/row next
    to the payload bytes (column-pruned away), and every shuffle key is
    (block, value) — hash-partitionable, skew-salted if a degenerate
    block value ever hot-spots."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    ph = d.select("doc_id", "content").mapInPandas(
        _phash_batches, schema=PHASH_SCHEMA
    )
    blocks = ph.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.shiftright("phash", off)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("bv"),
                    )
                    for j, (off, w) in enumerate(PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "phash", F.col("bk.j").alias("j"), F.col("bk.bv").alias("bv"))
    a = blocks.select(
        F.col("j"), F.col("bv"), F.col("doc_id").alias("doc_a"), F.col("phash").alias("pa")
    )
    b = blocks.select(
        F.col("j"), F.col("bv"), F.col("doc_id").alias("doc_b"), F.col("phash").alias("pb")
    )
    # r9 (guide §2.4/§4): the self-join's sides are the SAME
    # mapInPandas fingerprint pipeline; left to AQE one side broadcasts
    # and the Arrow-batched pHash decode runs TWICE (2 documents scans,
    # 2 Python passes).  The merge hint makes both sides identical
    # (j, bv) shuffles, which ReuseExchange collapses — one decode pass,
    # the join reads the one shuffle twice (same fix as dedup_simhash).
    cand = (
        a.hint("merge")
        .join(b, ["j", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pa", "pb")
        .distinct()
    )
    ham = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
    return (
        cand.filter(ham <= PHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", ham.cast("long").alias("hamming"))
    )


AUDIO_FRAME = 64
AUDIO_SCHEMA = "doc_id bigint, frame_idx bigint, energy_milli bigint"


def audio_energy_stage(df, frame_bytes: int = AUDIO_FRAME):
    """mapInPandas audio feature stage (waveform → per-frame energy).
    STUB decode: the payload bytes stand in for 8-bit PCM samples
    centered at 128 (no audio codec in this container); the Spark-side
    shape is the real one — Arrow batches in, one row per full frame
    out, integer milli-energy so the relational audit is exact."""
    from collections.abc import Iterator

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, energies = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                if payload is None:
                    raise NotImplementedError(
                        "real decode requires an audio codec"
                    )
                for f in range(len(payload) // frame_bytes):
                    frame = payload[f * frame_bytes : (f + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(f)
                    energies.append(
                        sum(abs(b - 128) for b in frame) * 1000 // frame_bytes
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "energy_milli": energies}
            )

    return df.select("doc_id", "content").mapInPandas(
        _batches, schema=AUDIO_SCHEMA
    )


@query(
    "mm_audio_energy",
    oracle=f"""
    WITH fr AS (
      SELECT doc_id, f AS frame_idx,
             (CAST(list_sum(list_transform(range(1, {AUDIO_FRAME} + 1),
                i -> abs(ord(substr(text, f * {AUDIO_FRAME} + i, 1)) - 128)))
                   AS BIGINT)
              * 1000) // {AUDIO_FRAME} AS e
      FROM (SELECT doc_id, text,
                   unnest(range(0, length(text) // {AUDIO_FRAME})) AS f
            FROM documents) t
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(max(e) AS BIGINT) AS peak_energy_milli,
           CAST(min(CASE WHEN e = me THEN frame_idx END) AS BIGINT)
             AS peak_frame
    FROM (SELECT *, max(e) OVER (PARTITION BY doc_id) AS me FROM fr) x
    GROUP BY doc_id
    """,
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality feature extraction audit: the per-frame energy
    stage (Arrow-batched mapInPandas, one row per {64}-byte frame)
    rolled up to per-doc frame count, peak energy, and peak-frame index.
    The oracle recomputes the stub's exact integer arithmetic
    relationally from the same bytes (fixtures are ASCII, so DuckDB's
    per-character ord() equals the payload byte — the same equivalence
    the resize audit relies on).  At 100 TB the stage is
    embarrassingly parallel: no shuffle until the per-doc rollup, and a
    real PCM decoder drops into the same batch signature."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    frames = audio_energy_stage(d)
    w = W.partitionBy("doc_id")
    return (
        frames.withColumn("me", F.max("energy_milli").over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.max("energy_milli").cast("long").alias("peak_energy_milli"),
            F.min(
                F.when(
                    F.col("energy_milli") == F.col("me"), F.col("frame_idx")
                )
            )
            .cast("long")
            .alias("peak_frame"),
        )
    )


# ---------------------------------------------------------------------------
# REAL container codecs — BMP and RIFF/WAV are byte-layout formats fully
# writable/parsable in pure Python (no PIL/ffmpeg needed).  The queries
# below round-trip genuine containers: the encoder builds a spec-valid
# file around the payload bytes and the decoder re-parses it from the
# BYTES — header magic, little-endian fields, row-stride padding and all
# — so any writer/parser disagreement breaks oracle parity.  Only
# compressed formats (JPEG/PNG/MP3) remain out of scope in this
# container.
# ---------------------------------------------------------------------------

import struct

BMP_WIDTH = 16  # fixed-width grayscale-as-24bit encoding


def encode_bmp(gray: bytes, width: int = BMP_WIDTH) -> bytes:
    """Write a spec-valid uncompressed 24-bit BI_RGB .bmp: BITMAPFILEHEADER
    (14 bytes) + BITMAPINFOHEADER (40 bytes) + bottom-up pixel rows padded
    to 4-byte boundaries, one gray level replicated across B,G,R."""
    height = max(1, -(-len(gray) // width))
    padded = gray.ljust(width * height, b"\0")
    stride = (width * 3 + 3) & ~3
    rows = []
    for r in range(height - 1, -1, -1):  # bottom-up, per spec
        row = bytearray()
        for c in range(width):
            v = padded[r * width + c]
            row += bytes((v, v, v))
        row += b"\0" * (stride - width * 3)
        rows.append(bytes(row))
    pixel_data = b"".join(rows)
    off = 14 + 40
    file_size = off + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data),
        2835, 2835, 0, 0,
    )
    return header + info + pixel_data


def decode_bmp(bmp: bytes) -> dict:
    """Parse the container back FROM BYTES: validate magic, read the
    little-endian header fields, walk the padded bottom-up rows."""
    magic, file_size, _r1, _r2, off = struct.unpack_from("<2sIHHI", bmp, 0)
    if magic != b"BM":
        raise ValueError("not a BMP stream")
    (hsz, width, height, _planes, bpp, comp, _imgsz, _xp, _yp, _cu, _ci
     ) = struct.unpack_from("<IiiHHIIiiII", bmp, 14)
    if hsz != 40 or bpp != 24 or comp != 0:
        raise ValueError("unsupported BMP variant")
    stride = (width * 3 + 3) & ~3
    total = 0
    for r in range(height):
        base = off + (height - 1 - r) * stride  # un-flip bottom-up rows
        for c in range(width):
            total += bmp[base + c * 3]  # blue channel = gray level
    return {
        "width": width,
        "height": height,
        "file_size": file_size,
        "pixel_sum": total,
    }


def _bmp_roundtrip_batches(batches):
    for pdf in batches:
        out = {"doc_id": [], "width": [], "height": [],
               "file_size": [], "pixel_sum": []}
        for did, payload in zip(pdf["doc_id"], pdf["content"]):
            bmp = encode_bmp(bytes(payload))
            d = decode_bmp(bmp)
            out["doc_id"].append(did)
            for k in ("width", "height", "file_size", "pixel_sum"):
                out[k].append(d[k])
        yield pd.DataFrame(out)


@query(
    "mm_bmp_roundtrip",
    # the oracle recomputes what a CORRECT writer+parser pair must
    # yield, straight from the source bytes: height from the fixed
    # width, file size from the padded stride, pixel sum = byte sum
    # (zero padding adds nothing).  Any stride/flip/offset bug in either
    # codec side breaks the match.
    oracle=f"""
    SELECT doc_id,
           CAST({BMP_WIDTH} AS BIGINT) AS width,
           CAST(CAST(ceil(length(text) / {BMP_WIDTH}.0) AS BIGINT)
                AS BIGINT) AS height,
           CAST(54 + CAST(ceil(length(text) / {BMP_WIDTH}.0) AS BIGINT)
                * {(BMP_WIDTH * 3 + 3) & ~3} AS BIGINT) AS file_size,
           CAST(coalesce(list_sum(list_transform(
                generate_series(1, length(text)),
                i -> ord(substr(text, i, 1)))), 0) AS BIGINT) AS pixel_sum
    FROM documents
    """,
)
def mm_bmp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-container codec path (no stub): each payload encodes
    into a spec-valid uncompressed 24-bit BMP (bottom-up rows, 4-byte
    stride padding, little-endian headers) and is decoded back by
    parsing the BYTES — magic check, header walk, row un-flip.  The
    oracle recomputes width/height/file-size/pixel-sum from the source
    text independently, so the writer and parser must agree with the
    spec, not merely with each other's in-memory values.

    100 TB shape: mapInPandas over Arrow batches, one output row per
    payload, no shuffle — the same plumbing a JPEG/PNG decode stage
    uses when the real libraries are present."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    return d.select("doc_id", "content").mapInPandas(
        _bmp_roundtrip_batches,
        schema="doc_id bigint, width bigint, height bigint, "
               "file_size bigint, pixel_sum bigint",
    )


WAV_RATE = 8000


def encode_wav(pcm_u8: bytes, rate: int = WAV_RATE) -> bytes:
    """Write a spec-valid RIFF/WAVE container: 8-bit unsigned mono PCM
    (format code 1), canonical 44-byte header."""
    n = len(pcm_u8)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + n, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate, 1, 8)
        + struct.pack("<4sI", b"data", n)
        + pcm_u8
    )


def decode_wav(wav: bytes) -> dict:
    """Parse RIFF chunks FROM BYTES: validate magic, walk fmt/data."""
    riff, _size, wave = struct.unpack_from("<4sI4s", wav, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, bits, channels, data = 12, None, None, None, b""
    while pos + 8 <= len(wav):
        cid, csz = struct.unpack_from("<4sI", wav, pos)
        body = wav[pos + 8 : pos + 8 + csz]
        if cid == b"fmt ":
            _fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)  # chunks are word-aligned
    samples = list(data)
    dev = sum(abs(s - 128) for s in samples)
    return {
        "sample_rate": rate,
        "bits": bits,
        "channels": channels,
        "n_samples": len(samples),
        "dev_sum": dev,
    }


def _wav_roundtrip_batches(batches):
    for pdf in batches:
        out = {"doc_id": [], "sample_rate": [], "bits": [],
               "n_samples": [], "dev_sum": []}
        for did, payload in zip(pdf["doc_id"], pdf["content"]):
            d = decode_wav(encode_wav(bytes(payload)))
            out["doc_id"].append(did)
            out["sample_rate"].append(d["sample_rate"])
            out["bits"].append(d["bits"])
            out["n_samples"].append(d["n_samples"])
            out["dev_sum"].append(d["dev_sum"])
        yield pd.DataFrame(out)


@query(
    "mm_wav_roundtrip",
    oracle=f"""
    SELECT doc_id,
           CAST({WAV_RATE} AS BIGINT) AS sample_rate,
           CAST(8 AS BIGINT) AS bits,
           CAST(length(text) AS BIGINT) AS n_samples,
           CAST(coalesce(list_sum(list_transform(
                generate_series(1, length(text)),
                i -> abs(ord(substr(text, i, 1)) - 128))), 0)
                AS BIGINT) AS dev_sum
    FROM documents
    """,
)
def mm_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-container codec path: payload bytes wrap into a
    spec-valid RIFF/WAVE (8-bit unsigned mono PCM, canonical chunks)
    and decode back by walking the chunk list from the bytes — the
    PCM-U8 interpretation means the amplitude-deviation sum is genuine
    signal arithmetic, not stub arithmetic.  Oracle recomputes the
    expected header fields and deviation from the source text, so the
    writer/parser pair must match the RIFF spec."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    return d.select("doc_id", "content").mapInPandas(
        _wav_roundtrip_batches,
        schema="doc_id bigint, sample_rate bigint, bits bigint, "
               "n_samples bigint, dev_sum bigint",
    )


# ---------------------------------------------------------------------------
# REAL compressed image codec — PNG (RFC 2083 / ISO 15948) via stdlib
# zlib.  The encoder emits a spec-valid 8-bit-grayscale PNG: signature,
# CRC-32-guarded IHDR/IDAT/IEND chunks, per-scanline filter bytes
# cycling through ALL FIVE filter types (None/Sub/Up/Average/Paeth) so
# the decoder's un-filter logic is exercised on every image, DEFLATE
# compression of the filtered stream.  The decoder re-parses from the
# BYTES: signature check, chunk walk with CRC verification, IHDR field
# decode, zlib inflate, filter reconstruction per the spec's Paeth
# predictor.  Pixel identity through compress→filter→inflate→unfilter
# is asserted against the relational oracle (pixel_sum == byte sum).
# ---------------------------------------------------------------------------

import zlib

PNG_WIDTH = 16
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(gray: bytes, width: int = PNG_WIDTH) -> bytes:
    """Spec-valid 8-bit grayscale PNG (color type 0, bit depth 8).
    Scanline r uses filter type r % 5, so every image exercises the
    full filter family; the filtered stream is DEFLATE-compressed."""
    height = max(1, -(-len(gray) // width))
    padded = gray.ljust(width * height, b"\0")
    prev = bytes(width)
    out = bytearray()
    for r in range(height):
        row = padded[r * width : (r + 1) * width]
        ft = r % 5
        out.append(ft)
        for c in range(width):
            x = row[c]
            a = row[c - 1] if c else 0          # left
            b = prev[c]                          # up
            d = prev[c - 1] if c else 0          # up-left
            if ft == 0:
                f = x
            elif ft == 1:
                f = (x - a) & 0xFF
            elif ft == 2:
                f = (x - b) & 0xFF
            elif ft == 3:
                f = (x - (a + b) // 2) & 0xFF
            else:
                f = (x - _paeth(a, b, d)) & 0xFF
            out.append(f)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(png: bytes) -> dict:
    """Parse the PNG back FROM BYTES: signature, CRC-verified chunk
    walk, inflate, and full filter reconstruction (the inverse of all
    five filter types, Paeth predictor per spec)."""
    if png[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, width, height, idat = 8, None, None, bytearray()
    n_chunks = 0
    while pos + 12 <= len(png):
        (ln,) = struct.unpack_from(">I", png, pos)
        ctype = png[pos + 4 : pos + 8]
        data = png[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", png, pos + 8 + ln)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        n_chunks += 1
        if ctype == b"IHDR":
            width, height, depth, ctyp, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctyp, comp, filt, ilace) != (8, 0, 0, 0, 0):
                raise ValueError("unsupported PNG variant")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (width + 1):
        raise ValueError("inflated stream has wrong length")
    prev = bytes(width)
    total = 0
    filters_seen = set()
    for r in range(height):
        base = r * (width + 1)
        ft = raw[base]
        filters_seen.add(ft)
        row = bytearray(width)
        for c in range(width):
            f = raw[base + 1 + c]
            a = row[c - 1] if c else 0
            b = prev[c]
            d = prev[c - 1] if c else 0
            if ft == 0:
                x = f
            elif ft == 1:
                x = (f + a) & 0xFF
            elif ft == 2:
                x = (f + b) & 0xFF
            elif ft == 3:
                x = (f + (a + b) // 2) & 0xFF
            elif ft == 4:
                x = (f + _paeth(a, b, d)) & 0xFF
            else:
                raise ValueError(f"bad filter type {ft}")
            row[c] = x
            total += x
        prev = bytes(row)
    return {
        "width": width,
        "height": height,
        "pixel_sum": total,
        "n_filters": len(filters_seen),
        "n_chunks": n_chunks,
    }


def _png_roundtrip_batches(batches):
    for pdf in batches:
        out = {"doc_id": [], "width": [], "height": [],
               "pixel_sum": [], "n_filters": [], "n_chunks": []}
        for did, payload in zip(pdf["doc_id"], pdf["content"]):
            raw = bytes(payload)
            png = encode_png(raw)
            d = decode_png(png)
            out["doc_id"].append(did)
            for k in ("width", "height", "pixel_sum", "n_filters",
                      "n_chunks"):
                out[k].append(d[k])
        yield pd.DataFrame(out)


@query(
    "mm_png_roundtrip",
    # the oracle recomputes what a CORRECT encoder+decoder pair must
    # produce straight from the source bytes: geometry from the fixed
    # width, pixel identity through DEFLATE + all five scanline filters
    # (pixel_sum == byte sum; zero padding adds nothing), the filter
    # variety actually written (min(height,5) distinct types), and the
    # 3-chunk layout.  Any bug in filtering, inflation, CRC framing
    # or stride handling breaks the match.  (That DEFLATE genuinely
    # compresses is asserted corpus-wide in test_functions.py — zlib
    # output size is data-dependent, so it is not per-row oracled.)
    oracle=f"""
    SELECT doc_id,
           CAST({PNG_WIDTH} AS BIGINT) AS width,
           CAST(greatest(1, CAST(ceil(length(text) / {PNG_WIDTH}.0) AS BIGINT))
                AS BIGINT) AS height,
           CAST(coalesce(list_sum(list_transform(
                generate_series(1, length(text)),
                i -> ord(substr(text, i, 1)))), 0) AS BIGINT) AS pixel_sum,
           CAST(least(greatest(1, CAST(ceil(length(text) / {PNG_WIDTH}.0)
                AS BIGINT)), 5) AS BIGINT) AS n_filters,
           CAST(3 AS BIGINT) AS n_chunks
    FROM documents
    """,
)
def mm_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image codec path: each payload encodes into a
    spec-valid 8-bit-grayscale PNG — CRC-32-guarded chunks, per-row
    filter bytes cycling through all five RFC 2083 filter types,
    DEFLATE-compressed IDAT — and decodes back by parsing the BYTES
    (signature, CRC-verified chunk walk, inflate, Paeth-correct filter
    reconstruction).  The oracle recomputes geometry and pixel identity
    from the source text independently, so encoder and decoder must
    agree with the PNG spec, not merely with each other.

    100 TB shape: mapInPandas over Arrow batches, one output row per
    payload, no shuffle — swap libpng/PIL into the same batch signature
    when native codecs are available."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    return d.select("doc_id", "content").mapInPandas(
        _png_roundtrip_batches,
        schema="doc_id bigint, width bigint, height bigint, "
               "pixel_sum bigint, n_filters bigint, n_chunks bigint",
    )


# ---------------------------------------------------------------------------
# REAL lossy audio codec — ITU-T G.711 μ-law companding.  The payload's
# 8-bit unsigned PCM expands to 16-bit linear, compresses through the
# published segment/mantissa quantizer (BIAS 0x84, CLIP 32635, 8
# segments x 16 mantissa steps → one byte per sample), and expands back.
# Pure integer arithmetic end to end, so the DuckDB oracle reproduces
# the EXACT quantization error relationally — segment selection as a
# range CASE, mantissa extraction and reconstruction with bit shifts.
# ---------------------------------------------------------------------------

_MULAW_BIAS = 0x84  # 132
_MULAW_CLIP = 32635


def mulaw_encode(linear: int) -> int:
    """ITU-T G.711 μ-law compress one 16-bit linear sample to one byte."""
    sign = 0x80 if linear < 0 else 0
    if linear < 0:
        linear = -linear
    if linear > _MULAW_CLIP:
        linear = _MULAW_CLIP
    linear += _MULAW_BIAS
    exponent = 7
    mask = 0x4000
    while exponent > 0 and not (linear & mask):
        exponent -= 1
        mask >>= 1
    mantissa = (linear >> (exponent + 3)) & 0x0F
    return ~(sign | (exponent << 4) | mantissa) & 0xFF


def mulaw_decode(mu: int) -> int:
    """Expand one μ-law byte back to 16-bit linear (quantized)."""
    mu = ~mu & 0xFF
    sign = mu & 0x80
    exponent = (mu >> 4) & 0x07
    mantissa = mu & 0x0F
    linear = (((mantissa << 3) + _MULAW_BIAS) << exponent) - _MULAW_BIAS
    return -linear if sign else linear


def _mulaw_roundtrip_batches(batches):
    table_enc = [mulaw_encode((b - 128) << 8) for b in range(256)]
    table_dec = [mulaw_decode(m) for m in table_enc]
    for pdf in batches:
        out = {"doc_id": [], "n_samples": [], "mu_sum": [],
               "decoded_dev_sum": [], "quant_err_sum": []}
        for did, payload in zip(pdf["doc_id"], pdf["content"]):
            raw = bytes(payload)
            n = len(raw)
            mu_sum = dev = err = 0
            for b in raw:
                lin = (b - 128) << 8
                mu_sum += table_enc[b]
                dec = table_dec[b]
                dev += abs(dec)
                err += abs(dec - lin)
            out["doc_id"].append(did)
            out["n_samples"].append(n)
            out["mu_sum"].append(mu_sum)
            out["decoded_dev_sum"].append(dev)
            out["quant_err_sum"].append(err)
        yield pd.DataFrame(out)


# relational G.711: v = biased magnitude, e = segment from range CASE,
# m = mantissa, byte = ~(sign|e<<4|m), reconstruction per spec
_MULAW_SQL_FRAGMENT = f"""
      SELECT doc_id, i,
             (ord(substr(text, i, 1)) - 128) * 256 AS lin
      FROM (SELECT doc_id, text,
                   unnest(generate_series(1, length(text))) AS i
            FROM documents) t
"""


@query(
    "mm_mulaw_roundtrip",
    oracle=f"""
    WITH s AS (
      {_MULAW_SQL_FRAGMENT}
    ),
    q AS (
      SELECT doc_id, lin,
             CASE WHEN lin < 0 THEN 128 ELSE 0 END AS sign,
             least(abs(lin), {_MULAW_CLIP}) + {_MULAW_BIAS} AS v
      FROM s
    ),
    e AS (
      SELECT doc_id, lin, sign, v,
             CASE WHEN v >= 16384 THEN 7 WHEN v >= 8192 THEN 6
                  WHEN v >= 4096 THEN 5 WHEN v >= 2048 THEN 4
                  WHEN v >= 1024 THEN 3 WHEN v >= 512 THEN 2
                  WHEN v >= 256 THEN 1 ELSE 0 END AS seg
      FROM q
    ),
    b AS (
      SELECT doc_id, lin, sign, seg,
             (v >> (seg + 3)) & 15 AS mant
      FROM e
    ),
    d AS (
      SELECT doc_id, lin,
             255 - (sign + seg * 16 + mant) AS mu,
             (CASE WHEN sign = 128 THEN -1 ELSE 1 END)
               * (((mant * 8 + {_MULAW_BIAS}) << seg) - {_MULAW_BIAS})
               AS dec
      FROM b
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(coalesce(sum(mu), 0) AS BIGINT) AS mu_sum,
           CAST(coalesce(sum(abs(dec)), 0) AS BIGINT) AS decoded_dev_sum,
           CAST(coalesce(sum(abs(dec - lin)), 0) AS BIGINT) AS quant_err_sum
    FROM d
    GROUP BY doc_id
    HAVING count(*) > 0
    """,
)
def mm_mulaw_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy audio codec: ITU-T G.711 μ-law companding of the
    payload-as-PCM — 16-bit linear expand, the published BIAS/CLIP
    segment quantizer down to one byte per sample, reconstruction, and
    the exact integer quantization error.  The oracle re-derives the
    whole quantizer relationally (segment range CASE, mantissa shifts,
    spec reconstruction), so the Python codec must match G.711 itself.

    100 TB shape: table-driven per-byte companding inside Arrow
    batches; the 256-entry LUT is built once per executor — the same
    structure a real μ-law DSP path uses."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    return (
        d.select("doc_id", "content")
        .filter(F.length("content") > 0)
        .mapInPandas(
            _mulaw_roundtrip_batches,
            schema="doc_id bigint, n_samples bigint, mu_sum bigint, "
                   "decoded_dev_sum bigint, quant_err_sum bigint",
        )
    )


# ---------------------------------------------------------------------------
# REAL compressed image codec #2 — GIF87a with LZW implemented from
# scratch (no library does the compression here: variable-width codes
# 9→12 bits LSB-first, clear/EOI codes, dictionary reset at 4096, the
# published algorithm).  Lossless, so decoded pixels must equal the
# source bytes exactly — the oracle checks pixel identity straight from
# the source text, and the 255-byte sub-block framing, logical screen
# descriptor and 256-entry gray palette are all spec-real.
# ---------------------------------------------------------------------------

GIF_WIDTH = 16


def _lzw_compress(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW: emit CLEAR first, grow code width when the next
    code would overflow it, reset the dictionary at 4096 entries.
    LSB-first bit packing per the GIF spec."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    out_bits.append((clear, width))
    w = b""
    for ch in data:
        wk = w + bytes([ch])
        if wk in table:
            w = wk
            continue
        out_bits.append((table[w], width))
        table[wk] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            out_bits.append((clear, width))
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([ch])
    if w:
        out_bits.append((table[w], width))
    out_bits.append((eoi, width))
    # LSB-first packing
    acc = nbits = 0
    packed = bytearray()
    for code, wd in out_bits:
        acc |= code << nbits
        nbits += wd
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        packed.append(acc & 0xFF)
    return bytes(packed)


def _lzw_decompress(packed: bytes, min_code_size: int = 8) -> bytes:
    """Mirror of the GIF LZW spec: rebuild the dictionary from the code
    stream (including the w+first(entry) rule for the just-defined
    code), track width growth and clear-code resets."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader, LSB first
    acc = nbits = pos = 0

    def read(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(packed):
                raise ValueError("LZW stream truncated")
            acc |= packed[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK special case
            table.append(entry)
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        # width grows when the NEXT append would overflow — i.e. the
        # table is now at the boundary the encoder tracked
        if len(table) >= (1 << width) and width < 12:
            width += 1
        prev = entry
    return bytes(out)


def encode_gif(gray: bytes, width: int = GIF_WIDTH) -> bytes:
    """Spec-valid GIF87a: header, logical screen descriptor with a
    256-entry global gray palette, image descriptor, from-scratch LZW
    pixel data in 255-byte sub-blocks, trailer."""
    height = max(1, -(-len(gray) // width))
    padded = gray.ljust(width * height, b"\0")
    palette = b"".join(bytes((v, v, v)) for v in range(256))
    lzw = _lzw_compress(padded)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator
    return (
        b"GIF87a"
        + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 256
        + palette
        + b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        + bytes([8])  # LZW minimum code size
        + bytes(blocks)
        + b"\x3B"
    )


def decode_gif(gif: bytes) -> dict:
    """Parse GIF87a FROM BYTES: signature, screen descriptor, palette,
    image descriptor, sub-block walk, LZW decode."""
    if gif[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    try:
        sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", gif, 6)
        pos = 13
        palette_size = 0
        if flags & 0x80:
            palette_size = 2 << (flags & 0x07)
            pos += 3 * palette_size
        if gif[pos] != 0x2C:
            raise ValueError("expected image descriptor")
        _l, _t, iw, ih, iflags = struct.unpack_from("<HHHHB", gif, pos + 1)
        pos += 10
        min_code = gif[pos]
        pos += 1
        lzw = bytearray()
        n_subblocks = 0
        while True:
            ln = gif[pos]
            pos += 1
            if ln == 0:
                break
            lzw += gif[pos : pos + ln]
            n_subblocks += 1
            pos += ln
        if gif[pos] != 0x3B:
            raise ValueError("missing trailer")
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated GIF stream: {exc}") from exc
    pixels = _lzw_decompress(bytes(lzw), min_code)
    if len(pixels) != iw * ih:
        raise ValueError("LZW pixel count mismatch")
    return {
        "width": iw,
        "height": ih,
        "palette_size": palette_size,
        "min_code_size": min_code,
        "pixel_sum": sum(pixels),
        "n_subblocks": n_subblocks,
    }


def _gif_roundtrip_batches(batches):
    for pdf in batches:
        out = {"doc_id": [], "width": [], "height": [],
               "palette_size": [], "min_code_size": [], "pixel_sum": []}
        for did, payload in zip(pdf["doc_id"], pdf["content"]):
            d = decode_gif(encode_gif(bytes(payload)))
            out["doc_id"].append(did)
            for k in ("width", "height", "palette_size", "min_code_size",
                      "pixel_sum"):
                out[k].append(d[k])
        yield pd.DataFrame(out)


@query(
    "mm_gif_roundtrip",
    oracle=f"""
    SELECT doc_id,
           CAST({GIF_WIDTH} AS BIGINT) AS width,
           CAST(greatest(1, CAST(ceil(length(text) / {GIF_WIDTH}.0) AS BIGINT))
                AS BIGINT) AS height,
           CAST(256 AS BIGINT) AS palette_size,
           CAST(8 AS BIGINT) AS min_code_size,
           CAST(coalesce(list_sum(list_transform(
                generate_series(1, length(text)),
                i -> ord(substr(text, i, 1)))), 0) AS BIGINT) AS pixel_sum
    FROM documents
    """,
)
def mm_gif_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image codec path #2: GIF87a with LZW implemented
    from scratch (variable 9→12-bit codes, LSB-first packing,
    clear/EOI, 4096-entry dictionary resets, the KwKwK rule) — no
    compression library involved.  Lossless, so the decoded pixel sum
    must equal the source byte sum exactly; geometry, palette and code
    size come from the parsed descriptors.  Sub-block framing and
    screen/image descriptors follow the spec byte for byte.

    100 TB shape: identical mapInPandas stage as the PNG/BMP paths."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    return d.select("doc_id", "content").mapInPandas(
        _gif_roundtrip_batches,
        schema="doc_id bigint, width bigint, height bigint, "
               "palette_size bigint, min_code_size bigint, "
               "pixel_sum bigint",
    )


# ---------------------------------------------------------------------------
# REAL lossy image codec — baseline JPEG (ITU T.81), grayscale, pure
# Python + numpy: 8x8 DCT-II, Annex K luminance quantization, zigzag,
# DC differential + Huffman entropy coding with the Annex K code
# tables, 0xFF byte stuffing, full JFIF marker structure.  The decoder
# re-parses everything FROM BYTES: marker walk, DQT/SOF0/DHT/SOS,
# Huffman tree rebuild, dequant, IDCT.  Lossy — the relational oracle
# checks the exactly-predictable structural fields (geometry, MCU
# count, marker inventory); reconstruction fidelity is pinned by
# PSNR-bounded unit tests (tests/test_functions.py).
# ---------------------------------------------------------------------------

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
_JPEG_QT = [  # Annex K.1 luminance, quality ~50
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
# Annex K.3: (BITS counts for lengths 1..16, HUFFVAL)
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

JPEG_WIDTH = 16


def _huff_codes(bits, vals):
    """Annex C: generate canonical (code, length) per symbol."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _dct_matrix():
    import numpy as np

    n = 8
    d = np.zeros((n, n))
    import math

    for k in range(n):
        for i in range(n):
            c = (1 / n) ** 0.5 if k == 0 else (2 / n) ** 0.5
            d[k, i] = c * math.cos(math.pi * k * (2 * i + 1) / (2 * n))
    return d


def _jpeg_category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def encode_jpeg(gray: bytes, width: int = JPEG_WIDTH) -> bytes:
    """Baseline JFIF: grayscale, one component, Annex K tables."""
    import numpy as np

    height = max(1, -(-len(gray) // width))
    img = np.frombuffer(gray.ljust(width * height, b"\0"), dtype=np.uint8)
    img = img.reshape(height, width).astype(np.float64)
    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    pad = np.empty((ph, pw))
    pad[:height, :width] = img
    pad[height:, :width] = img[-1:, :]            # edge-replicate pad
    pad[:, width:] = pad[:, width - 1 : width]
    d = _dct_matrix()
    qt = np.array(_JPEG_QT, dtype=np.float64).reshape(8, 8)
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = d @ block @ d.T
            q = np.round(coef / qt).astype(np.int64)
            zz = [int(q.flat[_JPEG_ZIGZAG[i]]) for i in range(64)]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            cat = _jpeg_category(diff)
            bw.write(*dc_codes[cat])
            if cat:
                v = diff if diff >= 0 else diff + (1 << cat) - 1
                bw.write(v, cat)
            run = 0
            for k in range(1, 64):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.write(*ac_codes[0xF0])  # ZRL
                    run -= 16
                cat = _jpeg_category(v)
                bw.write(*ac_codes[(run << 4) | cat])
                vv = v if v >= 0 else v + (1 << cat) - 1
                bw.write(vv, cat)
                run = 0
            if run:
                bw.write(*ac_codes[0x00])  # EOB
    bw.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dqt = seg(0xDB, bytes([0]) + bytes(_JPEG_QT[_JPEG_ZIGZAG[i]] for i in range(64)))
    sof = seg(0xC0, struct.pack(">BHHB", 8, ph, pw, 1) + bytes([1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)) \
        + seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xFF\xD8" + dqt + sof + dht + sos + bytes(bw.buf) + b"\xFF\xD9"
    )


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # unstuff
                else:
                    raise ValueError("unexpected marker in entropy data")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _huff_decoder(bits, vals):
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def decode_jpeg(jpg: bytes) -> dict:
    """Parse baseline JPEG FROM BYTES: marker walk, table rebuild,
    Huffman + DC-differential decode, dequant, IDCT."""
    import numpy as np

    if jpg[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qt = None
    h = w = None
    dc_tab = ac_tab = None
    markers = ["SOI"]
    entropy = None
    while pos + 4 <= len(jpg):
        if jpg[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = jpg[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", jpg, pos + 2)
        body = jpg[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:
            markers.append("DQT")
            zzq = list(body[1:65])
            qt = [0] * 64
            for i in range(64):
                qt[_JPEG_ZIGZAG[i]] = zzq[i]
        elif marker == 0xC0:
            markers.append("SOF0")
            _prec, h, w, _nc = struct.unpack_from(">BHHB", body, 0)
        elif marker == 0xC4:
            markers.append("DHT")
            tc_th = body[0]
            bits = list(body[1:17])
            vals = list(body[17 : 17 + sum(bits)])
            if tc_th >> 4 == 0:
                dc_tab = _huff_decoder(bits, vals)
            else:
                ac_tab = _huff_decoder(bits, vals)
        elif marker == 0xDA:
            markers.append("SOS")
            entropy = jpg[pos + 2 + ln : -2]
            pos = len(jpg)
            break
        pos += 2 + ln
    if None in (qt, h, w, dc_tab, ac_tab) or entropy is None:
        raise ValueError("missing JPEG segments")
    br = _BitReader(entropy)

    def read_sym(tab):
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            if (length, code) in tab:
                return tab[(length, code)]
        raise ValueError("bad Huffman code")

    def extend(v, cat):
        return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1

    d = _dct_matrix()
    qtm = np.array(qt, dtype=np.float64).reshape(8, 8)
    out = np.zeros((h, w))
    prev_dc = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            zz = [0] * 64
            cat = read_sym(dc_tab)
            diff = extend(br.bits(cat), cat) if cat else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = read_sym(ac_tab)
                run, cat = rs >> 4, rs & 0x0F
                if rs == 0x00:
                    break  # EOB
                if rs == 0xF0:
                    k += 16
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC run overflow")
                zz[k] = extend(br.bits(cat), cat)
                k += 1
            q = np.zeros(64)
            for i in range(64):
                q[_JPEG_ZIGZAG[i]] = zz[i]
            coef = q.reshape(8, 8) * qtm
            block = d.T @ coef @ d + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    pixels = np.clip(np.round(out), 0, 255).astype(np.uint8)
    markers.append("EOI")
    return {
        "width": w,
        "height": h,
        "n_blocks": (h // 8) * (w // 8),
        "markers": markers,
        "pixels": pixels,
    }


def _jpeg_roundtrip_batches(batches):
    for pdf in batches:
        out = {"doc_id": [], "width": [], "height": [], "n_blocks": [],
               "n_markers": []}
        for did, payload in zip(pdf["doc_id"], pdf["content"]):
            d = decode_jpeg(encode_jpeg(bytes(payload)))
            out["doc_id"].append(did)
            out["width"].append(d["width"])
            out["height"].append(d["height"])
            out["n_blocks"].append(d["n_blocks"])
            out["n_markers"].append(len(d["markers"]))
        yield pd.DataFrame(out)


@query(
    "mm_jpeg_roundtrip",
    # structural oracle: padded geometry (8x8 MCU alignment over the
    # 16-wide grid), MCU count, and the marker inventory a baseline
    # grayscale JFIF must carry (SOI, DQT, SOF0, 2x DHT, SOS, EOI = 7).
    # Reconstruction fidelity is lossy by design and pinned by the
    # PSNR-bounded unit tests instead.
    oracle=f"""
    SELECT doc_id,
           CAST({JPEG_WIDTH} AS BIGINT) AS width,
           CAST(((greatest(1, CAST(ceil(length(text) / {JPEG_WIDTH}.0)
                AS BIGINT)) + 7) // 8) * 8 AS BIGINT) AS height,
           CAST(((greatest(1, CAST(ceil(length(text) / {JPEG_WIDTH}.0)
                AS BIGINT)) + 7) // 8) * ({JPEG_WIDTH} // 8) AS BIGINT)
               AS n_blocks,
           CAST(7 AS BIGINT) AS n_markers
    FROM documents
    """,
)
def mm_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy image codec: baseline JPEG (ITU T.81) implemented
    here end to end — 8x8 DCT-II, Annex K luminance quantization,
    zigzag, DC-differential + Huffman entropy coding with the Annex K
    code tables, 0xFF byte stuffing, JFIF marker framing — and decoded
    back by parsing the BYTES (marker walk, canonical Huffman rebuild,
    dequant, IDCT).  The relational oracle pins the exactly-predictable
    structure (MCU-padded geometry, block count, the 7-marker
    inventory); reconstruction quality is pinned by unit tests (DC-path
    exactness on flat blocks, PSNR floor on random payloads).

    100 TB shape: the same no-shuffle mapInPandas stage as every codec
    here; numpy does the per-block math inside Arrow batches."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    return d.select("doc_id", "content").mapInPandas(
        _jpeg_roundtrip_batches,
        schema="doc_id bigint, width bigint, height bigint, "
               "n_blocks bigint, n_markers bigint",
    )
