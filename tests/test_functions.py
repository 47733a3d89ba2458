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


# ---------------------------------------------------------------------------
# codec-level unit tests (no Spark): the PNG and G.711 μ-law codecs in
# queries/multimodal.py must hold spec properties the relational oracle
# cannot express (zlib output size is data-dependent; corruption paths
# never reach the oracle because decode raises)
# ---------------------------------------------------------------------------


def test_png_roundtrip_identity_and_compression():
    import random
    from ducklakexl_spark.queries.multimodal import (
        PNG_WIDTH, decode_png, encode_png,
    )

    rng = random.Random(42)
    # corpus-level compression: concatenated repetitive ASCII must
    # genuinely shrink through DEFLATE (guards against a "compressed"
    # path that stores raw bytes)
    corpus = (b"the quick brown fox jumps over the lazy dog " * 60)
    png = encode_png(corpus)
    h = -(-len(corpus) // PNG_WIDTH)
    assert len(png) < 8 + 36 + 13 + h * (PNG_WIDTH + 1)
    d = decode_png(png)
    assert d["pixel_sum"] == sum(corpus)
    assert d["n_filters"] == 5  # all five filter types exercised
    # random payloads, edge sizes
    for n in (0, 1, PNG_WIDTH - 1, PNG_WIDTH, PNG_WIDTH + 1, 777):
        data = bytes(rng.randrange(256) for _ in range(n))
        dd = decode_png(encode_png(data))
        assert dd["pixel_sum"] == sum(data)
        assert dd["width"] == PNG_WIDTH
        assert dd["height"] == max(1, -(-n // PNG_WIDTH))


def test_png_decoder_rejects_corruption():
    import pytest as _pytest
    from ducklakexl_spark.queries.multimodal import decode_png, encode_png

    png = bytearray(encode_png(b"corruption target payload bytes"))
    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a" + bytes(png))
    # flip one byte inside the IDAT payload → CRC must catch it
    flipped = bytearray(png)
    flipped[8 + 12 + 13 + 12] ^= 0xFF  # first IDAT data byte
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(flipped))


def test_mulaw_spec_properties():
    from ducklakexl_spark.queries.multimodal import (
        mulaw_decode, mulaw_encode,
    )

    # spec anchor points (G.711 table): 0 → 0xFF, full-scale → 0x80
    assert mulaw_encode(0) == 0xFF
    assert mulaw_encode(32635) == 0x80
    assert mulaw_encode(-32635) == 0x00
    # decode(encode(x)) is within one quantization step, monotone in x,
    # and sign-symmetric
    prev = None
    for lin in range(-32768, 32768, 257):
        mu = mulaw_encode(lin)
        dec = mulaw_decode(mu)
        exponent = ((~mu & 0xFF) >> 4) & 7
        step = 1 << (exponent + 3)
        assert abs(dec - max(-32635, min(32635, lin))) <= step
        if prev is not None:
            assert dec >= prev  # non-decreasing reconstruction
        prev = dec
        if lin != -32768:
            assert mulaw_encode(-lin) == (mulaw_encode(lin) ^ 0x80)


def test_gif_lzw_roundtrip_and_compression():
    import random
    from ducklakexl_spark.queries.multimodal import (
        _lzw_compress, _lzw_decompress, decode_gif, encode_gif,
    )

    rng = random.Random(11)
    # repetitive corpus: LZW must genuinely compress AND roundtrip
    rep = b"the quick brown fox " * 2000
    packed = _lzw_compress(rep)
    assert len(packed) < len(rep) // 2
    assert _lzw_decompress(packed) == rep
    # random data large enough to force 12-bit codes + dictionary reset
    blob = bytes(rng.randrange(256) for _ in range(30000))
    assert _lzw_decompress(_lzw_compress(blob)) == blob
    d = decode_gif(encode_gif(blob))
    assert d["pixel_sum"] == sum(blob)
    assert d["n_subblocks"] > 1  # 255-byte sub-block framing exercised


def test_gif_decoder_rejects_corruption():
    import pytest as _pytest
    from ducklakexl_spark.queries.multimodal import decode_gif, encode_gif

    gif = encode_gif(b"some payload")
    with _pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG" + gif)
    with _pytest.raises(ValueError):
        decode_gif(gif[:-1])  # missing trailer


def test_jpeg_roundtrip_fidelity():
    import random

    import numpy as np

    from ducklakexl_spark.queries.multimodal import (
        _dct_matrix, decode_jpeg, encode_jpeg,
    )

    # the DCT basis must be orthonormal or everything else silently skews
    d = _dct_matrix()
    assert np.allclose(d @ d.T, np.eye(8), atol=1e-12)
    # flat blocks are DC-only: reconstruction must be EXACT
    r = decode_jpeg(encode_jpeg(bytes([200] * 256)))
    assert int(np.abs(r["pixels"].astype(int) - 200).max()) == 0
    assert r["markers"] == ["SOI", "DQT", "SOF0", "DHT", "DHT", "SOS", "EOI"]
    # smooth gradient: high-fidelity band
    grad = bytes(range(256))
    r2 = decode_jpeg(encode_jpeg(grad))
    ref = np.frombuffer(grad, dtype=np.uint8).reshape(16, 16).astype(float)
    mse = ((r2["pixels"][:16, :16].astype(float) - ref) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / mse) > 40
    # random noise: JPEG's worst case still has a floor
    rng = random.Random(5)
    blob = bytes(rng.randrange(256) for _ in range(1000))
    r3 = decode_jpeg(encode_jpeg(blob))
    h = -(-1000 // 16)
    ref = np.frombuffer(blob.ljust(16 * h, b"\0"), dtype=np.uint8)
    ref = ref.reshape(h, 16).astype(float)
    mse = ((r3["pixels"][:h, :16].astype(float) - ref) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / mse) > 18


def test_jpeg_decoder_rejects_corruption():
    import pytest as _pytest

    from ducklakexl_spark.queries.multimodal import decode_jpeg, encode_jpeg

    jpg = encode_jpeg(b"corruption target")
    with _pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"XX" + jpg)
    with _pytest.raises(ValueError):
        decode_jpeg(jpg[:40])  # missing SOS/entropy segments
