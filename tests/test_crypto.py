"""Crypto primitives (FIPS-197 AES-128, RFC 3394 key wrap) and the
pyarrow Parquet-Modular-Encryption plumbing in crypto.py.

All published test vectors are pinned: the AES tables are DERIVED at
import (GF(2^8) construction), so a generator bug (e.g. the exp-table
edge at inverse(1) found during development) must be caught here, not
in a field's corrupted files."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ducklakexl_spark import crypto


# ------------------------------------------------------------- FIPS-197


def test_aes128_fips197_appendix_b():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    ct = crypto.aes128_encrypt_block(key, pt)
    assert ct.hex() == "3925841d02dc09fbdc118597196a0b32"
    assert crypto.aes128_decrypt_block(key, ct) == pt


def test_aes128_fips197_appendix_c1():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = crypto.aes128_encrypt_block(key, pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert crypto.aes128_decrypt_block(key, ct) == pt


def test_sbox_matches_published_table():
    # spot rows of the canonical AES S-box — including SBOX[1], the
    # exp-table wraparound edge (inverse of 1) a naive generator misses
    canon_row0 = [
        0x63, 0x7C, 0x77, 0x7B, 0xF2, 0x6B, 0x6F, 0xC5,
        0x30, 0x01, 0x67, 0x2B, 0xFE, 0xD7, 0xAB, 0x76,
    ]
    assert [crypto._SBOX[i] for i in range(16)] == canon_row0
    assert crypto._SBOX[0x53] == 0xED
    assert all(crypto._INV_SBOX[crypto._SBOX[v]] == v for v in range(256))


def test_aes_roundtrip_random():
    import random

    rng = random.Random(7)
    for _ in range(25):
        k = bytes(rng.randrange(256) for _ in range(16))
        p = bytes(rng.randrange(256) for _ in range(16))
        assert crypto.aes128_decrypt_block(k, crypto.aes128_encrypt_block(k, p)) == p


# ------------------------------------------------------------- RFC 3394


def test_key_wrap_rfc3394_section_4_1():
    kek = bytes.fromhex("000102030405060708090A0B0C0D0E0F")
    kd = bytes.fromhex("00112233445566778899AABBCCDDEEFF")
    w = crypto.aes_key_wrap(kek, kd)
    assert (
        w.hex().upper()
        == "1FA68B0A8112B447AEF34BD8FB5A7B829D3E862371D2CFE5"
    )
    assert crypto.aes_key_unwrap(kek, w) == kd


def test_key_wrap_integrity_check():
    kek = bytes(range(16))
    w = crypto.aes_key_wrap(kek, bytes(16))
    with pytest.raises(ValueError, match="integrity"):
        crypto.aes_key_unwrap(bytes(16), w)
    # bit-flip in the wrapped blob must also fail
    bad = bytes([w[0] ^ 1]) + w[1:]
    with pytest.raises(ValueError, match="integrity"):
        crypto.aes_key_unwrap(kek, bad)


def test_key_wrap_longer_keys():
    kek = bytes(range(16))
    for n in (16, 24, 32):
        kd = bytes(range(100, 100 + n))
        assert crypto.aes_key_unwrap(kek, crypto.aes_key_wrap(kek, kd)) == kd


# --------------------------------------------------------- PME plumbing


@pytest.fixture()
def sample_table():
    return pa.table(
        {
            "a": pa.array(range(1000), pa.int32()),
            "b": pa.array(
                [None if i % 7 == 0 else f"s{i}" for i in range(1000)]
            ),
        }
    )


def _write(path, table, key):
    props = crypto.encryption_properties(key, table.schema.names)
    with pq.ParquetWriter(
        str(path), table.schema, encryption_properties=props
    ) as w:
        w.write_table(table)


def test_pme_roundtrip_and_footer_stats(tmp_path, sample_table):
    p = tmp_path / "e.parquet"
    key = crypto.new_file_key()
    _write(p, sample_table, key)
    pf = crypto.open_parquet(str(p), key)
    assert pf.read().equals(sample_table)
    # decrypted footer still exposes row-group statistics — the write
    # path's _collect_file_stats depends on this
    st = pf.metadata.row_group(0).column(0).statistics
    assert st.min == 0 and st.max == 999


def test_pme_rejects_plain_and_wrong_key(tmp_path, sample_table):
    p = tmp_path / "e.parquet"
    _write(p, sample_table, crypto.new_file_key())
    with pytest.raises(Exception, match="[Ee]ncrypt"):
        pq.ParquetFile(str(p)).read()
    with pytest.raises(Exception):
        crypto.open_parquet(str(p), crypto.new_file_key()).read()


def test_pme_open_plain_with_none_key(tmp_path, sample_table):
    p = tmp_path / "p.parquet"
    pq.write_table(sample_table, str(p))
    assert crypto.open_parquet(str(p), None).read().equals(sample_table)


def test_read_table_with_schema_reconciles(tmp_path, sample_table):
    p = tmp_path / "e.parquet"
    key = crypto.new_file_key()
    _write(p, sample_table, key)
    target = pa.schema(
        [
            pa.field("a", pa.int64()),  # widened
            pa.field("c", pa.float64()),  # added later -> nulls
        ]
    )
    t = crypto.read_table_with_schema(crypto.open_parquet(str(p), key), target)
    assert t.schema == target
    assert t.column("a").to_pylist()[:3] == [0, 1, 2]
    assert t.column("c").null_count == 1000
