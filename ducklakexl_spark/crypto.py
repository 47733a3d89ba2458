"""Parquet Modular Encryption for encrypted DuckLake lakes.

DuckLake spec surface: ``ducklake_metadata['encrypted'] = 'true'`` plus a
per-file key in ``ducklake_data_file.encryption_key`` /
``ducklake_delete_file.encryption_key`` (SURVEY §1.1; the reference
round-trips the ``encrypted`` metadata row through its sync plane at
ducklakexl.py:501-505 and delegates the actual cryptography to DuckDB's
parquet encryption).  This engine implements the real thing on the Spark
side with pyarrow's Parquet Modular Encryption (PME, the Parquet spec's
AES-GCM footer+page encryption):

- every data/delete file is encrypted with its own random 128-bit master
  key, stored (base64) in the catalog's spec ``encryption_key`` field —
  the catalog is the trust boundary, data files on untrusted storage are
  unreadable without it (DuckLake's model);
- pyarrow's CryptoFactory envelope-encrypts random DEKs/KEKs per file;
  the master-key wrap step is a from-scratch RFC 3394 AES Key Wrap over
  a from-scratch FIPS-197 AES-128 (pure Python — the container ships no
  crypto lib; only 2 single-block wrap ops per file, so speed is moot);
- reads/writes are DISTRIBUTED: ``mapInArrow`` tasks each encrypt/decrypt
  whole files with pyarrow, so a 1000-executor cluster decrypts 1000
  files concurrently — the JVM never needs a KMS plugin.

Interop note: DuckDB's ``encryption_config={footer_key: …}`` uses the
named key DIRECTLY as the file key, while PME's CryptoFactory always
envelope-wraps a random DEK — the formats are mutually unreadable by
design, so correctness oracles compare query RESULTS against plain
tables rather than bytes.
"""

from __future__ import annotations

import base64
import os
import uuid
from urllib.parse import quote, unquote

import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.parquet.encryption as pe

# --------------------------------------------------------------------- AES-128
# FIPS-197, forward + inverse cipher.  Tables are derived at import time
# from the spec's GF(2^8) construction (x^8+x^4+x^3+x+1) rather than
# pasted, and pinned against the FIPS-197 appendix vectors in
# tests/test_crypto.py.


def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverse via exp/log tables on generator 3
    exp, log = [0] * 256, [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gf_mul(x, 3)
    exp += exp  # wraparound
    sbox, inv = [0] * 256, [0] * 256
    for v in range(256):
        q = 0 if v == 0 else exp[(255 - log[v]) % 255]
        # affine transform
        s = q
        for sh in (1, 2, 3, 4):
            s ^= ((q << sh) | (q >> (8 - sh))) & 0xFF
        s ^= 0x63
        sbox[v] = s
        inv[s] = v
    return sbox, inv


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> list[list[int]]:
    """AES-128 key schedule → 11 round keys of 16 bytes each."""
    if len(key) != 16:
        raise ValueError("AES-128 requires a 16-byte key")
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(11)]


def _mix_single(col: list[int], inverse: bool) -> list[int]:
    a, b, c, d = col
    if not inverse:
        return [
            _gf_mul(a, 2) ^ _gf_mul(b, 3) ^ c ^ d,
            a ^ _gf_mul(b, 2) ^ _gf_mul(c, 3) ^ d,
            a ^ b ^ _gf_mul(c, 2) ^ _gf_mul(d, 3),
            _gf_mul(a, 3) ^ b ^ c ^ _gf_mul(d, 2),
        ]
    return [
        _gf_mul(a, 14) ^ _gf_mul(b, 11) ^ _gf_mul(c, 13) ^ _gf_mul(d, 9),
        _gf_mul(a, 9) ^ _gf_mul(b, 14) ^ _gf_mul(c, 11) ^ _gf_mul(d, 13),
        _gf_mul(a, 13) ^ _gf_mul(b, 9) ^ _gf_mul(c, 14) ^ _gf_mul(d, 11),
        _gf_mul(a, 11) ^ _gf_mul(b, 13) ^ _gf_mul(c, 9) ^ _gf_mul(d, 14),
    ]


def aes128_encrypt_block(key: bytes, block: bytes) -> bytes:
    rk = _expand_key(key)
    s = [block[r + 4 * c] for c in range(4) for r in range(4)]  # column-major in
    # state as 4x4 row-major list: s[row][col] = s[4*row+col] — keep flat,
    # index row*4+col after transposing input (FIPS state is column-major)
    st = [[block[4 * c + r] for c in range(4)] for r in range(4)]
    del s

    def add_rk(round_i: int) -> None:
        k = rk[round_i]
        for r in range(4):
            for c in range(4):
                st[r][c] ^= k[4 * c + r]

    add_rk(0)
    for rnd in range(1, 10):
        for r in range(4):
            for c in range(4):
                st[r][c] = _SBOX[st[r][c]]
        for r in range(1, 4):
            st[r] = st[r][r:] + st[r][:r]
        for c in range(4):
            col = _mix_single([st[r][c] for r in range(4)], False)
            for r in range(4):
                st[r][c] = col[r]
        add_rk(rnd)
    for r in range(4):
        for c in range(4):
            st[r][c] = _SBOX[st[r][c]]
    for r in range(1, 4):
        st[r] = st[r][r:] + st[r][:r]
    add_rk(10)
    return bytes(st[r][c] for c in range(4) for r in range(4))


def aes128_decrypt_block(key: bytes, block: bytes) -> bytes:
    rk = _expand_key(key)
    st = [[block[4 * c + r] for c in range(4)] for r in range(4)]

    def add_rk(round_i: int) -> None:
        k = rk[round_i]
        for r in range(4):
            for c in range(4):
                st[r][c] ^= k[4 * c + r]

    add_rk(10)
    for rnd in range(9, 0, -1):
        for r in range(1, 4):
            st[r] = st[r][-r:] + st[r][:-r]
        for r in range(4):
            for c in range(4):
                st[r][c] = _INV_SBOX[st[r][c]]
        add_rk(rnd)
        for c in range(4):
            col = _mix_single([st[r][c] for r in range(4)], True)
            for r in range(4):
                st[r][c] = col[r]
    for r in range(1, 4):
        st[r] = st[r][-r:] + st[r][:-r]
    for r in range(4):
        for c in range(4):
            st[r][c] = _INV_SBOX[st[r][c]]
    add_rk(0)
    return bytes(st[r][c] for c in range(4) for r in range(4))


# ----------------------------------------------------------- RFC 3394 key wrap

_KW_IV = b"\xa6" * 8


def aes_key_wrap(kek: bytes, plaintext: bytes) -> bytes:
    """RFC 3394 AES Key Wrap (n>=2 64-bit blocks, 6n AES calls)."""
    if len(plaintext) % 8 or len(plaintext) < 16:
        raise ValueError("key wrap input must be >=16 bytes, 8-byte aligned")
    n = len(plaintext) // 8
    a = int.from_bytes(_KW_IV, "big")
    r = [plaintext[8 * i : 8 * i + 8] for i in range(n)]
    for j in range(6):
        for i in range(n):
            b = aes128_encrypt_block(kek, a.to_bytes(8, "big") + r[i])
            t = n * j + i + 1
            a = int.from_bytes(b[:8], "big") ^ t
            r[i] = b[8:]
    return a.to_bytes(8, "big") + b"".join(r)


def aes_key_unwrap(kek: bytes, wrapped: bytes) -> bytes:
    if len(wrapped) % 8 or len(wrapped) < 24:
        raise ValueError("wrapped key must be >=24 bytes, 8-byte aligned")
    n = len(wrapped) // 8 - 1
    a = int.from_bytes(wrapped[:8], "big")
    r = [wrapped[8 * (i + 1) : 8 * (i + 2)] for i in range(n)]
    for j in range(5, -1, -1):
        for i in range(n - 1, -1, -1):
            t = n * j + i + 1
            b = aes128_decrypt_block(kek, (a ^ t).to_bytes(8, "big") + r[i])
            a = int.from_bytes(b[:8], "big")
            r[i] = b[8:]
    if a.to_bytes(8, "big") != _KW_IV:
        raise ValueError("key unwrap integrity check failed (wrong key?)")
    return b"".join(r)


# --------------------------------------------------------------- pyarrow PME

#: single well-known key id — the actual key BYTES differ per file and
#: live in the catalog row, so a constant id keeps the spec's one-string
#: ``encryption_key`` field sufficient to open the file.
KEY_ID = "k"


class _DictKms(pe.KmsClient):
    """KMS client over an in-memory {key_id: master_key_bytes} dict;
    wrap/unwrap is RFC 3394 AES-KW under the named master key."""

    def __init__(self, keys: dict[str, bytes]):
        pe.KmsClient.__init__(self)
        self._keys = keys

    def wrap_key(self, key_bytes, master_key_identifier):
        kek = self._keys[master_key_identifier]
        return base64.b64encode(aes_key_wrap(kek, bytes(key_bytes))).decode()

    def unwrap_key(self, wrapped_key, master_key_identifier):
        kek = self._keys[master_key_identifier]
        if isinstance(wrapped_key, (bytes, bytearray)):
            wrapped_key = wrapped_key.decode()
        return aes_key_unwrap(kek, base64.b64decode(wrapped_key))


def _factory(keys: dict[str, bytes]) -> tuple:
    fac = pe.CryptoFactory(lambda _cfg, _k=keys: _DictKms(_k))
    return fac, pe.KmsConnectionConfig()


def new_file_key() -> str:
    """Fresh random 128-bit per-file master key, base64 (the catalog's
    ``encryption_key`` value)."""
    return base64.b64encode(os.urandom(16)).decode()


def encryption_properties(key_b64: str, column_names: list[str]):
    fac, cfg = _factory({KEY_ID: base64.b64decode(key_b64)})
    enc = pe.EncryptionConfiguration(
        footer_key=KEY_ID,
        column_keys={KEY_ID: list(column_names)},
        encryption_algorithm="AES_GCM_V1",
        data_key_length_bits=128,
        internal_key_material=True,
    )
    return fac.file_encryption_properties(cfg, enc)


def open_parquet(path: str, key_b64: str | None) -> pq.ParquetFile:
    """ParquetFile handle, decrypting when the catalog carries a key
    (``None`` = plain file, e.g. adopted zero-copy into an encrypted
    lake)."""
    if not key_b64:
        return pq.ParquetFile(path)
    fac, cfg = _factory({KEY_ID: base64.b64decode(key_b64)})
    dec = fac.file_decryption_properties(cfg, pe.DecryptionConfiguration())
    return pq.ParquetFile(path, decryption_properties=dec)


# ------------------------------------------------- distributed read/write


def read_table_with_schema(
    pf: pq.ParquetFile, target: pa.Schema, columns: list[str] | None = None
) -> pa.Table:
    """Read ``pf`` reconciled to ``target``: fields missing from the
    file's physical schema become null columns (ALTER ADD / historical
    rename), extra physical columns are not projected (ALTER DROP), and
    types cast to the target (lossless widening)."""
    want = [f.name for f in target] if columns is None else list(columns)
    have = set(pf.schema_arrow.names)
    present = [c for c in want if c in have]
    t = pf.read(columns=present)
    arrays, fields = [], []
    for name in want:
        f = target.field(name)
        if name in have:
            arrays.append(t.column(name).cast(f.type))
        else:
            arrays.append(pa.nulls(t.num_rows, type=f.type))
        fields.append(f)
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def make_encrypted_reader(
    target_schema: pa.Schema, with_position: bool
):
    """mapInArrow task over rows of (path, key): decrypt-read each file,
    reconcile to ``target_schema``, optionally append __file/__pos.
    One whole file per input row — tasks decrypt independently, so the
    read parallelism is the file count (same unit the plain Spark
    parquet reader uses for small files)."""

    out_fields = list(target_schema)
    if with_position:
        out_fields += [
            pa.field("__file", pa.string()),
            pa.field("__pos", pa.int64()),
        ]
    out_schema = pa.schema(out_fields)

    def read_files(iterator):
        for batch in iterator:
            for i in range(batch.num_rows):
                path = batch.column("path")[i].as_py()
                key = batch.column("key")[i].as_py()
                pf = open_parquet(path, key)
                pos = 0
                for rb in pf.iter_batches(batch_size=65536):
                    t = read_table_with_schema(
                        _BatchAdapter(rb), target_schema
                    )
                    if with_position:
                        n = t.num_rows
                        t = t.append_column(
                            "__file", pa.array([path] * n, pa.string())
                        ).append_column(
                            "__pos",
                            pa.array(range(pos, pos + n), pa.int64()),
                        )
                        pos += n
                    t = t.cast(out_schema)
                    yield from t.to_batches()

    return read_files, out_schema


class _BatchAdapter:
    """Duck-typed ParquetFile stand-in so read_table_with_schema can
    reconcile a single streamed record batch."""

    def __init__(self, rb: pa.RecordBatch):
        self._t = pa.Table.from_batches([rb])
        self.schema_arrow = rb.schema

    def read(self, columns=None):
        return self._t.select(columns) if columns is not None else self._t


def make_encrypted_writer(
    out_dir: str,
    part_cols: list[str],
    compression: str | None,
    fixed_key_b64: str | None = None,
):
    """mapInArrow task: write this partition's rows as encrypted parquet
    under ``out_dir`` with a fresh random file key (or, for the
    user-managed ``COPY TO (ENCRYPTION_CONFIG …)`` surface,
    ``fixed_key_b64`` on every file), returning one row per written
    file: (path, key, partition values json).

    With ``part_cols`` (duplicated ``__part_<c>`` columns), rows are
    grouped within the task and one file per distinct partition tuple is
    written under hive-style dirs — callers repartition on the part
    columns first so each tuple lands in one task (same layout contract
    as the plain ``partitionBy`` path)."""
    import json

    def write_files(iterator):
        batches = list(iterator)
        out_rows_path, out_rows_key, out_rows_part = [], [], []
        if batches:
            tbl = pa.Table.from_batches(batches)
            if tbl.num_rows:
                groups: list[tuple[list[str] | None, pa.Table]] = []
                if part_cols:
                    import pyarrow.compute as pc

                    keys = tbl.select(part_cols)
                    data = tbl.drop_columns(part_cols)
                    # distinct partition tuples in this task
                    idx = keys.group_by(part_cols).aggregate([])
                    for j in range(idx.num_rows):
                        vals = [
                            idx.column(c)[j].as_py() for c in part_cols
                        ]
                        mask = None
                        for c, v in zip(part_cols, vals):
                            m = (
                                pc.is_null(keys.column(c))
                                if v is None
                                else pc.equal(keys.column(c), pa.scalar(v))
                            )
                            mask = m if mask is None else pc.and_(mask, m)
                        groups.append(
                            (
                                [None if v is None else str(v) for v in vals],
                                data.filter(mask),
                            )
                        )
                else:
                    groups.append((None, tbl))
                for vals, sub in groups:
                    if not sub.num_rows:
                        continue
                    leaf = out_dir
                    if vals is not None:
                        for c, v in zip(part_cols, vals):
                            seg = (
                                "__HIVE_DEFAULT_PARTITION__"
                                if v is None
                                else quote(v, safe="")
                            )
                            leaf = os.path.join(leaf, f"{c}={seg}")
                    os.makedirs(leaf, exist_ok=True)
                    path = os.path.join(
                        leaf, f"part-{uuid.uuid4().hex[:16]}.parquet"
                    )
                    key = fixed_key_b64 or new_file_key()
                    props = encryption_properties(key, sub.schema.names)
                    kwargs = {}
                    if compression:
                        kwargs["compression"] = compression
                    with pq.ParquetWriter(
                        path, sub.schema, encryption_properties=props, **kwargs
                    ) as w:
                        w.write_table(sub)
                    out_rows_path.append(path)
                    out_rows_key.append(key)
                    out_rows_part.append(
                        None if vals is None else json.dumps(vals)
                    )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_rows_path, pa.string()),
                pa.array(out_rows_key, pa.string()),
                pa.array(out_rows_part, pa.string()),
            ],
            names=["path", "key", "part"],
        )

    return write_files
