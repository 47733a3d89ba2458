"""The type-coercion rules that ARE the semantic content of the
reference's sync plane (SURVEY §1.1 coercion table).

Workbook cells are stringly typed; the catalog declares dtypes.  Pull
coerces strings back to declared dtypes exactly like the reference:

- int columns → nullable Int64, blank cell ⇒ NULL      (ducklakexl.py:413-417)
- timestamps → tz-naive                                 (ducklakexl.py:418-421)
- bools arrive as strings: 't*'→True, 'f*'→False, else NULL
                                                        (ducklakexl.py:434-453)
- '' → None in non-string columns                       (ducklakexl.py:497)

Push stringifies and maps NA forms {'<NA>','nan','None','NaT'} → None
(ducklakexl.py:567-568), strips timezones (ducklakexl.py:520-524), and
lower-cases metadata.value for key='encrypted' so the Excel bool
round-trip stays stable (ducklakexl.py:501-505).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ducklakexl_spark.catalog.schemas import CATALOG_SCHEMAS

NA_FORMS = {"<NA>", "nan", "None", "NaT", ""}


def _coerce_bool(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if not s:
        return None
    if s.startswith("t"):
        return True
    if s.startswith("f"):
        return False
    return None


def pull_coerce(table: str, header: list[str], rows: list[list]) -> pd.DataFrame:
    """Raw sheet cells (list of row-lists, all strings/None) → typed frame."""
    schema = CATALOG_SCHEMAS[table]
    cols = {name: [] for name in header}
    for row in rows:
        for name, v in zip(header, row):
            cols[name].append(v)
    out = {}
    for field in schema:
        raw = cols.get(field.name, [None] * len(rows))
        clean = [None if (v is None or str(v) in NA_FORMS) else v for v in raw]
        if pa.types.is_integer(field.type):
            out[field.name] = pd.array(
                [None if v is None else int(float(v)) for v in clean],
                dtype="Int64",
            )
        elif pa.types.is_boolean(field.type):
            out[field.name] = pd.array(
                [_coerce_bool(v) for v in clean], dtype="boolean"
            )
        elif pa.types.is_timestamp(field.type):
            s = pd.to_datetime(pd.Series(clean, dtype="object"), errors="coerce")
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            out[field.name] = s
        elif pa.types.is_floating(field.type):
            out[field.name] = pd.array(
                [None if v is None else float(v) for v in clean], dtype="Float64"
            )
        else:
            out[field.name] = pd.array(
                [None if v is None else str(v) for v in clean], dtype="string"
            )
    df = pd.DataFrame(out, columns=[f.name for f in schema])
    if table == "ducklake_metadata" and len(df):
        enc = df["key"] == "encrypted"
        df.loc[enc, "value"] = df.loc[enc, "value"].str.lower()
    return df


def push_serialize(table: str, df: pd.DataFrame) -> tuple[list[str], list[list]]:
    """Typed catalog frame → (header, string cell rows) for the workbook."""
    schema = CATALOG_SCHEMAS[table]
    header = [f.name for f in schema]
    work = df.copy()
    if table == "ducklake_metadata" and len(work):
        enc = work["key"] == "encrypted"
        work.loc[enc, "value"] = work.loc[enc, "value"].astype(str).str.lower()
    rows = []
    for tup in work.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and pd.isna(v)) or pd.isna(v):
                row.append(None)
            elif isinstance(v, pd.Timestamp):
                ts = v.tz_convert("UTC").tz_localize(None) if v.tzinfo else v
                row.append(ts.isoformat(sep=" "))
            else:
                s = str(v)
                row.append(None if s in NA_FORMS else s)
        rows.append(row)
    return header, rows
