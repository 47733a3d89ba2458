"""Explicit schemas for the DuckLake catalog tables.

The reference never hardcodes these — it reflects them from DuckDB at
runtime (ducklakexl.py:238-241, 409-422).  The table set and columns come
from the public DuckLake v0.1 specification (ducklake.select,
"Specification → Tables"), which is what those reflected tables contain.
We keep the set data-driven the same way: everything iterates over
``CATALOG_SCHEMAS``, nothing assumes a fixed list elsewhere.

Pandas/pyarrow dtypes are chosen to survive the Excel string round-trip
the reference performs (nullable Int64 ≙ ducklakexl.py:413-417, naive
timestamps ≙ :418-421).
"""

from __future__ import annotations

import pyarrow as pa

_I = pa.int64()
_S = pa.string()
_B = pa.bool_()
_TS = pa.timestamp("us")

CATALOG_SCHEMAS: dict[str, pa.Schema] = {
    "ducklake_metadata": pa.schema([("key", _S), ("value", _S)]),
    "ducklake_snapshot": pa.schema(
        [
            ("snapshot_id", _I),
            ("snapshot_time", _TS),
            ("schema_version", _I),
            ("next_catalog_id", _I),
            ("next_file_id", _I),
        ]
    ),
    "ducklake_snapshot_changes": pa.schema(
        [("snapshot_id", _I), ("changes_made", _S)]
    ),
    "ducklake_schema": pa.schema(
        [
            ("schema_id", _I),
            ("schema_uuid", _S),
            ("begin_snapshot", _I),
            ("end_snapshot", _I),
            ("schema_name", _S),
        ]
    ),
    "ducklake_table": pa.schema(
        [
            ("table_id", _I),
            ("table_uuid", _S),
            ("begin_snapshot", _I),
            ("end_snapshot", _I),
            ("schema_id", _I),
            ("table_name", _S),
        ]
    ),
    "ducklake_view": pa.schema(
        [
            ("view_id", _I),
            ("view_uuid", _S),
            ("begin_snapshot", _I),
            ("end_snapshot", _I),
            ("schema_id", _I),
            ("view_name", _S),
            ("dialect", _S),
            ("sql", _S),
            ("column_aliases", _S),
        ]
    ),
    "ducklake_column": pa.schema(
        [
            ("column_id", _I),
            ("begin_snapshot", _I),
            ("end_snapshot", _I),
            ("table_id", _I),
            ("column_order", _I),
            ("column_name", _S),
            ("column_type", _S),
            ("initial_default", _S),
            ("default_value", _S),
            ("nulls_allowed", _B),
            ("parent_column", _I),
        ]
    ),
    "ducklake_data_file": pa.schema(
        [
            ("data_file_id", _I),
            ("table_id", _I),
            ("begin_snapshot", _I),
            ("end_snapshot", _I),
            ("file_order", _I),
            ("path", _S),
            ("path_is_relative", _B),
            ("file_format", _S),
            ("record_count", _I),
            ("file_size_bytes", _I),
            ("footer_size", _I),
            ("row_id_start", _I),
            ("partition_id", _I),
            ("encryption_key", _S),
            ("partial_file_info", _S),
        ]
    ),
    "ducklake_delete_file": pa.schema(
        [
            ("delete_file_id", _I),
            ("table_id", _I),
            ("begin_snapshot", _I),
            ("end_snapshot", _I),
            ("data_file_id", _I),
            ("path", _S),
            ("path_is_relative", _B),
            ("format", _S),
            ("delete_count", _I),
            ("file_size_bytes", _I),
            ("footer_size", _I),
            ("encryption_key", _S),
        ]
    ),
    "ducklake_file_column_statistics": pa.schema(
        [
            ("data_file_id", _I),
            ("table_id", _I),
            ("column_id", _I),
            ("column_size_bytes", _I),
            ("value_count", _I),
            ("null_count", _I),
            ("min_value", _S),
            ("max_value", _S),
            ("contains_nan", _B),
        ]
    ),
    "ducklake_table_stats": pa.schema(
        [
            ("table_id", _I),
            ("record_count", _I),
            ("next_row_id", _I),
            ("file_size_bytes", _I),
        ]
    ),
    "ducklake_table_column_stats": pa.schema(
        [
            ("table_id", _I),
            ("column_id", _I),
            ("contains_null", _B),
            ("contains_nan", _B),
            ("min_value", _S),
            ("max_value", _S),
        ]
    ),
    "ducklake_partition_info": pa.schema(
        [
            ("partition_id", _I),
            ("table_id", _I),
            ("begin_snapshot", _I),
            ("end_snapshot", _I),
        ]
    ),
    "ducklake_partition_column": pa.schema(
        [
            ("partition_id", _I),
            ("table_id", _I),
            ("partition_key_index", _I),
            ("column_id", _I),
            ("transform", _S),
        ]
    ),
    "ducklake_file_partition_value": pa.schema(
        [
            ("data_file_id", _I),
            ("table_id", _I),
            ("partition_key_index", _I),
            ("partition_value", _S),
        ]
    ),
    "ducklake_tag": pa.schema(
        [
            ("object_id", _I),
            ("begin_snapshot", _I),
            ("end_snapshot", _I),
            ("key", _S),
            ("value", _S),
        ]
    ),
    "ducklake_column_tag": pa.schema(
        [
            ("table_id", _I),
            ("column_id", _I),
            ("begin_snapshot", _I),
            ("end_snapshot", _I),
            ("key", _S),
            ("value", _S),
        ]
    ),
    # Data inlining (DuckLake spec "Data Inlining"): rows from small
    # inserts live in the catalog itself instead of spawning a tiny
    # parquet file each.  The spec shards these into per-table
    # ducklake_inlined_data_<n> tables; one shared table keyed by
    # table_id is the same data model without dynamic DDL against the
    # catalog store.  row_id comes from the table's next_row_id counter
    # (same id space as file rows), begin/end snapshots give the rows
    # full MVCC visibility/time travel, and row_json is the row payload
    # keyed by column name (schema-evolution tolerant: missing keys read
    # as NULL, like a data file written before an ADD COLUMN).
    "ducklake_inlined_data": pa.schema(
        [
            ("table_id", _I),
            ("row_id", _I),
            ("begin_snapshot", _I),
            ("end_snapshot", _I),
            ("row_json", _S),
        ]
    ),
    "ducklake_files_scheduled_for_deletion": pa.schema(
        [
            ("data_file_id", _I),
            ("table_id", _I),
            ("path", _S),
            ("path_is_relative", _B),
            ("schedule_start", _TS),
        ]
    ),
}


def sheet_name(table: str) -> str:
    """Excel sheet name for a catalog table: strip the leading 'ducklake_'
    once — Excel caps sheet names at 31 chars (ducklakexl.py:241)."""
    name = table.replace("ducklake_", "", 1)
    return name[:31]
