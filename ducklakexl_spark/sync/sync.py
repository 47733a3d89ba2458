"""Catalog ↔ workbook synchronization — the reference's _pull/_push
orchestration (ducklakexl.py:400-464, 512-536) over any WorkbookClient.

Bootstrap rule is the reference's (ducklakexl.py:248-296): ensure one
sheet per catalog table (names per the 31-char stripping rule); if ALL
sheets already existed → pull (adopt remote state); else → push (project
local state out).

Push is changed-tables-only: every push fingerprints each table's
serialized payload and rewrites only sheets whose payload differs from
the last synchronized state — the reference's README lists exactly this
delta-push as its planned optimization (README.md:160-163; its current
code clears+rewrites all ~19 sheets per statement).  A typical DML
statement touches 4-6 catalog tables, so this drops the per-statement
HTTP round-trips by ~3x on the OneDrive backend.
"""

from __future__ import annotations

import hashlib

from ducklakexl_spark.catalog.catalog import DuckLakeCatalog
from ducklakexl_spark.catalog.schemas import CATALOG_SCHEMAS, sheet_name
from ducklakexl_spark.catalog.store import conform
from ducklakexl_spark.sync.coercions import pull_coerce, push_serialize


def _fingerprint(header, rows) -> str:
    h = hashlib.md5()
    h.update("\x1f".join(header).encode())
    for r in rows:
        h.update(b"\x1e")
        h.update(
            "\x1f".join("" if v is None else str(v) for v in r).encode()
        )
    return h.hexdigest()


class WorkbookSync:
    def __init__(self, workbook):
        self.workbook = workbook
        self._sheet_for = {t: sheet_name(t) for t in CATALOG_SCHEMAS}
        # table -> fingerprint of the payload last known to be on the
        # remote sheet (written by us, or adopted by a pull)
        self._synced: dict[str, str] = {}

    def initialize(self, catalog: DuckLakeCatalog) -> None:
        existing = set(self.workbook.sheet_names())
        needed = set(self._sheet_for.values())
        missing = needed - existing
        for s in sorted(missing):
            self.workbook.create_sheet(s)
        if not missing and existing >= needed:
            self.pull(catalog)
        else:
            self.push(catalog)

    def pull(self, catalog: DuckLakeCatalog) -> None:
        """Workbook → catalog: read every sheet, coerce to declared dtypes,
        truncate-and-replace the catalog tables, atomic store commit.

        Backends exposing ``read_sheets`` get the concurrent per-sheet
        fan-out (one gather over ~19 sheets instead of serialized
        round-trips — the reference's _session_pull_all,
        ducklakexl.py:467-481); others fall back to sequential reads."""
        items = list(self._sheet_for.items())
        if hasattr(self.workbook, "read_sheets"):
            results = self.workbook.read_sheets([s for _t, s in items])
        else:
            results = [self.workbook.read_sheet(s) for _t, s in items]
        new_tables = {}
        for (t, _sheet), (header, rows) in zip(items, results):
            if not header:
                continue  # empty sheet: keep local table (fresh workbook)
            new_tables[t] = conform(t, pull_coerce(t, header, rows))
        if not new_tables:
            return
        # only adopt a remote state that is a valid catalog (has snapshots)
        snap = new_tables.get("ducklake_snapshot")
        if snap is None or snap.empty:
            return
        catalog.tables.update(new_tables)
        catalog.store.save(catalog.tables)
        # the adopted state IS the remote state: seed the dirty tracker so
        # the next push rewrites only tables the engine then mutates
        for t in self._sheet_for:
            self._synced[t] = _fingerprint(
                *push_serialize(t, catalog.tables[t])
            )

    def push(self, catalog: DuckLakeCatalog, force: bool = False) -> int:
        """Catalog → workbook: serialize every table, clear+rewrite the
        sheets whose payload CHANGED since the last sync (``force=True``
        rewrites all — used when remote state is unknown).  Concurrent
        fan-out via ``write_sheets`` when the backend has it (the
        reference's _session_push_all, ducklakexl.py:539-550).  Returns
        the number of sheets written."""
        dirty = []
        for t, sheet in self._sheet_for.items():
            header, rows = push_serialize(t, catalog.tables[t])
            fp = _fingerprint(header, rows)
            if force or self._synced.get(t) != fp:
                dirty.append((t, sheet, header, rows, fp))
        if not dirty:
            return 0
        payloads = [(sheet, header, rows) for _t, sheet, header, rows, _f in dirty]
        if hasattr(self.workbook, "write_sheets"):
            self.workbook.write_sheets(payloads)
        else:
            for sheet, header, rows in payloads:
                self.workbook.write_sheet(sheet, header, rows)
        for t, _sheet, _h, _r, fp in dirty:
            self._synced[t] = fp
        return len(dirty)
