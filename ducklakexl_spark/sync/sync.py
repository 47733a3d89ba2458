"""Catalog ↔ workbook synchronization — the reference's _pull/_push
orchestration (ducklakexl.py:400-464, 512-536) over any WorkbookClient.

Bootstrap rule is the reference's (ducklakexl.py:248-296): ensure one
sheet per catalog table (names per the 31-char stripping rule); if ALL
sheets already existed → pull (adopt remote state); else → push (project
local state out).
"""

from __future__ import annotations

from ducklakexl_spark.catalog.catalog import DuckLakeCatalog
from ducklakexl_spark.catalog.schemas import CATALOG_SCHEMAS, sheet_name
from ducklakexl_spark.catalog.store import conform
from ducklakexl_spark.sync.coercions import pull_coerce, push_serialize


class WorkbookSync:
    def __init__(self, workbook):
        self.workbook = workbook
        self._sheet_for = {t: sheet_name(t) for t in CATALOG_SCHEMAS}

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

    def push(self, catalog: DuckLakeCatalog) -> None:
        """Catalog → workbook: serialize every table and clear+rewrite its
        sheet (full rewrite, matching the reference — README.md:160-163
        lists delta-push only as future work).  Concurrent fan-out via
        ``write_sheets`` when the backend has it (the reference's
        _session_push_all, ducklakexl.py:539-550)."""
        payloads = [
            (sheet, *push_serialize(t, catalog.tables[t]))
            for t, sheet in self._sheet_for.items()
        ]
        if hasattr(self.workbook, "write_sheets"):
            self.workbook.write_sheets(payloads)
        else:
            for sheet, header, rows in payloads:
                self.workbook.write_sheet(sheet, header, rows)
