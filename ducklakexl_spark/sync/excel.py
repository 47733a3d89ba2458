"""Workbook backends.

The reference picks a client by argument shape (_pick_client,
ducklakexl.py:85-97): OneDrive when drive_id is set, local .xlsx
otherwise.  Here the same switch lives in :func:`open_workbook`, and all
backends implement one small protocol so the sync logic (and the
reference's coercion quirks) is backend-independent and testable in this
container, which ships neither openpyxl nor aiohttp:

- CsvWorkbook  — a directory with one CSV per sheet.  Cells are strings,
  like Excel's; this is the test double AND a usable plain-text catalog
  mirror.
- XlsxWorkbook — openpyxl-backed local .xlsx (the reference's local mode,
  ducklakexl.py:427-453, 530-534), import-gated.
- OneDriveWorkbook — Microsoft Graph (see sync/graph.py), import-gated.
"""

from __future__ import annotations

import csv
import os
from typing import Protocol


class WorkbookClient(Protocol):
    def sheet_names(self) -> list[str]: ...

    def create_sheet(self, name: str) -> None: ...

    def read_sheet(self, name: str) -> tuple[list[str], list[list]]:
        """Returns (header, rows of string-or-None cells)."""
        ...

    def write_sheet(self, name: str, header: list[str], rows: list[list]) -> None:
        """Clear the sheet's used range and write header+rows
        (the reference's clear-then-PATCH, ducklakexl.py:553-583)."""
        ...


class CsvWorkbook:
    """Directory-of-CSVs workbook: one <sheet>.csv per sheet."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _file(self, name: str) -> str:
        return os.path.join(self.path, f"{name}.csv")

    def sheet_names(self) -> list[str]:
        return sorted(
            f[:-4] for f in os.listdir(self.path) if f.endswith(".csv")
        )

    def create_sheet(self, name: str) -> None:
        if not os.path.exists(self._file(name)):
            open(self._file(name), "w").close()

    def read_sheet(self, name: str) -> tuple[list[str], list[list]]:
        with open(self._file(name), newline="") as fh:
            reader = list(csv.reader(fh))
        if not reader:
            return [], []
        header = reader[0]
        rows = [[(c if c != "" else None) for c in r] for r in reader[1:]]
        return header, rows

    def write_sheet(self, name: str, header: list[str], rows: list[list]) -> None:
        tmp = self._file(name) + ".tmp"
        with open(tmp, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(header)
            for r in rows:
                w.writerow(["" if c is None else c for c in r])
        os.replace(tmp, self._file(name))


class XlsxWorkbook:
    """Local .xlsx via openpyxl (reference local mode).  Import-gated:
    the build container has no openpyxl; on real deployments this is the
    drop-in equivalent of pd.read_excel/ExcelWriter usage at
    ducklakexl.py:427-453, 530-534."""

    def __init__(self, path: str):
        try:
            import openpyxl  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "openpyxl is required for .xlsx workbooks; use a .csvdir "
                "path (CsvWorkbook) or install openpyxl"
            ) from e
        import openpyxl

        self._openpyxl = openpyxl
        self.path = path
        if not os.path.exists(path):
            wb = openpyxl.Workbook()
            wb.save(path)  # blank create-if-missing (ducklakexl.py:275-281)

    def _load(self):
        return self._openpyxl.load_workbook(self.path)

    def sheet_names(self) -> list[str]:
        return self._load().sheetnames

    def create_sheet(self, name: str) -> None:
        wb = self._load()
        if name not in wb.sheetnames:
            wb.create_sheet(name)
            wb.save(self.path)

    def read_sheet(self, name: str) -> tuple[list[str], list[list]]:
        ws = self._load()[name]
        it = ws.iter_rows(values_only=True)
        try:
            header = [str(c) if c is not None else "" for c in next(it)]
        except StopIteration:
            return [], []
        rows = [[None if c is None else str(c) for c in row] for row in it]
        return header, rows

    def write_sheet(self, name: str, header: list[str], rows: list[list]) -> None:
        wb = self._load()
        if name in wb.sheetnames:
            del wb[name]  # clear used range = replace sheet
        ws = wb.create_sheet(name)
        ws.append(header)
        for r in rows:
            ws.append(r)
        wb.save(self.path)


def open_workbook(target: str):
    """The reference's client switch (ducklakexl.py:85-97): https/graph →
    OneDrive, *.xlsx → local Excel; anything else → CSV-dir workbook."""
    if target.startswith("https://") or target.startswith("graph:"):
        from ducklakexl_spark.sync.graph import OneDriveWorkbook

        return OneDriveWorkbook(target)
    if target.endswith(".xlsx"):
        return XlsxWorkbook(target)
    return CsvWorkbook(target)
