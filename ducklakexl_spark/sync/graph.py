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
import os
import random
import threading

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

    async def request(
        self, transport, method, url, *, refresh_token=None, retry_404=True, **kw
    ):
        """transport(method, url, **kw) -> (status, headers, body).

        ``retry_404=False`` disables the eventual-consistency 404 ladder
        for probes where 404 is a meaningful answer (file-existence
        checks before create-if-missing)."""
        n404 = n401 = 0
        while True:
            status, headers, body = await transport(method, url, **kw)
            if status == 404 and retry_404 and n404 < self.MAX_404:
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


class MsalTokenProvider:
    """Production login path mirroring the reference's MSAL public-client
    flow (ducklakexl.py:100-176): CLIENT_ID from the environment (.env
    honored when python-dotenv is installed), consumers authority,
    Files.ReadWrite (+ Files.ReadWrite.All for shared files) scopes,
    in-memory token cache, silent acquisition with interactive fallback.
    Import-gated: msal is not in this container, so construction raises
    a clear ImportError and tests inject fakes instead."""

    AUTHORITY = "https://login.microsoftonline.com/consumers"

    def __init__(
        self,
        client_id: str | None = None,
        scopes: list[str] | None = None,
        read_shared_files: bool = False,
    ):
        try:
            import msal
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "msal is required for the OneDrive login path; pass a "
                "token_provider/transport for testing or install msal"
            ) from e
        try:  # .env support, optional exactly like the reference
            from dotenv import load_dotenv

            load_dotenv()
        except ImportError:
            pass
        client_id = client_id or os.getenv("CLIENT_ID")
        if not client_id:
            raise ValueError(
                "CLIENT_ID not provided and not found in the environment"
            )
        self.scopes = scopes or ["Files.ReadWrite", "User.Read"]
        if read_shared_files and "Files.ReadWrite.All" not in self.scopes:
            self.scopes.append("Files.ReadWrite.All")
        self.cache = msal.TokenCache()
        self.app = msal.PublicClientApplication(
            client_id, authority=self.AUTHORITY, token_cache=self.cache
        )

    def token(self, force_refresh: bool = False) -> str:
        accounts = self.app.get_accounts()
        result = self.app.acquire_token_silent(
            self.scopes, account=accounts[0] if accounts else None
        )
        if not result or force_refresh:
            result = self.app.acquire_token_interactive(scopes=self.scopes)
        if not result or "access_token" not in result:
            raise RuntimeError(
                f"authentication failed: {(result or {}).get('error_description')}"
            )
        return result["access_token"]

    def headers(self) -> dict:
        return {"Authorization": f"Bearer {self.token()}"}

    async def refresh(self) -> None:
        self.token(force_refresh=True)


class AiohttpTransport:
    """Default production transport: aiohttp session per request with the
    token provider's Bearer header; returns (status, headers, json_body)
    in the shape RetryPolicy expects.  Import-gated."""

    def __init__(self, token_provider=None, ssl_context=None):
        import aiohttp  # raises ImportError outside production envs

        self._aiohttp = aiohttp
        self.token_provider = token_provider
        self.ssl_context = ssl_context

    async def __call__(self, method, url, **kw):
        headers = dict(kw.pop("headers", {}) or {})
        if self.token_provider is not None:
            headers.update(self.token_provider.headers())
        connector = self._aiohttp.TCPConnector(
            ssl=self.ssl_context, force_close=True
        )
        async with self._aiohttp.ClientSession(connector=connector) as session:
            async with session.request(
                method, url, headers=headers, **kw
            ) as resp:
                try:
                    body = await resp.json(content_type=None)
                except Exception:
                    body = await resp.text()
                return resp.status, dict(resp.headers), body


def blank_xlsx_bytes() -> bytes:
    """A minimal empty workbook for PUT create-if-missing (the Graph API
    cannot create an empty .xlsx directly — ducklakexl.py:586-595).
    Uses openpyxl when present; otherwise hand-assembles the smallest
    valid OOXML package (xlsx = zip of four XML parts), so workbook
    creation works even without the optional dependency."""
    import io

    try:
        import openpyxl

        buf = io.BytesIO()
        openpyxl.Workbook().save(buf)
        return buf.getvalue()
    except ImportError:
        pass
    import zipfile

    parts = {
        "[Content_Types].xml": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            "</Types>"
        ),
        "_rels/.rels": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>"
        ),
        "xl/workbook.xml": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
            "</workbook>"
        ),
        "xl/_rels/workbook.xml.rels": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
            "</Relationships>"
        ),
        "xl/worksheets/sheet1.xml": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<sheetData/></worksheet>"
        ),
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, xml in parts.items():
            z.writestr(name, xml)
    return buf.getvalue()


class OneDriveWorkbook:
    """Graph-backed workbook.  Requires aiohttp + MSAL at runtime; the
    sheet-level protocol (sheet_names/create_sheet/read_sheet/write_sheet)
    matches the other backends so WorkbookSync is oblivious.

    ``target`` accepts three forms (ducklakexl.py:185-228):
    - an item path (``/drives/<d>/items/<i>`` or ``/me/drive/items/<i>``),
      used as-is;
    - a ``{drive}!{item}`` resource id — the drive id is the prefix before
      ``!`` and the whole string is the item id;
    - a bare filename, resolved (and optionally created — PUT of a blank
      xlsx, ducklakexl.py:586-628) under ``drive_id``/``folder_path``.
    """

    def __init__(
        self,
        target: str,
        transport=None,
        token_provider=None,
        drive_id: str | None = None,
        folder_path: str | None = None,
        create_if_missing: bool = False,
    ):
        if transport is None and token_provider is None:
            # production wiring: MSAL login + aiohttp, both import-gated
            token_provider = MsalTokenProvider()
        if transport is None:
            transport = AiohttpTransport(token_provider)  # needs aiohttp
        self.transport = transport
        self.token_provider = token_provider
        self.drive_id = drive_id
        self.folder_path = folder_path
        self.create_if_missing = create_if_missing
        self.retry = RetryPolicy()
        self._loop = asyncio.new_event_loop()
        self._thread: threading.Thread | None = None
        self.target = self._resolve_target(target)

    def _run(self, coro):
        try:
            asyncio.get_running_loop()
        except RuntimeError:
            return self._loop.run_until_complete(coro)
        # called with a loop already running in this thread (Jupyter):
        # run_until_complete would raise, so drive our private loop from
        # a background thread instead (fixes ducklakexl.py:68-71, whose
        # loop reuse still requires nest_asyncio in notebooks)
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(
                target=self._loop.run_forever, daemon=True
            )
            self._thread.start()
        return asyncio.run_coroutine_threadsafe(coro, self._loop).result()

    # --- item resolution ---

    def _resolve_target(self, target: str) -> str:
        if target.startswith("/"):
            return target
        if "!" in target:
            drive = target.split("!", 1)[0]
            return f"/drives/{drive}/items/{target}"
        if not self.drive_id:
            raise ValueError(
                "drive_id must be specified to resolve a OneDrive filename"
            )
        item_id = self._run(self._get_or_create_item(target))
        return f"/drives/{self.drive_id}/items/{item_id}"

    async def _get_or_create_item(self, fname: str) -> str:
        folder = (self.folder_path or "").strip("/")
        root_path = (
            f"/drives/{self.drive_id}/root:/"
            + (f"{folder}/" if folder else "")
            + fname
        )
        refresh = getattr(self.token_provider, "refresh", None)
        status, _h, body = await self.retry.request(
            self.transport,
            "GET",
            f"{GRAPH_ROOT}{root_path}",
            refresh_token=refresh,
            retry_404=False,
        )
        if status == 200:
            return body["id"]
        if status != 404:
            raise RuntimeError(f"graph GET {root_path} -> {status}: {body}")
        if not self.create_if_missing:
            raise FileNotFoundError(
                f"'{fname}' not found on OneDrive and create_if_missing=False"
            )
        status, _h, body = await self.retry.request(
            self.transport,
            "PUT",
            f"{GRAPH_ROOT}{root_path}:/content",
            refresh_token=refresh,
            retry_404=False,
            data=blank_xlsx_bytes(),
        )
        if status >= 400:
            raise RuntimeError(
                f"graph PUT {root_path}:/content -> {status}: {body}"
            )
        return body["id"]

    # --- async core (fan-out mirrors _session_pull_all/_session_push_all) ---

    async def _req(self, method, path, **kw):
        refresh = getattr(self.token_provider, "refresh", None)
        status, headers, body = await self.retry.request(
            self.transport,
            method,
            f"{GRAPH_ROOT}{path}",
            refresh_token=refresh,
            **kw,
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
