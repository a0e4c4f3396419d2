"""REST API source/sink (reference ``PipeFlow/Api/ApiReader.cs:35-141`` /
``ApiWriter.cs:62-144``): auth header, custom headers, retry with linear
backoff (``delay × attempt``, max 3 — ``ApiReader.cs:95-141``), page-loop
pagination (``page``/``pageSize`` params until an empty page,
``ApiReader.cs:54-93``), and ``data``/``results``/``items`` envelope
unwrapping (``ApiReader.cs:159-187``).

The transport is injectable (``fetch(url, headers) -> (status, body)``) so
behavior is unit-testable without a network — the analog of the reference's
mocked ``HttpMessageHandler`` tests (``ApiReaderGenericTests.cs:96-288``).
The default transport uses stdlib urllib; this sandbox has no network, so
only injected transports are exercised in tests.

Distribution: page fetches fan out as Ray tasks
(``from_items(pages).flat_map(fetch)``) once the page-count probe completes.
"""

from __future__ import annotations

import json
import time
from typing import Callable

import pyarrow as pa

import ray.data

ENVELOPE_KEYS = ("data", "results", "items")  # ApiReader.cs:159-187


def _default_fetch(url: str, headers: dict) -> tuple[int, str]:  # pragma: no cover
    import urllib.request

    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status, resp.read().decode("utf-8")


def _unwrap(doc) -> list[dict]:
    if isinstance(doc, list):
        return doc
    if isinstance(doc, dict):
        for k in ENVELOPE_KEYS:
            if isinstance(doc.get(k), list):
                return doc[k]
        return [doc]
    return []


class ApiReader:
    def __init__(
        self,
        url: str,
        auth_token: str | None = None,
        headers: dict | None = None,
        max_retries: int = 3,
        retry_delay_s: float = 1.0,
        fetch: Callable[[str, dict], tuple[int, str]] | None = None,
    ):
        if not url:
            raise ValueError("url is required")  # ctor null-arg contract, ApiTests.cs
        self.url = url
        self.headers = dict(headers or {})
        if auth_token:
            self.headers["Authorization"] = f"Bearer {auth_token}"
        self.max_retries = max_retries
        self.retry_delay_s = retry_delay_s
        self.fetch = fetch or _default_fetch

    def with_header(self, key: str, value: str) -> "ApiReader":
        self.headers[key] = value
        return self  # fluent chaining returns self (reference contract)

    def _get(self, url: str) -> list[dict]:
        """One GET with linear-backoff retry (delay × attempt, ApiReader.cs:95-141)."""
        last_err: Exception | None = None
        for attempt in range(1, self.max_retries + 1):
            try:
                status, body = self.fetch(url, self.headers)
                if status >= 400:
                    raise RuntimeError(f"HTTP {status}")
                return _unwrap(json.loads(body))
            except Exception as e:  # noqa: BLE001 — retry then surface
                last_err = e
                if attempt < self.max_retries:
                    time.sleep(self.retry_delay_s * attempt)
        raise RuntimeError(f"GET {url} failed after {self.max_retries} attempts") from last_err

    def read(self) -> list[dict]:
        """Single-request read (no pagination)."""
        return self._get(self.url)

    def read_paginated(self, page_size: int = 100, max_pages: int = 10_000) -> list[dict]:
        """Page loop until an empty page (ApiReader.cs:54-93). Driver-side
        sequential probe — use :meth:`to_dataset` for parallel fetch once the
        page range is known."""
        sep = "&" if "?" in self.url else "?"
        rows: list[dict] = []
        for page in range(1, max_pages + 1):
            got = self._get(f"{self.url}{sep}page={page}&pageSize={page_size}")
            if not got:
                break
            rows.extend(got)
            if len(got) < page_size:
                break
        return rows

    def to_dataset(self, num_pages: int, page_size: int = 100) -> ray.data.Dataset:
        """Known page range → parallel page fetches as Ray tasks."""
        sep = "&" if "?" in self.url else "?"
        reader = self

        def _fetch_page(row: dict) -> list[dict]:
            return reader._get(f"{reader.url}{sep}page={row['page']}&pageSize={page_size}")

        pages = ray.data.from_items([{"page": p} for p in range(1, num_pages + 1)])
        return pages.flat_map(_fetch_page)


def rows_to_table(rows: list[dict], schema: "pa.Schema") -> "pa.Table":
    """Deserialize JSON dicts into a TYPED Arrow table: case-insensitive
    field matching (the reference deserializes with
    ``PropertyNameCaseInsensitive = true``, ``Api/ApiReaderGeneric.cs:30-36``),
    missing fields → null, values coerced to the declared type."""
    cols: dict[str, list] = {f.name: [] for f in schema}
    lower_map = {f.name.lower(): f.name for f in schema}
    for row in rows:
        found = {}
        for k, v in (row or {}).items():
            name = lower_map.get(str(k).lower())
            if name is not None:
                found[name] = v
        for f in schema:
            cols[f.name].append(found.get(f.name))
    arrays = []
    for f in schema:
        try:
            arrays.append(pa.array(cols[f.name], type=f.type))
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            # per-value coercion fallback (Convert.ChangeType analog,
            # ApiReaderGeneric.cs typed deserialization contract)
            coerced = []
            py = float if pa.types.is_floating(f.type) else (
                int if pa.types.is_integer(f.type) else str)
            for v in cols[f.name]:
                if v is None:
                    coerced.append(None)
                else:
                    try:
                        coerced.append(py(v))
                    except (TypeError, ValueError):
                        coerced.append(None)
            arrays.append(pa.array(coerced, type=f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


class TypedApiReader(ApiReader):
    """Schema-typed REST reader (``Api/ApiReaderGeneric.cs:59-110``): same
    auth/retry/pagination/envelope surface as :class:`ApiReader`, but results
    deserialize into a typed Arrow table / Dataset instead of raw dicts."""

    def __init__(self, url: str, schema: "pa.Schema", **kw):
        super().__init__(url, **kw)
        if schema is None or len(schema) == 0:
            raise ValueError("schema is required")
        self.schema = schema

    def read_table(self) -> "pa.Table":
        return rows_to_table(self.read(), self.schema)

    def read_paginated_table(self, page_size: int = 100, **kw) -> "pa.Table":
        return rows_to_table(self.read_paginated(page_size=page_size, **kw), self.schema)

    def to_dataset(self, num_pages: int, page_size: int = 100) -> ray.data.Dataset:
        """Parallel typed page fetches: each Ray task deserializes its page
        against the shared schema → schema-stable blocks."""
        sep = "&" if "?" in self.url else "?"
        reader = self

        def _fetch_page(t: pa.Table) -> pa.Table:
            out = []
            for p in t["page"].to_pylist():
                rows = reader._get(f"{reader.url}{sep}page={p}&pageSize={page_size}")
                out.append(rows_to_table(rows, reader.schema))
            return pa.concat_tables(out)

        pages = ray.data.from_arrow(pa.table({"page": list(range(1, num_pages + 1))}))
        return pages.map_batches(_fetch_page, batch_format="pyarrow")


class ApiWriter:
    """JSON POST sink, single or batched (``ApiWriter.cs:62-144``)."""

    def __init__(
        self,
        url: str,
        auth_token: str | None = None,
        headers: dict | None = None,
        batch_size: int = 100,
        post: Callable[[str, dict, str], int] | None = None,
    ):
        if not url:
            raise ValueError("url is required")
        self.url = url
        self.headers = dict(headers or {})
        if auth_token:
            self.headers["Authorization"] = f"Bearer {auth_token}"
        self.batch_size = batch_size
        if post is None:  # pragma: no cover — no network in sandbox
            raise NotImplementedError("provide post=... (no network in this environment)")
        self.post = post

    def write(self, ds: ray.data.Dataset) -> int:
        writer = self

        def _send(batch) -> "ray.data.Dataset":
            import pandas as pd

            rows = batch.to_dict("records")
            status = writer.post(writer.url, writer.headers, json.dumps(rows))
            if status >= 400:
                raise RuntimeError(f"HTTP {status}")
            return pd.DataFrame({"written": [len(rows)]})

        out = ds.map_batches(_send, batch_format="pandas", batch_size=self.batch_size)
        return int(out.to_pandas().written.sum())
