"""SQL source/sink over DBAPI connections (reference: streaming
``ExecuteReader`` readers ``PipeFlow/Sql/SqlReader.cs:50-122`` /
``PostgreSQL/PostgreSqlReader.cs:81-202``, batched transactional INSERT
writers ``Sql/SqlWriter.cs:57-149``, upsert ``PostgreSqlWriter.cs:220-247``,
and the IQueryable/EF pushdown builder
``Builder/QueryablePipelineBuilder.cs:22-128`` with paged reads
``QueryablePipelineBuilder.cs:284-353``).

- :func:`read_sql` — Ray-native read of a fixed query (connection factory
  runs inside the read tasks).
- :func:`read_sql_params` — parameterized query (``SqlReader.WithParameter``,
  ``Sql/SqlReader.cs:36-43``): one Ray task executes with DBAPI qmark params.
- :func:`read_scalar` — ``ReadScalar<T>`` (``Sql/SqlReader.cs:101-122``):
  driver-side scalar with optional Python-type coercion.
- :class:`SqlQueryBuilder` — the IQueryable analog: Filter/Select/OrderBy/
  Take/Skip/Distinct are PUSHED INTO the SQL text (the database does the
  work, not the engine), and :meth:`read` pages the pushed-down query as
  parallel Ray tasks (``LIMIT page OFFSET k·page`` — the distributed form of
  the reference's sequential ``Skip/Take`` page loop).
- :func:`write_sql` — batched transactional INSERT / upsert sink.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import pyarrow as pa

import ray
import ray.data


def read_sql(sql: str, connection_factory: Callable, **kw) -> ray.data.Dataset:
    return ray.data.read_sql(sql, connection_factory, **kw)


@ray.remote
def _fetch_query_task(connection_factory: Callable, sql: str, params: tuple) -> pa.Table:
    """Execute one (possibly parameterized / paged) query inside a Ray task
    and return the result as an Arrow table.

    A zero-row result has null-typed columns (DBAPI cursor.description
    carries no portable types); callers that may concat such blocks with
    typed ones rely on Arrow's permissive null promotion. The builder's
    paged read sizes pages from COUNT(*) so empty pages only occur if the
    table shrinks mid-read."""
    conn = connection_factory()
    try:
        cur = conn.cursor()
        cur.execute(sql, params) if params else cur.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        conn.close()
    if not rows:
        return pa.table({c: pa.array([], pa.null()) for c in cols})
    df = pd.DataFrame(rows, columns=cols)
    return pa.Table.from_pandas(df, preserve_index=False)


def read_sql_params(
    sql: str, connection_factory: Callable, params: tuple | list = ()
) -> ray.data.Dataset:
    """Parameterized query via DBAPI placeholders (qmark style) — the analog
    of ``WithParameter`` (``Sql/SqlReader.cs:36-43``). The query runs in a
    Ray task; use :class:`SqlQueryBuilder` when the result is large enough to
    want paged parallel reads."""
    ref = _fetch_query_task.remote(connection_factory, sql, tuple(params))
    return ray.data.from_arrow_refs([ref])


def read_scalar(
    sql: str, connection_factory: Callable, params: tuple | list = (), cast: type | None = None
):
    """``ReadScalar<T>`` (``Sql/SqlReader.cs:101-122``): first column of the
    first row, optionally coerced; None when the result set is empty."""
    conn = connection_factory()
    try:
        cur = conn.cursor()
        cur.execute(sql, tuple(params)) if params else cur.execute(sql)
        row = cur.fetchone()
    finally:
        conn.close()
    if row is None or row[0] is None:
        return None
    return cast(row[0]) if cast else row[0]


class SqlQueryBuilder:
    """Fluent pushdown builder over one table — Filter/Select/OrderBy/Take/
    Skip/Distinct compile into the SQL the DATABASE executes
    (``Builder/QueryablePipelineBuilder.cs:22-128``); nothing is pulled and
    re-filtered engine-side.

    Predicates are parameterized fragments: ``where("age > ?", 25)`` — values
    always travel as DBAPI parameters, never interpolated.
    """

    def __init__(self, table: str):
        if not table:
            raise ValueError("table is required")
        self._table = table
        self._wheres: list[str] = []
        self._params: list = []
        self._select: list[str] | None = None
        self._order: list[str] = []
        self._limit: int | None = None
        self._offset: int | None = None
        self._distinct = False

    # --- fluent surface (each returns self, as the reference builders do) ---

    def where(self, condition: str, *params) -> "SqlQueryBuilder":
        self._wheres.append(f"({condition})")
        self._params.extend(params)
        return self

    filter = where  # reference aliases Filter == Where

    def select(self, *columns: str) -> "SqlQueryBuilder":
        self._select = list(columns)
        return self

    def order_by(self, column: str, descending: bool = False) -> "SqlQueryBuilder":
        self._order.append(f"{column} DESC" if descending else column)
        return self

    def take(self, n: int) -> "SqlQueryBuilder":
        if n < 0:
            raise ValueError("count must be non-negative")  # QueryablePipelineBuilder.cs:61
        self._limit = n
        return self

    def skip(self, n: int) -> "SqlQueryBuilder":
        if n < 0:
            raise ValueError("count must be non-negative")
        self._offset = n
        return self

    def distinct(self) -> "SqlQueryBuilder":
        self._distinct = True
        return self

    # --- compilation + execution ---

    def to_sql(self) -> tuple[str, tuple]:
        """Render the pushed-down query and its parameter tuple."""
        cols = ", ".join(self._select) if self._select else "*"
        head = "SELECT DISTINCT" if self._distinct else "SELECT"
        sql = f"{head} {cols} FROM {self._table}"
        if self._wheres:
            sql += " WHERE " + " AND ".join(self._wheres)
        if self._order:
            sql += " ORDER BY " + ", ".join(self._order)
        if self._limit is not None:
            sql += f" LIMIT {int(self._limit)}"
        if self._offset is not None:
            if self._limit is None:
                sql += " LIMIT -1"  # SQLite requires LIMIT before OFFSET
            sql += f" OFFSET {int(self._offset)}"
        return sql, tuple(self._params)

    def count(self, connection_factory: Callable) -> int:
        """Pushed-down COUNT(*) of the filtered query (no data transfer)."""
        sql = f"SELECT COUNT(*) FROM {self._table}"
        if self._wheres:
            sql += " WHERE " + " AND ".join(self._wheres)
        return int(read_scalar(sql, connection_factory, self._params) or 0)

    def read(
        self,
        connection_factory: Callable,
        page_size: int = 10_000,
        max_parallel_pages: int = 64,
        unique_key: str | None = None,
    ) -> ray.data.Dataset:
        """Paged partitioned read of the pushed-down query: a COUNT(*) sizes
        the page range, then every ``LIMIT page_size OFFSET k·page_size``
        page is fetched by its own Ray task — the parallel form of the
        reference's sequential page loop
        (``QueryablePipelineBuilder.cs:284-353``).

        LIMIT/OFFSET pages are only a consistent partition of the result
        under a TOTAL order: pass ``unique_key`` (a unique column, e.g. the
        primary key) as the tiebreaker — it is appended to the ORDER BY.
        Without one, the builder orders by the existing order_by (or the
        first selected column) and ties ordered differently by independent
        page queries can duplicate/drop rows; prefer ``unique_key``. The
        builder itself is left unmutated."""
        saved = (self._limit, self._offset, list(self._order))
        try:
            if not self._order:
                first = self._select[0] if self._select else "1"
                self.order_by(first)
            if unique_key is not None and unique_key not in [
                o.removesuffix(" DESC") for o in self._order
            ]:
                # note: with distinct() some engines (PostgreSQL) require the
                # ORDER BY key in the select list — include it there too
                self.order_by(unique_key)
            total = self.count(connection_factory)
            if self._offset:
                total = max(0, total - self._offset)
            if self._limit is not None:
                total = min(total, self._limit)
            if total == 0:
                return ray.data.from_items([])
            base_offset = self._offset or 0
            n_pages = min((total + page_size - 1) // page_size, max_parallel_pages)
            # large result + capped pages → grow the page instead of truncating
            eff_page = (total + n_pages - 1) // n_pages
            refs = []
            for k in range(n_pages):
                # clamp: when max_parallel_pages forces eff_page overshoot,
                # the tail page's remainder can reach 0/negative — a negative
                # LIMIT is "unbounded" to SQLite and would duplicate rows past
                # the requested take() (ADVICE r2)
                remaining = total - k * eff_page
                if remaining <= 0:
                    break
                self._limit = min(eff_page, remaining)
                self._offset = base_offset + k * eff_page
                sql, params = self.to_sql()
                refs.append(_fetch_query_task.remote(connection_factory, sql, params))
        finally:
            self._limit, self._offset, self._order = saved
        return ray.data.from_arrow_refs(refs)


def read_single(sql: str, connection_factory: Callable, params: tuple | list = ()) -> dict | None:
    """First row as a dict, or None (``SqlReader.ReadSingle``,
    ``Sql/SqlReader.cs:92-99``). Driver-side single fetch."""
    conn = connection_factory()
    try:
        cur = conn.cursor()
        cur.execute(sql, tuple(params)) if params else cur.execute(sql)
        row = cur.fetchone()
        if row is None:
            return None
        cols = [d[0] for d in cur.description]
        return dict(zip(cols, row))
    finally:
        conn.close()


def write_sql(
    ds: ray.data.Dataset,
    table: str,
    connection_factory: Callable,
    upsert: bool = False,
    upsert_keys: list[str] | None = None,
    batch_size: int = 4096,
) -> int:
    """Batched INSERT (one transaction per batch, rollback on error —
    ``Sql/SqlWriter.cs:69-100``). Upsert forms
    (``PostgreSqlWriter.cs:220-247``):

    - ``upsert=True`` alone → ``INSERT OR REPLACE`` keyed on the table's
      primary key (SQLite shorthand);
    - ``upsert_keys=[...]`` → ``ON CONFLICT (keys) DO UPDATE SET`` for every
      non-key column — the reference's PostgreSQL upsert, also valid on
      SQLite ≥ 3.24.

    Returns rows written."""

    def _write(batch: pd.DataFrame) -> pd.DataFrame:
        conn = connection_factory()
        try:
            cols = list(batch.columns)
            col_sql = ", ".join(cols)
            ph = ", ".join(["?"] * len(cols))
            if upsert_keys:
                updates = ", ".join(
                    f"{c} = excluded.{c}" for c in cols if c not in upsert_keys
                )
                keys = ", ".join(upsert_keys)
                sql = (f"INSERT INTO {table} ({col_sql}) VALUES ({ph}) "
                       f"ON CONFLICT ({keys}) DO UPDATE SET {updates}")
            else:
                verb = "INSERT OR REPLACE" if upsert else "INSERT"
                sql = f"{verb} INTO {table} ({col_sql}) VALUES ({ph})"
            cur = conn.cursor()
            try:
                cur.executemany(sql, batch.itertuples(index=False, name=None))
                conn.commit()
            except Exception:
                conn.rollback()
                raise
        finally:
            conn.close()
        return pd.DataFrame({"written": [len(batch)]})

    out = ds.map_batches(_write, batch_format="pandas", batch_size=batch_size)
    return int(out.to_pandas().written.sum())
