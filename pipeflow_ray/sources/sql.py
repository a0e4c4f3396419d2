"""SQL source/sink over DBAPI connections (reference: streaming
``ExecuteReader`` readers ``PipeFlow/Sql/SqlReader.cs:50-122`` /
``PostgreSQL/PostgreSqlReader.cs:81-202``, batched transactional INSERT
writers ``Sql/SqlWriter.cs:57-149``, upsert ``PostgreSqlWriter.cs:220-247``).

``read_sql`` delegates to ``ray.data.read_sql`` (connection factory runs in
the read tasks — e.g. ``sqlite3.connect``). ``write_sql`` is a batched
map_batches sink with per-batch transactions and optional
``INSERT OR REPLACE`` upsert — the reference's idempotency surface, which is
also what the exactly-once parquet sink generalizes.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

import ray.data


def read_sql(sql: str, connection_factory: Callable, **kw) -> ray.data.Dataset:
    return ray.data.read_sql(sql, connection_factory, **kw)


def write_sql(
    ds: ray.data.Dataset,
    table: str,
    connection_factory: Callable,
    upsert: bool = False,
    batch_size: int = 4096,
) -> int:
    """Batched INSERT (one transaction per batch, rollback on error —
    ``Sql/SqlWriter.cs:69-100``); ``upsert=True`` → ``INSERT OR REPLACE``
    keyed on the table's primary key (``PostgreSqlWriter.cs:220-247``).
    Returns rows written."""
    verb = "INSERT OR REPLACE" if upsert else "INSERT"

    def _write(batch: pd.DataFrame) -> pd.DataFrame:
        conn = connection_factory()
        try:
            cols = ", ".join(batch.columns)
            ph = ", ".join(["?"] * len(batch.columns))
            sql = f"{verb} INTO {table} ({cols}) VALUES ({ph})"
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
