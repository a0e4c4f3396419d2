"""Connector tour: SQL pushdown source → transform → keyed upsert sink,
formatted CSV/JSON output, cloud-style listing, typed REST deserialization.

Run: PYTHONPATH=/root/repo python examples/connectors_tour.py
"""

import json
import sqlite3
import tempfile
import os

import pyarrow as pa

import ray

from pipeflow_ray import Pipeline
from pipeflow_ray.sources import (
    CsvWriteOptions,
    SqlQueryBuilder,
    TypedApiReader,
    list_objects,
    read_scalar,
)
from pipeflow_ray.sources.writers import to_json_file


def main():
    work = tempfile.mkdtemp(prefix="pipeflow_tour_")
    db = os.path.join(work, "tour.db")

    # --- seed a database -------------------------------------------------
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE orders (id INTEGER PRIMARY KEY, region TEXT, amount REAL)")
    conn.executemany(
        "INSERT INTO orders VALUES (?,?,?)",
        [(i, ["emea", "apac", "amer"][i % 3], (i * 37) % 500 / 10) for i in range(2000)],
    )
    conn.execute("CREATE TABLE big_orders (id INTEGER PRIMARY KEY, region TEXT, amount REAL)")
    conn.commit()
    conn.close()
    factory = lambda: sqlite3.connect(db)  # noqa: E731

    # --- pushdown source: the DATABASE filters/orders/pages ---------------
    q = SqlQueryBuilder("orders").where("amount > ?", 30.0).order_by("id")
    print("pushed-down SQL:", q.to_sql()[0])
    print("server-side count:", q.count(factory))
    p = Pipeline.from_sql_builder(q, factory, page_size=256)

    # --- transform + keyed upsert back (ON CONFLICT DO UPDATE) -----------
    written = p.to_sql("big_orders", factory, upsert_keys=["id"])
    print("upserted:", written, "rows; re-run is idempotent:",
          p.to_sql("big_orders", factory, upsert_keys=["id"]))
    print("db total:", read_scalar("SELECT count(*) FROM big_orders", factory))

    # --- formatted sinks ---------------------------------------------------
    csv_dir = os.path.join(work, "csv_out")
    p.to_csv_formatted(csv_dir, CsvWriteOptions(delimiter="|"))
    print("csv files:", [o["path"].split("/")[-1] for o in list_objects(csv_dir)])
    summary = p.dataset.to_pandas().groupby("region").amount.sum().reset_index()
    to_json_file(pa.Table.from_pandas(summary), os.path.join(work, "summary.json"))
    print("json summary:", open(os.path.join(work, "summary.json")).read()[:120], "…")

    # --- typed REST reader (injected transport: no network needed) --------
    schema = pa.schema([("id", pa.int64()), ("name", pa.string())])
    fake = lambda url, hdrs: (200, json.dumps({"data": [{"Id": 1, "NAME": "a"}]}))  # noqa: E731
    t = TypedApiReader("http://svc/api", schema, fetch=fake).read_table()
    print("typed api:", t.to_pylist())


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    main()
    ray.shutdown()
