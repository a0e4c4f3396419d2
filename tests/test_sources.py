"""Source/sink tests: CSV round-trip + quoting goldens (CsvTests.cs analogs),
JSON + path selection, SQL via sqlite, REST reader with fake transport
(ApiReaderGenericTests.cs analogs)."""

from __future__ import annotations

import json
import sqlite3

import pyarrow as pa
import pytest

import ray.data

from pipeflow_ray.sources.api import ApiReader, ApiWriter
from pipeflow_ray.sources.files import read_csv, read_json, select_path
from pipeflow_ray.sources.sql import read_sql, write_sql


# ---------------------------------------------------------------- CSV

def test_csv_roundtrip_with_quoting(tmp_path):
    # CsvTests.cs:143-167: quotes, commas, newlines must survive a round trip
    path = tmp_path / "in.csv"
    path.write_text('Id,Name,Notes\n1,Alice,"says ""hi"", then\nleaves"\n2,Bob,plain\n')
    rows = sorted(read_csv(str(path)).take_all(), key=lambda r: r["Id"])
    assert rows[0]["Notes"] == 'says "hi", then\nleaves'
    assert rows[1]["Name"] == "Bob"
    assert isinstance(rows[0]["Id"], int)  # auto type-conversion


def test_csv_headerless_synthesizes_columns(tmp_path):
    # CsvReader.cs:85-96: no header → Column{i}
    path = tmp_path / "nh.csv"
    path.write_text("1,x\n2,y\n")
    rows = read_csv(str(path), has_header=False).take_all()
    assert set(rows[0].keys()) == {"Column0", "Column1"}


def test_csv_custom_delimiter_and_trim(tmp_path):
    path = tmp_path / "d.csv"
    path.write_text("a;b\n 1 ; padded \n")
    rows = read_csv(str(path), delimiter=";").take_all()
    assert rows[0]["b"] == "padded"  # trimmed


# ---------------------------------------------------------------- JSON

def test_json_nested_and_select_path(tmp_path):
    path = tmp_path / "in.json"
    recs = [{"meta": {"user": {"name": "Alice", "age": 30}}, "v": 1},
            {"meta": {"user": {"name": "Bob", "age": 25}}, "v": 2}]
    path.write_text("\n".join(json.dumps(r) for r in recs))
    ds = read_json(str(path))
    assert ds.count() == 2
    users = select_path(ds, "$.meta.user").take_all()
    assert sorted(u["name"] for u in users) == ["Alice", "Bob"]
    assert all(isinstance(u["age"], int) for u in users)


# ---------------------------------------------------------------- SQL (sqlite)

def test_sql_roundtrip(tmp_path):
    db = str(tmp_path / "t.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE people (id INTEGER PRIMARY KEY, name TEXT, age INTEGER)")
    conn.executemany("INSERT INTO people VALUES (?,?,?)",
                     [(1, "Alice", 25), (2, "Bob", 30), (3, "Eve", 22)])
    conn.commit(); conn.close()

    ds = read_sql("SELECT * FROM people WHERE age >= 25", lambda: sqlite3.connect(db))
    assert sorted(r["name"] for r in ds.take_all()) == ["Alice", "Bob"]

    # write back to a second table, then upsert (idempotent second write)
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE out_people (id INTEGER PRIMARY KEY, name TEXT, age INTEGER)")
    conn.commit(); conn.close()
    full = read_sql("SELECT * FROM people", lambda: sqlite3.connect(db))
    assert write_sql(full, "out_people", lambda: sqlite3.connect(db, timeout=30), upsert=True) == 3
    n1 = sqlite3.connect(db).execute("SELECT count(*) FROM out_people").fetchone()[0]
    full2 = read_sql("SELECT * FROM people", lambda: sqlite3.connect(db))
    write_sql(full2, "out_people", lambda: sqlite3.connect(db, timeout=30), upsert=True)
    n2 = sqlite3.connect(db).execute("SELECT count(*) FROM out_people").fetchone()[0]
    assert n1 == n2 == 3  # upsert keyed on pk → no duplicates


# ---------------------------------------------------------------- REST (fake transport)

def _pages_transport(pages: dict[int, list[dict]], fail_first: int = 0):
    calls = {"n": 0}

    def fetch(url: str, headers: dict) -> tuple[int, str]:
        calls["n"] += 1
        if calls["n"] <= fail_first:
            return 500, "boom"
        page = 1
        if "page=" in url:
            page = int(url.split("page=")[1].split("&")[0])
        return 200, json.dumps({"data": pages.get(page, [])})

    fetch.calls = calls
    return fetch


def test_api_reader_pagination_and_envelope():
    pages = {1: [{"id": 1}, {"id": 2}], 2: [{"id": 3}]}
    r = ApiReader("http://x/api", fetch=_pages_transport(pages))
    rows = r.read_paginated(page_size=2)
    assert [x["id"] for x in rows] == [1, 2, 3]  # stops at short page


def test_api_reader_retry_until_success():
    # ApiReaderGenericTests: fail twice then succeed
    fetch = _pages_transport({1: [{"ok": True}]}, fail_first=2)
    r = ApiReader("http://x/api", max_retries=3, retry_delay_s=0.01, fetch=fetch)
    assert r.read() == [{"ok": True}]
    assert fetch.calls["n"] == 3


def test_api_reader_throws_after_max_retries():
    fetch = _pages_transport({}, fail_first=99)
    r = ApiReader("http://x/api", max_retries=3, retry_delay_s=0.01, fetch=fetch)
    with pytest.raises(RuntimeError, match="failed after 3 attempts"):
        r.read()


def test_api_reader_auth_header_and_ctor_contract():
    seen = {}

    def fetch(url, headers):
        seen.update(headers)
        return 200, "[]"

    ApiReader("http://x", auth_token="tok", fetch=fetch).with_header("X-C", "1").read()
    assert seen["Authorization"] == "Bearer tok" and seen["X-C"] == "1"
    with pytest.raises(ValueError):
        ApiReader("")


def test_api_reader_parallel_pages_dataset():
    pages = {p: [{"id": p * 10 + i} for i in range(2)] for p in range(1, 4)}
    r = ApiReader("http://x/api", fetch=_pages_transport(pages))
    ds = r.to_dataset(num_pages=3, page_size=2)
    assert sorted(x["id"] for x in ds.take_all()) == [10, 11, 20, 21, 30, 31]


def test_api_writer_batched_post(tmp_path):
    # posts run in Ray workers → observe them through the filesystem
    log = str(tmp_path / "posts.jsonl")

    def post(url, headers, body):
        with open(log, "a") as f:
            f.write(body + "\n")
        return 200

    w = ApiWriter("http://x/bulk", batch_size=2, post=post)
    n = w.write(ray.data.from_items([{"i": i} for i in range(5)]))
    assert n == 5
    batches = [json.loads(line) for line in open(log)]
    assert sum(len(b) for b in batches) == 5
    assert all(len(b) <= 2 for b in batches)  # batched posts
