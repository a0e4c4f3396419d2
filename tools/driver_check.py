"""Local simulation of the driver's correctness gate: run every queries()
entry at a given sf and compare against oracle_sql() via DuckDB —
row-count + schema + order-insensitive value hash.

Usage: PYTHONPATH=/root/repo python tools/driver_check.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1).tolist())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main(sf_dir: str):
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    results = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            mine = to_pandas(fn(sf_dir))
            wall = time.perf_counter() - t0
            if name not in oracles:
                results[name] = ("ROWS_ONLY", len(mine), round(wall, 2))
                continue
            ref = con.execute(oracles[name]).df()
            schema_ok = sorted(mine.columns) == sorted(ref.columns)
            rows_ok = len(mine) == len(ref)
            hash_ok = value_hash(mine) == value_hash(ref) if (schema_ok and rows_ok) else False
            status = "OK" if (schema_ok and rows_ok and hash_ok) else "MISMATCH"
            results[name] = (status, f"rows {len(mine)}/{len(ref)} schema={schema_ok} hash={hash_ok}", round(wall, 2))
        except Exception as e:  # noqa: BLE001
            results[name] = ("ERROR", str(e)[:200], round(time.perf_counter() - t0, 2))

    fails = 0
    for name, (status, detail, wall) in sorted(results.items()):
        mark = {"OK": "✓", "ROWS_ONLY": "·", "MISMATCH": "✗", "ERROR": "!"}[status]
        if status in ("MISMATCH", "ERROR"):
            fails += 1
        print(f"{mark} {name:32s} {status:10s} {detail} [{wall}s]")
    print(f"\n{len(results)} queries, {fails} failing")
    ray.shutdown()
    return fails


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01") else 0)
