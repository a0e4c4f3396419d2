"""Exactly-once Parquet sink with per-partition commit manifests +
checkpoint/resume (SURVEY §2.6 Parquet row, §2.10).

Ray re-executes failed tasks automatically (lineage), which makes a naive
``write_parquet`` at-least-once: a retried write task appends a second copy of
its rows (observed directly — see ``.claude/skills/verify/SKILL.md`` gotchas).
The reference's idempotency surface is upsert-by-key
(``PipeFlow/PostgreSQL/PostgreSqlWriter.cs:220-247`` ``ON CONFLICT``); our
sink generalizes that to files:

1. rows are hash-partitioned by a deterministic key → partition id ``pid``;
2. each partition task writes to a temp file, fsyncs, atomically renames to
   the final deterministic path ``part-{pid}.parquet``;
3. the single atomic commit point is the rename of the per-partition
   **manifest** (JSON: pid, file, rows, bytes, ts bounds/watermark, input
   lineage, wall time) into ``_manifests/``;
4. a re-executed task (retry or resume) sees the committed manifest and
   no-ops — re-running the whole job skips finished partitions.

Output is a directory of per-partition files (never one giant file), so a
failed 100 TB run resumes by skipping committed partitions.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def _partition_id_column(part_by: str | list[str], num_partitions: int):
    cols = [part_by] if isinstance(part_by, str) else list(part_by)

    def _apply(t: pa.Table) -> pa.Table:
        if "__part" in t.column_names:  # idempotent under resume (prune → write)
            t = t.drop_columns(["__part"])
        df = t.select(cols).to_pandas()
        h = pd.util.hash_pandas_object(df, index=False).to_numpy()
        pid = (h % num_partitions).astype("int64")
        return t.append_column("__part", pa.array(pid, pa.int64()))

    return _apply


def _manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, "_manifests", f"part-{pid:05d}.json")


def completed_partitions(out_dir: str) -> dict[int, dict]:
    """Scan committed manifests → {pid: manifest}. The driver-side resume check."""
    mdir = os.path.join(out_dir, "_manifests")
    if not os.path.isdir(mdir):
        return {}
    out = {}
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            out[int(m["partition_id"])] = m
    return out


def filter_completed(
    ds: ray.data.Dataset, out_dir: str, part_by: str | list[str], num_partitions: int
) -> ray.data.Dataset:
    """Resume path: drop input rows belonging to already-committed partitions
    BEFORE any expensive compute (prune at the start, not at the sink)."""
    done = set(completed_partitions(out_dir))
    if not done:
        return ds
    done_arr = pa.array(sorted(done), pa.int64())

    def _prune(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.invert(pc.is_in(t["__part"], value_set=done_arr))
        return t.filter(mask)

    def _drop_part(t: pa.Table) -> pa.Table:
        return t.drop_columns(["__part"])

    # __part is dropped after pruning so the pruned dataset round-trips
    # through write_exactly_once (which re-derives it) without a duplicate
    # column (ADVICE r1)
    return (
        ds.map_batches(_partition_id_column(part_by, num_partitions), batch_format="pyarrow")
        .map_batches(_prune, batch_format="pyarrow")
        .map_batches(_drop_part, batch_format="pyarrow")
    )


def commit_partition(
    body: pa.Table,
    out_dir: str,
    pid: int,
    ts_col: str | None = None,
    lineage: dict | None = None,
) -> dict:
    """Commit one partition exactly-once: temp write → fsync → atomic data
    rename → atomic manifest rename (THE commit point). Idempotent: an
    existing manifest makes this a no-op. Usable from any task — the fused
    flagship bucket pass calls it directly."""
    t0 = time.perf_counter()
    mpath = _manifest_path(out_dir, pid)
    if os.path.exists(mpath):
        with open(mpath) as f:
            m = json.load(f)
        return {"partition_id": pid, "rows": m["rows"], "bytes": m["bytes"],
                "skipped": True, "wall_s": 0.0}
    final = os.path.join(out_dir, f"part-{pid:05d}.parquet")
    tmp = os.path.join(out_dir, "_tmp", f"part-{pid:05d}.{uuid.uuid4().hex}.parquet")
    pq.write_table(body, tmp)
    with open(tmp, "rb") as f:
        os.fsync(f.fileno())
    os.replace(tmp, final)  # deterministic final path: retries overwrite, never duplicate
    nbytes = os.path.getsize(final)
    manifest = {
        "partition_id": pid,
        "file": os.path.basename(final),
        "rows": body.num_rows,
        "bytes": nbytes,
        "lineage": lineage or {},
        "wall_s": round(time.perf_counter() - t0, 4),
    }
    if ts_col and ts_col in body.column_names and body.num_rows:
        import pyarrow.compute as pc

        manifest["min_ts"] = str(pc.min(body[ts_col]).as_py())
        manifest["max_ts"] = str(pc.max(body[ts_col]).as_py())
    mtmp = mpath + "." + uuid.uuid4().hex
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(mtmp, mpath)  # ← the atomic commit point
    return {"partition_id": pid, "rows": body.num_rows, "bytes": nbytes,
            "skipped": False, "wall_s": manifest["wall_s"]}


def prepare_sink(out_dir: str) -> None:
    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "_tmp"), exist_ok=True)


def write_exactly_once(
    ds: ray.data.Dataset,
    out_dir: str,
    part_by: str | list[str] = "conv_id",
    num_partitions: int = 32,
    ts_col: str | None = "ts",
    lineage: dict | None = None,
) -> pd.DataFrame:
    """Write *ds* as partitioned Parquet with exactly-once commit semantics.

    Returns a small per-partition stats frame (pid, rows, bytes, skipped,
    wall_s). Safe to call repeatedly: committed partitions are skipped, a
    crashed/partial write is atomically overwritten on retry.
    """
    prepare_sink(out_dir)
    lineage = lineage or {}

    with_pid = ds.map_batches(_partition_id_column(part_by, num_partitions), batch_format="pyarrow")

    def _commit(t: pa.Table) -> pa.Table:
        pid = int(t["__part"][0].as_py())
        s = commit_partition(t.drop_columns(["__part"]), out_dir, pid, ts_col, lineage)
        return pa.table({k: [v] for k, v in s.items()})

    stats = with_pid.groupby("__part").map_groups(_commit, batch_format="pyarrow").to_pandas()
    return stats.sort_values("partition_id").reset_index(drop=True)


def read_committed(out_dir: str) -> pa.Table:
    """Read back only committed partitions (files referenced by a manifest)
    as ONE driver-side Arrow table — small results only; at scale use
    :func:`read_committed_dataset`."""
    done = completed_partitions(out_dir)
    files = [os.path.join(out_dir, m["file"]) for m in done.values() if m["rows"] > 0]
    if not files:
        return pa.table({})
    return pa.concat_tables([pq.read_table(f) for f in sorted(files)])


def read_committed_dataset(out_dir: str) -> ray.data.Dataset:
    """Distributed read-back of committed partitions: a lazy
    ``ray.data.read_parquet`` over the manifest-listed files (one read task
    per partition file; nothing materializes on the driver)."""
    done = completed_partitions(out_dir)
    files = sorted(os.path.join(out_dir, m["file"]) for m in done.values() if m["rows"] > 0)
    if not files:
        return ray.data.from_items([])
    return ray.data.read_parquet(files)
