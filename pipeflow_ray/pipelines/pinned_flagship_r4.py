"""FROZEN bench baseline — DO NOT EDIT (see bench.py A/B discipline).

A self-contained snapshot of the round-4 flagship pipeline (commit ffc7f36:
``pipelines/flagship.py`` + the ``stages/core.hash_exchange`` split task +
the ``state/manifest`` commit path it uses), kept import-isolated from the
live modules so future changes to the engine can never move this code.

Purpose (round-4 VERDICT "Next round" #1): absolute bench numbers on this
shared-host sandbox swing ±2-3× with external contention, so the driver's
recorded headline regressed two rounds running while interleaved A/B runs
showed no code regression. ``bench.py`` now runs THIS frozen pipeline
interleaved rep-by-rep with the live flagship in the same Ray session and
reports the ratio — like the scaling-efficiency metric, a same-session ratio
divides out host state and is reproducible when absolute walls are not.

Nothing outside ``bench.py`` imports this module.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

_TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


# --- frozen copy of stages/core.hash_exchange (flat path, r4) ---------------


@ray.remote
def _pinned_split_task(key_cols: list, num_buckets: int, *tbls: pa.Table):
    nonempty = [t for t in tbls if t.num_rows]
    if not nonempty:
        tbl = max(tbls, key=lambda t: t.num_columns)
        out = tuple(tbl.slice(0, 0) for _ in range(num_buckets))
        return out if num_buckets > 1 else out[0]
    tbl = nonempty[0] if len(nonempty) == 1 else pa.concat_tables(
        nonempty, promote_options="default")
    df = tbl.select(key_cols).to_pandas()
    h = pd.util.hash_pandas_object(df, index=False).to_numpy() % num_buckets
    order = np.argsort(h, kind="stable")
    t = tbl.take(pa.array(order))
    hs = h[order]
    bounds = np.searchsorted(hs, np.arange(num_buckets + 1))
    out = tuple(t.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(num_buckets))
    return out if num_buckets > 1 else out[0]


def _pinned_hash_exchange(ds, key_cols: list, num_buckets: int):
    refs = ds.to_arrow_refs()
    if not refs:
        return [[] for _ in range(num_buckets)]
    n_tasks = min(len(refs), num_buckets)
    groups = [list(g) for g in np.array_split(np.array(refs, dtype=object), n_tasks)]
    parts = [
        _pinned_split_task.options(num_returns=num_buckets).remote(key_cols, num_buckets, *g)
        for g in groups
    ]
    if num_buckets == 1:
        return [parts]
    return [[p[j] for p in parts] for j in range(num_buckets)]


# --- frozen copy of the flagship stages (r4) --------------------------------


def _pinned_normalize(t: pa.Table) -> pa.Table:
    text = pc.utf8_trim_whitespace(pc.fill_null(t["text"], ""))
    n_chars = pc.utf8_length(text)
    t = t.set_column(t.column_names.index("text"), "text", text)
    return t.append_column("n_chars", n_chars.cast(pa.int64()))


def _pinned_slim(t: pa.Table) -> pa.Table:
    role = t["role"]
    code = pc.if_else(
        pc.equal(role, "user"),
        pa.scalar(0, pa.int8()),
        pc.if_else(
            pc.is_in(role, value_set=pa.array(["assistant", "tool"])),
            pa.scalar(1, pa.int8()),
            pa.scalar(2, pa.int8()),
        ),
    )
    return pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "rc": code,
            "ts_us": t["ts"].cast(pa.int64()),
            "n_chars": t["n_chars"],
        }
    )


def _pinned_pair_and_window(g: pd.DataFrame, window_s: float) -> pd.DataFrame:
    window_us = int(window_s * 1_000_000)
    g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    nxt = g.shift(-1)
    same = nxt["conv_id"].to_numpy() == g["conv_id"].to_numpy()
    take = (g["rc"] == 0) & (nxt["rc"] == 1) & same & (nxt["turn_idx"] == g["turn_idx"] + 1)
    user_us = g.loc[take, "ts_us"].to_numpy()
    resp_us = nxt.loc[take, "ts_us"].to_numpy()
    pairs = pd.DataFrame(
        {
            "conv_id": g.loc[take, "conv_id"],
            "window_start": user_us // window_us * window_us,
            "latency_s": (resp_us - user_us) / 1e6,
            "user_chars": g.loc[take, "n_chars"].to_numpy(),
            "resp_chars": nxt.loc[take, "n_chars"].to_numpy(),
        }
    )
    gb = pairs.groupby(["conv_id", "window_start"], sort=False)
    out = gb.agg(
        n_pairs=("latency_s", "size"),
        mean_latency_s=("latency_s", "mean"),
        max_latency_s=("latency_s", "max"),
        user_chars=("user_chars", "sum"),
        resp_chars=("resp_chars", "sum"),
    ).reset_index()
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out


_PINNED_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("window_start", pa.timestamp("us")),
        ("n_pairs", pa.int64()),
        ("mean_latency_s", pa.float64()),
        ("max_latency_s", pa.float64()),
        ("user_chars", pa.int64()),
        ("resp_chars", pa.int64()),
    ]
)


def _pinned_reduce_table(slices, window_s: float) -> pa.Table:
    slices = [t for t in slices if t.num_rows]
    if not slices:
        return _PINNED_SCHEMA.empty_table()
    agg = _pinned_pair_and_window(pa.concat_tables(slices).to_pandas(), window_s)
    return pa.Table.from_pandas(agg, preserve_index=False).cast(_PINNED_SCHEMA)


# --- frozen copy of the manifest commit path (r4) ---------------------------


def _pinned_commit_partition(body: pa.Table, out_dir: str, pid: int) -> dict:
    t0 = time.perf_counter()
    mpath = os.path.join(out_dir, "_manifests", f"part-{pid:05d}.json")
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
    os.replace(tmp, final)
    nbytes = os.path.getsize(final)
    manifest = {
        "partition_id": pid,
        "file": os.path.basename(final),
        "rows": body.num_rows,
        "bytes": nbytes,
        "lineage": {"pipeline": "pinned_flagship_r4"},
        "wall_s": round(time.perf_counter() - t0, 4),
    }
    if body.num_rows:
        manifest["min_ts"] = str(pc.min(body["window_start"]).as_py())
        manifest["max_ts"] = str(pc.max(body["window_start"]).as_py())
    mtmp = mpath + "." + uuid.uuid4().hex
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(mtmp, mpath)
    return {"partition_id": pid, "rows": body.num_rows, "bytes": nbytes,
            "skipped": False, "wall_s": manifest["wall_s"]}


@ray.remote(max_retries=3, retry_exceptions=True)
def _pinned_agg_commit_task(pid: int, window_s: float, out_dir: str, *slices) -> dict:
    return _pinned_commit_partition(_pinned_reduce_table(slices, window_s), out_dir, pid)


def _pinned_read_blocks(path: str) -> int:
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    if os.path.isdir(path):
        n_files = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
        return min(n_files, 64)
    size = os.path.getsize(path)
    return max(cpus, size // (64 << 20))


def pinned_flagship(
    transcripts_path: str,
    out_dir: str,
    window_s: float = 3600.0,
    num_partitions: int = 64,
) -> pd.DataFrame:
    """The frozen r4 flagship chain (read → normalize/slim → one conv_id
    exchange → per-bucket pair + window-aggregate + exactly-once commit).
    Byte-equivalent to ``flagship_pipeline(..., return_windowed=False)`` as of
    commit ffc7f36. Returns the per-partition stats frame."""
    ds = ray.data.read_parquet(
        transcripts_path, columns=_TRANSCRIPT_COLUMNS,
        override_num_blocks=_pinned_read_blocks(transcripts_path),
    )
    ds = ds.map_batches(lambda t: _pinned_slim(_pinned_normalize(t)), batch_format="pyarrow")
    buckets = _pinned_hash_exchange(ds, ["conv_id"], num_partitions)

    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "_tmp"), exist_ok=True)
    futures = [
        _pinned_agg_commit_task.remote(j, window_s, out_dir, *b)
        for j, b in enumerate(buckets)
    ]
    rows = ray.get(futures)
    stats = pd.DataFrame(rows)
    return stats.sort_values("partition_id").reset_index(drop=True)
