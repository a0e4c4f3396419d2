"""Deterministic synthetic fixtures (FIXTURES.md).

F1 ``transcripts`` — the flagship input table (BASELINE.json ``input_hint``):
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])`` with zipf-skewed conversation lengths (hot keys for skew
salting), user/assistant role alternation with occasional ``tool`` turns
(guaranteeing join matches), session-sized time gaps, and a small fraction of
late-arriving rows (file order ≠ event-time order) for watermark tests.

All generation is seeded and fully vectorized (numpy); the same
(scale, seed) always yields byte-identical tables. Mirrors the reference's
seeded fixture style (``Random(42)`` in
``PipeFlow.Benchmarks/CsvBenchmarks.cs:40``).

No external data: everything is synthesized in-process.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS_US = np.int64(1_735_689_600_000_000)  # 2025-01-01T00:00:00 UTC in us
_SPAN_US = np.int64(30 * 86_400) * 1_000_000  # conv start times spread over 30 days
TOOL_NAMES = np.array(["search", "python", "browser", "calculator"])

# Rows-per-unit-scale-factor: sf0.001 → ~5k turns, sf0.01 → ~50k, sf0.1 → ~500k.
TURNS_PER_SF = 5_000_000

FIXTURE_ROOT = "/tmp/pipeflow_fixtures"


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the per-row deterministic hash everything keys off."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _base_text(seed: int) -> str:
    """A long deterministic 'token soup' string; per-row texts are slices of it.

    Contains embedded quotes, commas and newlines (the CSV-edge analog of the
    reference's quoting tests, ``PipeFlow.Tests/CsvTests.cs:143-167``).
    """
    rng = np.random.default_rng(seed)
    vocab = [
        "alpha", "beta", "gamma", "delta", "query", "result", "model", "tool",
        "turn", "agent", "stream", "window", "join", "state", "parquet", "arrow",
        "batch", "shuffle", "actor", "watermark", "session", "commit", "lineage",
        'say "hi",', "x,y", "line\nbreak", "3.14", "42", "true", "2024-01-05",
    ]
    words = rng.choice(vocab, size=16_384)
    return " ".join(words.tolist()) + " "


def _gen_arrays(target_turns: int, seed: int = 42):
    """Numeric/deterministic core shared by the monolithic and sharded
    writers: everything except text materialization (the only memory-heavy
    part). Returns (conv_index, turn_idx, h, ts_us, order, base)."""
    rng = np.random.default_rng(seed)

    # --- conversation lengths: zipf-skewed + one guaranteed hot conversation ---
    est = max(8, target_turns // 3)
    lens = 2 + np.minimum(rng.zipf(1.8, size=est), 500)
    if target_turns >= 2000:
        hot = min(5000, max(1000, target_turns // 10))
        lens = np.concatenate([[hot], lens])  # conv_00000000 is the hot key
    cum = np.cumsum(lens)
    n_convs = int(np.searchsorted(cum, target_turns)) + 1
    lens = lens[:n_convs].astype(np.int64)
    n = int(lens.sum())

    conv_index = np.repeat(np.arange(n_convs, dtype=np.int64), lens)
    starts = np.zeros(n_convs, dtype=np.int64)
    starts[1:] = np.cumsum(lens)[:-1]
    turn_idx = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)

    h = _splitmix64((conv_index * np.int64(1_000_003) + turn_idx).astype(np.uint64))

    # --- event time: per-conv monotonic with session-sized gaps ---
    gaps = 1 + ((h >> np.uint64(8)) % np.uint64(240)).astype(np.int64)
    session_break = (h >> np.uint64(16)) % np.uint64(37) == 0
    gaps = np.where(session_break, gaps + 3600 + ((h >> np.uint64(24)) % np.uint64(7200)).astype(np.int64), gaps)
    first_row = np.zeros(n, dtype=bool)
    first_row[starts] = True
    gaps[first_row] = 0
    g = np.cumsum(gaps)
    seg = g - np.repeat(g[starts], lens)
    ch = _splitmix64(np.arange(n_convs, dtype=np.uint64) + np.uint64(seed) * np.uint64(0x51AB))
    conv_start_us = BASE_TS_US + (ch % np.uint64(_SPAN_US)).astype(np.int64)
    ts_us = np.repeat(conv_start_us, lens) + seg * 1_000_000

    # --- arrival order: by ts, except ~0.5% late rows displaced 2h later ---
    late = (h % np.uint64(211) == 0) & (turn_idx > 0)
    arrival_key = ts_us + np.where(late, np.int64(2 * 3600 * 1_000_000), 0)
    order = np.argsort(arrival_key, kind="stable")

    return conv_index, turn_idx, h, ts_us, order, _base_text(seed)


def _rows_table(conv_index, turn_idx, h, ts_us, idx, base) -> pa.Table:
    """Materialize the table for pre-order row ids *idx* (one shard's worth);
    byte-identical per row regardless of sharding."""
    hs = h[idx]
    ti = turn_idx[idx]
    role = np.where(ti % 2 == 0, "user", np.where(hs % np.uint64(8) == 0, "tool", "assistant"))
    tool_col = np.where(role == "tool", TOOL_NAMES[(hs >> np.uint64(3)) % np.uint64(4)], None)
    max_len = 2000
    off = (hs % np.uint64(len(base) - max_len - 1)).astype(np.int64)
    ln = 10 + ((hs >> np.uint64(32)) % np.uint64(max_len - 10)).astype(np.int64)
    txt = np.array([base[o : o + l] for o, l in zip(off.tolist(), ln.tolist())], dtype=object)
    txt[idx % 97 == 13] = ""  # empty strings (keyed to the pre-order row id)
    txt[idx % 131 == 5] = "   "  # whitespace-only
    conv_ids = np.char.add("conv_", np.char.zfill(conv_index[idx].astype("U8"), 8))
    return pa.table(
        {
            "conv_id": pa.array(conv_ids),
            "turn_idx": pa.array(ti, type=pa.int32()),
            "role": pa.array(role),
            "text": pa.array(txt, type=pa.string()),
            "tool": pa.array(tool_col, type=pa.string()),
            "ts": pa.array(ts_us[idx], type=pa.timestamp("us")),
        }
    )


def gen_transcripts(target_turns: int, seed: int = 42) -> pa.Table:
    """Generate the transcripts table with ~``target_turns`` rows, in arrival order."""
    conv_index, turn_idx, h, ts_us, order, base = _gen_arrays(target_turns, seed)
    return _rows_table(conv_index, turn_idx, h, ts_us, order, base)


def sf_of_dir(sf_dir: str) -> float:
    """Parse the scale factor out of a testdata dir name like '/root/testdata/sf0.01'."""
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.01


ROWS_PER_SHARD = 150_000  # ~150 MB decoded per shard: one read task each


def ensure_transcripts(sf_dir_or_sf: str | float, seed: int = 42) -> str:
    """Idempotently materialize the transcripts fixture for a scale factor as
    a DIRECTORY of parquet shards in arrival order (shard k = arrival rows
    [k·N, (k+1)·N)) — the layout a real transcript log would have, and what
    makes the read stage parallel (Ray schedules one read task per file; a
    single big file is read by ONE task regardless of override_num_blocks).

    Returns the directory path. Deterministic per (sf, seed); safe under
    concurrent callers (atomic rename of the whole directory).
    """
    sf = sf_of_dir(sf_dir_or_sf) if isinstance(sf_dir_or_sf, str) else float(sf_dir_or_sf)
    target = max(200, int(round(sf * TURNS_PER_SF)))
    out_dir = os.path.join(FIXTURE_ROOT, f"sf{sf}")
    path = os.path.join(out_dir, "transcripts")
    if os.path.isdir(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    # stream shard by shard: only one shard's text strings are ever
    # materialized (the numeric arrays are cheap even at 10^8 rows)
    conv_index, turn_idx, h, ts_us, order, base = _gen_arrays(target, seed=seed)
    n = len(order)
    n_shards = max(1, (n + ROWS_PER_SHARD - 1) // ROWS_PER_SHARD)
    for k in range(n_shards):
        idx = order[k * ROWS_PER_SHARD : (k + 1) * ROWS_PER_SHARD]
        shard = _rows_table(conv_index, turn_idx, h, ts_us, idx, base)
        pq.write_table(shard, os.path.join(tmp, f"part-{k:05d}.parquet"),
                       row_group_size=max(4096, ROWS_PER_SHARD // 4))
    os.replace(tmp, path)
    return path


# ---------------------------------------------------------------------------
# F2: reference-derived tabular mini-fixtures (golden values from the
# reference's inline test data).
# ---------------------------------------------------------------------------

def people_table() -> pa.Table:
    """Analog of the 5-person fixture in ``PipeFlow.Tests/PipelineTests.cs:11-21``."""
    return pa.table(
        {
            "Id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "Name": ["Alice", "Bob", "Charlie", "Diana", "Eve"],
            "Age": pa.array([25, 30, 35, 28, 22], pa.int32()),
            "City": ["New York", "London", "Paris", "Tokyo", "London"],
        }
    )


def employees_table() -> pa.Table:
    """Analog of ``PipeFlow.Tests/ExtensionTests.cs:12-45`` (dup Id=1, groupby goldens)."""
    return pa.table(
        {
            "Id": pa.array([1, 2, 1, 3], pa.int64()),
            "Name": ["John", "Jane", "John Duplicate", "Bob"],
            "Department": ["Engineering", "Engineering", "Sales", "Marketing"],
            "Salary": pa.array([75000, 82000, 75000, 60000], pa.int64()),
        }
    )


def scores_table() -> pa.Table:
    """Analog of ``PipeFlow.Tests/CsvTests.cs:172-177`` (filter+sort golden)."""
    return pa.table(
        {
            "Id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "Name": ["Alice", "Bob", "Charlie", "Diana", "Eve"],
            "Score": pa.array([85, 92, 78, 88, 95], pa.int64()),
        }
    )
