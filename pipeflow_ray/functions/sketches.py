"""Mergeable sketches (distributed-aggregation building blocks).

- :class:`HyperLogLog` — approximate distinct count; one register array per
  batch, merged by element-wise max (associative/commutative → safe under any
  partitioning).
- :func:`detect_hot_keys` — approximate heavy-hitters via per-batch top-k
  partial counts; feeds skew decisions (SURVEY §4.2 hot-conversation
  detection) without a full groupby over the key column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


class HyperLogLog:
    """Fixed 2^p registers, 64-bit hashes; standard bias-corrected estimate."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1 (vectorized via log2)
        lz = np.uint64(63) - np.floor(np.log2(rest.astype(np.float64))).astype(np.uint64)
        rank = (lz + np.uint64(1)).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # small-range correction
        return float(e)


def approx_distinct(ds: ray.data.Dataset, col: str, p: int = 12) -> float:
    """Distributed approximate distinct count: one HLL register array per
    batch (serialized bytes), merged on the driver (registers are tiny: 4 KiB
    each at p=12 — the merge is the 'small final stage' sketch pattern)."""

    def _sketch(t: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        vals = t[col].to_pandas()
        hll.add_hashes(pd.util.hash_array(vals.to_numpy()))
        return pa.table({"registers": pa.array([hll.registers.tobytes()], pa.binary())})

    merged = HyperLogLog(p)
    for b in ds.map_batches(_sketch, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for raw in b["registers"].to_pylist():
            other = HyperLogLog(p)
            other.registers = np.frombuffer(raw, dtype=np.uint8).copy()
            merged.merge(other)
    return merged.estimate()


def detect_hot_keys(
    ds: ray.data.Dataset, col: str, top_k: int = 10, per_batch_k: int = 64
) -> pd.DataFrame:
    """Approximate heavy hitters: per-batch value_counts truncated to
    ``per_batch_k`` (a space-saving-style partial), summed across batches.
    Exact for keys that are hot in most batches — precisely the ones skew
    handling cares about. Returns (key, approx_count) descending."""

    def _partial(t: pa.Table) -> pa.Table:
        vc = t[col].to_pandas().value_counts().head(per_batch_k)
        return pa.table({"key": pa.array(vc.index.astype(str)), "cnt": pa.array(vc.to_numpy())})

    partials = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    out = partials.groupby("key", sort=False).cnt.sum().nlargest(top_k).reset_index()
    return out.rename(columns={"cnt": "approx_count"})
