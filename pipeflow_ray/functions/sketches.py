"""Mergeable sketches (distributed-aggregation building blocks).

- :class:`HyperLogLog` — approximate distinct count; one register array per
  batch, merged by element-wise max (associative/commutative → safe under any
  partitioning).
- :func:`detect_hot_keys` — approximate heavy-hitters via per-batch top-k
  partial counts; feeds skew decisions (SURVEY §4.2 hot-conversation
  detection) without a full groupby over the key column.
- :class:`KLLSketch` — mergeable quantile sketch for unbounded continuous
  value domains (the scale path where the exact value-histogram quantiles
  would degrade toward O(rows) state); per-batch sketch combiner + merge in
  reduce tasks / bucket actors.
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


class KLLSketch:
    """KLL quantile sketch (Karnin–Lang–Liberty, arXiv:1603.05346 — public
    algorithm, same compactor scheme as Apache DataSketches' ``kll``).

    Structure: geometrically-shrinking compactor levels; a retained item at
    level *i* represents ``2^i`` input values. A full level sorts, promotes
    every other item to the level above (alternating parity), and keeps at
    most one leftover — so state is O(k · log(n/k)) float64s REGARDLESS of
    the value domain, where the exact histogram path
    (:func:`~pipeflow_ray.stages.window.grouped_quantiles`) would hold one
    entry per distinct value. Normalized rank error is ≈ 2.3/k with high
    probability (k=400 → ~0.6%), independent of n.

    ``merge`` is commutative/associative up to the sketch's own error bound
    — safe under any shard interleaving or reduce-tree shape. Parity
    alternation is deterministic (a counter, not an RNG), so a fixed
    insertion order reproduces bit-identical sketches; reordering changes
    only which side of the error bound an estimate lands on.

    Serialization (:meth:`dumps` / :meth:`loads`) is a flat little-endian
    int64/float64 layout — no pickle in the data plane."""

    __slots__ = ("k", "n", "levels", "_parity")

    def __init__(self, k: int = 400):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.n = 0
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self._parity = 0

    # --- capacity schedule: top level holds k, each below shrinks by 2/3 ---
    def _cap(self, i: int) -> int:
        h = len(self.levels) - 1 - i
        return max(int(self.k * (2.0 / 3.0) ** h), 8)

    def _total_cap(self) -> int:
        return sum(self._cap(i) for i in range(len(self.levels)))

    def update_many(self, values: np.ndarray) -> None:
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        self.n += int(len(v))
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if other.k != self.k:
            # merging across k would silently apply self's capacity schedule
            # to other's levels and degrade the stated rank-error bound
            raise ValueError(f"KLL k mismatch: {self.k} vs {other.k}")
        if other.n == 0:
            return self
        self.n += other.n
        for i, lvl in enumerate(other.levels):
            if not len(lvl):
                continue
            if i >= len(self.levels):
                self.levels.extend(
                    np.empty(0, np.float64) for _ in range(i + 1 - len(self.levels))
                )
            self.levels[i] = np.concatenate([self.levels[i], lvl])
        self._compress()
        return self

    def _compress(self) -> None:
        while sum(map(len, self.levels)) > self._total_cap():
            for i in range(len(self.levels)):
                if len(self.levels[i]) >= self._cap(i):
                    arr = np.sort(self.levels[i])
                    m = (len(arr) // 2) * 2  # leftover (odd tail) stays put
                    promoted = arr[self._parity:m:2]
                    self._parity ^= 1
                    self.levels[i] = arr[m:]
                    if i + 1 == len(self.levels):
                        self.levels.append(promoted)
                    else:
                        self.levels[i + 1] = np.concatenate(
                            [self.levels[i + 1], promoted]
                        )
                    break
            else:
                break  # over budget only by the capacity-schedule rounding

    def size(self) -> int:
        """Retained items (the state bound: O(k · log(n/k)))."""
        return int(sum(map(len, self.levels)))

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        items = np.concatenate(self.levels)
        weights = np.concatenate(
            [np.full(len(l), 1 << i, np.int64) for i, l in enumerate(self.levels)]
        )
        o = np.argsort(items, kind="mergesort")
        return items[o], weights[o]

    def quantiles(self, qs) -> np.ndarray:
        """percentile_disc-style readout: the retained value whose cumulative
        weight first reaches ``ceil(q · total_weight)`` (same rank rule as
        the exact path / DuckDB ``quantile_disc``, applied to the sketch's
        weighted sample)."""
        if self.n == 0:
            return np.full(len(tuple(qs)), np.nan)
        items, weights = self._weighted()
        cw = np.cumsum(weights)
        total = int(cw[-1])
        out = np.empty(len(tuple(qs)), np.float64)
        for j, q in enumerate(qs):
            target = min(total, max(1, int(np.ceil(q * total))))
            out[j] = items[np.searchsorted(cw, target)]
        return out

    def rank(self, value: float) -> float:
        """Estimated normalized rank of *value* (weight fraction ≤ value)."""
        if self.n == 0:
            return float("nan")
        items, weights = self._weighted()
        idx = np.searchsorted(items, value, side="right")
        return float(weights[:idx].sum() / weights.sum())

    # --- flat serialization (crosses the exchange as a binary column) ---
    def dumps(self) -> bytes:
        sizes = np.array([len(l) for l in self.levels], dtype="<i8")
        header = np.array([self.k, self.n, self._parity, len(sizes)], dtype="<i8")
        flat = (
            np.concatenate(self.levels).astype("<f8")
            if self.size()
            else np.empty(0, "<f8")
        )
        return header.tobytes() + sizes.tobytes() + flat.tobytes()

    @classmethod
    def loads(cls, raw: bytes) -> "KLLSketch":
        header = np.frombuffer(raw, dtype="<i8", count=4)
        k, n, parity, n_levels = (int(x) for x in header)
        sizes = np.frombuffer(raw, dtype="<i8", count=n_levels, offset=32)
        flat = np.frombuffer(raw, dtype="<f8", offset=32 + 8 * n_levels)
        sk = cls(k)
        sk.n = n
        sk._parity = parity
        out, off = [], 0
        for s in sizes:
            out.append(flat[off:off + int(s)].copy())
            off += int(s)
        sk.levels = out or [np.empty(0, np.float64)]
        return sk


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


def grouped_approx_distinct(
    ds: ray.data.Dataset, key_cols: list[str], col: str, p: int = 12
) -> ray.data.Dataset:
    """Distributed PER-KEY approximate distinct count — the batch twin of
    ``pipelines.streaming.StreamingHLLRunner``. Each batch shrinks to one
    ``2^p``-byte register array per key it contains (the combiner: raw
    values never cross the exchange); one key exchange later, bucket tasks
    merge registers by element-wise max and read the estimates. Shuffle
    volume is O(batches · keys-per-batch · 2^p) bytes and the result is
    O(keys) rows — exact per-key distinct would ship every distinct value.
    Returns (key_cols…, n, approx_distinct); ``n`` is exact; standard error
    ≈ 1.04/√(2^p)."""
    from pipeflow_ray.stages.core import grouped_by_bucket

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df[col].to_numpy())
        out: dict = {k: [] for k in key_cols}
        regs, ns = [], []
        for kv, idx in df.groupby(key_cols, sort=False).indices.items():
            hll = HyperLogLog(p)
            hll.add_hashes(h[idx])
            if len(key_cols) == 1:
                kv = (kv,)
            for k, v in zip(key_cols, kv):
                out[k].append(v)
            regs.append(hll.registers.tobytes())
            ns.append(len(idx))
        out["__regs"] = regs
        out["__n"] = np.array(ns, np.int64)
        return pd.DataFrame(out)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        out: dict = {k: [] for k in key_cols}
        ns, ests = [], []
        raw = df["__regs"].to_numpy()
        for kv, idx in df.groupby(key_cols, sort=False).indices.items():
            stacked = np.stack([np.frombuffer(raw[i], np.uint8) for i in idx])
            hll = HyperLogLog(p)
            hll.registers = stacked.max(axis=0)
            if len(key_cols) == 1:
                kv = (kv,)
            for k, v in zip(key_cols, kv):
                out[k].append(v)
            ns.append(int(df["__n"].to_numpy()[idx].sum()))
            ests.append(hll.estimate())
        out["n"] = np.array(ns, np.int64)
        out["approx_distinct"] = np.array(ests, np.float64)
        return pd.DataFrame(out)

    return grouped_by_bucket(
        ds.map_batches(_partial, batch_format="pandas"), key_cols, _merge
    )
