"""Deterministic data mixing for training-corpus assembly: per-key
stratified (Bernoulli) sampling and weighted upsampling driven by a stable
id hash.

The keep/repeat decision for a row is a PURE FUNCTION of ``(id, seed)`` —
splitmix64 (Steele, Lea & Flood, OOPSLA'14; the JDK SplittableRandom
finalizer) of the row id. That buys the properties a 100-TB curation run
needs and an RNG cannot give:

- **partitioning-independent**: any block layout, task retry, backfill or
  resume reproduces the same mixture row-for-row;
- **shuffle-free**: the decision is per-row local — ``map_batches`` only,
  no exchange, no driver state;
- **oracle-checkable**: the same hash is replayable in SQL (HUGEINT
  split-multiply mod 2^64 — see :func:`splitmix64_sql`), so the sampled
  output is value-hash verifiable, not just statistically plausible.

The reference's closest surface is unweighted ``Sample`` (SURVEY §2.9);
the per-key mixture ops are part of the beyond-reference training-data
layer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_M = 1 << 64
_C1 = 0x9E3779B97F4A7C15  # golden-ratio increment
_C2 = 0xBF58476D1CE4E5B9
_C3 = 0x94D049BB133111EB


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wraparound mod 2^64)."""
    x = (np.asarray(x).astype(np.uint64) + np.uint64(_C1)).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(_C2)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(_C3)
    return x ^ (x >> np.uint64(31))


def _mul_sql(col: str, c: int) -> str:
    """``(col * c) mod 2^64`` in DuckDB: HUGEINT is int128, so a full 64×64
    product overflows — split the CONSTANT into 32-bit halves; every partial
    stays under 2^97."""
    hi, lo = c >> 32, c & 0xFFFFFFFF
    return (f"CAST((CAST({col} AS HUGEINT) * {lo} + "
            f"((CAST({col} AS HUGEINT) * {hi}) % 4294967296) * 4294967296) "
            f"% {_M} AS UBIGINT)")


def splitmix64_sql(id_expr: str, seed: int) -> str:
    """SELECT-list fragment computing ``__h = splitmix64(id + seed)`` via
    DuckDB lateral column aliases — bit-identical to :func:`splitmix64`
    (tested). Embed inside ``SELECT *, {fragment} FROM …``."""
    return f"""CAST((CAST({id_expr} AS HUGEINT) + {seed} + {_C1}) % {_M} AS UBIGINT) AS __x0,
       xor(__x0, __x0 >> 30) AS __x1,
       {_mul_sql('__x1', _C2)} AS __x2,
       xor(__x2, __x2 >> 27) AS __x3,
       {_mul_sql('__x3', _C3)} AS __x4,
       xor(__x4, __x4 >> 31) AS __h"""


def _row_hashes(t: pa.Table, id_col: str, seed: int) -> np.ndarray:
    ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
    return splitmix64(ids + np.uint64(seed))


def _per_row_rates(t: pa.Table, key_col: str, rates: dict, default: float) -> np.ndarray:
    keys = t[key_col].to_pandas()
    return keys.map(rates).fillna(default).to_numpy(np.float64)


def stratified_sample(
    ds: ray.data.Dataset,
    key_col: str,
    fractions: dict,
    id_col: str = "doc_id",
    seed: int = 42,
    default: float = 1.0,
) -> ray.data.Dataset:
    """Per-key Bernoulli sampling: keep a row iff
    ``splitmix64(id + seed) < fraction[key] · 2^64``. Deterministic,
    shuffle-free, reproducible under any partitioning; keys absent from
    *fractions* use *default*. Fractions ≥ 1 keep everything."""
    fr = {k: float(v) for k, v in fractions.items()}

    def _keep(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t
        h = _row_hashes(t, id_col, seed)
        f = _per_row_rates(t, key_col, fr, default)
        # compare in float is unsafe at 2^64 precision — do it integer-wise:
        # full-keep handled separately, partial thresholds fit uint64 exactly
        # for the binary-fraction rates callers use; general rates round to
        # the nearest representable uint64 threshold (documented)
        keep = np.empty(t.num_rows, bool)
        full = f >= 1.0
        keep[full] = True
        part = ~full
        if part.any():
            thr_u = (np.minimum(f[part], 1.0) * float(_M)).astype(np.uint64)
            keep[part] = h[part] < thr_u
        return t.filter(pa.array(keep))

    return ds.map_batches(_keep, batch_format="pyarrow")


def upsample(
    ds: ray.data.Dataset,
    key_col: str,
    weights: dict,
    id_col: str = "doc_id",
    seed: int = 42,
    default: float = 1.0,
    copy_col: str = "copy_idx",
) -> ray.data.Dataset:
    """Weighted repetition for mixture targets > 1: a row with weight ``w``
    emits ``floor(w)`` copies plus one more iff
    ``splitmix64(id + seed) < frac(w) · 2^64`` — expected multiplicity
    exactly *w*, deterministic per id. Adds *copy_col* (0-based copy index)
    so output rows stay distinct. Weights < 1 behave like
    :func:`stratified_sample` (0 or 1 copies)."""
    wts = {k: float(v) for k, v in weights.items()}

    def _repeat(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t.append_column(copy_col, pa.array([], pa.int64()))
        h = _row_hashes(t, id_col, seed)
        w = _per_row_rates(t, key_col, wts, default)
        base = np.floor(w).astype(np.int64)
        frac = w - base
        extra = h < (frac * float(_M)).astype(np.uint64)
        reps = base + extra.astype(np.int64)
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), reps)
        starts = np.cumsum(reps) - reps
        cidx = np.arange(len(idx), dtype=np.int64) - np.repeat(starts, reps)
        out = t.take(pa.array(idx))
        return out.append_column(copy_col, pa.array(cidx, pa.int64()))

    return ds.map_batches(_repeat, batch_format="pyarrow")
