"""Deterministic epoch shuffle for training-data pipelines: assign every
document a GLOBAL shuffle position for one training epoch, reproducibly.

``shuffle_pos(doc) = rank of splitmix64(doc_id + seed) over the corpus``
(ties broken by doc_id) — i.e. the classic "sort by a keyed hash" epoch
shuffle, but emitted as an explicit position column (zipWithIndex style)
so downstream shard writers can place each doc without a full dataset
sort, and so the order itself is value-verifiable (SQL oracle:
``row_number() OVER (ORDER BY h, doc_id)``).

Scale shape — two cheap passes instead of one all-to-all sort:

1. COUNT pass: per-batch ``bincount`` of the hash's top ``radix_bits``
   (uniform under splitmix64 → balanced radix buckets); the driver folds
   one tiny int vector per batch (2^radix_bits counts, ~8 KB) and
   prefix-sums them into global bucket offsets. Only the id column is
   read.
2. ASSIGN pass: one hash exchange co-locating each radix bucket, then a
   vectorized per-bucket sort by ``(h, id)`` plus ``offset + arange``.
   Only ``(id, h)`` int pairs cross the exchange.

Because the dataset plan is lazy, the id read + hash run once per pass
(twice total) — both column-pruned int scans, which is the deliberate
trade against a full-width all-to-all sort of the corpus. The seed makes
epochs reproducible and independent: a new epoch is a new seed, no state.

Reference parity: the reference has no shuffle operator (Random ordering
falls out of PLINQ nondeterminism there); this is part of the
beyond-reference training-data surface, contract fixed by the SQL oracle
in pipelines/queries.py (epoch_shuffle_docs).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa

from pipeflow_ray.functions.sampling import splitmix64
from pipeflow_ray.stages.core import grouped_by_bucket


def _hash_prep(t: pa.Table, id_col: str, seed: int, radix_bits: int) -> pa.Table:
    ids = t[id_col].cast(pa.int64())
    h = splitmix64(
        ids.to_numpy(zero_copy_only=False).astype(np.uint64) + np.uint64(seed))
    rb = (h >> np.uint64(64 - radix_bits)).astype(np.int64)
    return pa.table({
        id_col: ids,
        "__h": pa.array(h, pa.uint64()),
        "__rb": pa.array(rb, pa.int64()),
    })


def _bucket_counts(t: pa.Table, radix_bits: int) -> pa.Table:
    # sparse (bucket, count) pairs: robust to any batch re-slicing on the
    # consumer side (iter_batches does not preserve producer batch bounds)
    n = np.bincount(t["__rb"].to_numpy(zero_copy_only=False),
                    minlength=1 << radix_bits)
    nz = np.nonzero(n)[0]
    return pa.table({"rb": pa.array(nz, pa.int64()),
                     "n": pa.array(n[nz], pa.int64())})


def _bucket_assign(df: pd.DataFrame, offsets: np.ndarray, id_col: str) -> pd.DataFrame:
    if not len(df):
        return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                             "shuffle_pos": pd.Series([], dtype=np.int64)})
    df = df.sort_values(["__rb", "__h", id_col], kind="mergesort").reset_index(drop=True)
    rb = df["__rb"].to_numpy(np.int64)
    n = len(df)
    idx = np.arange(n)
    starts = np.r_[0, np.nonzero(np.diff(rb))[0] + 1]
    run_start = np.repeat(idx[starts], np.diff(np.r_[starts, n]))
    return pd.DataFrame({
        id_col: df[id_col].to_numpy(np.int64),
        "shuffle_pos": offsets[rb] + (idx - run_start),
    })


def epoch_shuffle(
    ds,
    seed: int,
    id_col: str = "doc_id",
    radix_bits: int = 10,
    num_buckets: int | None = None,
):
    """Global deterministic shuffle positions for one epoch (module
    docstring). Returns a Dataset of ``(id_col, shuffle_pos)``."""
    prep = functools.partial(_hash_prep, id_col=id_col, seed=seed,
                             radix_bits=radix_bits)
    hds = ds.map_batches(prep, batch_format="pyarrow")

    counts = np.zeros(1 << radix_bits, np.int64)
    cnt = functools.partial(_bucket_counts, radix_bits=radix_bits)
    for b in hds.map_batches(cnt, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        np.add.at(counts, b["rb"].to_numpy(zero_copy_only=False),
                  b["n"].to_numpy(zero_copy_only=False))
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))

    kernel = functools.partial(_bucket_assign, offsets=offsets, id_col=id_col)
    return grouped_by_bucket(hds, ["__rb"], kernel, num_buckets=num_buckets,
                             batch_format="pandas")
