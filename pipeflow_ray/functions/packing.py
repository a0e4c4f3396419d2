"""Sequence packing for training-data pipelines: assign documents to
fixed token-budget training sequences (the "bin packing" step every LLM
data pipeline runs between curation and tokenized-shard writing).

Semantics (deterministic, partition-local, SQL-replicable):

- Each doc goes to partition ``doc_id % num_parts`` — a pure function of
  the id, so the assignment is independent of shard layout, retries and
  resume (the same determinism rule as functions/sampling.py mixing).
- Within a partition, docs are taken in ``doc_id`` order and packed
  GREEDILY: a running token total accumulates until adding the next doc
  would exceed ``budget``, which closes the sequence and starts the next
  one. A doc longer than the budget occupies a sequence alone (callers
  truncate or split downstream — this stage never drops data).
- Output: one row per doc ``(doc_id, n_tokens, part, seq_idx)``.

Scale shape: token counting is one vectorized RE2 kernel per batch
(:func:`pipeflow_ray.functions.text.token_count` — heavy text never
crosses the exchange, only ``(id, count)`` int pairs do), the exchange is
one hash bucketing on ``part``, and the per-partition greedy runs one
``searchsorted`` per SEQUENCE (not per row) over the partition's count
cumsum. Packing is embarrassingly parallel across partitions — at 100 TB,
``num_parts`` is sized to the cluster and each partition packs its own
sequences with zero coordination; sequence ids are only unique per
``(part, seq_idx)``, exactly what a sharded tokenizer writer needs.

Reference parity: the reference has no packing operator (this is part of
the beyond-reference LLM-curation surface); the greedy-reset contract is
fixed by the recursive-CTE SQL oracle in pipelines/queries.py
(pack_sequences_docs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pipeflow_ray.stages.core import grouped_by_bucket


def _pack_part(counts: np.ndarray, budget: int) -> np.ndarray:
    """Greedy sequence index per doc for ONE partition (docs pre-sorted by
    id). One searchsorted per sequence over the cumsum."""
    m = len(counts)
    seq = np.empty(m, np.int64)
    cum = np.cumsum(counts, dtype=np.int64)
    start, s = 0, 0
    while start < m:
        limit = (cum[start - 1] if start else 0) + budget
        j = int(np.searchsorted(cum, limit, side="right"))
        j = max(j, start + 1)  # an over-budget doc packs alone
        seq[start:j] = s
        start, s = j, s + 1
    return seq


def _bucket_pack(df: pd.DataFrame, budget: int, id_col: str) -> pd.DataFrame:
    df = df.sort_values(["part", id_col], kind="mergesort").reset_index(drop=True)
    parts = df["part"].to_numpy(np.int64)
    counts = df["n_tokens"].to_numpy(np.int64)
    seq = np.empty(len(df), np.int64)
    bnd = np.nonzero(np.diff(parts))[0]
    starts = np.r_[0, bnd + 1]
    ends = np.r_[bnd + 1, len(df)]
    for a, b in zip(starts, ends):  # one iteration per PARTITION in bucket
        seq[a:b] = _pack_part(counts[a:b], budget)
    out = df[[id_col, "n_tokens", "part"]].copy()
    out["seq_idx"] = seq
    return out


def pack_sequences(
    ds,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
    num_parts: int = 64,
    num_buckets: int | None = None,
):
    """Greedy token-budget sequence packing (module docstring). Pass
    ``n_tokens_col`` to pack on a precomputed length column instead of
    counting whitespace tokens from *text_col*."""
    if budget < 1:
        raise ValueError("budget must be ≥ 1 token")

    def _prep(t: pa.Table) -> pa.Table:
        if n_tokens_col is not None:
            n = t[n_tokens_col].cast(pa.int64())
        else:
            from pipeflow_ray.functions.text import _TOKEN_RE

            n = pc.count_substring_regex(
                pc.fill_null(t[text_col], ""), _TOKEN_RE).cast(pa.int64())
        ids = t[id_col].cast(pa.int64())
        part = pc.subtract(ids, pc.multiply(
            pc.divide(ids, np.int64(num_parts)), np.int64(num_parts)))
        return pa.table({id_col: ids, "n_tokens": n, "part": part})

    import functools

    kernel = functools.partial(_bucket_pack, budget=budget, id_col=id_col)
    return grouped_by_bucket(
        ds.map_batches(_prep, batch_format="pyarrow"),
        ["part"], kernel, num_buckets=num_buckets, batch_format="pandas",
    )
