"""Exact deduplication as distributed shuffle operators.

Reference semantics:
- ``Distinct()`` — whole-record exact dedup (``PipeFlow/Pipeline.cs:80-84``).
- ``RemoveDuplicates(keyColumn)`` — keyed dedup keeping the FIRST occurrence
  in encounter order via a closure ``HashSet`` (``PipeFlow/PipeFlow.cs:218-232``).

Ray blocks carry no encounter order, so "first" is defined by an explicit
*order_by* sort key (default ``(conv_id, turn_idx)`` for transcripts) — this
matches the reference's *sequential* semantics, which is also what its own
tests assert (its PLINQ path is racy, ``Parallel/ParallelPipeline.cs:135-141``).

Scale notes: both operators pre-shrink inside ``map_batches`` (per-batch
combiner) before the all-to-all ``groupby`` so the shuffle moves only
already-locally-unique rows; the shuffle key for whole-row dedup is a 64-bit
content hash rather than the full (wide, text-heavy) row.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from pipeflow_ray.stages.core import (
    content_hash_column,
    first_rows_per_group,
    local_distinct,
)


def distinct_rows(ds: ray.data.Dataset, cols: list[str] | None = None) -> ray.data.Dataset:
    """Whole-record (or *cols*-projected) exact distinct.

    local distinct (combiner) → hash column → shuffle on hash → per-group
    exact dedup. Hash collisions are handled: within a group we dedup on the
    actual column values, not the hash.
    """
    from pipeflow_ray.stages.core import grouped_by_bucket

    if cols:
        ds = ds.select_columns(cols)

    ds = ds.map_batches(local_distinct(), batch_format="pyarrow")
    ds = ds.map_batches(lambda t: content_hash_column(t), batch_format="pyarrow")

    def _bucket_distinct(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__h"])
        return t.group_by(t.column_names, use_threads=False).aggregate([])

    # shuffle on the 64-bit hash bucketed to ~2× cores: one vectorized
    # in-bucket distinct instead of a Python call per hash value
    return grouped_by_bucket(ds, ["__h"], _bucket_distinct, batch_format="pyarrow")


def remove_duplicates(
    ds: ray.data.Dataset,
    key: str | list[str],
    order_by: str | list[str],
) -> ray.data.Dataset:
    """Keyed dedup, first-wins under *order_by* ordering.

    Per-batch first-wins combiner → shuffle on key → per-group first-wins.
    Deterministic regardless of block arrival order.
    """
    from pipeflow_ray.stages.core import grouped_by_bucket

    key_cols = [key] if isinstance(key, str) else list(key)
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)

    def _local(t: pa.Table) -> pa.Table:
        return first_rows_per_group(t, key_cols, order_cols)

    ds = ds.map_batches(_local, batch_format="pyarrow")
    # first_rows_per_group is multi-key vectorized → one call per bucket
    return grouped_by_bucket(ds, key_cols, _local, batch_format="pyarrow")


def keep_first(
    ds: ray.data.Dataset,
    keys: list[str],
    order_by: list[tuple[str, str]],
) -> ray.data.Dataset:
    """Top-1 per key under a multi-directional order — the generalized
    first-wins dedup (e.g. each customer's highest-price order with orderkey
    tiebreak). Bucket-vectorized: per-batch combiner, then one sorted
    ``drop_duplicates`` per hash bucket; never one Python call per key."""
    import pandas as pd

    from pipeflow_ray.stages.core import grouped_by_bucket

    cols = [c for c, _ in order_by]
    asc = [d != "descending" for _, d in order_by]

    def _first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + cols, ascending=[True] * len(keys) + asc, kind="mergesort")
        return df.drop_duplicates(subset=keys, keep="first")

    def _local(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(_first(t.to_pandas()), preserve_index=False)

    ds = ds.map_batches(_local, batch_format="pyarrow")
    return grouped_by_bucket(ds, keys, _first, batch_format="pandas")


def top_n_per_key(
    ds: ray.data.Dataset,
    keys: list[str],
    order_by: list[tuple[str, str]],
    n: int,
    rank_col: str | None = "rn",
) -> ray.data.Dataset:
    """Top-N rows per key under a multi-directional order (generalizes
    :func:`keep_first` from N=1), with an optional 1-based ``rank_col`` —
    the SQL ``row_number() OVER (...) <= n`` pattern. Order must be total
    (include a tiebreak column) for deterministic output.

    Bucket-vectorized: a per-batch combiner caps each batch's contribution
    at N rows per key (so the shuffle carries ≤ N·keys rows per batch, not
    the row count), then one sorted grouped ``head(n)`` per hash bucket."""
    import pandas as pd

    from pipeflow_ray.stages.core import grouped_by_bucket

    cols = [c for c, _ in order_by]
    asc = [d != "descending" for _, d in order_by]

    def _top(df: pd.DataFrame, final: bool) -> pd.DataFrame:
        df = df.sort_values(keys + cols, ascending=[True] * len(keys) + asc,
                            kind="mergesort")
        out = df.groupby(keys, sort=False).head(n)
        if final and rank_col is not None:
            out = out.copy()
            out[rank_col] = out.groupby(keys, sort=False).cumcount() + 1
        return out

    def _local(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(_top(t.to_pandas(), final=False),
                                    preserve_index=False)

    import functools

    ds = ds.map_batches(_local, batch_format="pyarrow")
    return grouped_by_bucket(ds, keys, functools.partial(_top, final=True),
                             batch_format="pandas")


def group_concat(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    order_col: str,
    sep: str = ",",
    out: str = "agg",
) -> ray.data.Dataset:
    """Ordered group concatenation — SQL ``string_agg(value, sep ORDER BY
    order_col)``. One key exchange; per bucket a single mergesort, then one
    C-implemented ``str.join`` per KEY (a per-key loop over #keys, not
    #rows — same budget as the session fragment merge). SQL semantics for
    nulls: NULL values are skipped inside a group, and a group whose values
    are ALL NULL is still emitted, with a NULL aggregate (round-4 VERDICT
    #5)."""
    import pandas as pd

    from pipeflow_ray.stages.core import grouped_by_bucket

    def _cat(df: pd.DataFrame) -> pd.DataFrame:
        all_keys = df[keys].drop_duplicates()
        nn = df.dropna(subset=[value_col])
        nn = nn.sort_values(keys + [order_col], kind="mergesort")
        vals = nn[value_col]
        if vals.dtype != object:  # SQL string_agg casts to text implicitly
            vals = vals.astype(str)
        g = vals.groupby([nn[k] for k in keys], sort=False).agg(lambda s: sep.join(s))
        g = g.rename(out).reset_index()
        # all-null groups re-enter with a NULL aggregate; keys come from the
        # left side so their dtypes never drift on unmatched rows
        res = all_keys.merge(g, on=keys, how="left")
        res[out] = res[out].astype(object).where(res[out].notna(), None)
        return res

    return grouped_by_bucket(ds, keys, _cat, batch_format="pandas")
