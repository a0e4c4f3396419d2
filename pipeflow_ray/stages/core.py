"""Core stateless batch-level operators.

The reference implements these as lazy ``IEnumerable`` closures applied per
row (``PipeFlow/Pipeline.cs:25-102``). Here every operator is a vectorized
Arrow-batch transform used inside ``Dataset.map_batches(...,
batch_format="pyarrow")`` — no Python-per-row work on the hot path.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads


PredicateLike = "pads.Expression | Callable[[pa.Table], pa.ChunkedArray | pa.Array | np.ndarray]"


def filter_batches(predicate) -> Callable[[pa.Table], pa.Table]:
    """Batch filter (reference ``Filter``/``Where``, ``Pipeline.cs:25-37``).

    *predicate* is either a ``pyarrow.dataset`` expression
    (``pc.field("Age") > 25`` — pushdown-friendly) or a callable
    ``table → boolean mask``.
    """
    if isinstance(predicate, pads.Expression):
        return lambda t: t.filter(predicate)

    def _apply(t: pa.Table) -> pa.Table:
        mask = predicate(t)
        return t.filter(mask)

    return _apply


def content_hash_column(
    table: pa.Table, cols: list[str] | None = None, out: str = "__h"
) -> pa.Table:
    """Append a vectorized 64-bit content hash of *cols* (default: all columns).

    Used to turn whole-row identity (the reference's ``Distinct()`` over
    ``IEquatable`` rows, ``Pipeline.cs:80-84``) into a single cheap shuffle
    key.
    """
    cols = cols or table.column_names
    df = table.select(cols).to_pandas(types_mapper=None)
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()  # uint64, vectorized
    return table.append_column(out, pa.array(h.view(np.int64), type=pa.int64()))


def local_distinct(cols: list[str] | None = None) -> Callable[[pa.Table], pa.Table]:
    """Per-batch pre-dedup (combiner) that shrinks the shuffle before the
    global dedup — the partial-aggregation pattern."""

    def _apply(t: pa.Table) -> pa.Table:
        keys = cols or t.column_names
        return t.group_by(keys, use_threads=False).aggregate([])

    return _apply


def first_rows_per_group(
    table: pa.Table, key_cols: list[str], order_cols: list[str]
) -> pa.Table:
    """Within one Arrow table, keep the first row per *key_cols* under
    *order_cols* ordering — vectorized (sort + unique-index take).

    Ray blocks are unordered, so "first occurrence" must be anchored to an
    explicit sort key (vs the reference's encounter-order ``HashSet`` closure,
    ``PipeFlow/PipeFlow.cs:218-232``, which is racy under PLINQ).
    """
    sort_keys = [(c, "ascending") for c in order_cols + [k for k in key_cols if k not in order_cols]]
    idx = pc.sort_indices(table, sort_keys=sort_keys)
    t = table.take(idx)
    df = t.select(key_cols).to_pandas()
    keep = ~df.duplicated(keep="first").to_numpy()
    return t.filter(pa.array(keep))
