"""Fluent pipeline builder over ``ray.data.Dataset``.

Mirrors the reference's two API shapes — the classic fluent chain
(``PipeFlow.From.Csv(...).Filter(...).Map(...).ToCsv(...)``,
``PipeFlow/PipeFlow.cs:21-65``) and the builder variant returning a
``PipelineResult`` (``PipeFlow/Builder/PipelineBuilder.cs:163-197``) — as a
thin, zero-cost wrapper around a lazy Ray ``Dataset`` plan. Operators apply
strictly in chaining order (the reference contract, ``Pipeline.cs:121-131``);
Ray Data's lazy logical plan preserves that for free.

Nothing executes until a sink/action is called (``write_*``, ``to_list``,
``count``, ``execute``) — matching the reference's pull-based laziness
(``Pipeline.cs:104-119``) but with Ray's streaming executor (backpressure,
block pipelining, spill) instead of a single-threaded enumerator.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum

from pipeflow_ray.schema import canonicalize_columns
from pipeflow_ray.stages import columns as col_ops
from pipeflow_ray.stages import core as core_ops
from pipeflow_ray.stages import dedup as dedup_ops


@dataclass
class PipelineResult:
    """Analog of the reference's ``PipelineResult`` (``Builder/IPipelineBuilder.cs:55-83``)."""

    success: bool
    data: Any = None
    processed_count: int = 0
    execution_time_s: float = 0.0
    errors: list[str] = field(default_factory=list)


_AGG_FACTORIES = {
    "count": lambda col, name: Count(alias_name=name),
    "sum": lambda col, name: Sum(col, alias_name=name),
    "mean": lambda col, name: Mean(col, alias_name=name),
    "avg": lambda col, name: Mean(col, alias_name=name),
    "average": lambda col, name: Mean(col, alias_name=name),
    "min": lambda col, name: Min(col, alias_name=name),
    "max": lambda col, name: Max(col, alias_name=name),
    "std": lambda col, name: Std(col, alias_name=name),
}


class GroupedPipeline:
    """Result of ``Pipeline.group_by`` (reference ``PipeFlow.cs:466-507``)."""

    def __init__(self, pipeline: "Pipeline", keys: list[str]):
        self._p = pipeline
        self._keys = keys

    def aggregate(self, **named_aggs: tuple[str, str] | str) -> "Pipeline":
        """``aggregate(avg_salary=("mean", "Salary"), n=("count", None))`` —
        built-in distributed aggs (partial+final under the hood). Reference
        analog: ``GroupBy(keyColumn, (name, aggregator)...)``
        (``PipeFlow.cs:480-507``), restricted to the decomposable aggregators
        its tests exercise (Count/Average/Max — ``ExtensionTests.cs:137-152``)
        plus Sum/Min/Std."""
        aggs = []
        for out_name, spec in named_aggs.items():
            if isinstance(spec, str):
                kind, col = spec, None
            else:
                kind, col = spec
            aggs.append(_AGG_FACTORIES[kind.lower()](col, out_name))
        return Pipeline(self._p._ds.groupby(self._keys).aggregate(*aggs))

    def map_groups(self, fn, batch_format: str = "pyarrow", **kw) -> "Pipeline":
        """Arbitrary per-group UDF (the reference's arbitrary
        ``Func<IEnumerable<DataRow>, object>`` aggregator path) — accepts the
        shuffle cost; groups are co-located by hash partitioning."""
        return Pipeline(self._p._ds.groupby(self._keys).map_groups(fn, batch_format=batch_format, **kw))


class Pipeline:
    """Fluent, lazy pipeline over a Ray ``Dataset``."""

    def __init__(self, ds: ray.data.Dataset):
        self._ds = ds
        self._batch_size: int | None = None  # reference Batch(n), PipeFlow.cs:206-216
        self._concurrency: int | None = None  # reference Parallel(maxDOP), PipeFlow.cs:198-204

    # ------------------------------------------------------------------ sources
    @classmethod
    def from_parquet(cls, paths, columns: list[str] | None = None, **kw) -> "Pipeline":
        return cls(ray.data.read_parquet(paths, columns=columns, **kw))

    @classmethod
    def from_csv(cls, paths, **kw) -> "Pipeline":
        """CSV source: Arrow CSV parse + type inference stands in for the
        reference's hand-rolled parser/auto-convert (``PipeFlow/CsvReader.cs:68-234``)."""
        return cls(ray.data.read_csv(paths, **kw))

    @classmethod
    def from_json(cls, paths, **kw) -> "Pipeline":
        return cls(ray.data.read_json(paths, **kw))

    @classmethod
    def from_arrow(cls, table: pa.Table) -> "Pipeline":
        return cls(ray.data.from_arrow(table))

    @classmethod
    def from_items(cls, items: list[dict]) -> "Pipeline":
        """Reference ``From.Collection`` / ``From.DataRows`` (``PipeFlow.cs:51-65``)."""
        return cls(ray.data.from_items(items))

    @classmethod
    def from_pandas(cls, df: pd.DataFrame) -> "Pipeline":
        return cls(ray.data.from_pandas(df))

    @classmethod
    def from_sql(cls, sql: str, connection_factory, params: tuple = (), **kw) -> "Pipeline":
        """SQL source; with *params*, a parameterized single-task read
        (``SqlReader.WithParameter``), else Ray's native ``read_sql``."""
        from pipeflow_ray.sources.sql import read_sql, read_sql_params

        if params:
            return cls(read_sql_params(sql, connection_factory, params))
        return cls(read_sql(sql, connection_factory, **kw))

    @classmethod
    def from_sql_builder(cls, builder, connection_factory, page_size: int = 10_000) -> "Pipeline":
        """Pushdown source: a :class:`~pipeflow_ray.sources.sql.SqlQueryBuilder`
        whose operators run in the database, paged as parallel Ray tasks."""
        return cls(builder.read(connection_factory, page_size=page_size))

    @property
    def dataset(self) -> ray.data.Dataset:
        return self._ds

    def _chain(self, ds: ray.data.Dataset) -> "Pipeline":
        p = Pipeline(ds)
        p._batch_size = self._batch_size
        p._concurrency = self._concurrency
        return p

    def _mb_kwargs(self) -> dict:
        kw: dict[str, Any] = {}
        if self._batch_size is not None:
            kw["batch_size"] = self._batch_size
        if self._concurrency is not None:
            kw["concurrency"] = self._concurrency
        return kw

    # ------------------------------------------------------------- core operators
    def canonicalize(self, rename: dict[str, str] | None = None) -> "Pipeline":
        return self._chain(
            self._ds.map_batches(
                lambda t: canonicalize_columns(t, rename), batch_format="pyarrow", **self._mb_kwargs()
            )
        )

    def filter(self, predicate) -> "Pipeline":
        """Reference ``Filter``/``Where`` (``Pipeline.cs:25-37``); vectorized."""
        return self._chain(
            self._ds.map_batches(
                core_ops.filter_batches(predicate), batch_format="pyarrow", **self._mb_kwargs()
            )
        )

    where = filter

    def map(self, fn: Callable[[pa.Table], pa.Table], batch_format: str = "pyarrow", **kw) -> "Pipeline":
        """Reference ``Map``/``Select`` (``Pipeline.cs:39-51``) at batch level —
        *fn* is table→table, may change shape/schema."""
        return self._chain(self._ds.map_batches(fn, batch_format=batch_format, **{**self._mb_kwargs(), **kw}))

    map_batches = map
    select_batches = map

    def select(self, columns: list[str]) -> "Pipeline":
        return self._chain(self._ds.select_columns(columns))

    select_columns = select

    def select_many(self, fn: Callable[[dict], Iterable[dict]]) -> "Pipeline":
        """Reference ``SelectMany`` (``Pipeline.cs:53-60``): 1 → N records.
        Row-level — fine for control-sized data; use :meth:`explode` for the
        vectorized batch-level flatten."""
        return self._chain(self._ds.flat_map(fn))

    flat_map = select_many

    def explode(self, list_col: str) -> "Pipeline":
        """Vectorized flatten of a list column: 1 row → len(list) rows."""
        import pyarrow.compute as pc

        def _explode(t: pa.Table) -> pa.Table:
            lists = t.column(list_col)
            if isinstance(lists, pa.ChunkedArray):
                lists = lists.combine_chunks()
            parents = pc.list_parent_indices(lists)
            flat = pc.list_flatten(lists)
            base = t.drop_columns([list_col]).take(parents)
            return base.append_column(list_col, flat)

        return self.map(_explode)

    def take_n(self, n: int) -> "Pipeline":
        """Reference ``Take`` (``Pipeline.cs:62-69``)."""
        return self._chain(self._ds.limit(n))

    limit = take_n

    def skip(self, n: int, by: str | list[str] | None = None) -> "Pipeline":
        """Reference ``Skip`` (``Pipeline.cs:71-78``). Ray blocks are unordered,
        so a global skip needs an explicit order: when *by* is given we sort
        first; otherwise current plan order is used. Triggers execution
        (split_at_indices needs block counts)."""
        ds = self._ds.sort(by) if by else self._ds
        return self._chain(ds.split_at_indices([n])[1])

    def distinct(self, cols: list[str] | None = None) -> "Pipeline":
        """Reference ``Distinct()`` (``Pipeline.cs:80-84``)."""
        return self._chain(dedup_ops.distinct_rows(self._ds, cols))

    def remove_duplicates(self, key, order_by) -> "Pipeline":
        """Reference ``RemoveDuplicates(keyColumn)`` (``PipeFlow.cs:218-232``),
        first-wins under the explicit *order_by* key."""
        return self._chain(dedup_ops.remove_duplicates(self._ds, key, order_by))

    def order_by(self, key, descending: "bool | list[bool]" = False) -> "Pipeline":
        """Reference ``OrderBy``/``OrderByDescending`` (``Pipeline.cs:86-102``):
        global range-partitioned shuffle sort."""
        return self._chain(self._ds.sort(key, descending=descending))

    sort = order_by

    # --------------------------------------------------------- column transforms
    def add_column(self, name: str, selector) -> "Pipeline":
        return self._chain(
            self._ds.map_batches(col_ops.add_column(name, selector), batch_format="pyarrow", **self._mb_kwargs())
        )

    def remove_column(self, *names: str) -> "Pipeline":
        return self._chain(
            self._ds.map_batches(col_ops.remove_columns(list(names)), batch_format="pyarrow", **self._mb_kwargs())
        )

    def rename_column(self, old: str, new: str) -> "Pipeline":
        return self._chain(
            self._ds.map_batches(col_ops.rename_column(old, new), batch_format="pyarrow", **self._mb_kwargs())
        )

    def fill_missing(self, column: str, default: Any) -> "Pipeline":
        return self._chain(
            self._ds.map_batches(col_ops.fill_missing(column, default), batch_format="pyarrow", **self._mb_kwargs())
        )

    def cast(self, casts: dict[str, pa.DataType], safe: bool = True) -> "Pipeline":
        return self._chain(
            self._ds.map_batches(col_ops.cast_columns(casts, safe), batch_format="pyarrow", **self._mb_kwargs())
        )

    # ------------------------------------------------------------------- tuning
    def batch(self, batch_size: int) -> "Pipeline":
        """Reference ``Batch(batchSize)`` micro-batching (``PipeFlow.cs:206-216``):
        here it just sets the batch size for subsequent vectorized stages."""
        p = self._chain(self._ds)
        p._batch_size = batch_size
        return p

    def parallel(self, max_dop: int) -> "Pipeline":
        """Reference ``Parallel(maxDOP)`` / ``AsParallel`` (``PipeFlow.cs:198-204``):
        Ray parallelizes by default; this bounds per-stage concurrency."""
        p = self._chain(self._ds)
        p._concurrency = max_dop
        return p

    def repartition(self, n: int, shuffle: bool = False) -> "Pipeline":
        return self._chain(self._ds.repartition(n, shuffle=shuffle))

    # ------------------------------------------------------------------ grouping
    def group_by(self, *keys: str) -> GroupedPipeline:
        return GroupedPipeline(self, list(keys))

    def union(self, other: "Pipeline") -> "Pipeline":
        return self._chain(self._ds.union(other._ds))

    # ------------------------------------------------------------------- actions
    def execute(self, collect: bool = False) -> PipelineResult:
        """Builder-API ``Execute()`` (``PipelineBuilder.cs:163-197``): run the
        chain, return a result envelope. By default counts without
        materializing rows to the driver (unlike the reference, which
        ``ToList()``s everything); ``collect=True`` also returns the rows."""
        t0 = time.perf_counter()
        try:
            if collect:
                rows = self._ds.take_all()
                return PipelineResult(True, rows, len(rows), time.perf_counter() - t0)
            n = self._ds.count()
            return PipelineResult(True, None, n, time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001 — result envelope captures failure
            return PipelineResult(False, None, 0, time.perf_counter() - t0, [str(e)])

    def to_list(self) -> list[dict]:
        return self._ds.take_all()

    def to_pandas(self, limit: int | None = None) -> pd.DataFrame:
        return self._ds.to_pandas(limit=limit)

    def to_arrow(self) -> pa.Table:
        tables = [b for b in self._ds.iter_batches(batch_format="pyarrow", batch_size=None)]
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables, promote_options="permissive")

    def first(self) -> dict:
        """Reference ``First`` (``Pipeline.cs:170-178``): raises on empty."""
        rows = self._ds.take(1)
        if not rows:
            raise ValueError("sequence contains no elements")
        return rows[0]

    def first_or_default(self, default=None):
        rows = self._ds.take(1)
        return rows[0] if rows else default

    def sample(self, fraction: float, seed: int | None = None) -> "Pipeline":
        """Random sample (SURVEY §2.9; not in the reference — scale addition)."""
        return self._chain(self._ds.random_sample(fraction, seed=seed))

    def count(self) -> int:
        return self._ds.count()

    def for_each_batch(self, fn, batch_format: str = "pyarrow", batch_size: int | None = None):
        """Terminal side-effecting iteration (reference ``ForEach``,
        ``Pipeline.cs:138-158``) — driver-side streaming consumption."""
        for b in self._ds.iter_batches(batch_format=batch_format, batch_size=batch_size):
            fn(b)

    def stream(self, batch_size: int | None = None, batch_format: str = "pyarrow"):
        """Builder-API ``Stream()`` (``PipelineBuilder.cs:199-213``): lazy iteration."""
        return self._ds.iter_batches(batch_format=batch_format, batch_size=batch_size)

    # -------------------------------------------------------- validation
    def validate(self, validator, strategy: str = "skip"):
        """Reference ``Validate(configure, errorHandling)`` (``PipeFlow.cs:509-557``).
        Strategies: throw / skip / log / fix / route (route → (valid, invalid))."""
        from pipeflow_ray.stages.validate import apply_validation

        out = apply_validation(self._ds, validator, strategy)
        if strategy == "route":
            valid, invalid = out
            return self._chain(valid), self._chain(invalid)
        return self._chain(out)

    def validate_with_results(self, validator) -> "Pipeline":
        """Reference ``ValidateWithResults`` (``PipeFlow.cs:559-574``)."""
        from pipeflow_ray.stages.validate import validate_with_results as _vwr

        return self._chain(_vwr(self._ds, validator))

    # ------------------------------------------------- streaming layer (north rule)
    def tumbling_window(self, keys: list[str], width_s: float, specs: dict, ts_col: str = "ts") -> "Pipeline":
        from pipeflow_ray.stages.window import tumbling_aggregate

        return self._chain(tumbling_aggregate(self._ds, keys, width_s, specs, ts_col))

    def sliding_window(self, keys: list[str], width_s: float, slide_s: float, specs: dict, ts_col: str = "ts") -> "Pipeline":
        from pipeflow_ray.stages.window import sliding_aggregate

        return self._chain(sliding_aggregate(self._ds, keys, width_s, slide_s, specs, ts_col))

    def session_window(self, key: str, gap_s: float, specs: dict, ts_col: str = "ts") -> "Pipeline":
        from pipeflow_ray.stages.window import session_aggregate

        return self._chain(session_aggregate(self._ds, key, gap_s, specs, ts_col))

    def split_late(self, lateness_s: float, ts_col: str = "ts") -> "tuple[Pipeline, Pipeline]":
        """Watermark split: (on_time, late); late rows routed, never dropped."""
        from pipeflow_ray.stages.watermark import compute_watermark, split_late

        wm = compute_watermark(self._ds, lateness_s, ts_col)
        on_time, late = split_late(self._ds, wm, ts_col)
        return self._chain(on_time), self._chain(late)

    def join_broadcast(self, small, on, how: str = "inner") -> "Pipeline":
        from pipeflow_ray.stages.join import broadcast_join

        return self._chain(broadcast_join(self._ds, small, on, how))

    def join_hash(self, other: "Pipeline", on, how: str = "inner", num_partitions: int = 32) -> "Pipeline":
        from pipeflow_ray.stages.join import hash_join

        return self._chain(hash_join(self._ds, other._ds, on, how, num_partitions))

    def join_turn_response(self, key: str = "conv_id", order_col: str = "turn_idx",
                           carry_cols: list[str] | None = None) -> "Pipeline":
        from pipeflow_ray.stages.join import turn_response_join

        return self._chain(turn_response_join(self._ds, key, order_col, carry_cols))

    def join_asof(self, other: "Pipeline", key: str, ts_col: str = "ts",
                  direction: str = "backward", suffix: str = "_r",
                  num_buckets: int = 64) -> "Pipeline":
        from pipeflow_ray.stages.join import asof_join

        return self._chain(asof_join(self._ds, other._ds, key, ts_col, direction,
                                     suffix, num_buckets))

    def join_semi(self, other: "Pipeline", left_on: str,
                  right_on: str | None = None) -> "Pipeline":
        from pipeflow_ray.stages.join import semi_join

        return self._chain(semi_join(self._ds, other._ds, left_on, right_on))

    def join_anti(self, other: "Pipeline", left_on: str,
                  right_on: str | None = None) -> "Pipeline":
        from pipeflow_ray.stages.join import anti_join

        return self._chain(anti_join(self._ds, other._ds, left_on, right_on))

    def match_pattern(self, steps, within_us: int | None = None, emit=(),
                      key: str = "conv_id", order: str = "turn_idx",
                      ts_col: str = "ts") -> "Pipeline":
        """CEP: consecutive per-key step-sequence matches (stages/cep)."""
        from pipeflow_ray.stages.cep import match_pattern

        return self._chain(match_pattern(self._ds, steps, within_us=within_us,
                                         emit=emit, key=key, order=order,
                                         ts_col=ts_col))

    def match_absence(self, trigger, response, within_us: int,
                      key: str = "conv_id", order: str = "turn_idx",
                      ts_col: str = "ts") -> "Pipeline":
        """CEP negation: triggers with no qualifying successor (stages/cep)."""
        from pipeflow_ray.stages.cep import match_absence

        return self._chain(match_absence(self._ds, trigger, response,
                                         within_us=within_us, key=key,
                                         order=order, ts_col=ts_col))

    def match_kleene(self, steps, within_us: int | None = None,
                     key: str = "conv_id", order: str = "turn_idx",
                     ts_col: str = "ts", emit=()) -> "Pipeline":
        """CEP Kleene-plus: [pre…, ('+', step), post…] maximal runs.
        *emit* copies source columns from the span's fixed rows (offsets
        from span start ≥ 0 / span end < 0)."""
        from pipeflow_ray.stages.cep import match_kleene

        return self._chain(match_kleene(self._ds, steps, within_us=within_us,
                                        key=key, order=order, ts_col=ts_col,
                                        emit=emit))

    def match_many(self, patterns: dict, key: str = "conv_id",
                   order: str = "turn_idx", ts_col: str = "ts") -> "Pipeline":
        """CEP pattern library in one pass (one shuffle for N patterns)."""
        from pipeflow_ray.stages.cep import match_many

        return self._chain(match_many(self._ds, patterns, key=key, order=order,
                                      ts_col=ts_col))

    def window_functions(self, key: str, order: str, specs: dict) -> "Pipeline":
        """Per-key ordered analytics (lag/lead/diff/cumsum/rank/…)."""
        from pipeflow_ray.stages.window import keyed_window_functions

        return self._chain(keyed_window_functions(self._ds, key, order, specs))

    def quantiles(self, keys: list[str], value_col: str,
                  qs=(0.25, 0.5, 0.75)) -> "Pipeline":
        """Exact grouped discrete quantiles (percentile_disc semantics).
        Exact state is O(keys × distinct values) — for unbounded CONTINUOUS
        value domains use :meth:`quantiles_sketch`."""
        from pipeflow_ray.stages.window import grouped_quantiles

        return self._chain(grouped_quantiles(self._ds, keys, value_col, qs))

    def quantiles_sketch(self, keys: list[str], value_col: str,
                         qs=(0.25, 0.5, 0.75), k: int = 400) -> "Pipeline":
        """Approximate grouped quantiles via mergeable KLL sketches — the
        unbounded-continuous-domain path: O(k·log(n/k)) state per key
        regardless of value cardinality, normalized rank error ≈ 2.3/k whp,
        exact per-key counts."""
        from pipeflow_ray.stages.window import grouped_quantiles_sketch

        return self._chain(grouped_quantiles_sketch(self._ds, keys, value_col, qs, k=k))

    def approx_distinct_by(self, keys: list[str], value_col: str,
                           p: int = 12) -> "Pipeline":
        """Per-key approximate distinct count via mergeable HLL register
        combiners (2^p bytes/key of state, values never shuffle; standard
        error ≈ 1.04/√(2^p)). Emits (keys…, n, approx_distinct); n exact."""
        from pipeflow_ray.functions.sketches import grouped_approx_distinct

        return self._chain(grouped_approx_distinct(self._ds, keys, value_col, p=p))

    def pivot_wider(self, keys: list[str], name_col: str,
                    value_col: str | None = None, agg: str = "sum",
                    names: list[str] | None = None,
                    prefix: str = "") -> "Pipeline":
        """Long→wide pivot: one column per *name_col* category holding
        ``agg`` of *value_col* (row counts when None). Categories are
        discovered unless *names* is given; aggregation goes through the
        partial combiner (≤ one shuffled row per key per batch)."""
        from pipeflow_ray.stages.columns import pivot_wider as _pw

        return self._chain(_pw(self._ds, keys, name_col, value_col, agg,
                               names, prefix))

    def unpivot(self, id_cols: list[str], value_cols: list[str],
                name_col: str = "name", value_col: str = "value",
                include_nulls: bool = False) -> "Pipeline":
        """Wide→long reshape (SQL UNPIVOT / pandas melt) — stateless,
        shuffle-free; NULL cells drop unless ``include_nulls``."""
        from pipeflow_ray.stages.columns import unpivot as _unpivot

        return self.map(_unpivot(id_cols, value_cols, name_col, value_col,
                                 include_nulls))

    # -------------------------------------------------------------------- sinks
    def write_exactly_once(self, out_dir: str, part_by="conv_id", num_partitions: int = 32,
                           ts_col: str | None = "ts", lineage: dict | None = None):
        """Exactly-once partitioned Parquet sink (per-partition atomic commit
        manifests; re-runs/retries no-op). Returns the per-partition stats frame."""
        from pipeflow_ray.state.manifest import write_exactly_once as _weo

        return _weo(self._ds, out_dir, part_by, num_partitions, ts_col, lineage)

    def to_parquet(self, path: str, **kw):
        self._ds.write_parquet(path, **kw)

    def to_csv(self, path: str, **kw):
        self._ds.write_csv(path, **kw)

    def to_json(self, path: str, **kw):
        self._ds.write_json(path, **kw)

    def to_csv_formatted(self, path: str, options=None):
        """Formatted distributed CSV sink (delimiter / headers / quote-all /
        date + bool formats / append guard — ``sources.writers``)."""
        from pipeflow_ray.sources.writers import write_csv as _wc

        _wc(self._ds, path, options)

    def to_json_formatted(self, path: str, options=None):
        """Formatted distributed JSONL sink (camelCase naming, append guard)."""
        from pipeflow_ray.sources.writers import write_json as _wj

        _wj(self._ds, path, options)

    def to_sql(self, table: str, connection_factory, upsert: bool = False,
               upsert_keys: list[str] | None = None, batch_size: int = 4096) -> int:
        """Batched transactional SQL sink; returns rows written."""
        from pipeflow_ray.sources.sql import write_sql as _ws

        return _ws(self._ds, table, connection_factory, upsert=upsert,
                   upsert_keys=upsert_keys, batch_size=batch_size)
