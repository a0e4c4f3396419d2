"""Watermarks and late-data routing (north-rule extension; no analog in the
reference — it has no event-time concept).

Batch mode (static input): the watermark is ``max(ts) − allowed_lateness``,
computed with a tiny global aggregate; rows are split into on-time / late
relative to a caller-provided cutoff.

Micro-batch streaming mode (arrival order matters) lives in
``pipeflow_ray.pipelines.streaming``: a monotonic watermark is advanced per
micro-batch and rows whose ``ts`` is already behind the watermark at arrival
are routed to the late output — that is where "late" is actually observable.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Max


def compute_watermark(
    ds: ray.data.Dataset, lateness_s: float, ts_col: str = "ts"
) -> _dt.datetime:
    """Global low watermark = max(ts) − allowed_lateness. One small aggregate;
    does not materialize the dataset."""
    row = ds.aggregate(Max(ts_col, alias_name="max_ts"))
    max_ts = row["max_ts"] if row else None
    if max_ts is None:
        raise ValueError(f"cannot compute watermark: dataset has no {ts_col!r} values")
    if isinstance(max_ts, (int, float)):
        # numeric epoch micros are naive UTC — convert timezone-independently
        # (plain fromtimestamp would apply the local zone; ADVICE r1)
        max_ts = _dt.datetime.fromtimestamp(
            max_ts / 1e6, tz=_dt.timezone.utc
        ).replace(tzinfo=None)
    return max_ts - _dt.timedelta(seconds=lateness_s)


def split_late(
    ds: ray.data.Dataset, watermark: _dt.datetime, ts_col: str = "ts"
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Split into (on_time, late) relative to *watermark*. Late rows are routed
    to a side output, never silently dropped (drop_late=False default)."""
    wm = pa.scalar(watermark, type=pa.timestamp("us"))
    on_time = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t[ts_col], wm)), batch_format="pyarrow"
    )
    late = ds.map_batches(
        lambda t: t.filter(pc.less(t[ts_col], wm)), batch_format="pyarrow"
    )
    return on_time, late
