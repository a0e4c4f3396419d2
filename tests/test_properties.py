"""Property-based tests (hypothesis): randomized inputs vs pandas oracles —
coverage the reference's test suite lacks entirely (SURVEY §5: no
property-based testing in PipeFlow)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray.data

from pipeflow_ray.stages.dedup import keep_first, remove_duplicates
from pipeflow_ray.stages.window import partial_aggregate, session_aggregate

_settings = settings(
    max_examples=8,  # each example spins Ray tasks; keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@st.composite
def keyed_values(draw):
    n = draw(st.integers(10, 200))
    keys = draw(st.lists(st.integers(0, 5), min_size=n, max_size=n))
    vals = draw(st.lists(st.integers(-1000, 1000), min_size=n, max_size=n))
    return pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64()),
                     "pos": pa.array(range(n), pa.int64())})


@given(keyed_values())
@_settings
def test_partial_aggregate_matches_pandas(t):
    out = (
        partial_aggregate(ray.data.from_arrow(t), ["k"],
                          {"s": ("sum", "v"), "n": ("count", None),
                           "mn": ("min", "v"), "mx": ("max", "v"), "m": ("mean", "v")})
        .to_pandas().set_index("k").sort_index()
    )
    ref = (t.to_pandas().groupby("k")
           .agg(s=("v", "sum"), n=("v", "size"), mn=("v", "min"), mx=("v", "max"), m=("v", "mean"))
           .sort_index())
    pd.testing.assert_frame_equal(out[["s", "n", "mn", "mx", "m"]], ref, check_dtype=False)


@given(keyed_values())
@_settings
def test_remove_duplicates_first_wins_property(t):
    out = remove_duplicates(ray.data.from_arrow(t), "k", order_by="pos").to_pandas()
    ref = t.to_pandas().sort_values("pos", kind="mergesort").drop_duplicates("k", keep="first")
    got = out.sort_values("k").reset_index(drop=True)
    ref = ref.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "v", "pos"]], ref[["k", "v", "pos"]], check_dtype=False)


@given(keyed_values())
@_settings
def test_keep_first_descending_property(t):
    out = keep_first(ray.data.from_arrow(t), ["k"],
                     [("v", "descending"), ("pos", "ascending")]).to_pandas()
    ref = (t.to_pandas()
           .sort_values(["k", "v", "pos"], ascending=[True, False, True], kind="mergesort")
           .drop_duplicates("k", keep="first"))
    got = out.sort_values("k").reset_index(drop=True)
    ref = ref.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "v", "pos"]], ref[["k", "v", "pos"]], check_dtype=False)


@st.composite
def event_times(draw):
    n = draw(st.integers(5, 120))
    keys = draw(st.lists(st.sampled_from(["a", "b", "c"]), min_size=n, max_size=n))
    # microsecond offsets with occasional > gap jumps
    deltas = draw(st.lists(st.integers(0, 4000), min_size=n, max_size=n))
    ts = np.cumsum(np.array(deltas, dtype=np.int64)) * 1_000_000 + 1_700_000_000_000_000
    return pa.table({
        "k": keys,
        "ts": pa.array(ts, pa.timestamp("us")),
        "v": pa.array(range(n), pa.int64()),
    })


@given(event_times())
@_settings
def test_session_aggregate_property(t):
    gap_s = 1800.0
    out = (
        session_aggregate(ray.data.from_arrow(t), "k", gap_s, {"n": ("count", None), "s": ("sum", "v")})
        .to_pandas().sort_values(["k", "session_start"]).reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["k", "ts"], kind="mergesort")
    new = df.k.ne(df.k.shift()) | (df.ts.diff() > pd.Timedelta(seconds=gap_s))
    frag = new.cumsum()
    g = df.groupby(frag)
    ref = pd.DataFrame({
        "k": g.k.first(), "session_start": g.ts.min(), "session_end": g.ts.max(),
        "n": g.size(), "s": g.v.sum(),
    }).sort_values(["k", "session_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["k", "session_start", "session_end", "n", "s"]], ref, check_dtype=False
    )
    # conservation: every row in exactly one session
    assert out.n.sum() == t.num_rows
