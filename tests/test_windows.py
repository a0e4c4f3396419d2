"""Streaming-semantics tests: window assignment goldens vs a pandas oracle
(SURVEY §5 strategy item 4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from pipeflow_ray.stages import window as W
from pipeflow_ray.stages.watermark import compute_watermark, split_late


def _events() -> pa.Table:
    # 10 events over ~5 minutes, 2 keys
    ts = pd.to_datetime(
        ["2025-01-01 00:00:05", "2025-01-01 00:00:59", "2025-01-01 00:01:10",
         "2025-01-01 00:02:30", "2025-01-01 00:03:01", "2025-01-01 00:00:20",
         "2025-01-01 00:01:45", "2025-01-01 00:04:59", "2025-01-01 00:02:02",
         "2025-01-01 00:03:59"]
    )
    return pa.table(
        {
            "k": ["a"] * 5 + ["b"] * 5,
            "v": pa.array([1.0, 2, 3, 4, 5, 10, 20, 30, 40, 50], pa.float64()),
            "ts": pa.array(ts.values.astype("datetime64[us]"), pa.timestamp("us")),
        }
    )


def test_tumbling_aggregate_matches_pandas():
    t = _events()
    out = (
        W.tumbling_aggregate(ray.data.from_arrow(t), ["k"], 60.0,
                             {"s": ("sum", "v"), "n": ("count", None), "m": ("mean", "v")})
        .to_pandas()
        .sort_values(["k", "window_start"])
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df["window_start"] = df.ts.dt.floor("60s")
    ref = (
        df.groupby(["k", "window_start"])
        .agg(s=("v", "sum"), n=("v", "size"), m=("v", "mean"))
        .reset_index()
        .sort_values(["k", "window_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["k", "window_start", "s", "m"]], ref[["k", "window_start", "s", "m"]], check_dtype=False)
    assert list(out.n) == list(ref.n)


def test_sliding_assignment_matches_oracle():
    t = _events()
    out = (
        ray.data.from_arrow(t)
        .map_batches(W.assign_sliding(120.0, 60.0), batch_format="pyarrow")
        .to_pandas()
    )
    # oracle: row belongs to window ws iff ws <= ts < ws+width, ws on slide grid
    df = t.to_pandas()
    expect = []
    for _, r in df.iterrows():
        epoch = int(r.ts.value // 1000)  # us
        for ws in range((epoch // 60_000_000 - 1) * 60_000_000, epoch + 1, 60_000_000):
            if ws <= epoch < ws + 120_000_000 and ws >= 0:
                expect.append((r.k, r.v, ws))
    got = sorted(zip(out.k, out.v, out.window_start.astype("datetime64[us]").astype(np.int64)))
    assert got == sorted(expect)


def test_session_windows_and_aggregate():
    # key a: gaps 10s,200s(,split),5s → sessions {0,1},{2,3} with gap=60
    ts = pd.to_datetime(
        ["2025-01-01 00:00:00", "2025-01-01 00:00:10", "2025-01-01 00:03:30",
         "2025-01-01 00:03:35", "2025-01-01 01:00:00"]
    )
    t = pa.table(
        {
            "conv_id": ["a", "a", "a", "a", "b"],
            "turn_idx": pa.array([0, 1, 2, 3, 0], pa.int32()),
            "v": pa.array([1.0, 2, 3, 4, 9], pa.float64()),
            "ts": pa.array(ts.values.astype("datetime64[us]"), pa.timestamp("us")),
        }
    )
    assigned = W.assign_sessions(ray.data.from_arrow(t), key="conv_id", gap_s=60).to_pandas()
    a = assigned[assigned.conv_id == "a"].sort_values("turn_idx")
    assert list(a.session_id) == [0, 0, 1, 1]

    agg = (
        W.session_aggregate(ray.data.from_arrow(t), "conv_id", 60.0, {"s": ("sum", "v"), "n": ("count", None)})
        .to_pandas()
        .sort_values(["conv_id", "session_id"])
        .reset_index(drop=True)
    )
    assert list(agg.s) == [3.0, 7.0, 9.0]
    assert list(agg.n) == [2, 2, 1]
    assert agg.session_end.iloc[1] == pd.Timestamp("2025-01-01 00:03:35")


def test_watermark_split():
    t = _events()
    ds = ray.data.from_arrow(t)
    wm = compute_watermark(ds, lateness_s=120.0)
    assert wm == pd.Timestamp("2025-01-01 00:02:59")
    on_time, late = split_late(ds, wm)
    assert on_time.count() + late.count() == 10
    assert late.count() == t.to_pandas().ts.lt(wm).sum()


def test_grouped_quantiles_match_duckdb_quantile_disc():
    """Distributed histogram quantiles must reproduce DuckDB quantile_disc
    exactly (percentile_disc index rule), across skewed group sizes,
    singleton groups and duplicate-heavy values."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from pipeflow_ray.stages.window import grouped_quantiles

    rng = np.random.default_rng(11)
    sizes = {"a": 1, "b": 2, "c": 7, "d": 500, "e": 33}
    frames = [
        pd.DataFrame({"k": k, "v": rng.integers(0, 12, size=n).astype(np.int64)})
        for k, n in sizes.items()
    ]
    df = pd.concat(frames, ignore_index=True).sample(frac=1.0, random_state=3)
    ds = ray.data.from_pandas(df).repartition(5)
    got = (
        grouped_quantiles(ds, ["k"], "v", qs=(0.25, 0.5, 0.75))
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    ref = duckdb.query_df(df, "t", """
        SELECT k, CAST(count(*) AS BIGINT) AS n,
               CAST(quantile_disc(v, 0.25) AS BIGINT) AS p25,
               CAST(quantile_disc(v, 0.50) AS BIGINT) AS p50,
               CAST(quantile_disc(v, 0.75) AS BIGINT) AS p75
        FROM t GROUP BY k ORDER BY k""").df()
    pd.testing.assert_frame_equal(got, ref.astype(got.dtypes.to_dict()))


def test_keyed_window_functions_match_duckdb():
    """lag/diff/cumsum/row_number over (PARTITION BY k ORDER BY i) must equal
    DuckDB window functions, including nulls at partition edges."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from pipeflow_ray.stages.window import keyed_window_functions

    rng = np.random.default_rng(5)
    n = 600
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], size=n),
        "v": rng.integers(0, 100, size=n).astype(np.int64),
    })
    df["i"] = df.groupby("k").cumcount().astype(np.int64)
    ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=1)).repartition(4)
    got = keyed_window_functions(
        ds, "k", "i",
        {"prev_v": ("lag", "v"), "dv": ("diff", "v"),
         "cv": ("cumsum", "v"), "rn": ("row_number",)},
    ).to_pandas().sort_values(["k", "i"]).reset_index(drop=True)
    ref = duckdb.query_df(df, "t", """
        SELECT k, v, i,
               lag(v) OVER w AS prev_v,
               v - lag(v) OVER w AS dv,
               sum(v) OVER (PARTITION BY k ORDER BY i ROWS UNBOUNDED PRECEDING) AS cv,
               row_number() OVER w AS rn
        FROM t WINDOW w AS (PARTITION BY k ORDER BY i) ORDER BY k, i""").df()
    for c in ("prev_v", "dv", "cv", "rn"):
        pd.testing.assert_series_equal(
            got[c].astype("Float64"), ref[c].astype("Float64"), check_names=False
        )


def test_keyed_window_rank_kinds_match_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from pipeflow_ray.stages.window import keyed_window_functions

    rng = np.random.default_rng(9)
    n = 400
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], size=n),
        "v": rng.integers(0, 15, size=n).astype(np.int64),  # many ties
    })
    df["i"] = df.groupby("k").cumcount().astype(np.int64)
    ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=2)).repartition(3)
    got = keyed_window_functions(
        ds, "k", "i",
        {"r": ("rank", "v"), "dr": ("dense_rank", "v"), "mx": ("cummax", "v"),
         "mn": ("cummin", "v")},
    ).to_pandas().sort_values(["k", "i"]).reset_index(drop=True)
    ref = duckdb.query_df(df, "t", """
        SELECT k, v, i,
               rank() OVER (PARTITION BY k ORDER BY v) AS r,
               dense_rank() OVER (PARTITION BY k ORDER BY v) AS dr,
               max(v) OVER (PARTITION BY k ORDER BY i ROWS UNBOUNDED PRECEDING) AS mx,
               min(v) OVER (PARTITION BY k ORDER BY i ROWS UNBOUNDED PRECEDING) AS mn
        FROM t ORDER BY k, i""").df()
    for c in ("r", "dr", "mx", "mn"):
        assert got[c].astype("int64").tolist() == ref[c].astype("int64").tolist(), c


def test_keyed_window_rolling_sum_matches_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from pipeflow_ray.stages.window import keyed_window_functions

    rng = np.random.default_rng(13)
    n = 300
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], size=n),
        "v": rng.integers(0, 50, size=n).astype(np.int64),
    })
    df["i"] = df.groupby("k").cumcount().astype(np.int64)
    ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=4)).repartition(3)
    got = keyed_window_functions(
        ds, "k", "i", {"rs": ("rolling_sum", "v", 3)}
    ).to_pandas().sort_values(["k", "i"]).reset_index(drop=True)
    ref = duckdb.query_df(df, "t", """
        SELECT k, i, sum(v) OVER (PARTITION BY k ORDER BY i
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rs
        FROM t ORDER BY k, i""").df()
    assert got.rs.astype("int64").tolist() == ref.rs.astype("int64").tolist()
