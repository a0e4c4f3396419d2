"""Skew handling (SURVEY §4.2): a hot key must neither break correctness nor
flood the shuffle.

The engine's skew strategy for decomposable aggregates is the per-batch
combiner in ``partial_aggregate``: a hot key contributes at most one partial
row per (batch, key, window) to the all-to-all exchange — the effect explicit
salting would give, without a detection pass. Non-decomposable keyed scans
(join pairing, session scan) are bucket-vectorized, so a hot conversation
costs linear vectorized work inside one bucket; the documented partitioning
assumption is that a single conversation fits one worker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from pipeflow_ray.fixtures import gen_transcripts
from pipeflow_ray.stages.join import turn_response_join
from pipeflow_ray.stages.window import partial_aggregate


def _skewed_table(n=100_000, hot_share=0.95) -> pa.Table:
    rng = np.random.default_rng(7)
    hot_n = int(n * hot_share)
    keys = np.concatenate([
        np.full(hot_n, "HOT"),
        np.array([f"k{i % 50:03d}" for i in range(n - hot_n)]),
    ])
    return pa.table({"k": keys, "v": rng.integers(0, 1000, n)})


def test_partial_aggregate_correct_under_extreme_skew():
    t = _skewed_table()
    out = (
        partial_aggregate(ray.data.from_arrow(t), ["k"],
                          {"s": ("sum", "v"), "n": ("count", None), "mx": ("max", "v")})
        .to_pandas().set_index("k").sort_index()
    )
    ref = (
        t.to_pandas().groupby("k")
        .agg(s=("v", "sum"), n=("v", "size"), mx=("v", "max"))
        .sort_index()
    )
    pd.testing.assert_frame_equal(out[["s", "n", "mx"]], ref, check_dtype=False)
    assert out.loc["HOT", "n"] == 95_000


def test_combiner_caps_shuffle_rows_per_hot_key():
    """The pre-shuffle partial output must be ≤ (#batches × #keys) rows —
    i.e. the hot key is reduced inside every batch before the exchange."""
    t = _skewed_table()
    ds = ray.data.from_arrow(t)

    # replicate the partial stage exactly as partial_aggregate builds it
    def _partial(tb: pa.Table) -> pa.Table:
        return tb.group_by(["k"], use_threads=False).aggregate([("v", "sum")])

    partial_rows = ds.map_batches(_partial, batch_format="pyarrow").count()
    n_keys = 51
    # with one block the bound is exactly n_keys; allow for block splitting
    assert partial_rows <= n_keys * 32
    assert partial_rows < 1000  # ≪ the 100k input rows


def test_join_complete_on_hot_conversation():
    """gen_transcripts' conv_00000000 is the deliberately hot conversation;
    the bucket-vectorized join must produce its complete pair set."""
    t = gen_transcripts(20_000)
    counts = pd.Series(t["conv_id"].to_pylist()).value_counts()
    assert counts.iloc[0] >= 3 * counts.iloc[10]  # genuinely skewed fixture

    got = turn_response_join(ray.data.from_arrow(t), carry_cols=[]).to_pandas()
    df = t.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
    nxt = df.groupby("conv_id").shift(-1)
    expected = (
        (df.role == "user") & nxt.role.isin(["assistant", "tool"]) & (nxt.turn_idx == df.turn_idx + 1)
    ).sum()
    assert len(got) == expected
    hot = counts.index[0]
    assert (got.conv_id == hot).sum() > 500
