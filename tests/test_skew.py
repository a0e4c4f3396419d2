"""Skew handling (SURVEY §4.2): a hot key must neither break correctness nor
flood the shuffle.

The engine's skew strategy for decomposable aggregates is the per-batch
combiner in ``partial_aggregate`` (a hot key contributes at most one partial
row per (batch, key, window) to the all-to-all exchange) plus OPTIONAL
detected-hot-key salting (``hot_keys=detect_hot_keys(...)``) that spreads a
heavy key's merge work across reduce buckets. Non-decomposable keyed scans
(join pairing, session scan) are bucket-vectorized with a chunked merge
(``hash_join(chunk_rows=...)``) bounding per-task memory; the documented
partitioning assumption is that a single conversation fits one worker.
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


def test_hash_join_hot_key_chunked_merge_equals_pandas():
    """One key holding 50% of the left rows lands its whole bucket in one
    merge task; a tiny chunk_rows forces the bounded-memory chunked path,
    which must equal the single-pass pandas merge (round-2 VERDICT #6)."""
    from pipeflow_ray.stages.join import hash_join

    n = 20_000
    k = np.where(np.arange(n) % 2 == 0, 7, np.arange(n) % 997).astype(np.int64)
    left = pa.table({"k": k, "lv": np.arange(n, dtype=np.int64)})
    rk = np.concatenate([np.arange(997), [7, 7]]).astype(np.int64)  # hot key fans out ×3
    right = pa.table({"k": rk, "rv": np.arange(len(rk), dtype=np.int64)})

    out = hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right), on="k",
        num_partitions=8, chunk_rows=512,
    ).to_pandas()
    ref = left.to_pandas().merge(right.to_pandas(), on="k", how="inner")
    key_cols = ["k", "lv", "rv"]
    got = out[key_cols].astype("int64").sort_values(key_cols).reset_index(drop=True)
    exp = ref[key_cols].sort_values(key_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # the hot key really is ≥half the input and fanned out ×3
    n_hot_left = int((k == 7).sum())
    assert n_hot_left >= n // 2
    assert (got.k == 7).sum() == n_hot_left * 3


def test_hash_join_right_outer_hot_key_chunked_equals_pandas():
    """Right/outer joins with one key at 50% of the probe rows must survive
    the chunked-probe path: cross-chunk unmatched-build bookkeeping has to
    emit every unmatched build row exactly once, with null probe columns
    (round-3 VERDICT #4)."""
    from pipeflow_ray.stages.join import hash_join

    n = 20_000
    k = np.where(np.arange(n) % 2 == 0, 7, np.arange(n) % 997).astype(np.int64)
    left = pa.table({"k": k, "lv": np.arange(n, dtype=np.int64)})
    # right side: hot key fans out ×3, keys 1000..1049 match nothing on the
    # left (unmatched BUILD rows — must appear once each), and left keys
    # 900..996 never appear here (unmatched probe rows — outer only)
    rk = np.concatenate([np.arange(900), [7, 7], np.arange(1000, 1050)]).astype(np.int64)
    right = pa.table({"k": rk, "rv": np.arange(len(rk), dtype=np.int64)})

    lp, rp = left.to_pandas(), right.to_pandas()
    for how in ("right", "outer"):
        out = hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right), on="k",
            how=how, num_partitions=8, chunk_rows=512,
        ).to_pandas()
        ref = lp.merge(rp, on="k", how=how)
        cols = ["k", "lv", "rv"]
        got = out[cols].astype("float64").sort_values(cols).reset_index(drop=True)
        exp = ref[cols].astype("float64").sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # unmatched build rows present exactly once each
        assert int(out.k.isin(range(1000, 1050)).sum()) == 50
        hot_rows = int((k == 7).sum())
        assert int((out.k == 7).sum()) == hot_rows * 3  # ≥half the probe, fanned ×3


def test_hot_key_salted_aggregate_equals_unsalted():
    """Salting detected hot keys across reduce buckets must not change any
    aggregate (decomposable states; round-2 VERDICT #7)."""
    from pipeflow_ray.functions.sketches import detect_hot_keys

    n = 30_000
    rng = np.random.default_rng(7)
    key = np.where(rng.random(n) < 0.5, "hot", rng.integers(0, 500, n).astype("U8"))
    df = pa.table({
        "k": pa.array(key),
        "w": pa.array((rng.integers(0, 5, n) * 100).astype(np.int64)),
        "v": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
    })
    ds = ray.data.from_arrow(df).repartition(8)
    hot = detect_hot_keys(ds, "k", top_k=3)
    assert "hot" in set(hot.key)

    specs = {"n": ("count", None), "s": ("sum", "v"), "m": ("mean", "v"),
             "mx": ("max", "v"), "mn": ("min", "v")}
    plain = partial_aggregate(ds, ["k", "w"], specs).to_pandas()
    salted = partial_aggregate(ds, ["k", "w"], specs,
                               hot_keys=hot.key.tolist(), salt=8).to_pandas()
    cols = ["k", "w"]
    a = plain.sort_values(cols).reset_index(drop=True)
    b = salted.sort_values(cols).reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # the salted result must NOT carry the salt column
    assert "__salt" not in b.columns
