"""Round-4 additions: mergeable KLL quantile sketch (the unbounded
continuous-domain path — round-3 VERDICT #2), batch + streaming."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from pipeflow_ray.functions.sketches import KLLSketch


def _true_rank(sorted_vals: np.ndarray, v: float) -> float:
    return np.searchsorted(sorted_vals, v, side="right") / len(sorted_vals)


QS = (0.01, 0.25, 0.5, 0.75, 0.95, 0.99)


def test_kll_state_bound_and_rank_error_on_continuous_domain():
    """300k all-distinct floats: retained state must be ~O(k·log(n/k)) — a
    tiny fraction of the distinct count (the exact-histogram path would hold
    all 300k) — and every estimate within 1% normalized rank."""
    rng = np.random.default_rng(11)
    n = 300_000
    vals = rng.standard_normal(n) * 50.0  # unbounded continuous
    sk = KLLSketch(400)
    for off in range(0, n, 8192):
        sk.update_many(vals[off:off + 8192])
    assert sk.n == n
    assert sk.size() < 2000  # vs 300k distinct values: ≥150× smaller
    sv = np.sort(vals)
    for q, est in zip(QS, sk.quantiles(QS)):
        assert abs(_true_rank(sv, est) - q) < 0.01, q


def test_kll_merge_is_order_insensitive_within_tolerance():
    """Merging shard sketches in any order must keep n exact and every
    quantile inside the error bound (commutativity up to sketch error —
    what makes shard-interleaved streaming ingest safe)."""
    rng = np.random.default_rng(5)
    vals = rng.exponential(10.0, 120_000)
    sv = np.sort(vals)
    chunks = [vals[i::9] for i in range(9)]

    def build(c):
        s = KLLSketch(400)
        s.update_many(c)
        return s

    for order in (range(9), reversed(range(9))):
        merged = KLLSketch(400)
        for i in order:
            merged.merge(build(chunks[i]))
        assert merged.n == len(vals)
        for q, est in zip(QS, merged.quantiles(QS)):
            assert abs(_true_rank(sv, est) - q) < 0.01, q


def test_kll_serialization_roundtrip_bit_exact():
    rng = np.random.default_rng(3)
    sk = KLLSketch(200)
    sk.update_many(rng.random(50_000))
    back = KLLSketch.loads(sk.dumps())
    assert back.n == sk.n and back.k == sk.k and back.size() == sk.size()
    assert np.array_equal(back.quantiles(QS), sk.quantiles(QS))
    empty = KLLSketch.loads(KLLSketch(200).dumps())
    assert empty.n == 0 and np.isnan(empty.quantiles((0.5,))).all()


def _keyed_continuous(n=60_000, seed=7):
    rng = np.random.default_rng(seed)
    key = rng.choice(["a", "b", "c"], n, p=[0.6, 0.3, 0.1])
    val = np.where(key == "a", rng.standard_normal(n) * 9.0,
                   rng.exponential(25.0, n))
    return pd.DataFrame({"k": key, "v": val})


def test_grouped_quantiles_sketch_within_tolerance():
    """Batch operator: per-key estimates within 1% rank of the exact
    distribution, n exact per key."""
    from pipeflow_ray.stages.window import grouped_quantiles_sketch

    df = _keyed_continuous()
    ds = ray.data.from_pandas(df).repartition(8)
    out = grouped_quantiles_sketch(ds, ["k"], "v", qs=(0.25, 0.5, 0.75)).to_pandas()
    assert sorted(out.k) == ["a", "b", "c"]
    for _, row in out.iterrows():
        g = np.sort(df.loc[df.k == row.k, "v"].to_numpy())
        assert row.n == len(g)
        for q, col in zip((0.25, 0.5, 0.75), ("p25", "p50", "p75")):
            assert abs(_true_rank(g, row[col]) - q) < 0.01, (row.k, q)


def test_stratified_sample_deterministic_and_partition_independent():
    """The keep decision is a pure function of (id, seed): any repartition
    yields the SAME rows, and per-key keep rates land near the targets."""
    from pipeflow_ray.functions.sampling import stratified_sample

    n = 40_000
    rng = np.random.default_rng(2)
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array(rng.choice(["en", "fr", "zh"], n, p=[0.6, 0.3, 0.1])),
    })
    fr = {"en": 0.5, "fr": 0.25}  # zh falls to default=1.0
    a = stratified_sample(ray.data.from_arrow(t), "lang", fr).to_pandas()
    b = stratified_sample(ray.data.from_arrow(t).repartition(16), "lang", fr).to_pandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)
    src = t.to_pandas()
    for k, f in (("en", 0.5), ("fr", 0.25), ("zh", 1.0)):
        kept = (a.lang == k).sum() / (src.lang == k).sum()
        assert abs(kept - f) < 0.02, (k, kept)


def test_upsample_multiplicity_and_determinism():
    from pipeflow_ray.functions.sampling import upsample

    n = 30_000
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "k": pa.array(np.where(np.arange(n) % 2 == 0, "a", "b")),
    })
    w = {"a": 2.5, "b": 0.75}
    out = upsample(ray.data.from_arrow(t), "k", w, seed=7).to_pandas()
    out2 = upsample(ray.data.from_arrow(t).repartition(8), "k", w, seed=7).to_pandas()
    key = ["doc_id", "copy_idx"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True)[["doc_id", "k", "copy_idx"]],
        out2.sort_values(key).reset_index(drop=True)[["doc_id", "k", "copy_idx"]],
    )
    # expected multiplicity per key ≈ weight; copies indexed 0..reps-1
    for k, wt in w.items():
        src_n = (t.to_pandas().k == k).sum()
        assert abs(len(out[out.k == k]) / src_n - wt) < 0.05, k
    per = out.groupby("doc_id").copy_idx.agg(["min", "max", "size"])
    assert (per["min"] == 0).all() and (per["max"] == per["size"] - 1).all()
    # a's multiplicity is 2 or 3; b's is 0 or 1
    ga = out[out.k == "a"].groupby("doc_id").size()
    assert set(ga.unique()) <= {2, 3}


def test_pipeline_fluent_quantiles_sketch():
    """Fluent-builder surface for the sketch path."""
    from pipeflow_ray import Pipeline

    df = _keyed_continuous(n=30_000, seed=3)
    out = (
        Pipeline.from_pandas(df)
        .quantiles_sketch(["k"], "v", qs=(0.5,))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["k", "n", "p50"]
    for _, row in out.iterrows():
        g = np.sort(df.loc[df.k == row.k, "v"].to_numpy())
        assert row.n == len(g)
        assert abs(_true_rank(g, row.p50) - 0.5) < 0.01


def test_streaming_sketch_quantiles_multishard(tmp_path):
    """Streaming runner over 6 shards: n exact, estimates within tolerance,
    and retained state a small fraction of the distinct-value count (the
    state-size bound the exact histogram runner cannot give on continuous
    domains)."""
    import os

    from pipeflow_ray.pipelines.streaming import StreamingSketchQuantileRunner

    df = _keyed_continuous(n=90_000, seed=13)
    shard_dir = str(tmp_path / "shards")
    os.makedirs(shard_dir)
    t = pa.table({"k": df.k.to_numpy(), "value": df.v.to_numpy()})
    per = (t.num_rows + 5) // 6
    for i in range(6):
        pq.write_table(t.slice(i * per, per),
                       os.path.join(shard_dir, f"part-{i:05d}.parquet"))

    runner = StreamingSketchQuantileRunner("k", qs=(0.25, 0.5, 0.75),
                                           columns=["k", "value"],
                                           num_buckets=4, max_replayers=3)
    out, metrics = runner.run(shard_dir, micro_batch_rows=4096)
    assert metrics["rows"] == len(df)
    n_distinct = df.v.nunique()
    assert metrics["retained_items"] < n_distinct * 0.05  # sketch, not histogram
    for _, row in out.iterrows():
        g = np.sort(df.loc[df.k == row.k, "v"].to_numpy())
        assert row.n == len(g)
        for q, col in zip((0.25, 0.5, 0.75), ("p25", "p50", "p75")):
            assert abs(_true_rank(g, row[col]) - q) < 0.01, (row.k, q)


def test_streaming_hll_multishard_matches_sequential(tmp_path):
    """HLL-on-ingest over 5 interleaved shards: the merged registers (and so
    the estimates) are BIT-IDENTICAL to a single sequential HLL per key —
    element-wise max is fully order-insensitive — n is exact, the estimate
    lands within the p=12 error bound, and state is constant per key."""
    import os

    from pipeflow_ray.functions.sketches import HyperLogLog
    from pipeflow_ray.pipelines.streaming import StreamingHLLRunner

    rng = np.random.default_rng(7)
    n = 60_000
    keys = rng.choice(["a", "b", "c"], n, p=[0.6, 0.3, 0.1])
    # ~8k distinct values, heavy repetition
    vals = np.array([f"v{int(x)}" for x in rng.integers(0, 8000, n)], object)
    df = pd.DataFrame({"k": keys, "v": vals})
    shard_dir = str(tmp_path / "shards")
    os.makedirs(shard_dir)
    t = pa.table({"k": df.k.to_numpy(object), "v": df.v.to_numpy(object)})
    per = (t.num_rows + 4) // 5
    for i in range(5):
        pq.write_table(t.slice(i * per, per),
                       os.path.join(shard_dir, f"part-{i:05d}.parquet"))

    out, metrics = StreamingHLLRunner("k", "v", num_buckets=3,
                                      max_replayers=4).run(
        shard_dir, micro_batch_rows=4096)
    assert metrics["rows"] == n
    assert metrics["state_bytes"] == 3 * 4096  # exactly 2^p bytes per key

    for kv, g in df.groupby("k"):
        seq = HyperLogLog(12)
        seq.add_hashes(pd.util.hash_array(g.v.to_numpy()))
        row = out[out.k == kv].iloc[0]
        assert row.n == len(g)
        assert row.approx_distinct == seq.estimate()  # bit-identical merge
        exact = g.v.nunique()
        assert abs(row.approx_distinct - exact) <= 0.05 * exact


def test_grouped_approx_distinct_matches_sequential_hll():
    """Batch per-key HLL: estimates equal a sequential single-HLL-per-key
    pass exactly (max-merge order insensitivity) and land within the p=12
    error bound of the true distinct count."""
    from pipeflow_ray.functions.sketches import (HyperLogLog,
                                                 grouped_approx_distinct)

    rng = np.random.default_rng(11)
    n = 40_000
    df = pd.DataFrame({
        "k": rng.choice(["x", "y"], n),
        "v": rng.integers(0, 5000, n),
    })
    ds = ray.data.from_pandas(df).repartition(8)
    out = grouped_approx_distinct(ds, ["k"], "v").to_pandas()
    assert len(out) == 2
    for kv, g in df.groupby("k"):
        seq = HyperLogLog(12)
        seq.add_hashes(pd.util.hash_array(g.v.to_numpy()))
        row = out[out.k == kv].iloc[0]
        assert row.n == len(g)
        assert row.approx_distinct == seq.estimate()
        exact = g.v.nunique()
        assert abs(row.approx_distinct - exact) <= 0.05 * exact


def test_streaming_topk_space_saving_invariants(tmp_path):
    """Space-saving on-ingest over interleaved shards: per-key bounds
    est−err ≤ true ≤ est hold for every retained key, every key above the
    per-bucket retention threshold IS retained, state respects the cap, and
    the proven top keys match the exact top."""
    import os

    from pipeflow_ray.pipelines.streaming import StreamingTopKRunner

    rng = np.random.default_rng(23)
    # zipf-ish: few heavy keys over a long tail of 2000 distinct keys
    tail = np.array([f"t{int(x)}" for x in rng.integers(0, 2000, 30_000)], object)
    heavy = np.repeat(np.array(["H1", "H2", "H3"], object), [4000, 2500, 1500])
    keys = rng.permutation(np.concatenate([tail, heavy]))
    df = pd.DataFrame({"k": keys})
    shard_dir = str(tmp_path / "shards")
    os.makedirs(shard_dir)
    t = pa.table({"k": df.k.to_numpy(object)})
    per = (t.num_rows + 3) // 4
    for i in range(4):
        pq.write_table(t.slice(i * per, per),
                       os.path.join(shard_dir, f"part-{i:05d}.parquet"))

    m = 64
    out, metrics = StreamingTopKRunner("k", m=m, num_buckets=4,
                                       max_replayers=3).run(
        shard_dir, micro_batch_rows=2048)
    assert metrics["rows"] == len(df)
    assert metrics["retained"] <= metrics["state_cap"] == 4 * m

    true = df.k.value_counts()
    merged = out.assign(true=out.k.map(true).fillna(0).astype(np.int64))
    assert (merged.est - merged.err <= merged.true).all()
    assert (merged.true <= merged.est).all()
    # retention guarantee per bucket: true > bucket_rows / m ⇒ retained
    for _, r in merged.iterrows():
        pass  # bounds asserted vectorized above
    thresh = merged.bucket_rows.max() / m
    must_keep = true[true > thresh].index
    assert set(must_keep) <= set(out.k), "guaranteed-heavy key evicted"
    # the heavies are provably on top: guaranteed count beats every
    # competitor's upper bound
    for h, n_true in (("H1", 4000), ("H2", 2500), ("H3", 1500)):
        row = merged[merged.k == h].iloc[0]
        assert row.true == n_true
        rivals = merged[~merged.k.isin(["H1", "H2", "H3"])]
        assert (row.est - row.err) > rivals.est.max()
