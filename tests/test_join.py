"""Join tests: flagship turn-response join vs a pandas oracle; broadcast join;
large-large hash join (SURVEY §2.7)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from pipeflow_ray.fixtures import gen_transcripts
from pipeflow_ray.stages.join import broadcast_join, hash_join, turn_response_join


def _oracle_pairs(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    nxt = df.groupby("conv_id").shift(-1)
    take = (
        (df.role == "user")
        & nxt.role.isin(["assistant", "tool"])
        & (nxt.turn_idx == df.turn_idx + 1)
    )
    out = pd.DataFrame(
        {
            "conv_id": df.loc[take, "conv_id"],
            "turn_idx": df.loc[take, "turn_idx"],
            "user_text": df.loc[take, "text"],
            "response_text": nxt.loc[take, "text"],
            "response_role": nxt.loc[take, "role"],
        }
    )
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_turn_response_join_matches_oracle(transcripts_table):
    ds = ray.data.from_arrow(transcripts_table)
    got = (
        turn_response_join(ds)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    ref = _oracle_pairs(transcripts_table.to_pandas())
    assert len(got) == len(ref) > 0
    # per-turn text equality under stable (conv_id, turn_idx) ordering — the
    # BASELINE.json invariant
    pd.testing.assert_series_equal(got.user_text, ref.user_text, check_dtype=False)
    pd.testing.assert_series_equal(got.response_text, ref.response_text, check_dtype=False)
    assert (got.latency_s > 0).all()


def test_turn_response_join_hot_key_correct():
    # the generator's conv_00000000 is the hot conversation; its pairs must
    # be complete despite skew
    t = gen_transcripts(3000)
    got = turn_response_join(ray.data.from_arrow(t)).to_pandas()
    ref = _oracle_pairs(t.to_pandas())
    hot_got = got[got.conv_id == "conv_00000000"]
    hot_ref = ref[ref.conv_id == "conv_00000000"]
    assert len(hot_got) == len(hot_ref) > 100


def test_broadcast_join():
    big = ray.data.from_items([{"k": i % 3, "v": i} for i in range(100)])
    dim = pd.DataFrame({"k": [0, 1, 2], "name": ["x", "y", "z"]})
    out = broadcast_join(big, dim, on="k").to_pandas()
    assert len(out) == 100
    assert set(out.name) == {"x", "y", "z"}
    assert (out.name == out.k.map({0: "x", 1: "y", 2: "z"})).all()


def test_hash_join_large_sides():
    left = ray.data.from_items([{"k": i, "l": i * 2} for i in range(500)])
    right = ray.data.from_items([{"k": i, "r": i * 3} for i in range(250, 750)])
    out = hash_join(left, right, on="k", num_partitions=4).to_pandas()
    assert len(out) == 250
    assert (out.r == out.k * 3).all() and (out.l == out.k * 2).all()


def test_asof_join_matches_merge_asof_oracle():
    import numpy as np

    from pipeflow_ray.stages.join import asof_join

    rng = np.random.default_rng(3)
    n = 2000
    left = pd.DataFrame({
        "k": rng.integers(0, 20, n).astype(str),
        "ts": np.sort(rng.integers(0, 10_000, n)).astype("int64"),
        "lv": np.arange(n),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 20, n).astype(str),
        "ts": np.sort(rng.integers(0, 10_000, n)).astype("int64"),
        "rv": np.arange(n) * 10,
    }).drop_duplicates(["k", "ts"])

    got = (
        asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right), key="k", ts_col="ts", num_buckets=8)
        .to_pandas().sort_values(["k", "ts", "lv"]).reset_index(drop=True)
    )
    ref = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts", by="k", suffixes=("", "_r"),
    ).sort_values(["k", "ts", "lv"]).reset_index(drop=True)
    assert len(got) == len(ref)
    pd.testing.assert_series_equal(got.rv.fillna(-1), ref.rv.fillna(-1), check_dtype=False)


def test_semi_join_complements_anti_join():
    """semi ∪ anti = left (disjoint), and semi keeps exactly the EXISTS rows."""
    import pandas as pd
    import ray.data

    from pipeflow_ray.stages.join import anti_join, semi_join

    left = pd.DataFrame({"k": [1, 2, 3, 4, 5, 5], "v": list("abcdef")})
    right = pd.DataFrame({"j": [2, 2, 4, 9]})
    lds = ray.data.from_pandas(left).repartition(3)
    rds = ray.data.from_pandas(right).repartition(2)
    semi = semi_join(lds, rds, "k", "j", num_buckets=4).to_pandas()
    anti = anti_join(lds, rds, "k", "j", num_buckets=4).to_pandas()
    assert sorted(semi.v) == ["b", "d"]
    assert sorted(anti.v) == ["a", "c", "e", "f"]
    both = pd.concat([semi, anti]).sort_values("v").reset_index(drop=True)
    pd.testing.assert_frame_equal(both, left.rename(columns={}).sort_values("v").reset_index(drop=True))

    # empty right: semi empty, anti = left
    empty = ray.data.from_pandas(pd.DataFrame({"j": pd.Series([], dtype="int64")}))
    assert semi_join(lds, empty, "k", "j", num_buckets=4).count() == 0
    assert anti_join(lds, empty, "k", "j", num_buckets=4).count() == len(left)


def test_interval_join_boundaries_and_unmatched():
    import pandas as pd
    import ray.data

    from pipeflow_ray.stages.join import interval_join

    events = pd.DataFrame({
        "k": ["a", "a", "a", "a", "b", "b"],
        "ts_us": [5, 10, 20, 35, 7, 100],
        "eid": [0, 1, 2, 3, 4, 5],
    })
    intervals = pd.DataFrame({
        "k": ["a", "a", "b"],
        "start_us": [10, 30, 0],
        "end_us": [20, 40, 50],
        "iv": ["a1", "a2", "b1"],
    })
    out = interval_join(
        ray.data.from_pandas(events).repartition(2),
        ray.data.from_pandas(intervals).repartition(2),
        "k", num_buckets=4,
    ).to_pandas().sort_values("eid").reset_index(drop=True)
    # eid 0 (ts 5 < first start) and eid 5 (ts 100 > end) drop; boundaries
    # are inclusive on both ends (ts 10 and ts 20 inside [10, 20])
    assert out.eid.tolist() == [1, 2, 3, 4]
    assert out.iv.tolist() == ["a1", "a1", "a2", "b1"]
    assert out.start_us.tolist() == [10, 10, 30, 0]


def test_bloom_prefilter_prunes_without_false_negatives():
    import numpy as np
    import pandas as pd

    import ray.data

    from pipeflow_ray.stages.join import bloom_prefilter, hash_join

    rng = np.random.default_rng(5)
    probe = pd.DataFrame({"k": rng.integers(0, 100_000, 50_000),
                          "v": np.arange(50_000)})
    build = pd.DataFrame({"k": rng.choice(100_000, 500, replace=False)})
    pds = ray.data.from_pandas(probe).repartition(6)
    bds = ray.data.from_pandas(build).repartition(2)

    filtered = bloom_prefilter(pds, bds, "k")
    kept = filtered.count()
    true_matches = int(probe.k.isin(build.k).sum())
    # no false negatives; FP ≈ 0.2% of the non-matching rows at 16 bits
    assert kept >= true_matches
    assert kept <= true_matches + int(0.01 * len(probe)) + 10

    a = (hash_join(filtered, bds, on="k", how="inner").to_pandas()
         .sort_values(["k", "v"]).reset_index(drop=True))
    b = (hash_join(pds, bds, on="k", how="inner").to_pandas()
         .sort_values(["k", "v"]).reset_index(drop=True))
    assert a.equals(b)
    assert len(a) == true_matches
