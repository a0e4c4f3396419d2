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


@st.composite
def edge_lists(draw):
    n = draw(st.integers(1, 40))
    a = draw(st.lists(st.integers(0, 30), min_size=n, max_size=n))
    b = draw(st.lists(st.integers(0, 30), min_size=n, max_size=n))
    # normalize to id_a < id_b, drop self-loops (the near-dup pair invariant)
    pairs = {(min(x, y), max(x, y)) for x, y in zip(a, b) if x != y}
    if not pairs:
        pairs = {(0, 1)}
    pa_, pb = zip(*sorted(pairs))
    return pa.table({"id_a": pa.array(pa_, pa.int64()), "id_b": pa.array(pb, pa.int64())})


def _union_find_components(pairs: pa.Table) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()):
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    return {x: find(x) for x in parent}


@given(edge_lists())
@_settings
def test_neardup_clusters_matches_union_find(pairs):
    from pipeflow_ray.functions.dedup import neardup_clusters

    out = neardup_clusters(ray.data.from_arrow(pairs)).to_pandas()
    got = dict(zip(out.doc_id, out.cluster_id))
    assert got == _union_find_components(pairs)


@st.composite
def doc_texts(draw):
    alphabet = st.characters(min_codepoint=32, max_codepoint=0x2FF)
    return draw(st.lists(st.text(alphabet, max_size=120), min_size=1, max_size=12))


@given(doc_texts(), st.integers(2, 6), st.integers(1, 5))
@_settings
def test_winnow_fingerprint_reference_property(texts, k, w):
    """Per-doc winnowing equals a direct per-window reference computation;
    the shared-substring guarantee holds for identical docs."""
    from pipeflow_ray.functions.text import WinnowFingerprint, _kgram_hashes

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    out = WinnowFingerprint(k=k, w=w)(t)
    for i, x in enumerate(texts):
        h = _kgram_hashes(x or "", k)
        if len(h) >= w:
            ref = {min(h[j:j + w]) for j in range(len(h) - w + 1)}
        else:
            ref = {h.min()}
        assert out["n_fp"][i].as_py() == len(ref)
        acc = np.uint64(0)
        for v in ref:
            acc ^= np.uint64(v)
        assert out["fp_xor"][i].as_py() == acc.view(np.int64).item()


@st.composite
def cep_frames(draw):
    """Random keyed ordered event frames: several convs, dense-or-gappy
    turn indices, nondecreasing per-conv event time, 3 roles."""
    import pandas as pd

    n = draw(st.integers(5, 120))
    convs = draw(st.lists(st.integers(0, 4), min_size=n, max_size=n))
    roles = draw(st.lists(st.sampled_from(["user", "assistant", "tool"]),
                          min_size=n, max_size=n))
    gaps = draw(st.lists(st.integers(0, 2), min_size=n, max_size=n))
    incs = draw(st.lists(st.integers(1, 400), min_size=n, max_size=n))
    df = pd.DataFrame({"conv_id": [f"c{c}" for c in convs], "role": roles})
    base = df.groupby("conv_id").cumcount()
    df["turn_idx"] = (base + pd.Series(gaps).groupby(df.conv_id).cumsum()).astype("int64")
    df["ts_us"] = (pd.Series(incs) * 1_000_000).groupby(df.conv_id).cumsum().astype("int64")
    return df


@given(cep_frames(), st.integers(0, 2))
@_settings
def test_cep_scan_matches_property(df, case):
    """scan_matches ≡ the row-at-a-time reference on arbitrary frames
    (pure-kernel property — no Ray tasks per example)."""
    from pipeflow_ray.stages.cep import compute_step_bits, scan_matches
    from tests.test_cep import _brute_force

    cases = [
        ([{"role": "user"}, {"role": "tool"}], 300_000_000, ()),
        ([{"role": "user"}, {"role": ["assistant", "tool"]}], None, ()),
        ([{"role": "user"}, {"role": "assistant"}, {"role": "user"}], 500_000_000, ()),
    ]
    steps, within, emit = cases[case]
    d = df.copy()
    d["__bits"] = compute_step_bits(d, steps)
    got = scan_matches(d, len(steps), within, emit).sort_values(
        ["conv_id", "start_turn_idx"]).reset_index(drop=True)
    ref = _brute_force(df, steps, within, emit).sort_values(
        ["conv_id", "start_turn_idx"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


@st.composite
def categorical_values(draw):
    n = draw(st.integers(5, 120))
    keys = draw(st.lists(st.integers(0, 4), min_size=n, max_size=n))
    cats = draw(st.lists(st.sampled_from(["a", "b", "c"]), min_size=n, max_size=n))
    vals = draw(st.lists(st.integers(-50, 50), min_size=n, max_size=n))
    return pa.table({"k": pa.array(keys, pa.int64()),
                     "cat": pa.array(cats, pa.string()),
                     "v": pa.array(vals, pa.int64())})


@given(categorical_values())
@_settings
def test_pivot_wider_matches_pandas_pivot_table(t):
    from pipeflow_ray.stages.columns import pivot_wider

    out = (pivot_wider(ray.data.from_arrow(t).repartition(3), ["k"], "cat", "v",
                       agg="sum")
           .to_pandas().sort_values("k").reset_index(drop=True))
    ref = (t.to_pandas().pivot_table(index="k", columns="cat", values="v",
                                     aggfunc="sum", fill_value=0)
           .reindex(columns=sorted(t["cat"].to_pylist() and
                                   set(t["cat"].to_pylist())), fill_value=0)
           .reset_index())
    ref.columns.name = None
    assert out.columns.tolist() == ref.columns.tolist()
    for c in out.columns:
        assert (out[c].to_numpy() == ref[c].to_numpy()).all(), c


@given(categorical_values())
@_settings
def test_unpivot_pivot_roundtrip_property(t):
    """unpivot(pivot_wider(x)) over sum-aggregated data recovers exactly the
    per-(key, category) sums present in the input (absent cells emit 0 from
    the pivot and survive the melt with include_nulls=False)."""
    from pipeflow_ray.stages.columns import pivot_wider, unpivot

    cats = sorted(set(t["cat"].to_pylist()))
    wide = pivot_wider(ray.data.from_arrow(t).repartition(2), ["k"], "cat", "v",
                       agg="sum", names=cats).to_pandas()
    back = unpivot(["k"], cats, name_col="cat", value_col="v")(
        pa.Table.from_pandas(wide, preserve_index=False)).to_pandas()
    ref = (t.to_pandas().groupby(["k", "cat"]).v.sum().reset_index())
    merged = back.merge(ref, on=["k", "cat"], how="left", suffixes=("", "_ref"))
    merged["v_ref"] = merged.v_ref.fillna(0)
    assert (merged.v == merged.v_ref).all()


@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(1, 60)),  # (doc, position)
        min_size=0, max_size=120, unique=True,
    ),
    st.integers(2, 12),
)
@_settings
def test_dupspan_island_coverage_property(pos_pairs, k):
    """The vectorized island merge in substring dedup equals a brute-force
    interval union of [g, g+k) per doc — pure kernel, no Ray."""
    from pipeflow_ray.functions.dedup import _dupspan_coverage

    docs = sorted({d for d, _ in pos_pairs} | {0, 1, 2, 3, 4})
    rows = [{"doc_id": d, "g": -1, "v": 100} for d in docs]  # stat rows
    rows += [{"doc_id": d, "g": g, "v": 0} for d, g in pos_pairs]
    out = _dupspan_coverage(k)(pd.DataFrame(rows)).set_index("doc_id")

    for d in docs:
        mine = out.loc[d]
        covered = set()
        pos = [g for dd, g in pos_pairs if dd == d]
        for g in pos:
            covered.update(range(g, g + k))
        assert mine.n_dup_grams == len(pos)
        assert mine.dup_chars == len(covered)
        assert mine.n_chars == 100 and mine.n_grams == 100 - k + 1
        assert mine.dup_frac_micro == int(np.floor(1e6 * len(covered) / 100))


@given(st.data())
@_settings
def test_conv_row_mix_order_independent_sum_property(data):
    """The conversation signature (wrapping SUM of position-mixed row
    hashes) is invariant under ANY row permutation — the property the
    streaming on-ingest runner's correctness rests on."""
    from pipeflow_ray.functions.dedup import conv_row_mix

    n = data.draw(st.integers(1, 30))
    roles = data.draw(st.lists(st.sampled_from(["u", "a", None, ""]),
                               min_size=n, max_size=n))
    tools = data.draw(st.lists(st.sampled_from([None, "s", "c", ""]),
                               min_size=n, max_size=n))
    df = pd.DataFrame({"turn_idx": np.arange(n), "role": roles, "tool": tools})
    perm = data.draw(st.permutations(range(n)))
    a = conv_row_mix(df, "turn_idx", ["role", "tool"]).sum()  # uint64 wraps
    b = conv_row_mix(df.iloc[list(perm)].reset_index(drop=True),
                     "turn_idx", ["role", "tool"]).sum()
    assert a == b
    # and it IS sequence-sensitive: swapping two distinct rows' positions
    # changes the signature (if any two rows differ)
    vals = list(zip(roles, tools))
    if len(set(vals)) > 1:
        i = next(i for i in range(n) for j in range(n) if vals[i] != vals[j])
        j = next(j for j in range(n) if vals[i] != vals[j])
        df2 = df.copy()
        df2.loc[[i, j], ["role", "tool"]] = df.loc[[j, i], ["role", "tool"]].to_numpy()
        assert conv_row_mix(df2, "turn_idx", ["role", "tool"]).sum() != a
