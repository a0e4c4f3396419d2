"""Fluent-API surface tests: the full user-facing chain shapes the reference
supports, expressed through Pipeline (SURVEY §2.1-§2.3, §2.10)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from pipeflow_ray import Pipeline
from pipeflow_ray.fixtures import gen_transcripts
from pipeflow_ray.stages.validate import DataValidator


def test_validate_route_through_pipeline():
    t = pa.table({"x": ["a", "", "c"], "n": pa.array([1, 5, 99], pa.int64())})
    v = DataValidator()
    v.column("x").required()
    v.column("n").in_range(0, 10)
    valid, invalid = Pipeline.from_arrow(t).validate(v, "route")
    assert valid.count() == 1 and invalid.count() == 2


def test_window_methods_via_pipeline(transcripts_table):
    p = Pipeline.from_arrow(transcripts_table)
    tw = p.tumbling_window(["conv_id"], 3600.0, {"n": ("count", None)}).to_pandas()
    assert tw.n.sum() == transcripts_table.num_rows
    sw = p.sliding_window(["conv_id"], 7200.0, 3600.0, {"n": ("count", None)}).to_pandas()
    assert sw.n.sum() == 2 * transcripts_table.num_rows  # each row in 2 windows
    sess = p.session_window("conv_id", 1800.0, {"n": ("count", None)}).to_pandas()
    assert sess.n.sum() == transcripts_table.num_rows


def test_split_late_and_join_through_pipeline(transcripts_table):
    p = Pipeline.from_arrow(transcripts_table)
    on_time, late = p.split_late(3600.0)
    assert on_time.count() + late.count() == transcripts_table.num_rows

    joined = p.join_turn_response(carry_cols=[]).to_pandas()
    assert len(joined) > 0 and (joined.latency_s > 0).all()


def test_join_hash_through_pipeline():
    left = Pipeline.from_items([{"k": i, "l": i} for i in range(100)])
    right = Pipeline.from_items([{"k": i, "r": -i} for i in range(50, 150)])
    out = left.join_hash(right, on="k", num_partitions=4).to_pandas()
    assert len(out) == 50 and (out.l == -out.r).all()


def test_write_exactly_once_through_pipeline(tmp_path):
    t = gen_transcripts(500)
    stats = Pipeline.from_arrow(t).write_exactly_once(str(tmp_path / "o"), num_partitions=4)
    assert stats.rows.sum() == t.num_rows
    stats2 = Pipeline.from_arrow(t).write_exactly_once(str(tmp_path / "o"), num_partitions=4)
    assert stats2.skipped.all()


def test_full_chain_reference_shape(tmp_path):
    """The reference's canonical shape: From → Filter → Map → GroupBy → To
    (README.md fluent example), on transcripts."""
    import pyarrow.compute as pc
    from pyarrow.dataset import field

    t = gen_transcripts(2000)
    out = (
        Pipeline.from_arrow(t)
        .filter(field("role") == "user")
        .add_column("n_chars", lambda tbl: pc.utf8_length(pc.fill_null(tbl["text"], "")))
        .group_by("conv_id")
        .aggregate(turns="count", chars=("sum", "n_chars"))
        .order_by("turns", descending=True)
        .take_n(5)
        .to_pandas()
    )
    assert len(out) == 5
    assert out.turns.iloc[0] == out.turns.max()
    # hot conversation must be on top
    assert out.conv_id.iloc[0] == "conv_00000000"


def test_pipeline_sql_source_and_sink(tmp_path):
    import sqlite3

    import pyarrow as pa

    from pipeflow_ray.pipeline import Pipeline
    from pipeflow_ray.sources.sql import SqlQueryBuilder

    db = str(tmp_path / "p.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE src (id INTEGER, v REAL)")
    conn.executemany("INSERT INTO src VALUES (?,?)", [(i, i * 1.5) for i in range(100)])
    conn.execute("CREATE TABLE dst (id INTEGER, v REAL)")
    conn.commit()
    conn.close()
    factory = lambda: sqlite3.connect(db)  # noqa: E731

    p = Pipeline.from_sql("SELECT id, v FROM src WHERE id < ? ORDER BY id", factory, (10,))
    assert p.count() == 10
    q = SqlQueryBuilder("src").where("id >= ?", 90).order_by("id")
    p2 = Pipeline.from_sql_builder(q, factory, page_size=4)
    assert sorted(p2.to_pandas().id.tolist()) == list(range(90, 100))
    written = p2.to_sql("dst", factory)
    assert written == 10


def test_pipeline_join_asof(tmp_path):
    import pyarrow as pa

    from pipeflow_ray.pipeline import Pipeline

    left = Pipeline.from_arrow(pa.table({"k": ["a", "a", "b"], "ts": [5, 10, 7]}))
    right = Pipeline.from_arrow(pa.table({"k": ["a", "b"], "ts": [4, 9], "val": [1, 2]}))
    out = left.join_asof(right, key="k", ts_col="ts", num_buckets=4).to_pandas()
    out = out.sort_values(["k", "ts"]).reset_index(drop=True)
    assert out.val.fillna(-1).tolist() == [1, 1, -1]  # b@7 has no prior right row


def test_fluent_cep_join_analytics_surface(transcripts_table):
    """The round-3 operators are reachable through the fluent Pipeline API."""
    import pandas as pd

    from pipeflow_ray.pipeline import Pipeline

    p = Pipeline.from_arrow(transcripts_table)
    matches = p.match_pattern(
        [{"role": "user"}, {"role": "tool"}, {"role": "user"}],
        within_us=600_000_000, emit=((1, "tool", "tool"),),
    ).to_pandas()
    assert len(matches) > 0 and "tool" in matches.columns

    timeouts = p.match_absence(
        {"role": "user"}, {"role": ["assistant", "tool"]}, within_us=600_000_000
    ).to_pandas()
    assert set(timeouts.reason) <= {"no_next", "wrong_type", "too_late"} and len(timeouts)

    wf = (
        Pipeline.from_pandas(pd.DataFrame({"k": ["a", "a", "b"], "i": [0, 1, 0],
                                           "v": [3, 5, 7]}))
        .window_functions("k", "i", {"rn": ("row_number",), "cv": ("cumsum", "v")})
        .to_pandas().sort_values(["k", "i"])
    )
    assert wf.rn.tolist() == [1, 2, 1] and wf.cv.tolist() == [3, 8, 7]

    q = (
        Pipeline.from_pandas(pd.DataFrame({"k": ["x"] * 4, "v": [1, 2, 3, 4]}))
        .quantiles(["k"], "v", qs=(0.5,)).to_pandas()
    )
    assert q.p50.tolist() == [2]

    left = Pipeline.from_pandas(pd.DataFrame({"a": [1, 2, 3]}))
    right = Pipeline.from_pandas(pd.DataFrame({"b": [2, 9]}))
    assert sorted(left.join_semi(right, "a", "b").to_pandas().a) == [2]
    assert sorted(left.join_anti(right, "a", "b").to_pandas().a) == [1, 3]


def test_fluent_kleene_and_many(transcripts_table):
    import pyarrow as pa
    import pyarrow.compute as pc

    from pipeflow_ray.pipeline import Pipeline

    t = transcripts_table.append_column(
        "nc", pc.utf8_length(pc.fill_null(transcripts_table["text"], "")).cast(pa.int64())
    )
    runs = (
        Pipeline.from_arrow(t.select(["conv_id", "turn_idx", "ts", "nc"]))
        .match_kleene([{"nc": (">=", 1000)}, ("+", {"nc": ("<", 300)}),
                       {"nc": (">=", 1000)}], within_us=1_800_000_000)
        .to_pandas()
    )
    assert len(runs) > 0 and "run_len" in runs.columns

    combo = (
        Pipeline.from_arrow(t.select(["conv_id", "turn_idx", "role", "tool", "ts"]))
        .match_many({
            "utu": {"steps": [{"role": "user"}, {"role": "tool"}, {"role": "user"}],
                    "within_us": 600_000_000, "emit": ((1, "tool", "tool"),)},
            "ua": {"steps": [{"role": "user"}, {"role": "assistant"}]},
        })
        .to_pandas()
    )
    assert set(combo.pattern) == {"utu", "ua"}


def test_fluent_unpivot_and_approx_distinct_by():
    import pyarrow as pa

    from pipeflow_ray import Pipeline

    t = pa.table({"id": [1, 2, 3, 4], "k": ["a", "a", "b", "b"],
                  "x": [10, 20, 30, 40], "y": [1, None, 3, 4]})
    out = (Pipeline.from_arrow(t).unpivot(["id"], ["x", "y"],
                                          name_col="m", value_col="v")
           .to_list())
    assert len(out) == 7  # one NULL y cell dropped
    est = (Pipeline.from_arrow(t).approx_distinct_by(["k"], "x")
           .to_pandas().sort_values("k"))
    assert est.n.tolist() == [2, 2]
    assert ((est.approx_distinct - 2).abs() < 0.2).all()
