"""Micro-batch streaming runtime tests: batch/stream equivalence, watermark
monotonicity, late routing, state eviction, flagship end-to-end."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from pipeflow_ray.pipelines.flagship import flagship_pipeline, normalize, session_stats
from pipeflow_ray.pipelines.streaming import SessionBucketActor, StreamingSessionRunner


def _batch_oracle_sessions(path: str, gap_s: float) -> pd.DataFrame:
    """Pandas oracle: sessionize ALL rows by event time (ignores arrival)."""
    df = pq.read_table(path, columns=["conv_id", "text", "ts"]).to_pandas()
    df["n_chars"] = df.text.fillna("").str.len()
    df = df.sort_values(["conv_id", "ts"], kind="mergesort")
    new = df.conv_id.ne(df.conv_id.shift()) | (
        df.ts.diff() > pd.Timedelta(seconds=gap_s)
    )
    frag = new.cumsum()
    g = df.groupby(frag)
    out = pd.DataFrame(
        {
            "conv_id": g.conv_id.first(),
            "session_start": g.ts.min(),
            "session_end": g.ts.max(),
            "n_turns": g.size(),
            "n_chars": g.n_chars.sum(),
        }
    ).reset_index(drop=True)
    return out.sort_values(["conv_id", "session_start"]).reset_index(drop=True)


def test_streaming_equals_batch_with_generous_lateness(transcripts_path):
    """With lateness ≥ max disorder (2h injected), nothing is late and the
    streaming result must equal the batch oracle exactly."""
    runner = StreamingSessionRunner(gap_s=1800.0, lateness_s=3 * 3600.0, num_buckets=4)
    sessions, late, metrics = runner.run(transcripts_path, micro_batch_rows=128)
    assert metrics["late_rows"] == 0 and len(late) == 0

    got = (
        sessions[["conv_id", "session_start", "session_end", "n_turns", "n_chars"]]
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )
    ref = _batch_oracle_sessions(transcripts_path, 1800.0)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_streaming_routes_late_rows(transcripts_path):
    """With lateness < injected disorder (2h), the displaced rows must land in
    the late side output — never silently dropped."""
    runner = StreamingSessionRunner(gap_s=1800.0, lateness_s=60.0, num_buckets=4)
    sessions, late, metrics = runner.run(transcripts_path, micro_batch_rows=128)
    assert metrics["late_rows"] > 0
    assert metrics["late_rows"] + sessions.n_turns.sum() == metrics["rows"]


def test_watermark_eviction_bounds_state(transcripts_path):
    """After the run (pre-flush eviction happened per batch), open state must
    be far smaller than total conversations — sessions close as the watermark
    passes them."""
    runner = StreamingSessionRunner(gap_s=1800.0, lateness_s=600.0, num_buckets=2)
    actors = [SessionBucketActor.remote(1800.0) for _ in range(2)]
    # drive manually to inspect state before flush
    import pyarrow as _pa

    pf = pq.ParquetFile(transcripts_path)
    wm = -(1 << 62)
    from pipeflow_ray.pipelines.streaming import _session_fragments

    for rb in pf.iter_batches(batch_size=256, columns=["conv_id", "text", "ts"]):
        df = pd.DataFrame(
            {
                "conv_id": rb.column("conv_id").to_pandas(),
                "ts_us": rb.column("ts").cast(_pa.int64()).to_pandas(),
                "n_chars": pd.Series(rb.column("text").to_pandas()).fillna("").str.len(),
            }
        )
        df = df[df.ts_us >= wm]
        if not len(df):
            continue
        wm = max(wm, int(df.ts_us.max()) - 600 * 1_000_000)
        frags = _session_fragments(df, 1800 * 1_000_000)
        b = pd.util.hash_array(frags.conv_id.to_numpy(dtype=object)) % 2
        ray.get([actors[i].process.remote(frags[b == i], wm) for i in range(2) if (b == i).any()])
    open_state = sum(ray.get([a.state_size.remote() for a in actors]))
    total_convs = len(pq.read_table(transcripts_path, columns=["conv_id"]).column(0).unique())
    assert open_state < total_convs * 0.5  # most conversations evicted before flush


def test_flagship_end_to_end(transcripts_path, tmp_path):
    out = str(tmp_path / "flagship")
    windowed, stats = flagship_pipeline(transcripts_path, out_dir=out, num_partitions=8)
    assert stats.rows.sum() > 0
    from pipeflow_ray.state.manifest import read_committed

    back = read_committed(out)
    assert back.num_rows == stats.rows.sum()
    assert set(back.column_names) >= {
        "conv_id", "window_start", "n_pairs", "mean_latency_s", "user_chars", "resp_chars",
    }
    # re-run: fully skipped, identical rows
    _, stats2 = flagship_pipeline(transcripts_path, out_dir=out, num_partitions=8)
    assert stats2.skipped.all() and stats2.rows.sum() == stats.rows.sum()


def test_session_stats_matches_oracle(transcripts_path):
    got = (
        session_stats(transcripts_path)
        .to_pandas()
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )
    ref = _batch_oracle_sessions(transcripts_path, 1800.0)
    # normalize() trims text → n_chars differs from raw oracle; compare counts/bounds
    pd.testing.assert_frame_equal(
        got[["conv_id", "session_start", "session_end", "n_turns"]],
        ref[["conv_id", "session_start", "session_end", "n_turns"]],
        check_dtype=False,
    )


def test_flagship_resume_recomputes_only_missing(transcripts_path, tmp_path):
    """Checkpoint/resume: wipe 2 of the committed manifests; the re-run must
    recompute exactly those partitions and no-op the rest, with identical
    final output."""
    import json
    import os

    out = str(tmp_path / "resume")
    _, stats1 = flagship_pipeline(transcripts_path, out_dir=out, num_partitions=8)
    from pipeflow_ray.state.manifest import read_committed

    before = read_committed(out).sort_by([("conv_id", "ascending"), ("window_start", "ascending")])

    mdir = os.path.join(out, "_manifests")
    victims = sorted(os.listdir(mdir))[:2]
    pids = []
    for v in victims:
        with open(os.path.join(mdir, v)) as f:
            pids.append(json.load(f)["partition_id"])
        os.remove(os.path.join(mdir, v))

    _, stats2 = flagship_pipeline(transcripts_path, out_dir=out, num_partitions=8)
    st = stats2.set_index("partition_id")
    assert not st.loc[pids, "skipped"].any()  # the two wiped ones recomputed
    assert st.drop(index=pids).skipped.all()  # everything else no-oped

    after = read_committed(out).sort_by([("conv_id", "ascending"), ("window_start", "ascending")])
    assert after.equals(before)  # byte-identical logical content


def test_streaming_tumbling_equals_batch(transcripts_path):
    """Streaming tumbling windows (watermark finalization, generous lateness)
    must equal the batch tumbling aggregate."""
    from pipeflow_ray.pipelines.streaming import StreamingTumblingRunner

    runner = StreamingTumblingRunner(width_s=3600.0, lateness_s=3 * 3600.0, num_buckets=4)
    windows, metrics = runner.run(transcripts_path, micro_batch_rows=128)
    assert metrics["late_rows"] == 0
    assert windows.n.sum() == metrics["rows"]

    df = pq.read_table(transcripts_path, columns=["conv_id", "text", "ts"]).to_pandas()
    df["v"] = df.text.fillna("").str.len()
    df["ws"] = df.ts.astype("datetime64[us]").astype(np.int64) // 3_600_000_000 * 3_600_000_000
    ref = df.groupby(["conv_id", "ws"]).agg(n=("v", "size"), value_sum=("v", "sum")).reset_index()

    got = windows.sort_values(["key", "window_start_us"]).reset_index(drop=True)
    ref = ref.sort_values(["conv_id", "ws"]).reset_index(drop=True)
    assert len(got) == len(ref)
    assert (got.n.to_numpy() == ref.n.to_numpy()).all()
    assert (got.value_sum.to_numpy() == ref.value_sum.to_numpy()).all()


def test_streaming_tumbling_bounds_state(transcripts_path):
    """Watermark finalization must keep open-window state small relative to
    total (key, window) pairs."""
    from pipeflow_ray.pipelines.streaming import StreamingTumblingRunner, TumblingBucketActor

    runner = StreamingTumblingRunner(width_s=3600.0, lateness_s=600.0, num_buckets=2)
    windows, metrics = runner.run(transcripts_path, micro_batch_rows=128)
    # conservation: every on-time row lands in exactly one emitted window
    assert windows.n.sum() + metrics["late_rows"] == metrics["rows"]


def test_parallel_multishard_replay_equals_batch(tmp_path):
    """Parallel per-shard replay + global min-watermark must equal batch
    event-time sessionization when lateness covers total disorder."""
    import os

    import pyarrow.parquet as _pq

    from pipeflow_ray.fixtures import gen_transcripts
    from pipeflow_ray.pipelines.streaming import ParallelStreamingRunner

    t = gen_transcripts(4000)
    shard_dir = str(tmp_path / "shards")
    os.makedirs(shard_dir)
    n_shards = 5
    rows_per = (t.num_rows + n_shards - 1) // n_shards
    for k in range(n_shards):
        _pq.write_table(t.slice(k * rows_per, rows_per),
                        os.path.join(shard_dir, f"part-{k:05d}.parquet"))
    single = str(tmp_path / "single.parquet")
    _pq.write_table(t, single)

    runner = ParallelStreamingRunner(gap_s=1800.0, lateness_s=6 * 3600.0, num_buckets=4)
    sessions, metrics = runner.run(shard_dir, micro_batch_rows=256)
    assert metrics["shards"] == 5 and metrics["late_rows"] == 0
    assert metrics["rows"] == t.num_rows

    got = (
        sessions[["conv_id", "session_start", "session_end", "n_turns", "n_chars"]]
        .sort_values(["conv_id", "session_start"]).reset_index(drop=True)
    )
    ref = _batch_oracle_sessions(single, 1800.0)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_parallel_replay_watermark_is_min_over_shards():
    """The global watermark must not pass any shard's local watermark."""
    import ray as _ray

    from pipeflow_ray.pipelines.streaming import WatermarkActor

    wm = WatermarkActor.remote([0, 1, 2])
    assert _ray.get(wm.advance.remote(0, 1000)) < 0  # others still at -inf
    _ray.get(wm.advance.remote(1, 500))
    g = _ray.get(wm.advance.remote(2, 2000))
    assert g == 500  # min rule
    g = _ray.get(wm.finish.remote(1))
    assert g == 1000  # finished shard no longer holds the watermark back


def test_checkpoint_resume_midstream_exactly_once(transcripts_path, tmp_path):
    """Kill the streaming job mid-stream (after 7 of ~20 micro-batches), then
    resume from the checkpoint: committed output must equal an uninterrupted
    run AND the batch oracle — no duplicates, no gaps."""
    from pipeflow_ray.pipelines.streaming import CheckpointingSessionRunner
    from pipeflow_ray.state.manifest import read_committed

    kw = dict(micro_batch_rows=64, checkpoint_every=3)  # ~16 micro-batches

    # uninterrupted reference run
    full_dir = str(tmp_path / "full")
    r1 = CheckpointingSessionRunner(gap_s=1800.0, lateness_s=3 * 3600.0, num_buckets=4)
    m_full = r1.run(transcripts_path, full_dir, **kw)
    assert m_full is not None
    full = read_committed(full_dir).to_pandas().sort_values(
        ["conv_id", "start_us"]).reset_index(drop=True)

    # crashed run: stops after 7 batches, no final flush
    crash_dir = str(tmp_path / "crash")
    r2 = CheckpointingSessionRunner(gap_s=1800.0, lateness_s=3 * 3600.0, num_buckets=4)
    assert r2.run(transcripts_path, crash_dir, stop_after_batches=7, **kw) is None

    # resume from the surviving checkpoint → completes
    r3 = CheckpointingSessionRunner(gap_s=1800.0, lateness_s=3 * 3600.0, num_buckets=4)
    m_res = r3.run(transcripts_path, crash_dir, **kw)
    assert m_res is not None
    resumed = read_committed(crash_dir).to_pandas().sort_values(
        ["conv_id", "start_us"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(resumed, full)

    # and both equal the event-time batch oracle
    ref = _batch_oracle_sessions(transcripts_path, 1800.0)
    got = resumed.copy()
    got["session_start"] = pd.to_datetime(got.start_us, unit="us")
    got["session_end"] = pd.to_datetime(got.end_us, unit="us")
    got = got[["conv_id", "session_start", "session_end", "n_turns", "n_chars"]]
    got = got.sort_values(["conv_id", "session_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_streaming_join_equals_batch_join(transcripts_path):
    """Incremental actor-state join must equal the batch turn-response join
    when the eviction gap covers the stream's disorder."""
    from pipeflow_ray.pipelines.streaming import StreamingJoinRunner
    from pipeflow_ray.stages.join import turn_response_join

    runner = StreamingJoinRunner(lateness_s=3 * 3600.0, num_buckets=4)
    pairs, metrics = runner.run(transcripts_path, micro_batch_rows=128)

    ds = ray.data.read_parquet(transcripts_path)
    batch = turn_response_join(ds, carry_cols=[]).to_pandas()

    assert metrics["pairs"] == len(batch) > 0
    got = pairs.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ref = batch.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (got.conv_id.to_numpy() == ref.conv_id.to_numpy()).all()
    assert (got.turn_idx.to_numpy() == ref.turn_idx.to_numpy().astype("int64")).all()
    assert (pd.to_datetime(got.resp_ts_us, unit="us").to_numpy()
            == ref.response_ts.astype("datetime64[ns]").to_numpy()).all()


def test_streaming_join_evicts_unmatched(transcripts_path):
    """With a small eviction gap the pending-turn state must stay bounded."""
    from pipeflow_ray.pipelines.streaming import StreamingJoinRunner

    runner = StreamingJoinRunner(lateness_s=600.0, eviction_gap_s=600.0, num_buckets=4)
    pairs, metrics = runner.run(transcripts_path, micro_batch_rows=128)
    assert metrics["open_state"] < metrics["rows"] * 0.2  # evicted, not hoarded


def test_streaming_sliding_equals_batch(transcripts_path):
    """Streaming sliding windows (2h width / 1h slide; row replicated into
    both containing windows) must equal the batch sliding aggregate."""
    from pipeflow_ray.pipelines.streaming import StreamingSlidingRunner

    runner = StreamingSlidingRunner(width_s=7200.0, slide_s=3600.0,
                                    lateness_s=3 * 3600.0, num_buckets=4)
    windows, metrics = runner.run(transcripts_path, micro_batch_rows=128)
    assert metrics["late_rows"] == 0
    assert windows.n.sum() == 2 * metrics["rows"]  # every row in exactly 2 windows

    df = pq.read_table(transcripts_path, columns=["conv_id", "text", "ts"]).to_pandas()
    df["v"] = df.text.fillna("").str.len()
    tus = df.ts.astype("datetime64[us]").astype(np.int64)
    slide = 3_600_000_000
    parts = []
    for i in range(2):
        ws = tus // slide * slide - i * slide
        sub = pd.DataFrame({"conv_id": df.conv_id, "ws": ws, "v": df.v})
        parts.append(sub[tus < ws + 2 * slide])
    rep = pd.concat(parts, ignore_index=True)
    ref = rep.groupby(["conv_id", "ws"]).agg(n=("v", "size"), value_sum=("v", "sum")).reset_index()

    got = windows.sort_values(["key", "window_start_us"]).reset_index(drop=True)
    ref = ref.sort_values(["conv_id", "ws"]).reset_index(drop=True)
    assert len(got) == len(ref)
    assert (got.n.to_numpy() == ref.n.to_numpy()).all()
    assert (got.value_sum.to_numpy() == ref.value_sum.to_numpy()).all()


def test_join_checkpoint_resume_midstream_exactly_once(transcripts_path, tmp_path):
    """Kill the streaming JOIN mid-stream, resume from checkpoint: committed
    pairs must equal an uninterrupted run AND the plain streaming join —
    no duplicates, no gaps."""
    from pipeflow_ray.pipelines.streaming import (
        CheckpointingJoinRunner,
        StreamingJoinRunner,
    )
    from pipeflow_ray.state.manifest import read_committed

    kw = dict(micro_batch_rows=64, checkpoint_every=3)
    key = ["conv_id", "turn_idx"]

    full_dir = str(tmp_path / "full")
    r1 = CheckpointingJoinRunner(lateness_s=3 * 3600.0, num_buckets=4)
    assert r1.run(transcripts_path, full_dir, **kw) is not None
    full = read_committed(full_dir).to_pandas().sort_values(key).reset_index(drop=True)

    crash_dir = str(tmp_path / "crash")
    r2 = CheckpointingJoinRunner(lateness_s=3 * 3600.0, num_buckets=4)
    assert r2.run(transcripts_path, crash_dir, stop_after_batches=5, **kw) is None

    r3 = CheckpointingJoinRunner(lateness_s=3 * 3600.0, num_buckets=4)
    assert r3.run(transcripts_path, crash_dir, **kw) is not None
    resumed = read_committed(crash_dir).to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(resumed, full)

    plain, _m = StreamingJoinRunner(lateness_s=3 * 3600.0, num_buckets=4).run(
        transcripts_path, micro_batch_rows=64
    )
    plain = plain.sort_values(key).reset_index(drop=True)[full.columns.tolist()]
    pd.testing.assert_frame_equal(resumed, plain, check_dtype=False)


def test_checkpoint_reruns_are_noops(transcripts_path, tmp_path):
    """Re-running an already-completed checkpointed job must replay nothing,
    commit nothing new, and leave the committed output identical (no empty
    partitions accumulating, no re-flushed state)."""
    from pipeflow_ray.pipelines.streaming import (
        CheckpointingJoinRunner,
        CheckpointingSessionRunner,
    )
    from pipeflow_ray.state.manifest import completed_partitions, read_committed

    s_dir = str(tmp_path / "s")
    r = CheckpointingSessionRunner(gap_s=1800.0, lateness_s=3 * 3600.0, num_buckets=2)
    m1 = r.run(transcripts_path, s_dir, micro_batch_rows=256, checkpoint_every=4)
    n_parts = len(completed_partitions(s_dir))
    rows1 = read_committed(s_dir).num_rows
    m2 = CheckpointingSessionRunner(gap_s=1800.0, lateness_s=3 * 3600.0, num_buckets=2).run(
        transcripts_path, s_dir, micro_batch_rows=256, checkpoint_every=4
    )
    assert len(completed_partitions(s_dir)) == n_parts
    assert read_committed(s_dir).num_rows == rows1
    assert m1["partitions"] == m2["partitions"]

    j_dir = str(tmp_path / "j")
    jr = CheckpointingJoinRunner(lateness_s=3 * 3600.0, num_buckets=2)
    jm1 = jr.run(transcripts_path, j_dir, micro_batch_rows=256, checkpoint_every=4)
    jn = len(completed_partitions(j_dir))
    jrows = read_committed(j_dir).num_rows
    jm2 = CheckpointingJoinRunner(lateness_s=3 * 3600.0, num_buckets=2).run(
        transcripts_path, j_dir, micro_batch_rows=256, checkpoint_every=4
    )
    assert len(completed_partitions(j_dir)) == jn
    assert read_committed(j_dir).num_rows == jrows
    assert jm1["partitions"] == jm2["partitions"]


def test_streaming_dedup_equals_batch_across_shards(tmp_path):
    """Duplicates planted ACROSS shards (different replayers): the streaming
    min-id flush equals batch exact_dedup — min is commutative, so parallel
    shard interleaving cannot change the result."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data
    from pipeflow_ray.functions.dedup import exact_dedup
    from pipeflow_ray.pipelines.streaming import StreamingDedupRunner

    rng = np.random.default_rng(7)
    texts = [f"document body {i} {'x' * int(rng.integers(0, 20))}" for i in range(40)]
    # shard k gets copies of texts [10k..10k+20) — overlapping ranges force
    # cross-shard duplicate groups
    d = tmp_path / "docs"
    d.mkdir()
    did = 0
    all_rows = []
    for k in range(3):
        rows = []
        for t in texts[10 * k: 10 * k + 20]:
            rows.append((did, t))
            did += 1
        pq.write_table(
            pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                      "text": [r[1] for r in rows]}),
            d / f"part-{k:05d}.parquet")
        all_rows.extend(rows)

    kept, metrics = StreamingDedupRunner(num_buckets=4, max_replayers=3).run(str(d))
    assert metrics["rows"] == len(all_rows) and metrics["replayers"] == 3

    batch = exact_dedup(ray.data.from_arrow(
        pa.table({"doc_id": pa.array([r[0] for r in all_rows], pa.int64()),
                  "text": [r[1] for r in all_rows]})))
    want = sorted(batch.to_pandas().doc_id.tolist())
    assert sorted(kept.doc_id.tolist()) == want


def test_streaming_quantiles_equal_batch(tmp_path):
    """Dedup-on-ingest's aggregate sibling: single-pass streaming histogram
    quantiles equal the batch grouped_quantiles across shard interleavings."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq
    import ray.data

    from pipeflow_ray.fixtures import gen_transcripts
    from pipeflow_ray.pipelines.streaming import StreamingQuantileRunner
    from pipeflow_ray.stages.window import grouped_quantiles

    t = gen_transcripts(3000)
    shard_dir = str(tmp_path / "shards")
    os.makedirs(shard_dir)
    per = (t.num_rows + 3) // 4
    for k in range(4):
        _pq.write_table(t.slice(k * per, per),
                        os.path.join(shard_dir, f"part-{k:05d}.parquet"))

    def _derive(tbl):
        return tbl.append_column(
            "value", pc.utf8_length(pc.fill_null(tbl["text"], "")).cast(pa.int64()))

    got, metrics = StreamingQuantileRunner(
        "role", qs=(0.25, 0.5, 0.75), value_fn=_derive,
        columns=["role", "text"], num_buckets=3,
    ).run(shard_dir, micro_batch_rows=128)
    assert metrics["rows"] == t.num_rows
    got = got.sort_values("role").reset_index(drop=True)

    ds = ray.data.from_arrow(_derive(t).select(["role", "value"]))
    ref = (
        grouped_quantiles(ds, ["role"], "value", qs=(0.25, 0.5, 0.75))
        .to_pandas().rename(columns={"role": "role"})
        .sort_values("role").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[ref.columns], ref.astype(got[ref.columns].dtypes.to_dict()))


def test_streaming_vocab_equals_batch_tfidf(tmp_path):
    """Streaming vocabulary (df/tf on ingest) equals the batch tfidf_terms
    df-side across shard interleavings."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as _pq
    import ray.data

    from pipeflow_ray.functions.text import tfidf_terms
    from pipeflow_ray.pipelines.streaming import StreamingVocabRunner

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 50)))
             for _ in range(400)]
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    shard_dir = str(tmp_path / "shards")
    os.makedirs(shard_dir)
    per = 100
    for k in range(4):
        _pq.write_table(pa.Table.from_pandas(docs.iloc[k*per:(k+1)*per]),
                        os.path.join(shard_dir, f"part-{k:05d}.parquet"))

    got, metrics = StreamingVocabRunner(num_buckets=3).run(
        shard_dir, micro_batch_rows=64)
    assert metrics["rows"] == len(docs)
    got = got.sort_values("token").reset_index(drop=True)

    ref = (
        tfidf_terms(ray.data.from_pandas(docs).repartition(3), num_buckets=4)
        .to_pandas().groupby("token")
        .agg(df=("df", "first"), tf_total=("tf", "sum")).reset_index()
        .sort_values("token").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref.astype(got.dtypes.to_dict()))


def test_streaming_conv_dedup_equals_batch_across_shards(tmp_path):
    """Conversations SPLIT ACROSS shards (their turns land in different
    replayers, arbitrary interleaving): the streaming flush equals batch
    conv_template_dedup bit-for-bit — the signature combine is a wrapping
    sum of position-mixed row hashes, i.e. commutative."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data
    from pipeflow_ray.functions.dedup import conv_template_dedup
    from pipeflow_ray.pipelines.streaming import StreamingConvDedupRunner

    rng = np.random.default_rng(13)
    roles = ["user", "assistant", "tool"]
    tools = [None, "search", "calc", ""]
    rows = []
    for c in range(30):
        tpl = c % 6  # 6 templates → guaranteed dup groups
        n = 3 + tpl
        for i in range(n):
            rows.append(dict(conv_id=f"conv_{c:03d}", turn_idx=i,
                             role=roles[(tpl + i) % 3],
                             tool=tools[(tpl * 7 + i) % 4]))
    df = pd.DataFrame(rows).sample(frac=1.0, random_state=5).reset_index(drop=True)
    d = tmp_path / "convs"
    d.mkdir()
    # scatter the SHUFFLED rows over 4 shards: every conversation straddles
    # shard boundaries
    for k, part in enumerate(np.array_split(df, 4)):
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       d / f"part-{k}.parquet")

    batch = (
        conv_template_dedup(
            ray.data.from_pandas(pd.DataFrame(rows)).repartition(3), num_buckets=4)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    for mb in (7, 4096):  # tiny micro-batches maximize interleaving
        got, metrics = StreamingConvDedupRunner(num_buckets=4, max_replayers=4).run(
            str(d), micro_batch_rows=mb)
        got = got.to_pandas().sort_values("conv_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, batch)
        assert metrics["rows"] == len(rows)
    assert batch.is_dup.sum() >= 20  # dup groups exist (5 of each template)
