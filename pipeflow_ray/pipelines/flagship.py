"""Flagship pipeline (BASELINE.md headline): read transcripts → normalize →
session windows + stateful turn-response join → windowed aggregates →
exactly-once partitioned Parquet sink.

Everything streams: one ``read_parquet`` (column-pruned), stateless
``map_batches`` for normalization, exactly two key-shuffles on ``conv_id``
(session scan+aggregate, join), a partial-aggregated tumbling window, and the
manifest-committed sink. No full materialization anywhere; the returned
Dataset is lazy until consumed.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pipeflow_ray.stages.join import turn_response_join
from pipeflow_ray.stages.window import session_aggregate, tumbling_aggregate
from pipeflow_ray.state.manifest import write_exactly_once

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def normalize(t: pa.Table) -> pa.Table:
    """Ingest normalization (the reference's Trim/auto-convert analog,
    ``PipeFlow/CsvReader.cs:120-206``): trim text, null-safe tool, derived
    ``n_chars``. Pure Arrow kernels, zero-copy in."""
    text = pc.utf8_trim_whitespace(pc.fill_null(t["text"], ""))
    n_chars = pc.utf8_length(text)
    t = t.set_column(t.column_names.index("text"), "text", text)
    return t.append_column("n_chars", n_chars.cast(pa.int64()))


def read_transcripts(path: str) -> ray.data.Dataset:
    return ray.data.read_parquet(path, columns=TRANSCRIPT_COLUMNS)


def flagship_pipeline(
    transcripts_path: str,
    out_dir: str | None = None,
    session_gap_s: float = 1800.0,
    window_s: float = 3600.0,
    num_partitions: int = 32,
):
    """Run the flagship chain; returns the joined-window aggregate Dataset
    (and writes it exactly-once when *out_dir* is given).

    Stages:
      1. read (pruned columns) → normalize (stateless tasks)
      2. stateful conv_id join: user turn ↔ next assistant/tool turn
      3. tumbling 1h window per conv over joined pairs:
         pairs, mean/max response latency, chars in/out
      4. session windows per conv over raw turns: sessions, turns/chars per
         session (second output)
      5. exactly-once sink on the window aggregate, partitioned by conv_id
    """
    ds = read_transcripts(transcripts_path).map_batches(normalize, batch_format="pyarrow")

    # carry only the derived n_chars through the join shuffle, never raw text
    joined = turn_response_join(ds, carry_cols=["n_chars"])

    def _pair_metrics(t: pa.Table) -> pa.Table:
        t = t.append_column("user_chars", t["user_n_chars"].cast(pa.int64()))
        t = t.append_column("resp_chars", t["response_n_chars"].cast(pa.int64()))
        return t.drop_columns(["user_n_chars", "response_n_chars"])

    pair_stats = joined.map_batches(_pair_metrics, batch_format="pyarrow")

    windowed = tumbling_aggregate(
        pair_stats,
        keys=["conv_id"],
        width_s=window_s,
        specs={
            "n_pairs": ("count", None),
            "mean_latency_s": ("mean", "latency_s"),
            "max_latency_s": ("max", "latency_s"),
            "user_chars": ("sum", "user_chars"),
            "resp_chars": ("sum", "resp_chars"),
        },
        ts_col="user_ts",
    )

    if out_dir is not None:
        stats = write_exactly_once(
            windowed,
            out_dir,
            part_by="conv_id",
            num_partitions=num_partitions,
            ts_col="window_start",
            lineage={"input": transcripts_path, "pipeline": "flagship"},
        )
        return windowed, stats
    return windowed


def session_stats(transcripts_path: str, session_gap_s: float = 1800.0) -> ray.data.Dataset:
    """Companion output: per-conversation session windows over raw turns."""
    ds = read_transcripts(transcripts_path).map_batches(normalize, batch_format="pyarrow")
    return session_aggregate(
        ds,
        key="conv_id",
        gap_s=session_gap_s,
        specs={"n_turns": ("count", None), "n_chars": ("sum", "n_chars")},
    )
