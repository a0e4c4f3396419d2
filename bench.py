"""Benchmark harness.

Default: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(num_cpus=$RAY_GRAFT_CPUS or 32)`` and
print ONE JSON line: ``{"metric": ..., "value": <headline sec>, "unit":
"sec", "queries": {...}, "sf": ..., "num_cpus": N}``.

``--scaling``: run the headline pipeline in two fresh processes at 8 and 32
CPUs on the same input (the sandbox proxy for the N vs 4N node criterion) and
print both wall times, both throughputs, and the scaling efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _headline(sf_dir: str, out_root: str) -> tuple[float, int]:
    """Flagship chain: read transcripts → normalize → stateful join →
    tumbling window aggregate → exactly-once partitioned sink.
    Returns (wall seconds, input turns)."""
    import pyarrow.parquet as pq

    from pipeflow_ray.fixtures import ensure_transcripts
    from pipeflow_ray.pipelines.flagship import flagship_pipeline

    path = ensure_transcripts(sf_dir)
    n_turns = pq.read_metadata(path).num_rows
    with open(path, "rb") as f:  # warm page cache: measure compute, not cold disk
        while f.read(1 << 24):
            pass
    out_dir = os.path.join(out_root, "flagship_out")
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    flagship_pipeline(path, out_dir=out_dir, num_partitions=64)
    return time.perf_counter() - t0, n_turns


def _run_queries(sf_dir: str) -> dict[str, float]:
    """Representative per-operator timings (full consumption each)."""
    import ray.data

    from pipeflow_ray.pipelines.queries import QUERIES

    names = [
        "q1_pricing_summary",
        "filter_project",
        "tumbling_events",
        "session_events",
        "transcripts_turn_join",
        "transcripts_sessions",
        "streaming_sessions",
        "dedup_exact_docs",
        "minhash_pairs_docs",
        "ann_topk",
        "hash_join_segment",
    ]
    out = {}
    for name in names:
        t0 = time.perf_counter()
        res = QUERIES[name](sf_dir)
        if isinstance(res, ray.data.Dataset):
            res.count()  # force full execution
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def bench_once() -> dict:
    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    wall, n_turns = _headline(sf_dir, "/tmp/pipeflow_bench")
    queries = {} if os.environ.get("GRAFT_HEADLINE_ONLY") else _run_queries(sf_dir)

    from pipeflow_ray.fixtures import sf_of_dir

    result = {
        "metric": "flagship transcripts pipeline (read→normalize→join→window agg→exactly-once sink) wall time",
        "value": round(wall, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_of_dir(sf_dir),
        "num_cpus": num_cpus,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / wall, 1),
    }
    ray.shutdown()
    return result


def bench_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_HEADLINE_ONLY="1", PYTHONPATH=REPO)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    tput_lo = lo["turns_per_sec"]
    tput_hi = hi["turns_per_sec"]
    eff = (tput_hi / tput_lo) / (32 / 8)
    return {
        "metric": "scaling efficiency, flagship pipeline, num_cpus 8 vs 32 (N vs 4N proxy)",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "turns_per_sec_8": tput_lo,
        "turns_per_sec_32": tput_hi,
        "scaling_efficiency": round(eff, 3),
        "sf": lo["sf"],
        "turns": lo["turns"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(bench_scaling()))
    else:
        print(json.dumps(bench_once()))
