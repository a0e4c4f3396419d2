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
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    n_turns = sum(pq.read_metadata(f).num_rows for f in files)
    for fp in files:  # warm page cache: measure compute, not cold disk
        with open(fp, "rb") as f:
            while f.read(1 << 24):
                pass
    # warm the Ray workers + plan path on the small fixture (untimed) so the
    # measurement is sustained throughput, not one-time process startup
    warm_dir = os.path.join(out_root, "warmup_out")
    shutil.rmtree(warm_dir, ignore_errors=True)
    flagship_pipeline(ensure_transcripts(0.001), out_dir=warm_dir, num_partitions=8)
    best = float("inf")
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "3"))
    for _ in range(reps):
        out_dir = os.path.join(out_root, "flagship_out")
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        flagship_pipeline(path, out_dir=out_dir, num_partitions=64, return_windowed=False)
        best = min(best, time.perf_counter() - t0)
    return best, n_turns


def _run_queries(sf_dir: str) -> dict[str, float]:
    """Representative per-operator timings (full consumption each),
    min-of-N reps (GRAFT_QUERY_REPS, default 2) — the min is robust to the
    shared host's intermittent ~30% contention spikes (see BASELINE.md
    host-noise discipline) while staying an honest full-execution wall."""
    import ray.data

    from pipeflow_ray.pipelines.queries import QUERIES

    # task-pool queries first, actor-spawning streaming runners LAST: a
    # finishing streaming topology's dying workers hold their CPUs for ~3 s
    # (see working notes), which would tax whatever query runs next
    names = [
        "q1_pricing_summary",
        "filter_project",
        "tumbling_events",
        "session_events",
        "transcripts_turn_join",
        "transcripts_sessions",
        "cep_pattern_turns",
        "cep_timeout_turns",
        "cep_kleene_open_turns",
        "turn_analytics_transcripts",
        "repetition_docs",
        "tfidf_docs",
        "dedup_exact_docs",
        "winnow_fingerprint_docs",
        "minhash_pairs_docs",
        "ann_topk",
        "sketch_quantiles_price",
        "unpivot_lineitem",
        "pivot_wider_transcripts",
        "hll_distinct_orders",
        "hash_join_segment",
        "streaming_sessions",
        "streaming_cep_pattern",
        "streaming_join",
        "streaming_sketch_quantiles",
        "streaming_hll_distinct",
        "streaming_topk_convs",
    ]
    reps = int(os.environ.get("GRAFT_QUERY_REPS", "2"))
    out = {}
    for name in names:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            res = QUERIES[name](sf_dir)
            if isinstance(res, ray.data.Dataset):
                res.count()  # force full execution
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def _pin_worker_threads():
    """One compute thread per Ray worker: Arrow kernels are internally
    multithreaded and oversubscribe the node (measured: 32-cpu flagship run
    2.1x FASTER pinned), and unpinned workers make the num_cpus knob
    meaningless for scaling measurements."""
    os.environ["OMP_NUM_THREADS"] = "1"
    os.environ["ARROW_NUM_THREADS"] = "1"
    import pyarrow as pa

    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)


def bench_once() -> dict:
    _pin_worker_threads()
    # Ray workers resolve imports via PYTHONPATH, not the driver's sys.path —
    # export it so bench works from any CWD
    os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR",
             runtime_env={"env_vars": {"OMP_NUM_THREADS": "1", "ARROW_NUM_THREADS": "1"}})
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
        "headline_reps": int(os.environ.get("GRAFT_BENCH_REPS", "3")),
        "query_reps": int(os.environ.get("GRAFT_QUERY_REPS", "2")),
    }
    ray.shutdown()
    return result


def bench_scaling() -> dict:
    # Scaling evidence needs a compute-dominated job: a larger fixture
    # (GRAFT_SCALING_SF, default sf2.0 = ~10M turns) amortizes the ~2s fixed
    # plan/shuffle-coordination overhead. Levels default to 2 vs 8 worker
    # slots (the driver's "N and 4N CPUs" form): with single-threaded workers
    # each slot is one core, and N→4N multiplies worker count exactly the way
    # added nodes would. (8 vs 32 on THIS single box saturates its memory
    # bandwidth — two runs sharing one socket is where the sandbox proxy
    # diverges from real added nodes; see BASELINE.md.)
    scaling_sf = os.environ.get("GRAFT_SCALING_SF", "4.0")
    lo_n, hi_n = (int(x) for x in os.environ.get("GRAFT_SCALE_LEVELS", "2,8").split(","))
    sys.path.insert(0, REPO)
    from pipeflow_ray.fixtures import FIXTURE_ROOT, ensure_transcripts

    ensure_transcripts(float(scaling_sf))  # generate once, shared by both runs
    sf_dir = os.path.join(FIXTURE_ROOT, f"sf{float(scaling_sf)}")

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_HEADLINE_ONLY="1",
                   GRAFT_SF_DIR=sf_dir, PYTHONPATH=REPO, OMP_NUM_THREADS="1",
                   GRAFT_BENCH_REPS=os.environ.get("GRAFT_BENCH_REPS", "3"))
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(lo_n), run(hi_n)
    tput_lo = lo["turns_per_sec"]
    tput_hi = hi["turns_per_sec"]
    eff = (tput_hi / tput_lo) / (hi_n / lo_n)
    return {
        "metric": f"scaling efficiency, flagship pipeline, num_cpus {lo_n} vs {hi_n} (N vs 4N proxy)",
        f"sec_{lo_n}": lo["value"],
        f"sec_{hi_n}": hi["value"],
        f"turns_per_sec_{lo_n}": tput_lo,
        f"turns_per_sec_{hi_n}": tput_hi,
        "scaling_efficiency": round(eff, 3),
        "sf": lo["sf"],
        "turns": lo["turns"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(bench_scaling()))
    else:
        print(json.dumps(bench_once()))
