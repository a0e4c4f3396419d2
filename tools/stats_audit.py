"""Per-stage Ray Data stats audit: run a handful of representative pipelines
and print `ds.stats()` so wall-time attribution (read vs transform vs
exchange) is inspectable, plus the flagship's raw-Ray exchange timings.

Run: PYTHONPATH=/root/repo python tools/stats_audit.py [sf_dir]
(defaults to /root/testdata/sf0.01; uses a fresh local Ray session.)
"""

from __future__ import annotations

import sys
import time


def main(sf_dir: str) -> None:
    import ray
    import ray.data

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pipeflow_ray.fixtures import ensure_transcripts
    from pipeflow_ray.pipelines.queries import QUERIES

    ensure_transcripts(sf_dir)

    # Dataset-returning queries expose the streaming executor's stats
    for name in ("transcripts_turn_join", "cep_pattern_turns", "q1_pricing_summary"):
        t0 = time.perf_counter()
        res = QUERIES[name](sf_dir)
        res.count()
        wall = time.perf_counter() - t0
        print(f"\n===== {name} ({wall:.2f}s wall) =====")
        print(res.stats())

    # the flagship's keyed all-to-all is raw-Ray (hash_exchange) — its cost
    # shows as the gap between the Dataset-stage stats above and end-to-end
    # walls in bench.py; BASELINE.md carries the t = f + c/N decomposition.
    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
