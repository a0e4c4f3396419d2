"""Stress reproduction of the round-1 driver flake: run EVERY queries() entry
sequentially, several repetitions, inside ONE long-lived num_cpus=32 session —
the driver's exact shape. The round-1 failure (asof_join_events KeyError
'user_id' inside a hash_exchange split task) only ever appeared in this shape;
fixed by module-level remote tasks (stages/core.py).

Usage: PYTHONPATH=/root/repo python tools/stress_gate.py [reps] [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main(reps: int, sf_dir: str):
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    failures = []
    for rep in range(reps):
        for name, fn in qs.items():
            t0 = time.perf_counter()
            try:
                res = fn(sf_dir)
                import pandas as pd
                import pyarrow as pa

                import ray.data as rd

                if isinstance(res, rd.Dataset):
                    n = res.count()
                elif isinstance(res, pa.Table):
                    n = res.num_rows
                else:
                    n = len(res)
                print(f"rep{rep} {name}: {n} rows [{time.perf_counter() - t0:.2f}s]", flush=True)
            except Exception as e:  # noqa: BLE001 - collect, report at end
                failures.append((rep, name, repr(e)[:500]))
                print(f"rep{rep} {name}: FAILED {e!r}", flush=True)
    ray.shutdown()
    print(f"\n{reps} reps x {len(qs)} queries, {len(failures)} failures")
    for rep, name, err in failures:
        print(f"  rep{rep} {name}: {err}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    main(reps, sf_dir)
