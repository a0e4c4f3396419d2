"""``python -m pipeflow_ray`` — the job entrypoint for ``ray job submit``.

The north rule's production shape is "run via ray job submit on a
fixed-size multi-node Ray cluster"; this module is that submission target:

    ray job submit --working-dir . -- python -m pipeflow_ray \\
        flagship --input /data/transcripts --out /data/flagship_out

Subcommands:

- ``flagship``          read → normalize → stateful join → tumbling window
                        aggregate → exactly-once partitioned parquet sink
                        (resume skips committed partitions).
- ``stream-sessions``   distributed-ingest streaming sessionization with
                        epoch checkpoints, exactly-once commits, mid-stream
                        resume.
- ``stream-join``       streaming turn-response join, same guarantees.
- ``query``             run any registered pipeline from the query registry
                        over a testdata/fixture directory.
- ``list``              print the registry.

Session ownership: this CLI initializes Ray only when no session exists
(``ray job submit`` / standalone runs) and shuts down only what it started —
inside an existing session (tests, notebooks) it is a pure library call,
per the repo contract that only CLI entry points, bench.py and the test
fixture own a Ray session.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m pipeflow_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("flagship", help="flagship transcript pipeline with exactly-once sink")
    f.add_argument("--input", required=True, help="transcript parquet file or shard directory")
    f.add_argument("--out", required=True, help="output sink directory (manifested partitions)")
    f.add_argument("--partitions", type=int, default=64)
    f.add_argument("--windowed", action="store_true",
                   help="also return the windowed aggregate row count")

    s = sub.add_parser("stream-sessions", help="streaming sessionization, checkpointed")
    s.add_argument("--input", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--gap-s", type=float, default=1800.0)
    s.add_argument("--lateness-s", type=float, default=3600.0)
    s.add_argument("--buckets", type=int, default=8)
    s.add_argument("--replayers", type=int, default=16)
    s.add_argument("--checkpoint-every", type=int, default=10)
    s.add_argument("--micro-batch-rows", type=int, default=65_536)

    j = sub.add_parser("stream-join", help="streaming turn-response join, checkpointed")
    j.add_argument("--input", required=True)
    j.add_argument("--out", required=True)
    j.add_argument("--lateness-s", type=float, default=3600.0)
    j.add_argument("--buckets", type=int, default=8)
    j.add_argument("--replayers", type=int, default=16)
    j.add_argument("--checkpoint-every", type=int, default=10)
    j.add_argument("--micro-batch-rows", type=int, default=65_536)

    q = sub.add_parser("query", help="run a registered pipeline by name")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="table directory (region/nation/.../documents parquet)")
    q.add_argument("--out", default=None, help="write result parquet here instead of "
                                               "printing row count + schema")

    sub.add_parser("list", help="print the query registry")
    return p


def _as_dataset(res):
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res
    if isinstance(res, pd.DataFrame):
        return ray.data.from_pandas(res)
    if isinstance(res, pa.Table):
        return ray.data.from_arrow(res)
    raise TypeError(f"unexpected query result type {type(res)!r}")


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    if args.cmd == "list":  # no Ray session needed
        from pipeflow_ray.pipelines.queries import ORACLES, QUERIES

        for name in sorted(QUERIES):
            kind = "oracle" if name in ORACLES else "rows-only"
            print(f"{name:36s} [{kind}]")
        return 0

    import ray

    own_session = not ray.is_initialized()
    if own_session:
        ray.init(include_dashboard=False, logging_level="ERROR")
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        if args.cmd == "flagship":
            from pipeflow_ray.pipelines.flagship import flagship_pipeline

            windowed, stats = flagship_pipeline(
                args.input, out_dir=args.out, num_partitions=args.partitions,
                return_windowed=args.windowed,
            )
            out = {"partitions": int(len(stats)), "rows": int(stats.rows.sum()),
                   "skipped": int(stats.skipped.sum())}
            if args.windowed and windowed is not None:
                out["windowed_rows"] = int(windowed.count())
            print(json.dumps(out))
        elif args.cmd == "stream-sessions":
            from pipeflow_ray.pipelines.streaming import ParallelCheckpointingSessionRunner

            m = ParallelCheckpointingSessionRunner(
                gap_s=args.gap_s, lateness_s=args.lateness_s,
                num_buckets=args.buckets, max_replayers=args.replayers,
            ).run(args.input, args.out, micro_batch_rows=args.micro_batch_rows,
                  checkpoint_every=args.checkpoint_every)
            print(json.dumps(m))
        elif args.cmd == "stream-join":
            from pipeflow_ray.pipelines.streaming import ParallelCheckpointingJoinRunner

            m = ParallelCheckpointingJoinRunner(
                lateness_s=args.lateness_s, num_buckets=args.buckets,
                max_replayers=args.replayers,
            ).run(args.input, args.out, micro_batch_rows=args.micro_batch_rows,
                  checkpoint_every=args.checkpoint_every)
            print(json.dumps(m))
        elif args.cmd == "query":
            from pipeflow_ray.pipelines.queries import QUERIES

            if args.name not in QUERIES:
                print(f"unknown query {args.name!r}; see `python -m pipeflow_ray list`",
                      file=sys.stderr)
                return 2
            ds = _as_dataset(QUERIES[args.name](args.sf_dir))
            if args.out:
                import shutil

                shutil.rmtree(args.out, ignore_errors=True)  # ray appends otherwise
                ds.write_parquet(args.out)
                # count from the written files' parquet footers — ds.count()
                # here would re-execute the whole pipeline (ADVICE r4)
                import glob
                import os

                import pyarrow.parquet as _pq

                rows = sum(
                    _pq.read_metadata(f).num_rows
                    for f in glob.glob(os.path.join(args.out, "*.parquet"))
                )
                print(json.dumps({"rows": rows, "out": args.out}))
            else:
                print(json.dumps({"rows": ds.count(), "schema": list(ds.schema().names)}))
        return 0
    finally:
        if own_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
