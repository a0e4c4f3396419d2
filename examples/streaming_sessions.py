"""The flagship streaming workload end-to-end: transcript log → sessionized /
windowed aggregates with watermarks, exactly-once output, and resume.

Run: PYTHONPATH=/root/repo python examples/streaming_sessions.py
"""

import shutil
import tempfile

import ray

from pipeflow_ray.fixtures import ensure_transcripts
from pipeflow_ray.pipelines.flagship import flagship_pipeline, session_stats
from pipeflow_ray.pipelines.streaming import StreamingSessionRunner


def main():
    path = ensure_transcripts(0.001)  # ~5k-turn deterministic fixture
    out = tempfile.mkdtemp(prefix="flagship_out_")
    shutil.rmtree(out, ignore_errors=True)

    # batch mode: fused single-exchange pipeline + exactly-once sink
    windowed, stats = flagship_pipeline(path, out_dir=out, num_partitions=16)
    print(f"windows: {windowed.count()} rows across {len(stats)} committed partitions")

    # re-run = resume: everything already committed → all partitions skipped
    _, stats2 = flagship_pipeline(path, out_dir=out, num_partitions=16)
    print("resume skipped all partitions:", bool(stats2.skipped.all()))

    # per-conversation session windows (gap-based)
    sess = session_stats(path, session_gap_s=1800.0)
    print("sessions:", sess.count())

    # micro-batch streaming mode: arrival order, monotonic watermark,
    # late rows to a side output, per-conversation state in actors
    runner = StreamingSessionRunner(gap_s=1800.0, lateness_s=600.0, num_buckets=4)
    sessions, late, metrics = runner.run(path, micro_batch_rows=1024)
    print("streaming metrics:", metrics)


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    main()
    ray.shutdown()
