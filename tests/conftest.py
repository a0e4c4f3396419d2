"""Session-scoped Ray fixture: init ONCE per pytest session."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def transcripts_path(tmp_path_factory):
    """Small deterministic transcripts fixture parquet (~1k turns)."""
    import pyarrow.parquet as pq

    from pipeflow_ray.fixtures import gen_transcripts

    path = tmp_path_factory.mktemp("fixtures") / "transcripts.parquet"
    pq.write_table(gen_transcripts(1000), str(path), row_group_size=256)
    return str(path)


@pytest.fixture(scope="session")
def transcripts_table():
    from pipeflow_ray.fixtures import gen_transcripts

    return gen_transcripts(1000)
