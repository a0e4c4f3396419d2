"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship transcript pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY §2 (plus the training-data ops); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible query (same column names, see
``pipeflow_ray/pipelines/queries.py`` for the cross-engine float discipline).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from typing import Any

_REPO = "/root/repo"
if _REPO not in sys.path:  # driver may import this module from anywhere
    sys.path.insert(0, _REPO)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: read transcripts →
    normalize → stateful turn-response join → tumbling window aggregate."""
    from pipeflow_ray.fixtures import ensure_transcripts
    from pipeflow_ray.pipelines.flagship import flagship_pipeline

    path = ensure_transcripts("/root/testdata/sf0.001")
    return flagship_pipeline(path)


def queries() -> dict[str, Callable[[str], Any]]:
    from pipeflow_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # the transcript / multimodal oracles read deterministic fixture parquet —
    # make sure both exist before the driver runs the SQL side
    from pipeflow_ray.fixtures import ensure_transcripts
    from pipeflow_ray.functions.multimodal import (
        ensure_audio_golden,
        ensure_image_golden,
        ensure_video_golden,
    )
    from pipeflow_ray.pipelines.queries import ORACLES

    ensure_transcripts("/root/testdata/sf0.01")
    ensure_image_golden(200)  # gate runs at sf0.01 → n = 200
    ensure_audio_golden(200)
    ensure_video_golden(200)
    return dict(ORACLES)
