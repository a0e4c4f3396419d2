"""Connectors whose client libraries are not available in this runtime,
gated behind import-try (reference surface: Excel
``PipeFlow/Excel/ExcelReader.cs:60-163`` / ``ExcelWriter.cs:58-197``, MongoDB
``PipeFlow/MongoDB/MongoReader.cs:35-141`` / ``MongoWriter.cs:68-170``).

The Ray-side shape is real: each reader returns a ``ray.data.Dataset`` and
each writer consumes one; only the client-library call is gated. Installing
``openpyxl`` / ``pymongo`` makes them functional without code changes here.
"""

from __future__ import annotations

import ray.data


def read_excel(path: str, sheet: str | int = 0, **kw) -> ray.data.Dataset:
    """Excel source (sheet by name/index, header handling via pandas)."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "read_excel requires openpyxl (not installed in this runtime); "
            "the Dataset-side plumbing is ready — pip install openpyxl to enable"
        ) from e
    import pandas as pd

    df = pd.read_excel(path, sheet_name=sheet, **kw)
    return ray.data.from_pandas(df)


def write_excel(ds: ray.data.Dataset, path: str, sheet: str = "Sheet1") -> None:
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError("write_excel requires openpyxl (not installed)") from e
    ds.to_pandas().to_excel(path, sheet_name=sheet, index=False)


def read_mongo(uri: str, database: str, collection: str, pipeline: list | None = None, **kw) -> ray.data.Dataset:
    """MongoDB source with aggregation-pipeline pushdown
    (``MongoReader.Aggregate``, ``MongoReader.cs:35-141``) via
    ``ray.data.read_mongo``."""
    try:
        import pymongo  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "read_mongo requires pymongo (not installed in this runtime)"
        ) from e
    return ray.data.read_mongo(uri=uri, database=database, collection=collection,
                               pipeline=pipeline or [], **kw)


def write_mongo(ds: ray.data.Dataset, uri: str, database: str, collection: str) -> None:
    try:
        import pymongo  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError("write_mongo requires pymongo (not installed)") from e
    ds.write_mongo(uri=uri, database=database, collection=collection)
