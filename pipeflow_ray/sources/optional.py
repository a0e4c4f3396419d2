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


class MongoQuery:
    """Fluent Mongo pushdown builder (``MongoDB/MongoReader.cs:35-141``):
    ``Where/WhereJson/Sort/Limit/Skip/Project/Aggregate`` compile into ONE
    aggregation pipeline the SERVER executes. The builder is pure data (unit
    -testable without a client); :meth:`read` hands the compiled pipeline to
    ``ray.data.read_mongo`` (import-gated — pymongo is absent here)."""

    def __init__(self, uri: str, database: str, collection: str):
        self.uri, self.database, self.collection = uri, database, collection
        self._match: dict = {}
        self._sort: list[tuple[str, int]] = []
        self._limit: int | None = None
        self._skip: int | None = None
        self._project: list[str] | None = None
        self._stages: list[dict] = []

    def where(self, field: str, value) -> "MongoQuery":
        self._match[field] = value  # Eq filter (MongoReader.cs:35-39)
        return self

    def where_json(self, json_filter: "str | dict") -> "MongoQuery":
        import json as _json

        doc = _json.loads(json_filter) if isinstance(json_filter, str) else dict(json_filter)
        self._match.update(doc)  # raw filter document (MongoReader.cs:47-51)
        return self

    def sort(self, field: str, ascending: bool = True) -> "MongoQuery":
        self._sort.append((field, 1 if ascending else -1))
        return self

    def limit(self, n: int) -> "MongoQuery":
        self._limit = n
        return self

    def skip(self, n: int) -> "MongoQuery":
        self._skip = n
        return self

    def project(self, *fields: str) -> "MongoQuery":
        self._project = list(fields)
        return self

    def aggregate(self, stage: "str | dict") -> "MongoQuery":
        import json as _json

        self._stages.append(_json.loads(stage) if isinstance(stage, str) else dict(stage))
        return self

    def to_pipeline(self) -> list[dict]:
        """Compile to an aggregation pipeline (explicit stages take
        precedence, mirroring ``MongoReader.Read``'s pipeline-vs-find split,
        ``MongoReader.cs:103-141``; find options become $match/$sort/$skip/
        $limit/$project stages — pushdown either way)."""
        if self._stages:
            return list(self._stages)
        out: list[dict] = []
        if self._match:
            out.append({"$match": dict(self._match)})
        if self._sort:
            out.append({"$sort": dict(self._sort)})
        if self._skip is not None:
            out.append({"$skip": int(self._skip)})
        if self._limit is not None:
            out.append({"$limit": int(self._limit)})
        if self._project is not None:
            proj = {f: 1 for f in self._project}
            if "_id" not in self._project:
                proj["_id"] = 0  # MongoReader.cs:88-90
            out.append({"$project": proj})
        return out

    def read(self, **kw) -> ray.data.Dataset:
        return read_mongo(self.uri, self.database, self.collection,
                          pipeline=self.to_pipeline(), **kw)


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
