"""Cloud storage connectors (reference: ``Cloud/S3Reader.cs:52-110`` +
AzureBlob/GCS siblings, ``S3Writer.cs``; listing ``S3Reader.ListObjectsAsync``,
``S3Reader.cs:85-110``).

Ray Data + Arrow filesystems already speak ``s3://``, ``gs://``, ``az://`` and
``file://`` URIs natively — these wrappers add the reference's surface (a
format-dispatching reader/writer pair and an object-listing helper) without
re-implementing transports. Everything is exercised against ``file://`` /
local paths in tests (no network in this sandbox); against real buckets the
same code paths run through Arrow's S3/GCS filesystems with credentials from
the standard environment chain, exactly as the reference reads its keys from
client configuration.
"""

from __future__ import annotations

import ray.data

_READERS = {
    "parquet": ray.data.read_parquet,
    "csv": ray.data.read_csv,
    "json": ray.data.read_json,
}


def _fs_and_path(url: str):
    from pyarrow import fs as pafs

    return pafs.FileSystem.from_uri(url)


def read_cloud(url: str, format: str | None = None, **kw) -> ray.data.Dataset:
    """Read ``s3://bucket/key``-style URIs (any Arrow-supported scheme).
    *format* defaults from the extension (``S3Reader.ReadAsync`` dispatches
    on key suffix, ``Cloud/S3Reader.cs:52-84``)."""
    if format is None:
        low = url.lower().rstrip("/")
        for ext, name in ((".parquet", "parquet"), (".csv", "csv"),
                          (".json", "json"), (".jsonl", "json")):
            if low.endswith(ext):
                format = name
                break
        else:
            format = "parquet"  # directory default
    if format not in _READERS:
        raise ValueError(f"unsupported format {format!r}; one of {sorted(_READERS)}")
    return _READERS[format](url, **kw)


def write_cloud(ds: ray.data.Dataset, url: str, format: str = "parquet", **kw) -> None:
    """Partitioned write to a cloud prefix (``Cloud/S3Writer.cs``)."""
    writer = {
        "parquet": ds.write_parquet,
        "csv": ds.write_csv,
        "json": ds.write_json,
    }.get(format)
    if writer is None:
        raise ValueError(f"unsupported format {format!r}")
    writer(url, **kw)


def list_objects(url: str, recursive: bool = True, suffix: str | None = None) -> list[dict]:
    """List objects under a prefix → [{path, size, mtime}] — the
    ``ListObjectsAsync`` helper (``Cloud/S3Reader.cs:85-110``). Works on any
    Arrow filesystem URI (local paths and ``file://`` included)."""
    from pyarrow import fs as pafs

    filesystem, path = _fs_and_path(url)
    sel = pafs.FileSelector(path, recursive=recursive, allow_not_found=True)
    out = []
    for info in filesystem.get_file_info(sel):
        if info.type != pafs.FileType.File:
            continue
        if suffix and not info.path.endswith(suffix):
            continue
        out.append({"path": info.path, "size": info.size, "mtime": info.mtime})
    return sorted(out, key=lambda d: d["path"])
