from pipeflow_ray.sources.files import read_csv, read_json, read_parquet
from pipeflow_ray.sources.sql import read_sql, write_sql
from pipeflow_ray.sources.api import ApiReader, ApiWriter

__all__ = [
    "read_csv", "read_json", "read_parquet",
    "read_sql", "write_sql",
    "ApiReader", "ApiWriter",
]
