from pipeflow_ray.sources.api import ApiReader, ApiWriter, TypedApiReader, rows_to_table
from pipeflow_ray.sources.cloud import list_objects, read_cloud, write_cloud
from pipeflow_ray.sources.files import read_csv, read_json, read_parquet
from pipeflow_ray.sources.optional import MongoQuery
from pipeflow_ray.sources.sql import (
    SqlQueryBuilder,
    read_scalar,
    read_single,
    read_sql,
    read_sql_params,
    write_sql,
)
from pipeflow_ray.sources.writers import (
    CsvWriteOptions,
    JsonWriteOptions,
    to_csv_file,
    to_json_file,
    write_csv,
    write_json,
)

__all__ = [
    "read_csv", "read_json", "read_parquet",
    "read_sql", "read_sql_params", "read_scalar", "read_single", "write_sql", "SqlQueryBuilder",
    "ApiReader", "ApiWriter", "TypedApiReader", "rows_to_table",
    "read_cloud", "write_cloud", "list_objects",
    "MongoQuery",
    "CsvWriteOptions", "JsonWriteOptions",
    "write_csv", "write_json", "to_csv_file", "to_json_file",
]
