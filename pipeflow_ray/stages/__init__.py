"""Operator stages: each is a function Dataset → Dataset (or a batch-level
helper used inside ``map_batches``), vectorized over Arrow batches."""

from pipeflow_ray.stages.core import (
    content_hash_column,
    filter_batches,
    local_distinct,
)
from pipeflow_ray.stages.dedup import distinct_rows, remove_duplicates

__all__ = [
    "content_hash_column",
    "filter_batches",
    "local_distinct",
    "distinct_rows",
    "remove_duplicates",
]
