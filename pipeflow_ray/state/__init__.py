from pipeflow_ray.state.manifest import (
    completed_partitions,
    filter_completed,
    write_exactly_once,
)

__all__ = ["write_exactly_once", "completed_partitions", "filter_completed"]
