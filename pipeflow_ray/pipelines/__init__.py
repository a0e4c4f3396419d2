from pipeflow_ray.pipelines.flagship import flagship_pipeline

__all__ = ["flagship_pipeline"]
