from glue_etl_pipeline_ray.pipelines.replay import discover_batches

__all__ = ["discover_batches"]
