from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine

__all__ = ["ReplayEngine"]
