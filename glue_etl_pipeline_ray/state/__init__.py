from glue_etl_pipeline_ray.state.checkpoint import CheckpointManager

__all__ = ["CheckpointManager"]
