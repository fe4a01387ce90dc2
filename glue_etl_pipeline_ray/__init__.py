"""Ray-Data-native CDC / incremental-ingest engine.

A brand-new engine re-expressing the flatten -> validate -> convert contract
of the reference Glue ETL pipeline (Gasta88/glue-etl-pipeline) as a
binlog-style change-event replayer over a Parquet lake:

- flatten + schema-validate each change event with a dead-letter channel
  (reference analog: ``ef_ingestion_etl/data_profiling.py:46-216``),
- keyed upserts with last-writer-wins by commit/sequence order
  (generalizing the reference's ordered append,
  ``update_workflow_properties.py:146-160``),
- additive schema evolution with null backfill
  (``flat_jsons.py:85-110`` analog),
- idempotent bucket-file Parquet sink + atomic checkpoint manifest for
  exactly-once resume (fixing the reference's at-least-once append hazard,
  ``convert_to_parquet.py:236-238``),
- per-batch, per-bucket lineage manifests
  (``data_profiling.py:180-189`` / ``process_logs.py`` analog).

Everything is built on public Ray Data / Apache Arrow APIs only.
"""

from glue_etl_pipeline_ray.spec import TableSpec, Rule
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine

__all__ = ["TableSpec", "Rule", "ReplayEngine"]
__version__ = "0.1.0"
