"""geohub_data_pipeline_spark — a PySpark-native analytics & data-pipeline engine.

A from-scratch, Spark-first redesign of the capabilities of
UNDP-Data/geohub-data-pipeline (reference, read-only at /root/reference):
a geospatial ETL service (queue -> blob -> GDAL probe -> vector tiles /
COG -> upload, with progress/cancel/dead-letter semantics), re-expressed
as DataFrame/SQL operators plus the full relational closure and
LLM-training-data operators (dedup, similarity search, text analysis,
multimodal columns), designed for 100 TB scale.

Layout:
  sources/    table + stream readers (parquet tables, message streams)
  functions/  column-level functions (path algebra, text, vectors, tiles)
  operators/  composite operators (as-of join, dedup, similarity, tiling,
              raster pyramid, progress, audits, geometry kernels)
  plans/      the query registry exercised by the correctness harness
  streaming/  Structured Streaming service (ingest loop, windows, cancel)
"""

__version__ = "0.1.0"

from geohub_data_pipeline_spark.session import get_session, configure  # noqa: F401
