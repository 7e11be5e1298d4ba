"""radiant_portal_pipeline_spark — a from-scratch PySpark-native CDC /
incremental-ingest engine with the capabilities of
radiant-network/radiant-portal-pipeline (see /root/repo/SURVEY.md).

Everything here is idiomatic Spark: DataFrame/SQL plans optimized by
Catalyst, a thin transactional lake-table layer (Iceberg-style commit
log over parquet — the real Iceberg runtime jar is not in this image),
Structured Streaming + foreachBatch for the CDC loop, and
Arrow-vectorized pandas UDFs for the few things built-ins can't say.
"""

__version__ = "0.1.0"
