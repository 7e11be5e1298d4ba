"""Registered STREAMING queries for the driver contract.

Unlike the pytest-only streaming coverage (sessions, arbitrary state —
tests/test_streaming_windows.py), these run a REAL Structured Streaming
query (readStream file source → event-time window aggregation →
memory-sink drain with availableNow) and are value-checked against a
batch DuckDB oracle: for tumbling windows in complete output mode the
streaming result must equal the batch group-by — Spark's
batch/streaming unification, made checkable.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radiant_portal_pipeline_spark.operators.registry import load_table, query


@query(
    "st_windowed_event_counts",
    oracle="""
    SELECT TIMESTAMP '1970-01-01 00:00:00'
             + CAST(FLOOR(EPOCH(ts) / 600) * 600 AS BIGINT) * INTERVAL 1 SECOND
             AS window_start,
           event_type,
           COUNT(*) AS n_events,
           MAX(event_id) AS max_event_id
    FROM events GROUP BY 1, 2
    """,
)
def st_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling windows (10 min) THROUGH the streaming
    engine: file-source tail, watermark, groupBy(window), complete-mode
    memory sink, availableNow drain. The oracle is the batch
    equivalent — equality proves the streaming plan neither drops nor
    duplicates events across micro-batches. Window starts are cast back
    to TIMESTAMP_NTZ (UTC-pinned session) so the comparison is
    timezone-proof."""
    batch = load_table(spark, sf_dir, "events")
    # split the source into several files so maxFilesPerTrigger=1 forces
    # MULTIPLE micro-batches: the complete-mode aggregation state must
    # survive and accumulate across them, or the oracle diverges (a
    # single-file source would be a one-shot batch in disguise and
    # could not catch cross-batch state loss/duplication)
    src = tempfile.mkdtemp(prefix="st_win_") + "/events"
    batch.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
    )
    agg = stream.groupBy(
        F.window("ts", "10 minutes").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("event_id").alias("max_event_id"),
    )
    sink = f"st_win_{uuid.uuid4().hex[:12]}"
    (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(sink).select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n_events",
        "max_event_id",
    )
