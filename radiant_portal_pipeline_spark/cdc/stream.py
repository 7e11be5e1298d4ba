"""Structured Streaming CDC loop: file-based change-feed tail →
``foreachBatch`` merge → LakeTable, checkpoint-resumable.

The reference's outer loop is Airflow-scheduled epochs (SURVEY.md §3.1);
here Structured Streaming provides the epochs: the checkpoint stores
source offsets, ``foreachBatch`` hands us a monotonically increasing
``batch_id``, and the engine's applied-epoch guard makes redelivered
batches no-ops — together that is exactly-once end-to-end. Killing the
query and restarting replays at most one batch, which the guard skips
(reference analog: watermark advanced only after successful run,
SURVEY.md ST2).

In production the source would be ``kafka``/``rate``/cloud-files; the
file source is the sandbox stand-in and exercises identical semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from radiant_portal_pipeline_spark.cdc.merge import MergeStats, TranscriptMergeEngine
from radiant_portal_pipeline_spark.cdc.schemas import CHANGE_EVENT_SCHEMA
from radiant_portal_pipeline_spark.cdc.lineage import LineageWriter


def write_feed_partitions(feed_df, out_dir: str, by_col: str = "commit_epoch") -> int:
    """Materialize a change feed as one file-source directory, one file
    per ``by_col`` value (so maxFilesPerTrigger slices micro-batches
    deterministically). Returns number of files written."""
    feed_df = feed_df.localCheckpoint(eager=True)  # one scan, not one per value
    vals = [r[0] for r in feed_df.select(by_col).distinct().collect()]
    for v in sorted(vals):
        (
            feed_df.filter(F.col(by_col) == v)
            .coalesce(1)
            .write.mode("append")
            .parquet(out_dir)
        )
    return len(vals)


@dataclass
class StreamResult:
    batches: list[MergeStats] = field(default_factory=list)


def run_cdc_stream(
    spark: SparkSession,
    feed_dir: str,
    engine: TranscriptMergeEngine,
    checkpoint_dir: str,
    lineage: LineageWriter | None = None,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
) -> StreamResult | StreamingQuery:
    """Tail ``feed_dir`` and apply every micro-batch through the merge
    engine. ``availableNow`` drains all pending input then stops —
    rerunning with the same checkpoint processes only new files."""
    reader = spark.readStream.schema(CHANGE_EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    feed = reader.parquet(feed_dir)

    result = StreamResult()
    if lineage is not None:
        engine.lineage = lineage

    def apply_batch(batch_df, batch_id: int) -> None:
        stats = engine.merge_batch(batch_df, epoch=batch_id)
        result.batches.append(stats)

    query = (
        feed.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not await_termination:
        return query
    query.awaitTermination()
    return result
