"""Per-batch, per-partition lineage / metrics emission.

The reference emits OTel spans around each pipeline phase
(radiant/tasks/tracing/trace.py:1-27) and advances an ``ingested_at``
watermark post-run. Here every applied micro-batch appends one row per
touched partition to a lineage LakeTable: applied-LSN watermark, live
row count, tombstone count, and merge latency — queryable like any
other table and itself transactional.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from radiant_portal_pipeline_spark.cdc import schemas as S
from radiant_portal_pipeline_spark.lake import LakeTable

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType(), False),
        T.StructField("part", T.IntegerType(), False),
        T.StructField("applied_lsn", T.LongType(), True),
        T.StructField("rows_total", T.LongType(), True),
        T.StructField("tombstones", T.LongType(), True),
        T.StructField("merge_seconds", T.DoubleType(), True),
    ]
)


class LineageWriter:
    def __init__(self, spark: SparkSession, path: str):
        if LakeTable.exists(path):
            self.table = LakeTable(spark, path)
        else:
            self.table = LakeTable.create(spark, path, LINEAGE_SCHEMA, "part")
        self.spark = spark

    def record(self, epoch: int, sink: LakeTable, parts: list, seconds: float) -> None:
        """Append watermarks for the partitions touched by ``epoch``."""
        if not parts:
            return
        wm = (
            sink.read(partitions=parts)
            .groupBy(S.PART_COL)
            .agg(
                F.max(S.LSN_COL).alias("applied_lsn"),
                F.count(F.lit(1)).alias("rows_total"),
                F.sum(F.when(F.col(S.DELETED_COL), 1).otherwise(0)).alias("tombstones"),
            )
            .select(
                F.lit(epoch).cast("long").alias("epoch"),
                F.col(S.PART_COL),
                "applied_lsn",
                "rows_total",
                "tombstones",
                F.lit(float(seconds)).alias("merge_seconds"),
            )
        )
        self.table.append(wm)

    def read(self):
        return self.table.read()
