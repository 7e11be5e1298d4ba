"""Schemas for the transcript CDC engine.

The input table shape is fixed by the engine contract:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``; the change feed adds ``(op string I/U/D, lsn long,
commit_epoch long)``. The sink table stores the transcript columns plus
``lsn`` (for cross-batch last-writer-wins) and ``_deleted`` (tombstone —
kept so an out-of-order lower-LSN update arriving later cannot resurrect
a deleted turn; reference analog: the ``deleted`` flag retained in
staging, radiant/dags/sql/radiant/sequencing_experiment_update_deleted.sql:1-5)
and ``part`` (hash bucket of conv_id — the partition column).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ts is TIMESTAMP_NTZ end-to-end: wall-clock values independent of the
# session timezone, so a driver/oracle session with a different TZ can
# never shift collected values (parquet naive timestamps are NTZ in
# Spark 4 anyway — keeping the sink NTZ avoids every conversion).
TRANSCRIPT_FIELDS = [
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampNTZType(), True),
]

CHANGE_EVENT_SCHEMA = T.StructType(
    TRANSCRIPT_FIELDS
    + [
        T.StructField("op", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("commit_epoch", T.LongType(), False),
    ]
)

KEY_COLS = ("conv_id", "turn_idx")
LSN_COL = "lsn"
DELETED_COL = "_deleted"
PART_COL = "part"


def sink_schema(extra_fields: list[T.StructField] | None = None) -> T.StructType:
    return T.StructType(
        TRANSCRIPT_FIELDS
        + (extra_fields or [])
        + [
            T.StructField(LSN_COL, T.LongType(), False),
            T.StructField(DELETED_COL, T.BooleanType(), False),
            T.StructField(PART_COL, T.IntegerType(), False),
        ]
    )
