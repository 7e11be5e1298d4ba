"""Streaming analytics over the change feed: event-time windowed
aggregation with watermarks for late data, session windows, and a
custom stateful operator via applyInPandasWithState.

The reference has no long-running stream (Airflow provides epochs,
SURVEY.md §2.9); these are the Structured Streaming counterparts a
transcript feed needs: turn-rate monitoring (tumbling windows),
conversation sessionization (session_window), and cross-batch running
state (arbitrary stateful processing).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _with_event_time(df: DataFrame) -> DataFrame:
    """Spark watermarks require TIMESTAMP (LTZ) event time; the feed
    carries TIMESTAMP_NTZ — cast here (UTC-pinned sessions make the
    interpretation stable)."""
    if dict(df.dtypes).get("ts") == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def windowed_turn_counts(
    feed: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling/sliding event-time windows with a late-data watermark:
    turns and deletes per (window, role). Works on both batch and
    streaming DataFrames (same plan — the streaming-unified design)."""
    df = _with_event_time(feed)
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return df.groupBy(win.alias("w"), "role").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_deletes"),
        F.max("lsn").alias("max_lsn"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "role",
        "n_events",
        "n_deletes",
        "max_lsn",
    )


def conversation_sessions(
    feed: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Sessionization: gap-based session windows per conversation."""
    df = _with_event_time(feed)
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return df.groupBy(
        F.session_window("ts", gap).alias("s"), "conv_id"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("lsn").alias("first_lsn"),
        F.max("lsn").alias("last_lsn"),
    ).select(
        "conv_id",
        F.col("s.start").alias("session_start"),
        F.col("s.end").alias("session_end"),
        "n_events",
        "first_lsn",
        "last_lsn",
    )


def streaming_dedup(
    feed: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming duplicate elimination with BOUNDED state:
    dropDuplicatesWithinWatermark keeps dedup state only for the
    watermark horizon (a plain dropDuplicates grows state forever).

    Trade-off, stated plainly: the watermark also DROPS events whose
    event time is older than the horizon — they are late data, not
    duplicates. The merge engine downstream is already lsn-idempotent
    (LWW + epoch guard), so this wrapper is an OPTIONAL pre-filter for
    duplicate-heavy feeds; use it only when the source's out-of-order
    bound fits inside the watermark, otherwise let the merge absorb
    duplicates. Output ts keeps the pipeline's TIMESTAMP_NTZ contract
    (the LTZ cast watermarks require is undone on the way out)."""
    keys = keys or ["conv_id", "turn_idx", "lsn"]
    if not feed.isStreaming:
        return feed.dropDuplicates(keys)
    out = (
        _with_event_time(feed)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
    )
    if dict(feed.dtypes).get("ts") == "timestamp_ntz":
        out = out.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return out


RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
    ]
)

RUNNING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
    ]
)


def running_conversation_totals(feed: DataFrame) -> DataFrame:
    """Arbitrary stateful processing: per-conversation running event
    count + max lsn maintained ACROSS micro-batches in the state store
    (applyInPandasWithState, Arrow-batched — no per-row Python)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        n, mx = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            n += len(pdf)
            mx = max(mx, int(pdf["lsn"].max()))
        state.update((n, mx))
        yield pd.DataFrame(
            {"conv_id": [key[0]], "n_events": [n], "max_lsn": [mx]}
        )

    return feed.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
