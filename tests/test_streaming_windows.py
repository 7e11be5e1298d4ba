from __future__ import annotations

from pyspark.sql import functions as F

from radiant_portal_pipeline_spark.cdc.feed import feed_from_events
from radiant_portal_pipeline_spark.cdc.schemas import CHANGE_EVENT_SCHEMA
from radiant_portal_pipeline_spark.cdc.stream import write_feed_partitions
from radiant_portal_pipeline_spark.streaming.windows import (
    conversation_sessions,
    running_conversation_totals,
    windowed_turn_counts,
)


def _stage_feed(spark, tmp_path, sf_smoke):
    feed = feed_from_events(spark, sf_smoke).cache()
    d = str(tmp_path / "feed")
    write_feed_partitions(feed.withColumn("s", F.col("lsn") % 3), d, "s")
    return feed, d


def _drain(spark, feed_dir, transform, name, output_mode, max_files=1):
    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files))
        .parquet(feed_dir)
    )
    q = (
        transform(stream)
        .writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_counts_stream_equals_batch(spark, tmp_path, sf_smoke):
    feed, d = _stage_feed(spark, tmp_path, sf_smoke)
    got = _drain(
        spark, d, lambda s: windowed_turn_counts(s, "1 hour"), "win_counts",
        "complete",
    )
    exp = windowed_turn_counts(feed, "1 hour")  # same plan, batch mode
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
    assert got.count() > 0


def test_watermark_append_mode_emits_closed_windows(spark, tmp_path, sf_smoke):
    """Files staged in EVENT-TIME order: every window the watermark
    closes must be final and exactly equal to the batch ground truth.
    (With out-of-time-order staging the watermark legitimately DROPS
    late rows — covered by the next test.)"""
    feed = feed_from_events(spark, sf_smoke).cache()
    d = str(tmp_path / "feed_ordered")
    write_feed_partitions(feed.withColumn("s", F.floor(F.hour("ts") / 6)), d, "s")
    got = _drain(
        spark,
        d,
        lambda s: windowed_turn_counts(s, "1 hour", watermark="30 minutes"),
        "win_append",
        "append",
    )
    exp = {
        (r["window_start"], r["role"]): (r["n_events"], r["n_deletes"])
        for r in windowed_turn_counts(feed, "1 hour").collect()
    }
    rows = got.collect()
    assert rows, "watermark should have closed at least one window"
    for r in rows:  # every emitted window is final and exactly right
        assert exp[(r["window_start"], r["role"])] == (r["n_events"], r["n_deletes"])


def test_watermark_drops_late_rows(spark, tmp_path, sf_smoke):
    """Files staged OUT of time order: closed windows may miss rows that
    arrived past the watermark — emitted counts must never exceed the
    batch ground truth (late data dropped, not duplicated)."""
    feed, d = _stage_feed(spark, tmp_path, sf_smoke)
    got = _drain(
        spark,
        d,
        lambda s: windowed_turn_counts(s, "1 hour", watermark="30 minutes"),
        "win_late",
        "append",
    )
    exp = {
        (r["window_start"], r["role"]): r["n_events"]
        for r in windowed_turn_counts(feed, "1 hour").collect()
    }
    rows = got.collect()
    assert rows
    assert any(r["n_events"] < exp[(r["window_start"], r["role"])] for r in rows)
    for r in rows:
        assert r["n_events"] <= exp[(r["window_start"], r["role"])]


def test_session_windows(spark, tmp_path, sf_smoke):
    """Append mode + watermark + time-ordered staging: every session the
    watermark closes must exactly match the batch sessionization."""
    feed = feed_from_events(spark, sf_smoke).cache()
    d = str(tmp_path / "feed_ordered_s")
    write_feed_partitions(
        feed.withColumn("s", F.floor(F.dayofyear("ts") / 2)), d, "s"
    )
    got = _drain(
        spark,
        d,
        lambda s: conversation_sessions(s, gap="30 minutes", watermark="1 hour"),
        "sessions",
        "append",
    )
    exp = {
        (r["conv_id"], r["session_start"]): tuple(r)
        for r in conversation_sessions(feed, gap="30 minutes").collect()
    }
    rows = got.collect()
    assert rows, "watermark should have closed sessions"
    for r in rows:
        assert exp[(r["conv_id"], r["session_start"])] == tuple(r)


def test_streaming_dedup_collapses_duplicates_across_batches(spark, tmp_path):
    """At-least-once producer whose duplicates arrive in a LATER
    micro-batch than the originals — exercises dedup state retained
    across triggers, not just within-batch collapse."""
    from radiant_portal_pipeline_spark.cdc.feed import synthetic_feed
    from radiant_portal_pipeline_spark.streaming.windows import streaming_dedup

    base = synthetic_feed(spark, 4000).cache()
    dups = base.filter(F.col("lsn") % 3 == 0)  # verbatim re-emissions
    n_distinct = base.count()
    d = str(tmp_path / "dup_feed")
    # file 0 = originals, file 1 = the duplicates -> separate triggers
    write_feed_partitions(base.withColumn("s", F.lit(0)), d, "s")
    write_feed_partitions(dups.withColumn("s", F.lit(1)), d, "s")
    got = _drain(
        spark, d, lambda s: streaming_dedup(s), "dedup_out", "append", max_files=1
    )
    assert got.count() == n_distinct
    assert (
        got.groupBy("conv_id", "turn_idx", "lsn").count().filter("count > 1").count()
        == 0
    )
    # NTZ contract preserved through the internal LTZ cast
    assert dict(got.dtypes)["ts"] == "timestamp_ntz"


def test_stateful_running_totals_across_batches(spark, tmp_path, sf_smoke):
    feed, d = _stage_feed(spark, tmp_path, sf_smoke)
    got = _drain(
        spark, d, running_conversation_totals, "running", "update", max_files=1
    )
    # memory sink in update mode appends every update; last row per key
    # is the cross-batch final total
    from pyspark.sql import Window

    final = (
        got.withColumn("rn", F.monotonically_increasing_id())
        .withColumn(
            "last",
            F.row_number().over(
                Window.partitionBy("conv_id").orderBy(F.col("rn").desc())
            ),
        )
        .filter("last = 1")
    )
    exp = feed.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.max("lsn").alias("max_lsn")
    )
    a = {(r["conv_id"], r["n_events"], r["max_lsn"]) for r in final.collect()}
    b = {(r["conv_id"], r["n_events"], r["max_lsn"]) for r in exp.collect()}
    assert a == b
