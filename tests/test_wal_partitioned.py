"""Partition-parallel WAL source (cdc/wal_partitioned.py): the full
DataSourceStreamReader contract — per-shard offsets, executor-side
range reads, exactly-once resume across restarts — the sharded-feed
shape a 100x deployment reads (round-4 verdict 'what's missing' #4)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from radiant_portal_pipeline_spark.cdc.merge import TranscriptMergeEngine
from radiant_portal_pipeline_spark.cdc.stream import run_cdc_stream
from radiant_portal_pipeline_spark.cdc.wal_partitioned import (
    PartitionedWalStreamReader,
    wal_partitioned_readstream,
)
from radiant_portal_pipeline_spark.lake import LakeTable


def test_shard_plan_covers_lsn_space_exactly_once():
    """Unit contract: over any (start, end) span the union of all
    partitions' rows is exactly the striped lsn set — no gaps, no
    duplicates, including a head not divisible by the shard count —
    and batch_size chunks the span into bounded parallel tasks."""
    rdr = PartitionedWalStreamReader(
        {"n_shards": "4", "n_events": "10007", "batch_size": "1000"}
    )
    start = rdr.initialOffset()
    end = rdr.latestOffset()
    # shard lens must partition the lsn space
    assert sum(end.values()) == 10007
    parts = rdr.partitions(start, end)
    # ~10007/1000 chunks across 4 shards: parallelism within one batch
    assert len(parts) > 4
    assert all(p.end_rec - p.start_rec <= 1000 for p in parts)
    lsns = []
    for p in parts:
        for row in rdr.read(p):
            lsns.append(row[7])  # lsn field
    assert sorted(lsns) == list(range(10007))

    # a mid-stream span (the resume shape): only the tail is served
    mid = {k: v // 2 for k, v in end.items()}
    tail = [
        row[7] for p in rdr.partitions(mid, end) for row in rdr.read(p)
    ]
    expect = sorted(
        s + k * 4
        for s in range(4)
        for k in range(int(mid[f"shard-{s}"]), int(end[f"shard-{s}"]))
    )
    assert sorted(tail) == expect


def test_partitioned_wal_stream_exactly_once_resume(spark, tmp_path):
    """End to end through Spark's real checkpoint machinery: a growing
    4-shard WAL drains in >=3 separate runs (fresh engine each time —
    nothing in-process survives), each resume reads only the new tail,
    a drained restart applies nothing, and the final LWW state equals
    the independent DuckDB oracle."""
    import duckdb

    from radiant_portal_pipeline_spark.cdc.wal_source import wal_oracle_sql

    tbl = TranscriptMergeEngine.create_table(
        spark, str(tmp_path / "t"), num_buckets=8
    )
    assert tbl is not None
    ckpt = str(tmp_path / "ckpt")

    applied_epochs: list[int] = []
    for grown_to in (3_000, 6_000, 9_000):
        eng = TranscriptMergeEngine(
            LakeTable(spark, str(tmp_path / "t")), num_buckets=8
        )
        r = run_cdc_stream(
            spark, None, eng, ckpt,
            source_df=wal_partitioned_readstream(
                spark, n_events=grown_to, n_shards=4, batch_size=500
            ),
        )
        applied = [b for b in r.batches if not b.skipped]
        assert len(applied) == 1, [b.epoch for b in r.batches]
        applied_epochs.append(applied[0].epoch)
    assert applied_epochs == sorted(set(applied_epochs)) and len(applied_epochs) == 3

    # drained: a further restart applies zero batches
    eng = TranscriptMergeEngine(LakeTable(spark, str(tmp_path / "t")), num_buckets=8)
    r = run_cdc_stream(
        spark, None, eng, ckpt,
        source_df=wal_partitioned_readstream(
            spark, n_events=9_000, n_shards=4, batch_size=500
        ),
    )
    assert not [b for b in r.batches if not b.skipped]

    got = sorted(
        (r["conv_id"], r["turn_idx"], r["text"], r["lsn"])
        for r in eng.current_state().collect()
    )
    oracle = sorted(
        map(tuple, duckdb.connect().execute(wal_oracle_sql(9_000)).fetchall())
    )
    assert got == oracle and len(got) > 0
