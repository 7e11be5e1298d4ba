"""A NON-FILE streaming source for the CDC loop: a WAL/binlog tail as
a PySpark custom data source (public ``pyspark.sql.datasource`` API,
Spark 4) whose offsets are LSN positions, not file listings.

The file source proves the engine's exactly-once semantics over
modification-time offsets (cdc/stream.py); production binlog tails
(Debezium, Kafka-connect, cloud CDC feeds) track BYTE/LSN offsets
instead. This source exercises that offset model end to end through
Spark's real checkpoint machinery:

- ``initialOffset`` starts at LSN 0 (or ``start_lsn``);
- ``read(start)`` serves the next window of change events and advances
  the offset to the first unserved LSN;
- ``readBetweenOffsets(start, end)`` REGENERATES a previously served
  window verbatim — the replay path Spark invokes when a batch is
  reprocessed after a crash, which is exactly where a non-deterministic
  source would silently break exactly-once.

Events are the same deterministic envelope arithmetic as
``cdc.feed.synthetic_feed`` (conv/turn from lsn, 'error' type means
delete), so a DuckDB oracle can recompute the expected final state.
The generator is driver-side (SimpleDataSourceStreamReader contract) —
the right trade for a WAL tail, whose ingest is sequential by nature;
partition-parallel sources would implement the full
``DataSourceStreamReader`` with per-partition offset ranges.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

_TYPES = ["click", "view", "signup", "purchase", "error"]

# duckdb-compatible schema of the served envelope (CHANGE_EVENT_SCHEMA
# minus commit_epoch, which the streaming loop derives from batch_id)
WAL_SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp_ntz, op string, lsn bigint, commit_epoch bigint"
)


def _xxh_mod(v: int, m: int) -> int:
    """Cheap deterministic spread (NOT xxhash — this source's rows only
    need determinism, and the oracle recomputes the same formula)."""
    return (v * 2654435761 % 2**32) % m


def event_at(lsn: int, n_convs: int, hot_every: int) -> tuple:
    """The envelope row at one WAL position — single source of truth
    for read() and readBetweenOffsets() (verbatim replay)."""
    etype = _TYPES[_xxh_mod(lsn, len(_TYPES))]
    if hot_every and lsn % hot_every == 0:
        conv, turn = "conv-hot", (lsn // hot_every) % 200
    else:
        conv, turn = f"conv-{lsn % n_convs}", (lsn // n_convs) % 50
    return (
        conv,
        turn,
        "user" if lsn % 2 == 0 else "assistant",
        f"msg-{lsn}-{etype}",
        {"click": "browser", "purchase": "checkout"}.get(etype),
        dt.datetime(2024, 1, 1) + dt.timedelta(seconds=lsn % 86400),
        "D" if etype == "error" else "U",
        lsn,
        0,
    )


class WalStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.n_events = int(options.get("n_events", 10_000))
        self.batch_size = int(options.get("batch_size", 2_000))
        self.n_convs = int(options.get("n_convs", 97))
        self.hot_every = int(options.get("hot_every", 5))
        self.start_lsn = int(options.get("start_lsn", 0))

    def initialOffset(self) -> dict:
        return {"lsn": self.start_lsn}

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        # a LIST, not a generator: Spark pickles the prefetched batch
        # into its offset-log cache for crash replay
        return [event_at(lsn, self.n_convs, self.hot_every) for lsn in range(lo, hi)]

    def read(self, start: dict):
        lo = int(start["lsn"])
        hi = min(lo + self.batch_size, self.n_events)
        # a list_iterator (picklable, a real iterator): Spark both
        # next()s it and pickles the prefetch cache for crash replay
        return iter(self._rows(lo, hi)), {"lsn": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # verbatim replay of a served window — MUST regenerate the same
        # rows or crash-recovery would apply a different batch
        return iter(self._rows(int(start["lsn"]), int(end["lsn"])))


class WalFeedSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wal_feed"

    def schema(self) -> str:
        return WAL_SCHEMA_DDL

    def simpleStreamReader(self, schema) -> WalStreamReader:
        return WalStreamReader(self.options)


def _ship_by_value() -> None:
    """The data-source planner/runner are SEPARATE Python processes
    that unpickle the source class; they see neither the driver's
    sys.path nor (once their daemon is up) late addPyFile calls.
    Registering this module for cloudpickle by-VALUE serialization
    makes the pickled source self-contained — the worker needs no
    import of this package at all (everything event_at uses is
    stdlib). Idempotent."""
    from pyspark import cloudpickle

    import radiant_portal_pipeline_spark.cdc.wal_source as _self

    cloudpickle.register_pickle_by_value(_self)


def wal_readstream(
    spark,
    n_events: int,
    batch_size: int = 2_000,
    n_convs: int = 97,
    hot_every: int = 5,
):
    """Register the source (idempotent) and open a streaming read.

    The streaming-source runner is a SEPARATE Python process that
    unpickles the reader — shipped self-contained by value (see
    _ship_by_value) so it works from any driver cwd without
    --py-files."""
    _ship_by_value()
    spark.dataSource.register(WalFeedSource)
    return (
        spark.readStream.format("wal_feed")
        .option("n_events", str(n_events))
        .option("batch_size", str(batch_size))
        .option("n_convs", str(n_convs))
        .option("hot_every", str(hot_every))
        .load()
    )


def wal_oracle_sql(n_events: int, n_convs: int = 97, hot_every: int = 5) -> str:
    """DuckDB SQL recomputing the final LWW state of a fully drained
    WAL feed (independent of every Spark code path)."""
    return f"""
    WITH lsns AS (SELECT UNNEST(RANGE(0, {n_events})) AS lsn),
    ev AS (
      SELECT
        CASE WHEN lsn % {hot_every} = 0 THEN 'conv-hot'
             ELSE 'conv-' || CAST(lsn % {n_convs} AS VARCHAR) END AS conv_id,
        CAST(CASE WHEN lsn % {hot_every} = 0 THEN (lsn // {hot_every}) % 200
                  ELSE (lsn // {n_convs}) % 50 END AS INTEGER) AS turn_idx,
        'msg-' || CAST(lsn AS VARCHAR) || '-' ||
          (['click','view','signup','purchase','error'])
            [((lsn * 2654435761) % 4294967296) % 5 + 1] AS text,
        CASE WHEN (['click','view','signup','purchase','error'])
            [((lsn * 2654435761) % 4294967296) % 5 + 1] = 'error'
             THEN 'D' ELSE 'U' END AS op,
        lsn
      FROM lsns),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                                   ORDER BY lsn DESC) rn
      FROM ev)
    SELECT conv_id, turn_idx, text, lsn
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """
