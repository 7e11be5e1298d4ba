"""Deterministic transcript change feeds.

Two generators, one arithmetic:

- ``synthetic_feed`` — ``spark.range(n)`` based, fully deterministic
  (no RNG), with a skew knob: every 5th event lands in one hot
  conversation (``conv-hot``), modelling the hot-partition problem the
  reference bounds with occupancy caps
  (radiant/tasks/starrocks/partition.py:91-165, SURVEY.md ST9/X15).
- ``feed_from_events`` — the same mapping applied to the driver-provided
  ``events`` table, so a DuckDB oracle can reproduce the feed exactly
  (``feed_sql`` renders the identical SQL in either dialect).

Feed columns: transcript payload (conv_id, turn_idx, role, text, tool,
ts) + CDC envelope (op I/U/D — 'error' events are deletes — lsn =
event_id, commit_epoch = lsn // EPOCH_SIZE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

N_CONVS = 97
MAX_TURNS = 50
HOT_EVERY = 5
HOT_TURNS = 200
EPOCH_SIZE = 2000

_FEED_TEMPLATE = """
SELECT
  CASE WHEN event_id % {hot} = 0 THEN 'conv-hot'
       ELSE 'conv-' || CAST(event_id % {nconv} AS {str_t}) END AS conv_id,
  CAST(CASE WHEN event_id % {hot} = 0 THEN (event_id {div} {hot}) % {hot_turns}
            ELSE (event_id {div} {nconv}) % {turns} END AS INTEGER) AS turn_idx,
  CASE WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
  'msg-' || CAST(event_id AS {str_t}) || '-' || event_type AS text,
  CASE WHEN event_type = 'click' THEN 'browser'
       WHEN event_type = 'purchase' THEN 'checkout'
       ELSE NULL END AS tool,
  ts,
  CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
  CAST(event_id AS BIGINT) AS lsn,
  CAST(event_id {div} {epoch} AS BIGINT) AS commit_epoch
FROM {source}
"""


def feed_sql(
    dialect: str,
    source: str = "events",
    hot_every: int = HOT_EVERY,
    n_convs: int = N_CONVS,
) -> str:
    """Render the feed derivation for 'spark' or 'duckdb'.
    ``hot_every=k`` sends every k-th event to the single hot
    conversation (k=5 → 20% hot, k=2 → 50% hot — the skew-bench knob)."""
    if hot_every < 1:
        raise ValueError(f"hot_every must be >= 1, got {hot_every}")
    if n_convs < 1:
        raise ValueError(f"n_convs must be >= 1, got {n_convs}")
    if dialect == "spark":
        div, str_t = "DIV", "STRING"
    elif dialect == "duckdb":
        div, str_t = "//", "VARCHAR"
    else:
        raise ValueError(dialect)
    return _FEED_TEMPLATE.format(
        hot=hot_every,
        nconv=n_convs,
        hot_turns=HOT_TURNS,
        turns=MAX_TURNS,
        div=div,
        str_t=str_t,
        epoch=EPOCH_SIZE,
        source=source,
    )


def feed_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.createOrReplaceTempView("_cdc_events_src")
    return spark.sql(feed_sql("spark", source="_cdc_events_src"))


def synthetic_feed(
    spark: SparkSession,
    n_events: int,
    n_convs: int = N_CONVS,
    payload_chars: int = 200,
    dup_frac: float = 0.0,
    ooo_window: int = 0,
    evolve_from_lsn: int | None = None,
    hot_every: int = HOT_EVERY,
) -> DataFrame:
    """Purely generated feed for benchmarks and property tests
    (FIXTURES.md F2). Same envelope arithmetic as the events-derived
    feed; deterministic (no RNG). Knobs:

    - ``dup_frac`` — fraction of events re-emitted VERBATIM (same lsn)
      to exercise idempotent apply (ref utils.py:73-96);
    - ``ooo_window`` — out-of-order delivery: within blocks of W
      events the DELIVERY epoch is assigned from a coprime-stride
      permutation of the position, so an epoch can carry lsns that are
      lower than ones already delivered (LWW straggler tests, ref W1);
    - ``evolve_from_lsn`` — events at/after this lsn carry additive
      ``meta_model``/``meta_tokens`` columns (schema-evolution batch,
      ref migrations SURVEY.md §1.2). Earlier events have them NULL —
      callers simulating true mid-stream evolution should drop the
      columns for earlier batches.
    """
    from pyspark.sql import functions as F

    types = ["click", "view", "signup", "purchase", "error"]
    df = spark.range(n_events).withColumnRenamed("id", "event_id")
    event_type = F.element_at(
        F.array(*[F.lit(t) for t in types]),
        (F.pmod(F.xxhash64("event_id"), F.lit(len(types))) + 1).cast("int"),
    )
    df = df.withColumn("event_type", event_type).withColumn(
        "ts",
        F.timestamp_seconds(F.lit(1704067200) + F.col("event_id") % 86400).cast(
            "timestamp_ntz"
        ),
    )
    if dup_frac > 0:
        dups = df.filter(
            F.pmod(F.xxhash64("event_id", F.lit(1)), F.lit(10_000))
            < F.lit(int(dup_frac * 10_000))
        )
        df = df.unionAll(dups)
    df.createOrReplaceTempView("_cdc_synth_src")
    feed = spark.sql(
        feed_sql(
            "spark", source="_cdc_synth_src", hot_every=hot_every, n_convs=n_convs
        )
    )
    if payload_chars:
        feed = feed.withColumn("text", F.rpad(F.col("text"), payload_chars, "x"))
    if ooo_window > 1:
        # bijection within each block of W positions: pos' = (pos *
        # stride) % W with stride coprime to W — a permutation, so every
        # event is delivered exactly once, displaced at most W-1 slots.
        w = ooo_window
        stride = 7 if w % 7 else (11 if w % 11 else 3)
        delivery_pos = (F.col("lsn") - F.col("lsn") % w) + (
            F.col("lsn") % w * stride
        ) % w
        feed = feed.withColumn(
            "commit_epoch", F.floor(delivery_pos / EPOCH_SIZE).cast("long")
        )
    if evolve_from_lsn is not None:
        feed = feed.withColumn(
            "meta_model",
            F.when(F.col("lsn") >= evolve_from_lsn, F.lit("m-2")),
        ).withColumn(
            "meta_tokens",
            F.when(
                F.col("lsn") >= evolve_from_lsn,
                (F.col("lsn") % 512).cast("int"),
            ),
        )
    return feed
