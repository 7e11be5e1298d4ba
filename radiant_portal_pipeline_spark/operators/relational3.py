"""Third wave: analytic-window sessionization (lag + gap cumsum),
grouping sets / rollup, and sketch aggregates (approximate distinct /
quantiles — the scale path where the reference insists on exact
clinical counts, SURVEY.md §2.4 note)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from radiant_portal_pipeline_spark.operators.registry import load_table, query


@query(
    "q33_sessionization_lag",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT *, CAST(SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM w)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(event_id) AS first_event, MAX(event_id) AS last_event
    FROM s GROUP BY user_id, session_id
    """,
)
def q33_sessionization_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag(ts) gap detection + running-sum session
    ids (frame spec ROWS UNBOUNDED PRECEDING..CURRENT) — the analytic
    complement of streaming session_window. Deterministic via the
    (ts, event_id) total order."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag(F.col("ts")).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.col("ts") - prev_ts) > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    sess = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("session_id", sess.cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
    )


@query(
    "q34_grouping_sets",
    oracle="""
    SELECT c_mktsegment, n_name,
           COUNT(*) AS n_cust,
           ROUND(SUM(c_acctbal), 2) AS total_bal,
           GROUPING(c_mktsegment) AS g_seg, GROUPING(n_name) AS g_nat
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((c_mktsegment, n_name), (c_mktsegment), ())
    """,
)
def q34_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (detail + per-segment + grand total in one pass) —
    multi-granularity rollup the serving layer wants precomputed.
    GROUPING() flags disambiguate NULL-as-group from NULL-as-total."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = c.join(n, c.c_nationkey == n.n_nationkey)
    j.createOrReplaceTempView("_q34")
    return spark.sql(
        """
        SELECT c_mktsegment, n_name,
               COUNT(*) AS n_cust,
               ROUND(SUM(c_acctbal), 2) AS total_bal,
               GROUPING(c_mktsegment) AS g_seg, GROUPING(n_name) AS g_nat
        FROM _q34
        GROUP BY GROUPING SETS ((c_mktsegment, n_name), (c_mktsegment), ())
        """
    )


@query("q35_sketch_aggregates")  # rows-only: sketch impls differ per engine
def q35_sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketches for the 100 TB path: approx_count_distinct (HLL++) and
    percentile_approx (exact counts are the reference's clinical
    requirement, SURVEY.md §2.4 — at 10^10 rows the monitoring/quality
    layer uses sketches instead). Error bounds vs exact are asserted in
    tests/test_sketches.py; no oracle (DuckDB's sketches differ)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_p50"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("approx_p99"),
    )
