"""Second wave of SURVEY.md §2 coverage: cohort classification (A2),
ordered array_agg (A6/A7), per-tenant union loops (U2), priority
scheduling (A11/ST8), sorted limits (O2), and the broker-load path (S8)
driven end-to-end through a temp TSV.
"""

from __future__ import annotations

import os
import tempfile
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from radiant_portal_pipeline_spark.operators.registry import load_table, query


@query(
    "q23_cohort_classification",
    oracle="""
    WITH task AS (
      SELECT o_custkey,
             SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS n_open,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_closed
      FROM orders GROUP BY o_custkey)
    SELECT
      COUNT(DISTINCT CASE WHEN n_open > 0 AND n_closed = 0 THEN o_custkey END) AS pc_open_only,
      COUNT(DISTINCT CASE WHEN n_open = 0 AND n_closed > 0 THEN o_custkey END) AS pc_closed_only,
      COUNT(DISTINCT CASE WHEN n_open > 0 AND n_closed > 0 THEN o_custkey END) AS pc_mixed
    FROM task
    """,
)
def q23_cohort_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: two-level cohort classification — first a per-entity grain
    aggregation flags cohort membership (the reference's
    ``n_tumoral=1 AND n_normal=0`` tumor-only detection,
    somatic_snv_staging_variant_freq_insert.sql:10-71), then conditional
    distinct counts over the flags."""
    o = load_table(spark, sf_dir, "orders")
    task = o.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_closed"),
    )
    return task.agg(
        F.countDistinct(
            F.when((F.col("n_open") > 0) & (F.col("n_closed") == 0), F.col("o_custkey"))
        ).alias("pc_open_only"),
        F.countDistinct(
            F.when((F.col("n_open") == 0) & (F.col("n_closed") > 0), F.col("o_custkey"))
        ).alias("pc_closed_only"),
        F.countDistinct(
            F.when((F.col("n_open") > 0) & (F.col("n_closed") > 0), F.col("o_custkey"))
        ).alias("pc_mixed"),
    )


@query(
    "q24_sorted_array_agg",
    oracle="""
    SELECT l_orderkey,
           LIST_SORT(LIST_DISTINCT(LIST(l_returnflag))) AS flags,
           LEN(LIST_DISTINCT(LIST(l_partkey))) AS n_parts
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q24_sorted_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7: array_agg + distinct + NULL-free collect
    (array_remove(array_unique_agg(x), NULL),
    snv_staging_variant_insert.sql:38; collect_list of overlaps,
    germline_cnv_occurrence_insert_partition_delta.sql:1,7). Arrays are
    sorted so the value is deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.sort_array(F.array_distinct(F.collect_list("l_returnflag"))).alias("flags"),
        F.size(F.array_distinct(F.collect_list("l_partkey"))).alias("n_parts"),
    )


@query(
    "q25_union_per_tenant_loop",
    oracle="""
    SELECT segment, custkey, ROUND(total, 2) AS total FROM (
      SELECT 'BUILDING' AS segment, c_custkey AS custkey, SUM(o_totalprice) AS total
      FROM customer JOIN orders ON c_custkey = o_custkey
      WHERE c_mktsegment = 'BUILDING' GROUP BY c_custkey
      UNION ALL
      SELECT 'MACHINERY', c_custkey, SUM(o_totalprice)
      FROM customer JOIN orders ON c_custkey = o_custkey
      WHERE c_mktsegment = 'MACHINERY' GROUP BY c_custkey
      UNION ALL
      SELECT 'AUTOMOBILE', c_custkey, SUM(o_totalprice)
      FROM customer JOIN orders ON c_custkey = o_custkey
      WHERE c_mktsegment = 'AUTOMOBILE' GROUP BY c_custkey)
    """,
)
def q25_union_per_tenant_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: the Jinja per-tenant UNION ALL loop
    (snv_variant_part_insert_part.sql:7-15) as a reduce(unionByName)
    over per-tenant branches — Catalyst collapses the common subplans."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")

    def tenant_branch(seg: str) -> DataFrame:
        return (
            c.filter(F.col("c_mktsegment") == seg)
            .join(o, c.c_custkey == o.o_custkey)
            .groupBy("c_custkey")
            .agg(F.sum("o_totalprice").alias("t"))
            .select(
                F.lit(seg).alias("segment"),
                F.col("c_custkey").alias("custkey"),
                F.round(F.col("t"), 2).alias("total"),
            )
        )

    return reduce(
        DataFrame.unionByName,
        [tenant_branch(s) for s in ("BUILDING", "MACHINERY", "AUTOMOBILE")],
    )


@query(
    "q26_priority_scheduling",
    oracle="""
    SELECT part, priority, n FROM (
      SELECT o_orderkey % 8 AS part,
             MIN(CASE o_orderpriority
                 WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                 WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
                 ELSE 5 END) AS priority,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderkey % 8)
    ORDER BY priority, part
    """,
)
def q26_priority_scheduling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11/ST8: priority classes per partition — min priority per part,
    processed in priority order (partition.py:234-256 priority grouping;
    STAT<ASAP<URGENT<ROUTINE). Deterministic total order via (priority,
    part)."""
    o = load_table(spark, sf_dir, "orders")
    prio = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 3)
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", 4)
        .otherwise(5)
    )
    return (
        o.groupBy((F.col("o_orderkey") % 8).alias("part"))
        .agg(F.min(prio).alias("priority"), F.count(F.lit(1)).alias("n"))
        .orderBy("priority", "part")
    )


@query(
    "q27_latest_task_run",
    oracle="""
    SELECT o_orderkey, o_orderdate FROM orders
    ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
    """,
)
def q27_latest_task_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: ORDER BY ... DESC LIMIT 1 — latest task-run poll
    (trigger.py:56-63) — with a unique tiebreak for determinism.
    Spark plans this as TakeOrderedAndProject (no full sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        .limit(1)
        .select("o_orderkey", "o_orderdate")
    )


@query(
    "q28_broker_load_tsv",
    oracle="""
    SELECT event_id, user_id,
           ROUND(value * 100, 0) AS value_cents,
           LOWER(event_type) AS event_type_clean
    FROM events
    WHERE event_type <> 'error'
    """,
)
def q28_broker_load_tsv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: broker bulk load — events round-tripped through a REAL tab-
    separated file, re-read with an explicit schema, SET-derived columns
    and a WHERE load filter applied (staging_exomiser_load.sql:1-46).
    The oracle reads the original parquet — so the TSV write/read path
    itself is value-checked."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    work = tempfile.mkdtemp(prefix="broker_")
    tsv_dir = os.path.join(work, "events_tsv")
    ev.coalesce(4).write.option("sep", "\t").mode("overwrite").csv(tsv_dir)

    from radiant_portal_pipeline_spark.sources.broker_load import read_delimited

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    df = read_delimited(spark, tsv_dir, schema, sep="\t")
    return (
        df.filter(F.col("event_type") != "error")
        .select(
            "event_id",
            "user_id",
            F.round(F.col("value") * 100, 0).alias("value_cents"),
            F.lower(F.col("event_type")).alias("event_type_clean"),
        )
    )
