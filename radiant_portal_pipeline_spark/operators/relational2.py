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
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(l_returnflag))), ',')
             AS flags,
           CAST(LEN(LIST_DISTINCT(LIST(l_partkey))) AS BIGINT) AS n_parts
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q24_sorted_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7: array_agg + distinct + NULL-free collect
    (array_remove(array_unique_agg(x), NULL),
    snv_staging_variant_insert.sql:38; collect_list of overlaps,
    germline_cnv_occurrence_insert_partition_delta.sql:1,7). The sorted
    array is emitted as a comma-joined STRING on both sides: the
    driver's pandas canonicalizer cannot sort list-valued cells
    (round-1 `unhashable type: 'list'`); the raw-array variant stays
    covered in tests/test_text_sim.py-style pytest assertions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.concat_ws(
            ",", F.sort_array(F.array_distinct(F.collect_list("l_returnflag")))
        ).alias("flags"),
        F.size(F.array_distinct(F.collect_list("l_partkey")))
        .cast("long")
        .alias("n_parts"),
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
    "q29_best_overlap_rank",
    oracle="""
    WITH iv AS (SELECT event_id, user_id, value AS lo, value + 50 AS hi FROM events),
    pairs AS (
      SELECT a.event_id AS a_event, b.event_id AS b_event, a.user_id,
             GREATEST(0, LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo)) AS ov
      FROM iv a JOIN iv b ON a.user_id = b.user_id AND a.event_id <> b.event_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY a_event ORDER BY ov DESC, b_event ASC) AS rn
      FROM pairs WHERE ov > 0)
    SELECT a_event, b_event, ROUND(ov, 2) AS best_overlap
    FROM ranked WHERE rn = 1
    """,
)
def q29_best_overlap_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: best-overlap ranking — row_number over overlap DESC, joined
    rn=1 (germline_cnv_occurrence_insert_partition_delta.sql:44-52,89).
    Tie-broken on the partner id for engine determinism."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("value").alias("lo"),
        (F.col("value") + 50).alias("hi"),
    )
    a, b = ev.alias("a"), ev.alias("b")
    ov = F.greatest(
        F.lit(0.0),
        F.least(F.col("a.hi"), F.col("b.hi")) - F.greatest(F.col("a.lo"), F.col("b.lo")),
    )
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") != F.col("b.event_id")),
        )
        .select(
            F.col("a.event_id").alias("a_event"),
            F.col("b.event_id").alias("b_event"),
            ov.alias("ov"),
        )
        .filter(F.col("ov") > 0)
    )
    w = Window.partitionBy("a_event").orderBy(F.col("ov").desc(), F.col("b_event").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("a_event", "b_event", F.round("ov", 2).alias("best_overlap"))
    )


@query(
    "q30_explode_unnest",
    oracle="""
    SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id,
             UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '\\s+'),
                                t -> t <> '')) AS token
      FROM documents)
    GROUP BY token HAVING COUNT(*) > 5
    """,
)
def q30_explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 UNNEST lateral explode (snv_consequence_filter_insert.sql:77-79)
    — the real explode + reaggregation (token document frequencies)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    return (
        d.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n") > 5)
    )


@query(
    "q31_lookup_table_map",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderpriority
             WHEN '1-URGENT' THEN 'STAT' WHEN '2-HIGH' THEN 'ASAP'
             WHEN '3-MEDIUM' THEN 'URGENT' WHEN '4-NOT SPECIFIED' THEN 'ROUTINE'
             ELSE 'ROUTINE' END AS priority_class,
           CASE WHEN o_orderstatus = 'O' AND o_totalprice > 200000 THEN 'open_large'
                WHEN o_orderstatus = 'O' THEN 'open_small'
                WHEN o_orderstatus = 'F' THEN 'finished'
                ELSE 'partial' END AS status_class
    FROM orders
    """,
)
def q31_lookup_table_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 pure-function lookup tables (the reference's ~400 LoC
    parental-origin/transmission dict lookups,
    germline/occurrence.py:247-667) as columnar map-literal + when-chain
    expressions — no Python in the row path."""
    o = load_table(spark, sf_dir, "orders")
    prio_map = F.create_map(
        F.lit("1-URGENT"), F.lit("STAT"),
        F.lit("2-HIGH"), F.lit("ASAP"),
        F.lit("3-MEDIUM"), F.lit("URGENT"),
        F.lit("4-NOT SPECIFIED"), F.lit("ROUTINE"),
        F.lit("5-LOW"), F.lit("ROUTINE"),
    )
    status = (
        F.when((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 200000),
               "open_large")
        .when(F.col("o_orderstatus") == "O", "open_small")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("partial")
    )
    return o.select(
        "o_orderkey",
        F.coalesce(prio_map[F.col("o_orderpriority")], F.lit("ROUTINE")).alias(
            "priority_class"
        ),
        status.alias("status_class"),
    )


@query(
    "q32_tenant_isolation",
    oracle="""
    SELECT source AS tenant_code, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE source IN ('src1', 'src2', 'src3')
    GROUP BY source
    """,
)
def q32_tenant_isolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/§1.1 multi-tenancy: tenant-isolation predicate + per-tenant
    aggregation (`tenant_code = %(tenant_code)s`,
    germline..._delta.sql:72; per-tenant DBs radiant_tables.py:102-113).
    The tenant column doubles as a partition/filter key at scale."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("source").isin("src1", "src2", "src3"))
        .groupBy(F.col("source").alias("tenant_code"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
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
