"""Relational operator inventory (SURVEY.md §2) as named queries.

Each query re-expresses one operator family from the reference's
StarRocks SQL, Spark-first: declarative DataFrame plans so Catalyst
gets pushdown/pruning/join-selection for free. Docstrings cite the
reference pattern being covered (file:line into /root/reference).

Scale notes are given per query where the plan shape matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from radiant_portal_pipeline_spark.operators.registry import load_table, query


# --------------------------------------------------------------------- A/P


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide grouped aggregation with derived expressions — the shape of
    the reference's frequency inserts (germline_snv_staging_variant_freq_insert.sql:23-45).
    Partial aggregation is map-side; one shuffle on the 2-col group key."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q02_watermark_delta_filter",
    oracle="""
    WITH src AS (
      SELECT event_id, ts AS updated_at,
             CASE WHEN user_id % 3 = 0 THEN NULL
                  WHEN user_id % 3 = 1 THEN ts - INTERVAL 1 HOUR
                  ELSE ts + INTERVAL 1 HOUR END AS ingested_at,
             event_type = 'error' AS deleted
      FROM events)
    SELECT event_id, deleted
    FROM src
    WHERE updated_at >= COALESCE(ingested_at, TIMESTAMP '1970-01-01') OR deleted
    """,
)
def q02_watermark_delta_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: the reference's CDC watermark predicate
    `updated_at >= COALESCE(ingested_at, epoch) OR deleted`
    (sequencing_experiment_select.sql:1-2). Pure filter — pushes to scan."""
    ev = load_table(spark, sf_dir, "events")
    ingested = (
        F.when(F.col("user_id") % 3 == 0, F.lit(None).cast("timestamp"))
        .when(F.col("user_id") % 3 == 1, F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        .otherwise(F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        ev.withColumn("updated_at", F.col("ts"))
        .withColumn("ingested_at", ingested)
        .withColumn("deleted", F.col("event_type") == "error")
        .filter(
            (
                F.col("updated_at")
                >= F.coalesce(F.col("ingested_at"), F.lit("1970-01-01").cast("timestamp"))
            )
            | F.col("deleted")
        )
        .select("event_id", "deleted")
    )


@query(
    "q03_anti_join_unseen",
    oracle="""
    SELECT c.c_custkey, MD5(c.c_name) AS cust_hash
    FROM customer c ANTI JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def q03_anti_join_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: LEFT ANTI dedup-vs-state — unseen hashes only
    (variant_lookup_insert_hashes.sql:5). At scale the state side is the
    big one: anti join shuffles on the key; with a bucketed state table
    it becomes a storage-partitioned join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", F.md5(F.col("c_name")).alias("cust_hash"))
    )


@query(
    "q04_semi_join_pruning",
    oracle="""
    SELECT p.p_partkey, p.p_name
    FROM part p SEMI JOIN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45) l
      ON p.p_partkey = l.l_partkey
    """,
)
def q04_semi_join_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: LEFT SEMI existence pruning (snv_variant_insert.sql:84)."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_name"
    )


@query(
    "q05_broadcast_dim_enrich",
    oracle="""
    SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q05_broadcast_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: explicit broadcast of a small dimension
    (germline_snv_occurrence_insert_partition_delta.sql:60 `JOIN [BROADCAST]`).
    supplier⨝nation is tiny → broadcast; the fact table never shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    dim = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "n_name"
    )
    return (
        li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q06_multiway_left_enrich",
    oracle="""
    SELECT o.o_orderkey, c.c_name, n.n_name, r.r_name
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q06_multiway_left_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: chained multi-way LEFT OUTER annotation enrichment
    (snv_staging_variant_insert.sql:32-38, 6-way). AQE turns the small
    sides into broadcasts automatically; no explicit hint needed."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .join(n, c.c_nationkey == n.n_nationkey, "left")
        .join(r, n.n_regionkey == r.r_regionkey, "left")
        .select("o_orderkey", "c_name", "n_name", "r_name")
    )


@query(
    "q07_composite_key_join",
    oracle="""
    WITH dim AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS ps_sum_cents,
             COUNT(*) AS ps_n
      FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT l.l_orderkey, l.l_linenumber, d.ps_sum_cents, d.ps_n
    FROM lineitem l LEFT JOIN dim d
      ON l.l_partkey = d.l_partkey AND l.l_suppkey = d.l_suppkey
    """,
)
def q07_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: composite-key equi join (snv_consequence_insert.sql:39-40
    dbnsfp on (locus_id, transcript_id)). Prices are quantized to BIGINT
    cents per row BEFORE summing on BOTH sides, so the aggregate is an
    exact integer — engine- and dtype-identical (DuckDB's DECIMAL /
    HUGEINT sums render differently from Spark's in the driver's
    canonicalizer even when values are equal)."""
    li = load_table(spark, sf_dir, "lineitem")
    dim = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("ps_sum_cents"),
        F.count(F.lit(1)).alias("ps_n"),
    )
    return li.join(dim, ["l_partkey", "l_suppkey"], "left").select(
        "l_orderkey", "l_linenumber", "ps_sum_cents", "ps_n"
    )


@query(
    "q08_conditional_distinct_freq",
    oracle="""
    SELECT l_partkey,
           COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_orderkey END) AS pc_returned,
           COUNT(DISTINCT CASE WHEN l_returnflag = 'A' THEN l_orderkey END) AS pc_accepted,
           COUNT(DISTINCT CASE WHEN l_quantity > 25 THEN l_suppkey END) AS pc_bulk_supp
    FROM lineitem GROUP BY l_partkey
    """,
)
def q08_conditional_distinct_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: conditional distinct counts per cohort in ONE pass — the
    reference's frequency numerators
    (germline_snv_staging_variant_freq_insert.sql:7-45). Multiple exact
    distincts expand the plan; keeping them conditional over one
    groupBy is the reference's (and our) choice — clinical/exact, no
    approx_count_distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey").agg(
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_orderkey"))
        ).alias("pc_returned"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "A", F.col("l_orderkey"))
        ).alias("pc_accepted"),
        F.countDistinct(F.when(F.col("l_quantity") > 25, F.col("l_suppkey"))).alias(
            "pc_bulk_supp"
        ),
    )


@query(
    "q09_partial_final_rollup",
    oracle="""
    WITH partial AS (
      SELECT l_partkey, l_orderkey % 8 AS bucket,
             SUM(l_quantity) AS pq, SUM(l_extendedprice) AS pr
      FROM lineitem GROUP BY l_partkey, l_orderkey % 8)
    SELECT l_partkey, ROUND(SUM(pq), 2) AS total_qty, ROUND(SUM(pr), 2) AS total_rev
    FROM partial GROUP BY l_partkey
    """,
)
def q09_partial_final_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: partial→final incremental aggregation — per-part staging
    freq tables rolled up globally
    (germline_snv_variant_frequency_insert.sql:3-28). In the CDC engine
    this is how derived aggregates recompute only touched partitions."""
    li = load_table(spark, sf_dir, "lineitem")
    partial = li.groupBy(
        "l_partkey", (F.col("l_orderkey") % 8).alias("bucket")
    ).agg(F.sum("l_quantity").alias("pq"), F.sum("l_extendedprice").alias("pr"))
    return partial.groupBy("l_partkey").agg(
        F.round(F.sum("pq"), 2).alias("total_qty"),
        F.round(F.sum("pr"), 2).alias("total_rev"),
    )


@query(
    "q10_scalar_totals_broadcast",
    oracle="""
    SELECT n.n_nationkey, COUNT(c.c_custkey) AS n_cust,
           ROUND(COUNT(c.c_custkey) * 1.0 / t.total, 4) AS cust_share
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    CROSS JOIN (SELECT COUNT(*) AS total FROM customer) t
    GROUP BY n.n_nationkey, t.total
    """,
)
def q10_scalar_totals_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: scalar-subquery broadcast of a 1-row aggregate — the
    denominator totals repeated per column
    (germline_snv_variant_frequency_insert.sql:29-48). crossJoin(broadcast)
    keeps it a map-side literal, no shuffle."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    totals = c.agg(F.count(F.lit(1)).alias("total"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .crossJoin(F.broadcast(totals))
        .groupBy("n_nationkey", "total")
        .agg(F.count("c_custkey").alias("n_cust"))
        .select(
            "n_nationkey",
            "n_cust",
            F.round(F.col("n_cust") * 1.0 / F.col("total"), 4).alias("cust_share"),
        )
    )


# ----------------------------------------------------------------- windows


@query(
    "q11_top1_per_key_window",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders) WHERE rn = 1
    """,
)
def q11_top1_per_key_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: top-1-per-key ranking — the LWW/dedup pattern
    (exomiser_insert_partition_delta.sql:9, `variant_rank = 1`). The CDC
    engine's production path uses the max-struct aggregation instead
    (see cdc.dedup) — this registers the window form for parity."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "q12_range_interval_join",
    oracle="""
    SELECT o.o_orderkey, COUNT(*) AS n_in_window
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderkey
    """,
)
def q12_range_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: interval/range join — equi key + range predicate, the
    cytoband/gene overlap shape
    (germline_cnv_occurrence_insert_partition_delta.sql:1-21). The equi
    key carries the shuffle; the range predicate evaluates post-join,
    so at scale the join stays a hash join, not a cartesian."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= o.o_orderdate + F.expr("INTERVAL 90 DAY"))
    )
    return o.join(li, cond).groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_in_window")
    )


@query(
    "q13_theta_overlap_join",
    oracle="""
    WITH iv AS (SELECT event_id, user_id, value AS lo, value + 50 AS hi FROM events)
    SELECT a.user_id, a.event_id AS a_event, b.event_id AS b_event,
           ROUND(GREATEST(0, LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo)), 2) AS overlap
    FROM iv a JOIN iv b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
    WHERE GREATEST(0, LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo)) >= 0.8 * (a.hi - a.lo)
      AND GREATEST(0, LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo)) >= 0.8 * (b.hi - b.lo)
    """,
)
def q13_theta_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: reciprocal-overlap theta join — equi keys bound the blow-up,
    GREATEST/LEAST overlap predicate filters
    (germline_cnv_occurrence_insert_partition_delta.sql:22-43)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("value").alias("lo"), (F.col("value") + 50).alias("hi")
    )
    a = ev.alias("a")
    b = ev.alias("b")
    overlap = F.greatest(
        F.lit(0.0),
        F.least(F.col("a.hi"), F.col("b.hi")) - F.greatest(F.col("a.lo"), F.col("b.lo")),
    )
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
        .filter(
            (overlap >= 0.8 * (F.col("a.hi") - F.col("a.lo")))
            & (overlap >= 0.8 * (F.col("b.hi") - F.col("b.lo")))
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("a_event"),
            F.col("b.event_id").alias("b_event"),
            F.round(overlap, 2).alias("overlap"),
        )
    )


# ------------------------------------------------------------------- sets


@query(
    "q14_union_distinct_catalog",
    oracle="""
    SELECT DISTINCT custkey FROM (
      SELECT o_custkey AS custkey FROM orders
      UNION ALL
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0)
    """,
)
def q14_union_distinct_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: UNION ALL of two sources then DISTINCT — the germline+somatic
    locus catalog union (snv_variant_insert.sql:16-22)."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return o.unionByName(c).distinct()


@query(
    "q15_not_in_subquery",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE o_custkey NOT IN (
      SELECT c_custkey FROM customer WHERE c_acctbal < 0 AND c_custkey IS NOT NULL)
    """,
)
def q15_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: NOT IN (subquery) anti-predicate — flag-deleted pattern
    (sequencing_experiment_update_deleted.sql:1-5) — as a left_anti join."""
    o = load_table(spark, sf_dir, "orders")
    bad = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    return o.join(bad, o.o_custkey == bad.c_custkey, "left_anti").select("o_orderkey")


# ------------------------------------------------------- scalar/array/misc


@query(
    "q16_explode_tokens_agg",
    oracle="""
    SELECT doc_id,
           LEN(LIST_DISTINCT(LIST_FILTER(
             REGEXP_SPLIT_TO_ARRAY(LOWER(text), '\\s+'), t -> t <> ''))) AS n_distinct_tokens,
           LEN(LIST_FILTER(
             REGEXP_SPLIT_TO_ARRAY(LOWER(text), '\\s+'), t -> t <> '')) AS n_tokens
    FROM documents
    """,
)
def q16_explode_tokens_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 array family: split/size/array_distinct — the UNNEST +
    array_unique_agg shape (snv_consequence_filter_insert.sql:77-79,
    snv_staging_variant_insert.sql:38) without a shuffle (per-row array
    ops instead of explode+groupBy — same result, no exchange)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    return d.select(
        "doc_id",
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.size(toks).alias("n_tokens"),
    )


@query(
    "q17_any_value_group",
    oracle="""
    SELECT l.l_orderkey, ANY_VALUE(o.o_orderstatus) AS status,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_orderkey
    """,
)
def q17_any_value_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: ANY_VALUE over a group-constant column
    (snv_variant_insert.sql:2-15) — deterministic because the column is
    functionally dependent on the group key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.first("o_orderstatus").alias("status"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@query(
    "q18_value_cleaning",
    oracle="""
    SELECT event_id,
           NULLIF(ROUND(value, 2), 0) AS value_nz,
           CASE WHEN value > 100 THEN ROUND(value, 2) ELSE NULL END AS value_hi,
           COALESCE(NULLIF(event_type, 'error'), 'cleaned') AS type_clean
    FROM events WHERE event_type <> 'view'
    """,
)
def q18_value_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: value cleaning — zero→NULL coercions, sentinel filtering
    (occurrence.py:169-199 dp/gq/ad `>0 else None`;
    variant_lookup_insert_hashes.sql:6 `alternate <> '*'`)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") != "view").select(
        "event_id",
        F.nullif(F.round(F.col("value"), 2), F.lit(0)).alias("value_nz"),
        F.when(F.col("value") > 100, F.round(F.col("value"), 2)).alias("value_hi"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("cleaned")).alias(
            "type_clean"
        ),
    )


@query(
    "q19_distinct_projection",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q19_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: DISTINCT projection (variant_lookup_insert_hashes.sql:3)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey"
    ).distinct()


def sequential_ids(
    df: DataFrame, order_col: str, id_col: str = "_seq", n_ranges: int = 32
) -> DataFrame:
    """Dense 1..N numbering in ``order_col`` order WITHOUT the
    single-partition global-sort window: range-partition on the order
    column, rank locally per partition (window partitioned by the
    physical partition id — full parallelism), then shift each
    partition by the cumulative count of the partitions before it.
    The only driver-side data is one row count PER PARTITION
    (O(n_ranges), never O(rows)). ``order_col`` values must be unique
    for a deterministic assignment. This is the zipWithIndex shape in
    pure DataFrame ops — the scalable form of the reference's
    AUTO_INCREMENT id fallback."""
    ranged = df.repartitionByRange(n_ranges, F.col(order_col)).localCheckpoint(
        eager=True  # pin the range-sampler's partitioning for both passes
    )
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    counts = sorted(
        (r["_pid"], r["cnt"])
        for r in with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    omap = F.create_map(
        *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    return with_pid.withColumn(
        id_col, (F.row_number().over(w) + omap[F.col("_pid")]).cast("long")
    ).drop("_pid")


@query(
    "q20b_sequential_ids_scalable",
    oracle="""
    SELECT MD5(p_name) AS part_hash,
           ROW_NUMBER() OVER (ORDER BY MD5(p_name)) AS seq_id
    FROM part
    """,
)
def q20b_sequential_ids_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalable sequential-id operator itself, oracle-checked
    against the serial ROW_NUMBER definition: range partition + local
    rank + per-partition offsets — no global-sort single task."""
    p = load_table(spark, sf_dir, "part")
    hashes = p.select(F.md5(F.col("p_name")).alias("part_hash"))
    return sequential_ids(hashes, "part_hash", id_col="seq_id")


@query(
    "q20_surrogate_id_assignment",
    oracle="""
    WITH existing AS (
      SELECT MD5(p_name) AS part_hash, p_partkey AS part_id
      FROM part WHERE p_partkey <= 100),
    unseen AS (
      SELECT MD5(p_name) AS part_hash FROM part WHERE p_partkey > 100),
    mx AS (SELECT MAX(part_id) AS max_id FROM existing)
    SELECT part_hash, part_id FROM existing
    UNION ALL
    SELECT u.part_hash,
           mx.max_id + ROW_NUMBER() OVER (ORDER BY u.part_hash) AS part_id
    FROM unseen u CROSS JOIN mx
    """,
)
def q20_surrogate_id_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/§1.4: surrogate-id assignment — anti-join unseen hashes, then
    max(existing) + dense numbering, the reference's AUTO_INCREMENT
    lookup fallback (variant_lookup_insert_hashes.sql:1-6,
    init/variant_lookup_create_table.sql:174-180). Numbering uses the
    range-partitioned two-pass ``sequential_ids`` (no single-partition
    global window); deterministic hash ids (xxhash64) remain the
    preferred zero-coordination form, registered via part_expr/q03."""
    p = load_table(spark, sf_dir, "part")
    existing = p.filter(F.col("p_partkey") <= 100).select(
        F.md5(F.col("p_name")).alias("part_hash"), F.col("p_partkey").alias("part_id")
    )
    unseen = p.filter(F.col("p_partkey") > 100).select(
        F.md5(F.col("p_name")).alias("part_hash")
    )
    mx = existing.agg(F.max("part_id").alias("max_id"))
    assigned = (
        sequential_ids(unseen, "part_hash", id_col="_seq")
        .crossJoin(F.broadcast(mx))
        .select(
            "part_hash", (F.col("max_id") + F.col("_seq")).alias("part_id")
        )
    )
    return existing.unionByName(assigned)


@query(
    "q21_copy_unchanged_delta",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O')
      AND l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def q21_copy_unchanged_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/ST3: the copy-unchanged projection — rows NOT in the delta and
    NOT deleted (germline_snv_occurrence_copy_partition.sql:1-3). In the
    CDC engine this survives as manifest-level partition retention; the
    row-level form is registered for parity."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    delta = o.filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    deleted = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return (
        li.join(delta, li.l_orderkey == delta.o_orderkey, "left_anti")
        .join(deleted, li.l_orderkey == deleted.o_orderkey, "left_anti")
        .select("l_orderkey", "l_linenumber")
    )


@query(
    "q22_affinity_max_part",
    oracle="""
    WITH assigned AS (
      SELECT o_custkey, o_orderkey % 16 AS part FROM orders WHERE o_orderstatus = 'F')
    SELECT d.o_custkey AS custkey, MAX(a.part) AS max_part, COUNT(*) AS n_pending
    FROM orders d LEFT JOIN assigned a ON d.o_custkey = a.o_custkey
    WHERE d.o_orderstatus = 'O'
    GROUP BY d.o_custkey
    """,
)
def q22_affinity_max_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10/A9: partition-affinity lookup — delta joined to already-
    ingested state, MAX(part) per affinity key
    (staging_sequencing_experiment_delta_create_table.sql:13-24)."""
    o = load_table(spark, sf_dir, "orders")
    assigned = o.filter(F.col("o_orderstatus") == "F").select(
        "o_custkey", (F.col("o_orderkey") % 16).alias("part")
    )
    delta = o.filter(F.col("o_orderstatus") == "O")
    return (
        delta.join(assigned, "o_custkey", "left")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.max("part").alias("max_part"), F.count(F.lit(1)).alias("n_pending"))
    )
