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


@query(
    "q36_jdbc_federation",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_name AS region_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q36_jdbc_federation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/J12: REAL JDBC federation — nation/region are round-tripped
    through an embedded Derby database (the JDBC engine Spark ships for
    its metastore) and read back via the partitioned JDBC source, then
    joined. The oracle reads the original parquet directly, so the
    whole write→JDBC-read→join path is value-checked. At scale the
    partition_column/bounds options issue range-sliced parallel queries
    (sources/jdbc.py; reference: StarRocks external JDBC catalog,
    radiant_tables.py:145-161)."""
    import tempfile

    from radiant_portal_pipeline_spark.sources.jdbc import read_jdbc

    work = tempfile.mkdtemp(prefix="q36_")
    # Derby writes derby.log into derby.system.home (default: the
    # JVM's cwd, which a harness may keep read-only) — pin it to the
    # temp dir BEFORE the engine boots. No-op if Derby already booted.
    spark._jvm.java.lang.System.setProperty("derby.system.home", work)
    url = f"jdbc:derby:{work}/fed;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    for t in ("nation", "region"):
        (
            load_table(spark, sf_dir, t)
            .write.format("jdbc")
            .option("url", url)
            .option("dbtable", t)
            .option("driver", props["driver"])
            .mode("overwrite")
            .save()
        )
    n = read_jdbc(
        spark, url, "nation",
        partition_column="n_nationkey", num_partitions=4,
        lower_bound=0, upper_bound=25, properties=props,
    )
    r = read_jdbc(spark, url, "region", properties=props)
    return n.join(r, n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", F.col("r_name").alias("region_name")
    )


@query(
    "q37_data_qa_suite",
    oracle="""
    SELECT 'accepted_values:l_returnflag' AS check_name,
           COUNT(*) AS n_violations
    FROM lineitem
    WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A', 'N')
    UNION ALL
    SELECT 'range:l_quantity', COUNT(*) FROM lineitem WHERE l_quantity > 45
    UNION ALL
    SELECT 'subset_of_parent:l_orderkey', COUNT(*)
    FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def q37_data_qa_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: the dbt-macro data-quality suite run as ONE job with
    per-check violation counts (reference: radiant/data_qa/macros +
    the data-integrity DAG) — accepted-values, range, and
    subset-of-parent over lineitem/orders. Zero-violation checks still
    emit a 0 row, so the serving layer can distinguish 'ran clean'
    from 'did not run'."""
    from radiant_portal_pipeline_spark.operators import data_qa as Q

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def cnt(viol: DataFrame, name: str) -> DataFrame:
        return viol.agg(
            F.count(F.lit(1)).cast("long").alias("n_violations")
        ).select(F.lit(name).alias("check_name"), "n_violations")

    from functools import reduce

    return reduce(
        DataFrame.unionByName,
        [
            cnt(
                Q.check_accepted_values(li, "l_returnflag", ["A", "N"]),
                "accepted_values:l_returnflag",
            ),
            cnt(Q.check_range(li, "l_quantity", hi=45), "range:l_quantity"),
            cnt(
                Q.check_subset_of_parent(
                    li.withColumnRenamed("l_orderkey", "o_orderkey"), o, ["o_orderkey"]
                ),
                "subset_of_parent:l_orderkey",
            ),
        ],
    )


def _kmv_sql(dialect: str, k: int = 128) -> str:
    """KMV (k-minimum-values) distinct sketch rendered for 'spark' or
    'duckdb' from ONE template, so the oracle runs the IDENTICAL
    estimator: mix l_orderkey with a multiply-xor-shift hash mod
    2^31-1, keep the k smallest distinct hash values per group,
    estimate = (k-1)*M DIV h_(k) (integer division — no float rounding
    to diverge between engines). Groups with < k distinct hashes fall
    back to the exact count, per the estimator's definition."""
    m = 2_147_483_647
    if dialect == "spark":
        xor = "({a} ^ {b})".format
        div = "DIV"
    elif dialect == "duckdb":
        xor = "xor({a}, {b})".format
        div = "//"
    else:
        raise ValueError(dialect)
    h1 = f"((CAST(l_orderkey AS BIGINT) * 2654435761) % {m})"
    h2 = xor(a=h1, b=f"({h1} {div} 32768)")
    h3 = f"(({h2} * 1103515245) % {m})"
    hv = f"(({xor(a=h3, b=f'({h3} {div} 65536)')}) % {m} + 1)"
    return f"""
    WITH h AS (SELECT DISTINCT l_returnflag, {hv} AS hv FROM lineitem),
    r AS (SELECT l_returnflag, hv,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn,
                 COUNT(*) OVER (PARTITION BY l_returnflag) AS nd
          FROM h),
    kmv AS (SELECT l_returnflag,
                   CAST(CASE WHEN MAX(nd) < {k} THEN MAX(nd)
                        ELSE ({k - 1} * CAST({m} AS BIGINT))
                             {div} MIN(CASE WHEN rn = {k} THEN hv END)
                   END AS BIGINT) AS kmv_orders
            FROM r GROUP BY l_returnflag),
    ex AS (SELECT l_returnflag,
                  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders
           FROM lineitem GROUP BY l_returnflag)
    SELECT ex.l_returnflag AS l_returnflag, exact_orders, kmv_orders
    FROM ex JOIN kmv ON ex.l_returnflag = kmv.l_returnflag
    """


@query("q35_sketch_aggregates", oracle=_kmv_sql("duckdb"))
def q35_sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketches for the 100 TB path (SURVEY.md §2.4: at 10^10 rows the
    monitoring/quality layer estimates distincts instead of counting
    them). Round 2 shipped this rows-only (HLL++ differs per engine);
    now the sketch is a KMV estimator built from engine-portable
    primitives, so the DuckDB oracle runs the SAME estimator and the
    gate value-checks it — estimate AND exact side by side. Native
    HLL++/percentile_approx error bounds stay asserted in
    tests/test_sketches.py; a production deployment merges per-partition
    k-minimum sets in a UDAF, while this form keeps both engines
    bit-identical via the rank window."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_kmv_sql("spark"))


@query(
    "q38_range_bin_join",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey AS iv_id, o_orderkey % 24 AS chrom,
             (o_orderkey % 40) * 10.0 AS lo,
             (o_orderkey % 40) * 10.0 + 60.0 AS hi
      FROM orders),
    pt AS (SELECT event_id, user_id % 24 AS chrom, value AS pos FROM events)
    SELECT iv.iv_id, COUNT(*) AS n_points
    FROM pt JOIN iv ON pt.chrom = iv.chrom
                   AND pt.pos >= iv.lo AND pt.pos <= iv.hi
    GROUP BY iv.iv_id
    """,
)
def q38_range_bin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 at the reference's TRUE cardinality: the cytoband overlap
    join's equi key is the chromosome — ~24 distinct values
    (germline_cnv_occurrence_insert_partition_delta.sql:1-21) — so a
    key-carried shuffle serializes per-chromosome work. The binned
    variant shuffles on (chrom, bin); the oracle is the direct
    interval join, proving the bin decomposition is result-invisible
    (operators/range_bin.py)."""
    from radiant_portal_pipeline_spark.operators.range_bin import range_bin_join

    o = load_table(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_orderkey").alias("iv_id"),
        (F.col("o_orderkey") % 24).alias("chrom"),
        ((F.col("o_orderkey") % 40) * 10.0).alias("lo"),
        ((F.col("o_orderkey") % 40) * 10.0 + 60.0).alias("hi"),
    )
    pt = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 24).alias("chrom"),
        F.col("value").alias("pos"),
    )
    joined = range_bin_join(
        pt, iv, ["chrom"], point_col="pos", lo_col="lo", hi_col="hi", bin_width=60.0
    )
    return joined.groupBy("iv_id").agg(F.count(F.lit(1)).alias("n_points"))


@query(
    "q39_interval_overlap_bin",
    oracle="""
    WITH a AS (
      SELECT event_id, user_id % 24 AS chrom,
             value AS a_lo, value + 50.0 AS a_hi
      FROM events),
    b AS (
      SELECT o_orderkey AS iv_id, o_orderkey % 24 AS chrom,
             (o_orderkey % 40) * 10.0 AS b_lo,
             (o_orderkey % 40) * 10.0 + 80.0 AS b_hi
      FROM orders)
    SELECT b.iv_id, COUNT(*) AS n_overlaps
    FROM a JOIN b ON a.chrom = b.chrom
                 AND a.a_lo <= b.b_hi AND a.a_hi >= b.b_lo
    GROUP BY b.iv_id
    """,
)
def q39_interval_overlap_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7, the reference's EXACT cytoband predicate (interval x
    interval overlap: c.chromosome = o.chromosome AND c.start <= o.end
    AND c.end >= o.start,
    germline_cnv_occurrence_insert_partition_delta.sql:1-21) over a
    ~24-value key, shuffled on (chrom, bin). Each overlapping pair is
    emitted exactly once via the canonical-bin rule (first bin of the
    intersection) — no pair-dedup distinct. The oracle is the direct
    overlap join (operators/range_bin.py range_bin_overlap_join)."""
    from radiant_portal_pipeline_spark.operators.range_bin import (
        range_bin_overlap_join,
    )

    a = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 24).alias("chrom"),
        F.col("value").alias("a_lo"),
        (F.col("value") + 50.0).alias("a_hi"),
    )
    b = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("iv_id"),
        (F.col("o_orderkey") % 24).alias("chrom"),
        ((F.col("o_orderkey") % 40) * 10.0).alias("b_lo"),
        ((F.col("o_orderkey") % 40) * 10.0 + 80.0).alias("b_hi"),
    )
    joined = range_bin_overlap_join(
        a, b, ["chrom"], "a_lo", "a_hi", "b_lo", "b_hi", bin_width=60.0
    )
    return joined.groupBy("iv_id").agg(F.count(F.lit(1)).alias("n_overlaps"))
