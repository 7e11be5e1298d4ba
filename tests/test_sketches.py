from __future__ import annotations

from pyspark.sql import functions as F

from radiant_portal_pipeline_spark.operators.registry import REGISTRY, load_table
import radiant_portal_pipeline_spark.operators.relational3  # noqa: F401


def test_kmv_distinct_within_error_bound(spark, sf_correct):
    """The portable KMV sketch (k=128 -> ~9% relative standard error)
    must land near the exact distinct count on every group."""
    rows = REGISTRY["q35_sketch_aggregates"].fn(spark, sf_correct).collect()
    assert rows
    for r in rows:
        err = abs(r["kmv_orders"] - r["exact_orders"]) / max(r["exact_orders"], 1)
        assert err < 0.30, f"{r['l_returnflag']}: kmv err {err:.3f}"


def test_hll_distinct_within_rsd(spark, sf_correct):
    """Spark-native HLL++ stays available for production (tighter
    error than the portable KMV gate query)."""
    li = load_table(spark, sf_correct, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
        )
        .collect()
    )
    for r in rows:
        err = abs(r["approx_orders"] - r["exact_orders"]) / max(r["exact_orders"], 1)
        assert err < 0.05, f"{r['l_returnflag']}: approx err {err:.3f}"


def test_percentile_approx_brackets_exact(spark, sf_correct):
    li = load_table(spark, sf_correct, "lineitem")
    exact_p50 = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p")
    ).head()["p"]
    approx_p50 = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p")
    ).head()["p"]
    assert abs(approx_p50 - exact_p50) / exact_p50 < 0.01
