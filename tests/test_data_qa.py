from __future__ import annotations

from pyspark.sql import functions as F

from radiant_portal_pipeline_spark.operators import data_qa as Q
from radiant_portal_pipeline_spark.operators.registry import load_table


def test_qa_suite_passes_on_testdata(spark, sf_smoke):
    """The dbt-macro-analog checks over the driver tables (reference:
    radiant/data_qa/tests/*.sql) — all empty (pass)."""
    li = load_table(spark, sf_smoke, "lineitem")
    o = load_table(spark, sf_smoke, "orders")
    docs = load_table(spark, sf_smoke, "documents")
    suite = Q.run_suite(
        [
            Q.check_accepted_values(li, "l_returnflag", ["A", "N", "R"]),
            Q.check_range(li, "l_discount", lo=0.0, hi=0.2),
            Q.check_range(li, "l_quantity", lo=0.0),
            Q.check_non_empty(li, "lineitem"),
            Q.check_not_all_null(o, "o_orderdate"),
            Q.check_not_same_value(o, "o_orderstatus"),
            Q.check_subset_of_parent(li.select(F.col("l_orderkey")),
                                     o.select(F.col("o_orderkey").alias("l_orderkey")),
                                     ["l_orderkey"]),
            Q.check_accepted_values(docs, "lang", ["en", "fr", "es", "de", "zh"]),
        ]
    )
    violations = suite.collect()
    assert violations == [], f"unexpected QA violations: {violations[:5]}"


def test_qa_checks_catch_violations(spark):
    df = spark.createDataFrame(
        [(1, "ok", [1, 2]), (2, "bad", [3, 99])], "id long, status string, tags array<int>"
    )
    assert Q.check_accepted_values(df, "status", ["ok"]).count() == 1
    assert Q.check_accepted_values_in_array(df, "tags", [1, 2, 3]).count() == 1
    assert Q.check_range(df, "id", hi=1).count() == 1
    const = spark.createDataFrame([(1,), (1,)], "x int")
    assert Q.check_not_same_value(const, "x").count() == 1
    parent = spark.createDataFrame([(1,)], "id long")
    assert Q.check_subset_of_parent(df, parent, ["id"]).count() == 1
