"""Data-quality checks — the engine's analog of the reference's dbt
macro suite (radiant/data_qa/macros/*.sql + tests/*.sql, SURVEY.md §5.5):
accepted-values, accepted-values-in-array, range, non-empty, not-all-null,
not-same-value, subset-of-parent.

Each check returns a DataFrame of VIOLATIONS (empty = pass) so suites
compose as unions and run as one Spark job; pytest asserts emptiness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_accepted_values(df: DataFrame, col: str, allowed: list) -> DataFrame:
    return df.filter(~F.col(col).isin(allowed) & F.col(col).isNotNull()).select(
        F.lit(f"accepted_values:{col}").alias("check"), F.col(col).cast("string").alias("value")
    )


def check_accepted_values_in_array(
    df: DataFrame, col: str, allowed: list
) -> DataFrame:
    allowed_arr = F.array(*[F.lit(v) for v in allowed])
    bad = F.filter(F.col(col), lambda x: ~F.array_contains(allowed_arr, x))
    return (
        df.select(F.explode(bad).alias("value"))
        .select(F.lit(f"accepted_values_in_array:{col}").alias("check"),
                F.col("value").cast("string"))
    )


def check_range(
    df: DataFrame, col: str, lo=None, hi=None
) -> DataFrame:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return df.filter(cond).select(
        F.lit(f"range:{col}").alias("check"), F.col(col).cast("string").alias("value")
    )


def check_non_empty(df: DataFrame, name: str) -> DataFrame:
    spark = df.sparkSession
    n = df.limit(1).count()
    if n > 0:
        return spark.createDataFrame([], "check string, value string")
    return spark.createDataFrame([(f"non_empty:{name}", "0 rows")],
                                 "check string, value string")


def check_not_all_null(df: DataFrame, col: str) -> DataFrame:
    spark = df.sparkSession
    n = df.filter(F.col(col).isNotNull()).limit(1).count()
    if n > 0:
        return spark.createDataFrame([], "check string, value string")
    return spark.createDataFrame([(f"not_all_null:{col}", "all null")],
                                 "check string, value string")


def check_not_same_value(df: DataFrame, col: str) -> DataFrame:
    spark = df.sparkSession
    n = df.select(col).distinct().limit(2).count()
    if n >= 2 or df.limit(1).count() == 0:
        return spark.createDataFrame([], "check string, value string")
    return spark.createDataFrame([(f"not_same_value:{col}", "constant column")],
                                 "check string, value string")


def check_subset_of_parent(
    child: DataFrame, parent: DataFrame, keys: list[str]
) -> DataFrame:
    """Child keys must exist in the parent (the reference's filter-table
    completeness/subset checks)."""
    orphans = child.select(*keys).join(parent.select(*keys), keys, "left_anti")
    return orphans.select(
        F.lit(f"subset_of_parent:{','.join(keys)}").alias("check"),
        F.concat_ws("|", *[F.col(k).cast("string") for k in keys]).alias("value"),
    )


def run_suite(checks: list[DataFrame]) -> DataFrame:
    from functools import reduce

    return reduce(DataFrame.unionByName, checks)
