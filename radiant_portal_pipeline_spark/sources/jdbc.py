"""JDBC federation source — the reference reads clinical data through a
StarRocks external JDBC catalog (radiant_tables.py:145-161, SURVEY.md
S10). Spark's native JDBC source replaces it; this wrapper adds the
partitioned-read options a large table needs and degrades with a clear
error in environments without a JDBC driver jar (this sandbox has none,
so the path is import-gated and exercised only for its error contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class JdbcUnavailable(RuntimeError):
    pass


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned JDBC scan: with ``partition_column`` + bounds Spark
    issues ``num_partitions`` range-sliced queries in parallel instead
    of one serial cursor — the difference between a usable and an
    unusable federation read at scale."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    try:
        return reader.load()
    except Exception as e:  # driver jar missing in this image
        raise JdbcUnavailable(
            f"JDBC read failed (driver jar on the classpath?): {e}"
        ) from e
