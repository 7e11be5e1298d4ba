"""Bulk TSV/CSV ingest — the reference's StarRocks broker load
(staging_exomiser_load.sql:1-46: ``LOAD LABEL ... COLUMNS TERMINATED BY
'\\t' ... SET (col=expr) WHERE ...``) as a Spark source: schema-explicit
delimited read, SET-style derived columns, WHERE-style load filter, and
an idempotent label guard (a load label applied twice is a no-op —
the reference polls labels for exactly that, operator.py:488-534).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from radiant_portal_pipeline_spark.lake import LakeTable


def read_delimited(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = "\t",
    header: bool = False,
) -> DataFrame:
    """Explicit-schema delimited scan (never inferSchema in prod —
    one extra full pass and nondeterministic types)."""
    return (
        spark.read.option("sep", sep)
        .option("header", str(header).lower())
        .schema(schema)
        .csv(path)
    )


def broker_load(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    table: LakeTable,
    label: str,
    set_exprs: dict[str, str] | None = None,
    where: str | None = None,
    sep: str = "\t",
    header: bool = False,
) -> bool:
    """LOAD LABEL analog: read -> SET columns -> WHERE filter -> append,
    guarded by the label (epoch guard reuse; returns False if the label
    was already applied)."""
    from pyspark.sql import functions as F

    df = read_delimited(spark, path, schema, sep=sep, header=header)
    for col, expr in (set_exprs or {}).items():
        df = df.withColumn(col, F.expr(expr))
    if where:
        df = df.filter(where)
    snap = table.append(df, source_id=f"broker:{label}", epoch=0)
    return snap is not None
