"""Last-writer-wins dedup.

Reference pattern: ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY rank
DESC) = 1`` (radiant/dags/sql/radiant/exomiser_insert_partition_delta.sql:9,
SURVEY.md §2.5 W1). The engine's default implementation is NOT the
window, though: a hash aggregation of ``max(struct(order_cols...,
payload))`` per key. Struct comparison is lexicographic over the leading
order columns, and the aggregate gets a map-side partial combine —
so a hot key (one conversation receiving a large share of events) is
reduced inside each input partition before the shuffle. That is the
skew story for dedup: no manual salting needed, the partial aggregate
IS the salt (each of the N input partitions contributes at most one
pre-reduced row per key). The window variant is kept for parity tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_dedup(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    use_window: bool = False,
) -> DataFrame:
    """Keep, per key, the single row with the greatest ``order_cols``
    tuple (descending lexicographic). ``order_cols`` must make the
    winner unique (e.g. a unique ``lsn``) for deterministic replay.
    Output column order matches the input."""
    keys = list(keys)
    order_cols = list(order_cols)
    if use_window:
        w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    payload = [c for c in df.columns if c not in keys]
    winner = F.max(
        F.struct(*[F.col(c) for c in order_cols], F.struct(*payload).alias("_row"))
    ).alias("_w")
    out = df.groupBy(*keys).agg(winner)
    return out.select(*keys, *[F.col(f"_w._row.{c}").alias(c) for c in payload]).select(
        *df.columns
    )
