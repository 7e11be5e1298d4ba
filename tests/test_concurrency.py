"""Optimistic-concurrency: racing writers must all land (the reference's
fresh-snapshot commit retry, radiant/tasks/iceberg/utils.py:61-96, and
the single-committer race it guards against,
design/SJRA-1751-snv-vcf-ingestion-fan-out.md:40-60)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pyspark.sql.types as T

from radiant_portal_pipeline_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
        T.StructField("part", T.IntegerType(), False),
    ]
)


def test_racing_appends_all_land(spark, tmp_path):
    path = str(tmp_path / "t")
    LakeTable.create(spark, path, SCHEMA, "part")
    n_writers, rows_each = 6, 5

    def writer(i: int) -> int:
        tbl = LakeTable(spark, path)  # separate handle per "writer"
        df = spark.createDataFrame(
            [(f"w{i}-{j}", i * 100 + j, i % 3) for j in range(rows_each)], SCHEMA
        )
        snap = tbl.append(df)
        return snap.version

    with ThreadPoolExecutor(max_workers=n_writers) as ex:
        versions = list(ex.map(writer, range(n_writers)))

    # every commit landed under its own version; all rows present
    assert sorted(versions) == list(range(1, n_writers + 1))
    tbl = LakeTable(spark, path)
    assert tbl.read().count() == n_writers * rows_each
    ks = {r["k"] for r in tbl.read().select("k").collect()}
    assert len(ks) == n_writers * rows_each


def test_racing_partition_overwrites_disjoint(spark, tmp_path):
    """Writers replacing DISJOINT partitions rebase cleanly — neither
    clobbers the other's partition (partition-swap isolation)."""
    path = str(tmp_path / "t")
    tbl0 = LakeTable.create(spark, path, SCHEMA, "part")
    tbl0.append(
        spark.createDataFrame([("seed0", 0, 0), ("seed1", 0, 1)], SCHEMA)
    )

    def overwrite(part: int):
        tbl = LakeTable(spark, path)
        df = spark.createDataFrame([(f"new{part}", part, part)], SCHEMA)
        return tbl.overwrite_partitions(df).version

    with ThreadPoolExecutor(max_workers=2) as ex:
        list(ex.map(overwrite, [0, 1]))

    rows = {tuple(r) for r in LakeTable(spark, path).read().collect()}
    assert rows == {("new0", 0, 0), ("new1", 1, 1)}
