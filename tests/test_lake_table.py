from __future__ import annotations

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from radiant_portal_pipeline_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
        T.StructField("part", T.IntegerType(), False),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_create_append_read(spark, tmp_path):
    tbl = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "part")
    tbl.append(_df(spark, [("a", 1, 0), ("b", 2, 1)]))
    tbl.append(_df(spark, [("c", 3, 0)]))
    assert tbl.snapshot().version == 2
    rows = {tuple(r) for r in tbl.read().collect()}
    assert rows == {("a", 1, 0), ("b", 2, 1), ("c", 3, 0)}
    # partition-pruned read only sees bucket 0 files
    assert {r["k"] for r in tbl.read(partitions=[0]).collect()} == {"a", "c"}


def test_overwrite_partitions_is_partition_scoped(spark, tmp_path):
    tbl = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "part")
    tbl.append(_df(spark, [("a", 1, 0), ("b", 2, 1), ("c", 3, 2)]))
    tbl.overwrite_partitions(_df(spark, [("a2", 10, 0)]))
    rows = {tuple(r) for r in tbl.read().collect()}
    assert rows == {("a2", 10, 0), ("b", 2, 1), ("c", 3, 2)}
    # also_replace empties a partition with no incoming rows
    tbl.overwrite_partitions(_df(spark, [("b2", 20, 1)]), also_replace=[2])
    rows = {tuple(r) for r in tbl.read().collect()}
    assert rows == {("a2", 10, 0), ("b2", 20, 1)}


def test_time_travel_expire_vacuum(spark, tmp_path):
    tbl = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "part")
    tbl.append(_df(spark, [("a", 1, 0)]))
    tbl.overwrite_partitions(_df(spark, [("a2", 2, 0)]))
    assert [tuple(r) for r in tbl.read(version=1).collect()] == [("a", 1, 0)]
    # v1's file is still referenced by snapshot v1 -> vacuum keeps it
    assert tbl.vacuum() == 0
    assert [tuple(r) for r in tbl.read(version=1).collect()] == [("a", 1, 0)]
    # expire old snapshots, then vacuum reclaims the orphaned file
    assert tbl.expire_snapshots(keep_last=1) == 2  # v0, v1 dropped
    assert tbl.vacuum() == 1
    assert [tuple(r) for r in tbl.read().collect()] == [("a2", 2, 0)]
    with pytest.raises(FileNotFoundError):
        tbl.read(version=1).collect()


def test_epoch_guard_idempotent(spark, tmp_path):
    tbl = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "part")
    assert tbl.append(_df(spark, [("a", 1, 0)]), source_id="s", epoch=1) is not None
    # replaying the same epoch is a no-op
    assert tbl.append(_df(spark, [("a", 1, 0)]), source_id="s", epoch=1) is None
    assert tbl.read().count() == 1
    assert tbl.append(_df(spark, [("b", 2, 0)]), source_id="s", epoch=2) is not None
    assert tbl.read().count() == 2


def test_additive_schema_evolution(spark, tmp_path):
    tbl = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "part")
    tbl.append(_df(spark, [("a", 1, 0)]))
    wider = spark.createDataFrame(
        [("b", 2, 0, "meta")],
        T.StructType(SCHEMA.fields + [T.StructField("extra", T.StringType(), True)]),
    )
    tbl.append(wider)
    out = {tuple(r) for r in tbl.read().select("k", "extra").collect()}
    assert out == {("a", None), ("b", "meta")}
    # type changes are rejected
    bad = spark.createDataFrame([("c", "notlong", 0)], "k string, v string, part int")
    with pytest.raises(ValueError, match="type change"):
        tbl.append(bad)


def test_schema_passed_to_scan_prunes_columns(spark, tmp_path):
    tbl = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "part")
    tbl.append(_df(spark, [("a", 1, 0)]))
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        tbl.read().select("k").explain("formatted")
    plan = buf.getvalue()
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "k" in read_schema and "v" not in read_schema
