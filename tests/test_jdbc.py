"""JDBC federation (SURVEY S10/J12) against a REAL in-process JDBC
engine: Spark ships Derby (for the Hive metastore), so the embedded
driver exercises the actual JDBC read path — round 1 could only test
the error contract."""

from __future__ import annotations

from radiant_portal_pipeline_spark.sources.jdbc import JdbcUnavailable, read_jdbc

DRIVER = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _write(df, url, table):
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DRIVER["driver"])
        .mode("overwrite")
        .save()
    )


def test_jdbc_roundtrip_partitioned_read_and_multijoin(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/clinical;create=true"
    tasks = spark.createDataFrame(
        [(i, f"task{i}", i % 7) for i in range(100)],
        "task_id int, name string, doc_id int",
    )
    docs = spark.createDataFrame(
        [(d, f"doc{d}") for d in range(7)], "doc_id int, title string"
    )
    _write(tasks, url, "tasks")
    _write(docs, url, "docs")

    serial = read_jdbc(spark, url, "tasks", properties=DRIVER)
    assert serial.count() == 100

    sliced = read_jdbc(
        spark, url, "tasks",
        partition_column="task_id", num_partitions=4,
        lower_bound=0, upper_bound=100, properties=DRIVER,
    )
    # range-sliced parallel read, not one serial cursor (S10 scale shape)
    assert sliced.rdd.getNumPartitions() == 4
    assert sliced.count() == 100

    # J12: multi-way join across federated tables
    j = sliced.join(read_jdbc(spark, url, "docs", properties=DRIVER), "doc_id", "left")
    assert j.filter("title IS NULL").count() == 0
    assert j.count() == 100


def test_jdbc_error_contract(spark):
    import pytest

    with pytest.raises(JdbcUnavailable, match="JDBC read failed"):
        read_jdbc(
            spark, "jdbc:nosuchdb://nowhere/x", "t",
            properties={"driver": "com.example.Missing"},
        )
