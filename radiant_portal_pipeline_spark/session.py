"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]``; on a real
cluster the same builder is used minus the master override (spark-submit
provides it). Shuffle partitions default to the local core count — at
100 TB scale the deployment sets ``spark.sql.shuffle.partitions`` to
~2-3x total cores and relies on AQE coalescing, configured here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "radiant_portal_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Kryo for broadcast/closure serialization (SQL shuffles stay
        # UnsafeRow either way): measured ~3% on the merge apply via
        # the winners-relation broadcast (round-6 interleaved A/B:
        # 9.91->9.66, 9.03->8.74 s at 8 cores); standard at any scale
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    # deployment/config escape hatch: ";"-separated key=value pairs,
    # applied before the caller's extra_conf (so code-level settings
    # win). Keeps scale-dependent tuning parameterised per the
    # deployment instead of hard-coded (e.g.
    # SPARK_GRAFT_EXTRA_CONF="spark.sql.files.maxPartitionBytes=1g").
    for pair in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in pair:
            k, _, v = pair.partition("=")
            builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
