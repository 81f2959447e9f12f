"""SparkSession factory.

Local mode is a single JVM; on a real cluster the same settings apply per
executor. AQE is on so shuffle partition counts, skew joins, and broadcast
decisions re-plan at runtime from observed sizes — the main lever that lets
one logical plan serve both the sf0.01 test scale and a 100 TB deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gdpr-anonymizer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    ``master``/``shuffle_partitions`` default from ``SPARK_GRAFT_CPUS`` so the
    bench harness and tests share one code path; on a cluster pass
    ``master=None`` with a pre-configured environment and these fall away.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4)))
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
        # Parallelism floor for file scans: without it a table smaller than
        # maxPartitionBytes (128 MB) reads as ONE split and the scan + partial
        # aggregation run on a single core regardless of cluster size. At
        # 100 TB every table exceeds the split size and the floor is inert.
        # cores/2 beats cores at bench scale (q1 median 0.50s vs 0.69s,
        # join_revenue 0.85s vs 0.95s at sf0.1/32 cores): a ~340 KB-per-task
        # split spends more on scheduling than it recovers, while cores/2
        # still keeps every core busy through the partial-agg stage (2
        # waves). Don't lower openCostInBytes alongside it — more sub-4MB
        # tasks cost more in scheduling than they recover.
        .config("spark.sql.files.minPartitionNum", str(max(2, cpus // 2)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
