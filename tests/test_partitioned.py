"""Partition-pruning layout contract (sources/partitioned.py): filters on
the partition column must prune at PLAN time (PartitionFilters in the
scan), and the pruned read must see only the matching directories."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.sources.partitioned import (
    read_partitioned,
    write_partitioned,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_filter_prunes_at_plan_time(spark):
    tmp = tempfile.mkdtemp(prefix="part_layout_")
    path = os.path.join(tmp, "events")
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 10).cast("string").alias("day"),
        (F.col("id") * 7).alias("v"),
    )
    write_partitioned(df, path, ["day"])
    # ten partition directories exist
    dirs = sorted(d for d in os.listdir(path) if d.startswith("day="))
    assert len(dirs) == 10

    back = read_partitioned(spark, path)
    pruned = back.filter(F.col("day") == "3")
    plan = _plan(pruned)
    # the day filter is a PartitionFilter (plan-time pruning), NOT a data
    # filter evaluated per row after reading every directory
    def partition_filters(p: str) -> str:
        # the bracketed list right after "PartitionFilters: "
        tail = p.split("PartitionFilters: [", 1)[1]
        return tail.split("]", 1)[0]

    assert "PartitionFilters" in plan
    assert "day" in partition_filters(plan)
    assert pruned.count() == 100
    # a data-column filter goes to PushedFilters, NOT PartitionFilters
    data_filtered = back.filter(F.col("v") > 100)
    assert partition_filters(_plan(data_filtered)) == ""


def test_one_file_per_partition(spark):
    tmp = tempfile.mkdtemp(prefix="part_files_")
    path = os.path.join(tmp, "t")
    df = spark.range(0, 400).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("p")
    )
    write_partitioned(df, path, ["p"])
    for d in os.listdir(path):
        if not d.startswith("p="):
            continue
        files = [
            f
            for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet")
        ]
        # the pre-write repartition keys each partition to one task ->
        # one file per directory, not one per (task, partition) pair
        assert len(files) == 1, (d, files)


def test_partitioned_roundtrip_values(spark):
    tmp = tempfile.mkdtemp(prefix="part_rt_")
    path = os.path.join(tmp, "t")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)], "id long, p string, v long"
    )
    write_partitioned(df, path, ["p"])
    back = read_partitioned(spark, path).select("id", "p", "v")
    got = {(r.id, r.p, r.v) for r in back.collect()}
    assert got == {(1, "a", 10), (2, "b", 20), (3, "a", 30)}
