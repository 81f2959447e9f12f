"""Plan-level proof of the bucketed co-located join contract: same key +
same bucket count → sort-merge join with NO Exchange and NO Sort in the
physical plan. This is the 100 TB fact-fact join strategy — the shuffle
is paid once at write time and never again."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)


@pytest.fixture()
def clean_tables(spark):
    """Drop test tables AND their warehouse dirs: a killed earlier run can
    leave the location on disk without the catalog entry, which fails the
    next managed-table create with LOCATION_ALREADY_EXISTS."""
    import shutil

    names = ["bt_customer", "bt_orders", "bt_mismatch_a", "bt_mismatch_b"]
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
        shutil.rmtree(f"{warehouse}/{n}", ignore_errors=True)
    yield
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
        shutil.rmtree(f"{warehouse}/{n}", ignore_errors=True)


@pytest.fixture()
def no_broadcast(spark):
    """Force the sort-merge path so the plan assertion tests bucketing,
    not the broadcast threshold."""
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


def test_cobucketed_join_has_no_exchange_or_sort(spark, no_broadcast, clean_tables):
    cust = spark.range(0, 500).select(
        F.col("id").alias("custkey"),
        (F.col("id") % 7).alias("segment"),
    )
    orders = spark.range(0, 2000).select(
        F.col("id").alias("orderkey"),
        (F.col("id") % 500).alias("custkey"),
        (F.col("id") * 3).alias("total"),
    )
    t1 = write_bucketed(cust, "bt_customer", ["custkey"], 4)
    t2 = write_bucketed(orders, "bt_orders", ["custkey"], 4)
    joined = bucketed_join(spark, t1, t2, ["custkey"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join re-shuffled a side"
    assert "Bucketed: true" in plan
    # Spark >=3.0 re-sorts bucket files by default (it no longer trusts
    # per-bucket order); with write_bucketed's one-file-per-bucket layout
    # the legacy sorted-scan contract is safe and drops the Sort too.
    prior = spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering"
    )
    try:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        sorted_plan = (
            bucketed_join(spark, t1, t2, ["custkey"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", prior
        )
    assert "Sort [" not in sorted_plan, (
        "single-file bucket-sorted scan should stream without re-sorting"
    )
    assert "Exchange" not in sorted_plan
    # and the result is the plain join's result
    assert joined.count() == 2000


def test_mismatched_bucket_counts_fall_back_to_exchange(spark, no_broadcast, clean_tables):
    """Divergent layouts (4 vs 8 buckets) can't co-locate: Spark must
    re-shuffle at least one side — the regression signature bucketed_join
    exists to surface."""
    a = spark.range(0, 100).select(F.col("id").alias("k"))
    b = spark.range(0, 100).select(F.col("id").alias("k"))
    t1 = write_bucketed(a, "bt_mismatch_a", ["k"], 4)
    t2 = write_bucketed(b, "bt_mismatch_b", ["k"], 8)
    plan = (
        bucketed_join(spark, t1, t2, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" in plan
