"""AQE runtime-replanning certifications: the two mechanisms every scale
claim in this repo leans on — (1) a join whose small side only becomes
small after filtering is converted to a broadcast join AT RUNTIME, and
(2) a skewed shuffle join is split into subpartitions. Both are asserted
on the FINAL adaptive plan, not the initial one."""

from __future__ import annotations

from pyspark.sql import functions as F


def _final_plan(df) -> str:
    # run THE SAME QueryExecution (a noop write would create a fresh,
    # unexecuted one whose plan string still says isFinalPlan=false)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    return plan


def test_aqe_runtime_broadcast_conversion(spark):
    # planner sees no stats that make the right side small; the filter
    # leaves 10 rows, so AQE must flip sort-merge -> broadcast at runtime
    big = spark.range(0, 200_000).select(F.col("id").alias("k"))
    small = (
        spark.range(0, 200_000)
        .select(F.col("id").alias("k"), (F.col("id") % 20_000).alias("m"))
        .filter(F.col("m") == 7)   # ~10 rows survive
    )
    joined = big.join(small, "k")
    plan = _final_plan(joined)
    assert "BroadcastHashJoin" in plan, plan[:500]
    assert "SortMergeJoin" not in plan


def test_aqe_skew_join_split(spark):
    prior = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # tiny thresholds so the crafted skew triggers the splitter
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB"
        )
        # forbid broadcast so the join stays shuffle-based (skew split
        # only applies to sort-merge/shuffle-hash joins)
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # partition coalescing folds the small partitions into the hot
        # one's read and masks the skew rule at these toy sizes —
        # production sizes don't need this, the test's KBs do
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "false"
        )
        # 95% of left rows share one key -> one hot partition
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(0, 50_000).select(
            F.col("id").alias("k"), F.lit("r").alias("tag")
        )
        # NB: no aggregation downstream — OptimizeSkewedJoin bails if
        # splitting would force an extra shuffle for a later stage's
        # distribution requirement (that case needs
        # forceOptimizeSkewedJoin); the raw join output is the clean
        # certification target
        joined = left.join(right, "k").select("k", "tag")
        plan = _final_plan(joined)
        assert "skew=true" in plan and "AQEShuffleRead skewed" in plan, (
            plan[:800]
        )
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_join_pruning(spark, tmp_path):
    """X141 runtime bloom-filter join pruning (SPARK-32268) — the third
    runtime mechanism the 100 TB story leans on: a selective filter on
    the dimension side injects a bloom filter into the FACT side's scan,
    so fact rows that cannot join are dropped before the shuffle. Plan
    must show the creation-side bloom_filter_agg AND the application-side
    might_contain probe, and the result must equal the un-filtered join.
    """
    fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") % 1000).alias("p")
    ).write.mode("overwrite").parquet(fact_p)
    spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") % 5000).alias("m")
    ).write.mode("overwrite").parquet(dim_p)

    keys = (
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    prior = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set(keys[0], "true")
        spark.conf.set(keys[1], "0")  # local files are far below 10GB
        spark.conf.set(keys[2], "-1")  # keep the join a shuffle join
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).filter(F.col("m") == 7)
        joined = fact.join(dim, "k")
        n = joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:800]
        assert "might_contain" in plan, plan[:800]
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # semantics unchanged: same count without the runtime filter
    spark.conf.set(keys[0], "false")
    try:
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).filter(F.col("m") == 7)
        assert fact.join(dim, "k").count() == n == 10
    finally:
        if prior[keys[0]] is None:
            spark.conf.unset(keys[0])
        else:
            spark.conf.set(keys[0], prior[keys[0]])


def test_dynamic_partition_pruning(spark, tmp_path):
    """X150 dynamic partition pruning cert (SPARK-11150) — the runtime
    mechanism that matters MOST for a partitioned 100 TB lake: a
    selective filter on the dimension side prunes the fact side's
    PARTITION list at runtime (directory-level skipping, coarser and
    cheaper than the X141 row-level bloom probe). The executed plan must
    carry a dynamicpruning subquery in the fact scan's partition
    filters, and the result must equal the DPP-off join.
    """
    fact_p, dim_p = str(tmp_path / "factp"), str(tmp_path / "dimp")
    spark.range(0, 100_000).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("p")
    ).write.mode("overwrite").partitionBy("p").parquet(fact_p)
    spark.range(0, 50).select(
        F.col("id").alias("p"), (F.col("id") % 10).alias("m")
    ).write.mode("overwrite").parquet(dim_p)

    key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    prior = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "true")
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).filter(F.col("m") == 3)
        joined = fact.join(dim, "p")
        n = joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:1200]
        # 5 of 50 partitions survive the dim filter (m == 3), 2000
        # fact rows each
        assert n == 5 * 2000
        spark.conf.set(key, "false")
        fact2 = spark.read.parquet(fact_p)
        dim2 = spark.read.parquet(dim_p).filter(F.col("m") == 3)
        off = fact2.join(dim2, "p")
        assert off.count() == n
        plan_off = off._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" not in plan_off.lower()
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
