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


def test_compact_files_reduces_file_count_and_preserves_rows(spark, tmp_path):
    from dbt_gdpr_anonymizer_spark.sources.partitioned import compact_files
    from pyspark.sql import functions as F

    src = str(tmp_path / "small")
    # 40 tiny files
    spark.range(0, 4000).withColumn("v", F.col("id") * 2).repartition(
        40
    ).write.parquet(src)
    out = str(tmp_path / "compact")
    n = compact_files(spark, src, out, target_file_bytes=10**9)
    assert n == 1  # everything fits one target-size file
    back = spark.read.parquet(out)
    assert back.count() == 4000
    assert back.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(4000))


def test_compact_files_range_clusters_for_pruning(spark, tmp_path):
    from dbt_gdpr_anonymizer_spark.sources.partitioned import compact_files

    src = str(tmp_path / "small2")
    spark.range(0, 10000).repartition(17).write.parquet(src)
    out = str(tmp_path / "compact2")
    # force multiple output files, clustered by id
    n = compact_files(
        spark, src, out, target_file_bytes=8 * 1024, order_cols=["id"]
    )
    assert n > 1
    # range clustering => per-file id ranges are (near-)disjoint: a point
    # filter must hit at most a couple of files' min/max ranges
    import pyarrow.parquet as pq
    import glob

    ranges = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = min(
            md.row_group(i).column(0).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(0).statistics.max
            for i in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    ranges.sort()
    overlaps = sum(
        1
        for (l1, h1), (l2, h2) in zip(ranges, ranges[1:])
        if l2 <= h1
    )
    assert overlaps == 0  # consecutive file ranges disjoint


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    from dbt_gdpr_anonymizer_spark.sources.partitioned import write_zordered
    from pyspark.sql import functions as F
    import glob
    import pyarrow.parquet as pq

    # 64x64 grid — every (x, y) combination once
    df = (
        spark.range(0, 64 * 64)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
    )
    out = str(tmp_path / "zorder")
    write_zordered(df, out, ["x", "y"], n_files=16, bits=6)

    # per-file bounding boxes: z-clustering must bound BOTH dims, so a
    # point probe (x=7,y=9) lands in very few files' boxes — with a
    # single-column sort, every file would span the full y range
    hits_both = 0
    y_full = 0
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        def rng(colname):
            i = names[colname]
            st = [md.row_group(g).column(i).statistics for g in range(md.num_row_groups)]
            return min(s.min for s in st), max(s.max for s in st)
        x_lo, x_hi = rng("x")
        y_lo, y_hi = rng("y")
        if x_lo <= 7 <= x_hi and y_lo <= 9 <= y_hi:
            hits_both += 1
        if y_lo == 0 and y_hi == 63:
            y_full += 1
    assert hits_both <= 4          # point probe prunes >= 12/16 files
    assert y_full <= 2             # files do NOT all span the full y range


def test_footer_stats_pushdown_metadata_only(spark, tmp_path):
    from dbt_gdpr_anonymizer_spark.sources.partitioned import footer_stats
    from pyspark.sql import functions as F

    path = str(tmp_path / "stats")
    spark.range(100, 1100).withColumn(
        "v", (F.col("id") * 3).cast("long")
    ).write.parquet(path)
    stats = footer_stats(spark, path, ["id", "v"])
    assert stats == {
        "n_rows": 1000,
        "min_id": 100, "max_id": 1099,
        "min_v": 300, "max_v": 3297,
    }
    # the session's default source path is untouched afterwards
    assert spark.conf.get("spark.sql.parquet.aggregatePushDown", "false") != "true"


def test_schema_evolution_merge_on_read(spark, tmp_path):
    # an evolved producer adds a column mid-stream: old files lack it, new
    # files carry it — mergeSchema reconciles at read with nulls for the
    # pre-evolution files (the append-only ingest upgrade path; full
    # rewrites are a 100 TB anti-pattern)
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolving")
    spark.range(0, 10).select(F.col("id")).write.parquet(path + "/batch=1")
    spark.range(10, 20).select(
        F.col("id"), F.lit("fr").alias("lang")
    ).write.parquet(path + "/batch=2")
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "lang", "batch"}
    got = {(r.id, r.lang) for r in df.collect()}
    assert {(i, None) for i in range(10)} <= got
    assert {(i, "fr") for i in range(10, 20)} <= got
