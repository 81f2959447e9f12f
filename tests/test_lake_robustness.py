"""X153 data-lake operational robustness certs — the failure modes a
100 TB lake hits weekly that a demo never does:

* schema evolution: batches written months apart gain/lose columns; a
  union read must reconcile (mergeSchema) with nulls for absent fields
  and no silent column drops.
* corrupt files: one bad parquet footer in a million files must not
  kill the job when the pipeline opts into ignoreCorruptFiles; with the
  option off it MUST fail loudly (silently skipping data is worse).

These are plan/behavior certifications (no result-set oracle — the
pii_inventory/runtime-cert stance).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_schema_evolution_merge(spark, tmp_path):
    """Old batch (k, v) + new batch (k, v, extra): mergeSchema read
    carries the union schema, old rows read NULL extra, and both
    generations' values survive."""
    p = str(tmp_path / "evolving")
    spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.mode("append").parquet(p)
    spark.range(10, 20).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") % 3).alias("extra"),
    ).write.mode("append").parquet(p)

    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"k", "v", "extra"}
    assert df.count() == 20
    old = df.filter(F.col("k") < 10)
    assert old.filter(F.col("extra").isNull()).count() == 10
    assert (
        df.agg(F.sum("v")).collect()[0][0]
        == sum(i * 2 for i in range(20))
    )


def test_corrupt_file_isolation(spark, tmp_path):
    """One truncated parquet among good ones: ignoreCorruptFiles=true
    reads the good rows; default (false) raises. Both behaviors are the
    contract — silent skipping must be an explicit opt-in."""
    p = tmp_path / "lake"
    p.mkdir()
    spark.range(0, 100).select(F.col("id").alias("k")).coalesce(
        1
    ).write.mode("overwrite").parquet(str(p / "good"))
    bad = p / "good" / "part-corrupt.parquet"
    bad.write_bytes(b"PAR1 this is not a real parquet footer")

    key = "spark.sql.files.ignoreCorruptFiles"
    prior = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "true")
        ok = spark.read.parquet(str(p / "good"))
        assert ok.count() == 100  # good rows survive, corrupt skipped
        spark.conf.set(key, "false")
        with pytest.raises(Exception):
            spark.read.parquet(str(p / "good")).count()
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
