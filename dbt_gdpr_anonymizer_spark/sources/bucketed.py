"""Bucketed-table materialization: the shuffle-free co-located join path.

At cluster scale the dominant cost of a fact-fact join (orders ⋈ lineitem,
customer ⋈ orders) is the exchange of BOTH sides on the join key — every
query, every day, forever. Bucketing amortizes that: write each table
hash-partitioned into a fixed number of buckets on the join key (one
shuffle, at write time), and every subsequent equi-join on that key reads
bucket i against bucket i directly — the physical plan contains NO
Exchange on either side (and with ``sortBy`` on the same key, no Sort
either: the sort-merge join streams the pre-sorted buckets).

The reference has no storage-layout surface (DuckDB single file); this is
the Spark-native answer to its "models materialize as tables" layer for
tables that are *joined* more often than scanned. Bucketed tables must go
through the session catalog (``saveAsTable``) — plain ``.parquet(path)``
writes drop bucket metadata.

Rules the helpers enforce/encode:
* both sides of a co-located join need the SAME bucket count and key;
* bucket count is a layout constant — pick it for the LARGEST table's
  target file size (buckets ≈ table_bytes / 512 MB) and reuse it for
  every table sharing the key;
* ``spark.sql.sources.bucketing.enabled`` must stay true (default), and
  AQE leaves bucketed joins alone (nothing to coalesce — no exchange).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_bucketed", "bucketed_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    buckets: int,
    *,
    sort: bool = True,
    database: str | None = None,
) -> str:
    """Materialize ``df`` as a bucketed (and bucket-sorted) catalog table;
    returns the qualified table name.

    ``sort=True`` adds ``sortBy(keys)``: each bucket file is stored sorted
    on the join key. Spark ≥3.0 no longer *trusts* that order by default
    (multi-file buckets are only per-file sorted, so the guarantee was
    dropped wholesale) and re-sorts before a sort-merge join — no shuffle,
    but a real Sort node. Because this writer guarantees ONE file per
    bucket, the stronger contract is safe to restore with
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``, which
    drops the Sort too and makes the join a pure streaming zipper
    (verified in tests/test_bucketed.py). One shuffle happens HERE (the
    write repartitions into buckets); that is the cost being amortized
    across all future joins.
    """
    spark = df.sparkSession
    if database:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    qualified = f"{database}.{table}" if database else table
    # One task per bucket → ONE file per bucket: besides sane file sizing,
    # Spark's scan reports the per-bucket sort order (and the downstream
    # sort-merge join skips its Sort operators) ONLY when every bucket is
    # a single file — multi-file buckets are only per-file sorted.
    w = (
        df.repartition(buckets, *[F.col(k) for k in keys])
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, *keys)
    )
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(qualified)
    return qualified


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    Plain ``spark.table(a).join(spark.table(b), on)`` — the point of this
    helper is the CONTRACT, verified by ``tests/test_bucketed.py``: when
    both tables were written by :func:`write_bucketed` with the same
    ``keys``/``buckets``, the physical plan has zero Exchange operators
    (and zero Sorts when written with ``sort=True``). If the plan DOES
    show an exchange, the layouts diverged (different bucket counts, a
    non-bucketed rewrite, or bucketing disabled) — the regression this
    function exists to make visible.
    """
    return spark.table(left_table).join(
        spark.table(right_table), list(on), how
    )
