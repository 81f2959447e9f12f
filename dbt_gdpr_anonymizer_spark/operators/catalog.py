"""Catalog introspection (SURVEY §2.2 S7).

The reference locates its mart via ``information_schema.tables`` and
enumerates VARCHAR/TEXT columns from ``information_schema.columns`` before
PII-scanning them (reference ``scripts/validate_anonymization.py:43-57,
72-92``). Spark has no information_schema; the idiomatic equivalent is the
``spark.catalog`` API, which works identically against the in-session
catalog, a Hive metastore, or any V2 catalog plugged into the session —
introspection cost is metadata-only, independent of data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbt_gdpr_anonymizer_spark.operators.validate import PII_PATTERNS, scan_for_pii

__all__ = ["find_table", "string_columns", "scan_catalog_table"]


def find_table(spark: SparkSession, name: str) -> str | None:
    """Locate ``name`` across all catalogs' databases, returning the
    qualified ``db.name`` (current database first, mirroring the
    reference's schema-search loop). None when absent — callers decide
    whether that's an error (the reference exits 1).
    """
    if spark.catalog.tableExists(name):
        # current database / temp view — resolvable as-is
        return name
    for db in spark.catalog.listDatabases():
        qualified = f"{db.name}.{name}"
        if spark.catalog.tableExists(qualified):
            return qualified
    return None


def string_columns(spark: SparkSession, table: str) -> list[str]:
    """String-typed column names of a cataloged table/view — the scan
    target set (reference enumerates VARCHAR/TEXT the same way)."""
    return [
        c.name
        for c in spark.catalog.listColumns(table)
        if c.dataType in ("string", "varchar", "text")
    ]


def scan_catalog_table(
    spark: SparkSession,
    name: str,
    patterns: dict[str, str] = PII_PATTERNS,
    sample_per_column: int = 100,
) -> DataFrame:
    """Catalog-driven PII scan: find the table, enumerate its string
    columns, run the single-pass regex scan on exactly those columns.

    Raises ``ValueError`` when the table is not in any catalog database —
    the analogue of the reference's "table not found" exit path.
    """
    qualified = find_table(spark, name)
    if qualified is None:
        raise ValueError(f"table {name!r} not found in any catalog database")
    cols = string_columns(spark, qualified)
    if not cols:
        raise ValueError(f"table {qualified} has no string columns to scan")
    df = spark.table(qualified).select(*cols)
    return scan_for_pii(
        df, table_name=name, patterns=patterns, sample_per_column=sample_per_column
    )
