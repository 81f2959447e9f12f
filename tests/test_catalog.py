"""Catalog introspection (S7): table discovery, string-column enumeration,
catalog-driven PII scan."""

from __future__ import annotations

import pytest

from dbt_gdpr_anonymizer_spark.operators.catalog import (
    find_table,
    scan_catalog_table,
    string_columns,
)


@pytest.fixture()
def cataloged(spark):
    df = spark.createDataFrame(
        [
            (1, "alice@example.com", "01 23 45 67 89", 4.5),
            (2, "user_abcdef1234567890@anonymized.gouv.fr", "01 XX XX XX XX", 2.0),
        ],
        "id long, contact string, phone string, score double",
    )
    df.createOrReplaceTempView("cat_scan_target")
    yield "cat_scan_target"
    spark.catalog.dropTempView("cat_scan_target")


def test_find_table(spark, cataloged):
    assert find_table(spark, cataloged) == cataloged
    assert find_table(spark, "no_such_table_anywhere") is None


def test_string_columns_only(spark, cataloged):
    assert string_columns(spark, cataloged) == ["contact", "phone"]


def test_scan_catalog_table_finds_pii(spark, cataloged):
    hits = scan_catalog_table(spark, cataloged).collect()
    found = {(r["column_name"], r["issue_type"]) for r in hits}
    # raw email + raw phone from row 1 flagged; anonymized row 2 is clean
    assert any(c == "contact" for c, _ in found)
    assert all(r["table_name"] == cataloged for r in hits)
    values = {r["value"] for r in hits}
    assert "alice@example.com" in values
    assert "user_abcdef1234567890@anonymized.gouv.fr" not in values


def test_scan_catalog_table_missing_raises(spark):
    with pytest.raises(ValueError, match="not found"):
        scan_catalog_table(spark, "ghost_table")
