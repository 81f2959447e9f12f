"""Driver contract: wires the engine's query registry to the verify harness.

``entry(spark)`` runs the flagship policy-driven mask_model query on the
sf0.001 tables; ``queries()``/``oracle_sql()`` expose the full registry from
``dbt_gdpr_anonymizer_spark.queries`` (one entry per SURVEY.md §2 operator,
each paired with a DuckDB oracle where SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dbt_gdpr_anonymizer_spark.queries import all_queries

    return all_queries()["mask_model_customer"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dbt_gdpr_anonymizer_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    from dbt_gdpr_anonymizer_spark.queries import all_oracles

    return all_oracles()
