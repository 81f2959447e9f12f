"""Pipeline stage definitions (pure DataFrame -> DataFrame functions)."""

from dbt_gdpr_anonymizer_spark.plans import pipeline  # noqa: F401
