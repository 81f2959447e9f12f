"""Column-expression function libraries (no Python UDFs)."""

from dbt_gdpr_anonymizer_spark.functions import masking, text  # noqa: F401
