"""Anonymization validation suite — distributed re-design of the reference's
driver-side checks.

Reference: src/dbt_gdpr_anonymizer/scripts/validate_anonymization.py and
tests/assert_no_pii_in_marts.sql. The reference samples ≤100 distinct values
per column into the driver and regex-matches in Python; here every scan is a
DataFrame filter (``rlike``), so matching runs on executors and the driver
only sees counts/samples — the design that survives a 100 TB mart.

Java regex (unlike DuckDB's RE2) supports the reference's negative
lookaheads, so the patterns are reproduced verbatim.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# validate_anonymization.py:23-35 — PII detection patterns (verbatim).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@(?!anonymized\.gouv\.fr)[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+33\s*[1-9]\s*\d{2}\s*\d{2}\s*\d{2}\s*\d{2}(?!\s*XX)"
ADDRESS_PATTERN = r"(?i)\d+\s+(?:rue|avenue|boulevard|place|impasse)\s+[\w\s]+"

PII_PATTERNS = {
    "non_anonymized_email": EMAIL_PATTERN,
    "unmasked_fr_phone": PHONE_PATTERN,
    "street_address": ADDRESS_PATTERN,
}


def assert_no_pii_in_mart(mart: DataFrame) -> DataFrame:
    """The singular end-to-end PII test (assert_no_pii_in_marts.sql:18-70).

    Returns the violations DataFrame (empty == pass): un-anonymized emails,
    unmasked phones, and >2-decimal GPS coordinates, UNION ALL'd with the
    reference's 4-column shape. The GPS check is numeric
    (``x*100 != floor(x*100)``) rather than string-split — same predicate,
    no double-formatting fragility.
    """
    email = (
        mart.filter(
            F.col("contact_email").isNotNull()
            & ~F.col("contact_email").like("%@anonymized.gouv.fr")
        ).select(
            F.lit("mart_services_open_data").alias("table_name"),
            F.lit("contact_email").alias("column_name"),
            F.col("contact_email").alias("value"),
            F.lit("Non-anonymized email detected").alias("issue_type"),
        )
    )
    phone = (
        mart.filter(
            F.col("contact_phone").isNotNull()
            & ~F.col("contact_phone").like("%XX%")
        ).select(
            F.lit("mart_services_open_data").alias("table_name"),
            F.lit("contact_phone").alias("column_name"),
            F.col("contact_phone").alias("value"),
            F.lit("Non-masked phone number detected").alias("issue_type"),
        )
    )
    lat, lon = F.col("latitude"), F.col("longitude")
    gps = (
        mart.filter(
            lat.isNotNull()
            & lon.isNotNull()
            & (
                (lat * 100 != F.floor(lat * 100))
                | (lon * 100 != F.floor(lon * 100))
            )
        ).select(
            F.lit("mart_services_open_data").alias("table_name"),
            F.lit("latitude/longitude").alias("column_name"),
            F.concat_ws(", ", lat.cast("string"), lon.cast("string")).alias(
                "value"
            ),
            F.lit("GPS coordinates too precise").alias("issue_type"),
        )
    )
    return email.unionByName(phone).unionByName(gps)


def scan_for_pii(
    df: DataFrame,
    table_name: str = "table",
    patterns: dict[str, str] = PII_PATTERNS,
    sample_per_column: int = 100,
) -> DataFrame:
    """Regex PII scan over every string column, fully distributed.

    For each (string column × pattern), emits up to ``sample_per_column``
    matching values. The reference pulls DISTINCT values into the driver
    first (validate_anonymization.py:96-134); this version pushes the regex
    into the scan and limits after, so it is a union of filter plans.
    """
    string_cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    pieces = []
    for col in string_cols:
        for issue, pat in patterns.items():
            pieces.append(
                df.select(F.col(col).alias("value"))
                .filter(F.col("value").isNotNull() & F.col("value").rlike(pat))
                .select(
                    F.lit(table_name).alias("table_name"),
                    F.lit(col).alias("column_name"),
                    "value",
                    F.lit(issue).alias("issue_type"),
                )
                .limit(sample_per_column)
            )
    if not pieces:
        raise ValueError("no string columns to scan")
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


@dataclass
class QualityMetrics:
    emails: dict
    phones: dict
    coordinates: dict


def check_anonymization_quality(enriched: DataFrame) -> QualityMetrics:
    """Conditional-aggregate quality metrics (validate_anonymization.py:154-211).

    One pass over the table computes all nine aggregates (the reference runs
    three separate queries).
    """
    e, p = F.col("contact_email_anon"), F.col("contact_phone_anon")
    la, lo = F.col("latitude_anon"), F.col("longitude_anon")
    row = enriched.agg(
        F.count(F.when(e.isNotNull(), 1)).alias("email_total"),
        F.sum(
            F.when(e.like("%@anonymized.gouv.fr"), 1).otherwise(0)
        ).alias("email_ok"),
        F.sum(
            F.when(~e.like("%@anonymized.gouv.fr") & e.isNotNull(), 1).otherwise(0)
        ).alias("email_bad"),
        F.count(F.when(p.isNotNull(), 1)).alias("phone_total"),
        F.sum(F.when(p.like("%XX XX XX XX"), 1).otherwise(0)).alias("phone_ok"),
        F.sum(
            F.when(~p.like("%XX XX XX XX") & p.isNotNull(), 1).otherwise(0)
        ).alias("phone_bad"),
        F.count(F.when(la.isNotNull() & lo.isNotNull(), 1)).alias("coord_total"),
        F.sum(
            F.when(
                la.isNotNull()
                & lo.isNotNull()
                & (la * 100 == F.floor(la * 100))
                & (lo * 100 == F.floor(lo * 100)),
                1,
            ).otherwise(0)
        ).alias("coord_ok"),
    ).collect()[0]

    def rate(ok: int, total: int) -> float:
        return (ok / total * 100) if total else 0.0

    return QualityMetrics(
        emails={
            "total": row["email_total"],
            "properly_anonymized": row["email_ok"],
            "improperly_anonymized": row["email_bad"],
            "success_rate": rate(row["email_ok"], row["email_total"]),
        },
        phones={
            "total": row["phone_total"],
            "properly_masked": row["phone_ok"],
            "improperly_masked": row["phone_bad"],
            "success_rate": rate(row["phone_ok"], row["phone_total"]),
        },
        coordinates={
            "total": row["coord_total"],
            "properly_rounded": row["coord_ok"],
            "success_rate": rate(row["coord_ok"], row["coord_total"]),
        },
    )


def k_anonymity_violations(
    df: DataFrame, quasi_identifiers: list[str], k: int = 5
) -> DataFrame:
    """Groups smaller than ``k`` over the quasi-identifier set
    (validate_anonymization.py:229-243). Map-side partial aggregation makes
    this a single shuffle on the QI key at any scale."""
    return (
        df.groupBy(*quasi_identifiers)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < k)
        .orderBy(F.col("group_size").asc())
    )


def validate(
    enriched: DataFrame,
    mart: DataFrame,
    quasi_identifiers: list[str] = ("organization_category",),
    k: int = 5,
) -> dict:
    """Full validation run (validate_anonymization.py:311-374): PII assert +
    scan, quality metrics, k-anonymity. Returns a report dict; caller decides
    the exit code."""
    pii_rows = assert_no_pii_in_mart(mart)
    scan_rows = scan_for_pii(mart, "mart_services_open_data")
    metrics = check_anonymization_quality(enriched)
    kviol = k_anonymity_violations(enriched, list(quasi_identifiers), k)
    n_pii = pii_rows.count()
    n_scan = scan_rows.count()
    n_kviol = kviol.count()
    return {
        "pii_violations": n_pii,
        "pii_scan_hits": n_scan,
        "quality": {
            "emails": metrics.emails,
            "phones": metrics.phones,
            "coordinates": metrics.coordinates,
        },
        "k_anonymity_ok": n_kviol == 0,
        "k_anonymity_violating_groups": n_kviol,
        "passed": n_pii == 0 and n_scan == 0 and n_kviol == 0,
    }
