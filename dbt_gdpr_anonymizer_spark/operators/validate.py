"""Anonymization validation suite — distributed re-design of the reference's
driver-side checks.

Reference: src/dbt_gdpr_anonymizer/scripts/validate_anonymization.py and
tests/assert_no_pii_in_marts.sql. The reference samples ≤100 distinct values
per column into the driver and regex-matches in Python; here every scan is a
DataFrame filter (``rlike``), so matching runs on executors and the driver
only sees counts/samples — the design that survives a 100 TB mart.

Java regex (unlike DuckDB's RE2) supports the reference's negative
lookaheads, so the patterns are reproduced verbatim.

Scale notes:
  * ``validate()`` fuses every per-table check into one aggregation pass per
    table (mart: 1 job; enriched: quality aggregates + the k-anonymity
    shuffle) instead of re-running the full lineage per metric.
  * ``scan_for_pii`` is a single scan: each row is exploded into its
    (column × pattern) cells once, then filtered — not a union of N×P
    subplans each re-reading the table.
  * GPS precision uses a decimal round-trip, not ``x*100 == floor(x*100)``:
    the float product of a correctly-rounded double (e.g. 4.35*100 =
    434.99999999999994) fails the floor test, producing false violations.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
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


def too_precise(col: Column, precision: int = 2) -> Column:
    """True when a coordinate carries more than ``precision`` decimals.

    Decimal round-trip comparison: exact for any double that IS the rounded
    value, immune to the ``x*100 != floor(x*100)`` float fragility (the
    reference's string ``split_part`` check has the same intent).
    """
    return col != col.cast(f"decimal(18,{precision})").cast("double")


def _mart_violation_conditions(mart: DataFrame) -> dict[str, Column]:
    """The three singular-test conditions (assert_no_pii_in_marts.sql:18-58)."""
    lat, lon = F.col("latitude"), F.col("longitude")
    return {
        "email": (
            F.col("contact_email").isNotNull()
            & ~F.col("contact_email").like("%@anonymized.gouv.fr")
        ),
        "phone": (
            F.col("contact_phone").isNotNull()
            & ~F.col("contact_phone").like("%XX%")
        ),
        "gps": (
            lat.isNotNull()
            & lon.isNotNull()
            & (too_precise(lat) | too_precise(lon))
        ),
    }


def assert_no_pii_in_mart(mart: DataFrame) -> DataFrame:
    """The singular end-to-end PII test (assert_no_pii_in_marts.sql:18-70).

    Returns the violations DataFrame (empty == pass): un-anonymized emails,
    unmasked phones, and >2-decimal GPS coordinates, UNION ALL'd with the
    reference's 4-column shape.
    """
    cond = _mart_violation_conditions(mart)
    email = mart.filter(cond["email"]).select(
        F.lit("mart_services_open_data").alias("table_name"),
        F.lit("contact_email").alias("column_name"),
        F.col("contact_email").alias("value"),
        F.lit("Non-anonymized email detected").alias("issue_type"),
    )
    phone = mart.filter(cond["phone"]).select(
        F.lit("mart_services_open_data").alias("table_name"),
        F.lit("contact_phone").alias("column_name"),
        F.col("contact_phone").alias("value"),
        F.lit("Non-masked phone number detected").alias("issue_type"),
    )
    gps = mart.filter(cond["gps"]).select(
        F.lit("mart_services_open_data").alias("table_name"),
        F.lit("latitude/longitude").alias("column_name"),
        F.concat_ws(
            ", ", F.col("latitude").cast("string"), F.col("longitude").cast("string")
        ).alias("value"),
        F.lit("GPS coordinates too precise").alias("issue_type"),
    )
    return email.unionByName(phone).unionByName(gps)


def scan_for_pii(
    df: DataFrame,
    table_name: str = "table",
    patterns: dict[str, str] = PII_PATTERNS,
    sample_per_column: int = 100,
) -> DataFrame:
    """Regex PII scan over every string column — ONE scan of the table.

    Each row is exploded into its (column, value) string cells, cross-
    producted with the (issue, pattern) list via a second explode, then
    filtered with ``regexp_like(value, pattern)``. The table is read once;
    the reference reads it once per column (validate_anonymization.py:96-134)
    and the previous design here unioned N×P limited subplans.

    ``sample_per_column`` caps output rows per (column, issue) via a window
    over the (tiny) post-filter match set.
    """
    string_cols = [
        f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
    ]
    if not string_cols:
        raise ValueError("no string columns to scan")

    cells = F.array(
        *[
            F.struct(F.lit(c).alias("column_name"), F.col(c).alias("value"))
            for c in string_cols
        ]
    )
    pats = F.array(
        *[
            F.struct(F.lit(issue).alias("issue_type"), F.lit(pat).alias("pattern"))
            for issue, pat in patterns.items()
        ]
    )
    from pyspark.sql import Window as W

    matches = (
        df.select(F.explode(cells).alias("cell"))
        .filter(F.col("cell.value").isNotNull())
        .select("cell.column_name", "cell.value", F.explode(pats).alias("p"))
        .filter(F.expr("regexp_like(value, p.pattern)"))
        .select(
            F.lit(table_name).alias("table_name"),
            "column_name",
            "value",
            F.col("p.issue_type").alias("issue_type"),
        )
    )
    w = W.partitionBy("column_name", "issue_type").orderBy("value")
    return (
        matches.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= sample_per_column)
        .drop("_rn")
    )


@dataclass
class QualityMetrics:
    emails: dict
    phones: dict
    coordinates: dict


def _quality_aggs() -> list[Column]:
    """The nine conditional aggregates (validate_anonymization.py:154-211),
    computable in one pass. ``bad`` counts are derived as total - ok so the
    two can never disagree."""
    e, p = F.col("contact_email_anon"), F.col("contact_phone_anon")
    la, lo = F.col("latitude_anon"), F.col("longitude_anon")
    # F.sum over zero rows is NULL — coalesce to 0 so an empty table
    # produces 0-count metrics rather than None arithmetic.
    return [
        F.count(F.when(e.isNotNull(), 1)).alias("email_total"),
        F.coalesce(
            F.sum(F.when(e.like("%@anonymized.gouv.fr"), 1).otherwise(0)),
            F.lit(0),
        ).alias("email_ok"),
        F.count(F.when(p.isNotNull(), 1)).alias("phone_total"),
        F.coalesce(
            F.sum(F.when(p.like("%XX XX XX XX"), 1).otherwise(0)), F.lit(0)
        ).alias("phone_ok"),
        F.count(F.when(la.isNotNull() & lo.isNotNull(), 1)).alias("coord_total"),
        F.coalesce(
            F.sum(
                F.when(
                    la.isNotNull()
                    & lo.isNotNull()
                    & ~too_precise(la)
                    & ~too_precise(lo),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("coord_ok"),
    ]


def _metrics_from_row(row) -> QualityMetrics:
    def rate(ok: int, total: int) -> float:
        return (ok / total * 100) if total else 0.0

    return QualityMetrics(
        emails={
            "total": row["email_total"],
            "properly_anonymized": row["email_ok"],
            "improperly_anonymized": row["email_total"] - row["email_ok"],
            "success_rate": rate(row["email_ok"], row["email_total"]),
        },
        phones={
            "total": row["phone_total"],
            "properly_masked": row["phone_ok"],
            "improperly_masked": row["phone_total"] - row["phone_ok"],
            "success_rate": rate(row["phone_ok"], row["phone_total"]),
        },
        coordinates={
            "total": row["coord_total"],
            "properly_rounded": row["coord_ok"],
            "success_rate": rate(row["coord_ok"], row["coord_total"]),
        },
    )


def check_anonymization_quality(enriched: DataFrame) -> QualityMetrics:
    """Conditional-aggregate quality metrics in one pass (the reference runs
    three separate queries)."""
    return _metrics_from_row(enriched.agg(*_quality_aggs()).collect()[0])


def k_anonymity_violations(
    df: DataFrame, quasi_identifiers: Sequence[str], k: int = 5
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
    quasi_identifiers: Sequence[str] = ("organization_category",),
    k: int = 5,
) -> dict:
    """Full validation run (validate_anonymization.py:311-374).

    Exactly three Spark jobs regardless of table size:
      1. one fused aggregation over ``mart`` — the three singular-test
         violation counts AND every (string column × pattern) regex-scan hit
         count in a single pass;
      2. one fused aggregation over ``enriched`` — the nine quality metrics;
      3. the k-anonymity group-by over ``enriched``.

    (The previous design ran four actions that each recomputed the full
    raw→mart lineage.) Returns a report dict; callers wanting the violating
    ROWS use ``assert_no_pii_in_mart`` / ``scan_for_pii`` directly, and
    ``run_validation_gate`` persists them + sets the exit code.
    """
    cond = _mart_violation_conditions(mart)
    string_cols = [
        f.name for f in mart.schema.fields if f.dataType.simpleString() == "string"
    ]
    # F.sum over ZERO rows is NULL, not 0 — coalesce so an empty mart
    # yields clean zero counts instead of None arithmetic errors.
    aggs = [
        F.coalesce(F.sum(F.when(c, 1).otherwise(0)), F.lit(0)).alias(
            f"viol_{name}"
        )
        for name, c in cond.items()
    ]
    for col in string_cols:
        for issue, pat in PII_PATTERNS.items():
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col(col).isNotNull() & F.col(col).rlike(pat), 1
                        ).otherwise(0)
                    ),
                    F.lit(0),
                ).alias(f"scan__{col}__{issue}")
            )
    mrow = mart.agg(*aggs).collect()[0]
    n_pii = mrow["viol_email"] + mrow["viol_phone"] + mrow["viol_gps"]
    scan_hits = {
        k_: v for k_, v in mrow.asDict().items() if k_.startswith("scan__") and v
    }
    n_scan = sum(scan_hits.values())

    metrics = check_anonymization_quality(enriched)
    n_kviol = k_anonymity_violations(enriched, list(quasi_identifiers), k).count()
    return {
        "pii_violations": int(n_pii),
        "pii_scan_hits": int(n_scan),
        "pii_scan_detail": {k_: int(v) for k_, v in scan_hits.items()},
        "quality": {
            "emails": metrics.emails,
            "phones": metrics.phones,
            "coordinates": metrics.coordinates,
        },
        "k_anonymity_ok": n_kviol == 0,
        "k_anonymity_violating_groups": n_kviol,
        "passed": n_pii == 0 and n_scan == 0 and n_kviol == 0,
    }


def run_validation_gate(
    enriched: DataFrame,
    mart: DataFrame,
    quasi_identifiers: Sequence[str] = ("organization_category",),
    k: int = 5,
    failures_root: str | None = None,
) -> int:
    """CLI-style validation gate (D5): persist failing rows, return exit code.

    Reference: ``+store_failures: true`` routes failing test rows to the
    ``test_results`` schema (dbt_project.yml:144-154) and
    validate_anonymization.py:353-374 exits 1 on any violation. With
    ``failures_root`` set, violating rows (singular-test + k-anonymity
    groups) are written as parquet under ``{failures_root}/<check>``; rows
    are only computed when the fused ``validate()`` counts say they exist,
    so the green path stays at three jobs.
    """
    report = validate(enriched, mart, quasi_identifiers, k)
    if failures_root:
        if report["pii_violations"] or report["pii_scan_hits"]:
            assert_no_pii_in_mart(mart).write.mode("overwrite").parquet(
                f"{failures_root}/assert_no_pii_in_mart"
            )
            scan_for_pii(mart, "mart_services_open_data").write.mode(
                "overwrite"
            ).parquet(f"{failures_root}/pii_scan")
        if report["k_anonymity_violating_groups"]:
            k_anonymity_violations(
                enriched, list(quasi_identifiers), k
            ).write.mode("overwrite").parquet(f"{failures_root}/k_anonymity")
    return 0 if report["passed"] else 1


@dataclass(frozen=True)
class ColumnTest:
    """One declarative schema test, the dbt generic-test vocabulary
    (models/staging/schema.yml): ``unique`` / ``not_null`` /
    ``accepted_values`` / ``accepted_range`` / ``relationships``.
    ``where`` optionally scopes any test to a row predicate (the
    reference's conditional ``not_null … where: "has_email = 1"``,
    schema.yml:67-68)."""

    column: str
    test: str
    values: tuple | None = None          # accepted_values
    lo: float | None = None              # accepted_range
    hi: float | None = None
    to_table: str | None = None          # relationships
    to_field: str | None = None
    where: str | None = None


def generic_schema_tests(
    tables: dict[str, DataFrame],
    tests: dict[str, Sequence[ColumnTest]],
) -> DataFrame:
    """Declarative schema-test runner — the ``dbt test`` counterpart for
    the generic tests the reference declares per column
    (schema.yml:36-195). Returns one row per test:
    ``(table_name, column_name, test_name, n_violations)``; the gate is
    "every n_violations == 0", and failing-row persistence composes via
    :func:`run_validation_gate`'s store_failures pattern.

    Scale shape — tests are FUSED, not run one-by-one:

    * all row-local tests on a table (not_null / accepted_values /
      accepted_range, with optional ``where`` scopes) collapse into ONE
      conditional-count aggregate pass — a table with 12 declared tests
      still scans once;
    * each ``unique`` test is one groupBy on its key counting duplicated
      values (map-side partial; dbt semantics: the violation count is
      the number of DISTINCT duplicated values);
    * each ``relationships`` test is a left-anti join against the parent
      key set — parent keys are distinct-reduced first and Spark/AQE
      broadcasts a dimension-sized parent automatically.

    The per-test outputs are 1-row aggregates unioned driver-side —
    bounded by test count, never by data volume.
    """
    results: list[DataFrame] = []
    for tname, tlist in tests.items():
        if tname not in tables:
            raise ValueError(
                f"generic_schema_tests: tests reference unknown table "
                f"{tname!r}; known tables: {sorted(tables)}"
            )
        df = tables[tname]
        rowlocal = [t for t in tlist if t.test in (
            "not_null", "accepted_values", "accepted_range")]
        if rowlocal:
            aggs = []
            for i, t in enumerate(rowlocal):
                c = F.col(t.column)
                if t.test == "not_null":
                    bad = c.isNull()
                elif t.test == "accepted_values":
                    # dbt semantics: NULL is not a violation here (that's
                    # not_null's job) — SQL NOT IN returns NULL for NULL
                    bad = c.isNotNull() & ~c.isin(list(t.values))
                else:
                    bad = (c < t.lo) | (c > t.hi)
                if t.where:
                    bad = bad & F.expr(t.where)
                aggs.append(
                    F.sum(F.when(bad, 1).otherwise(0)).cast("long")
                    .alias(f"_t{i}")
                )
            row = df.agg(*aggs)
            longs = [
                F.struct(
                    F.lit(tname).alias("table_name"),
                    F.lit(t.column).alias("column_name"),
                    F.lit(t.test).alias("test_name"),
                    F.col(f"_t{i}").alias("n_violations"),
                )
                for i, t in enumerate(rowlocal)
            ]
            results.append(
                row.select(F.explode(F.array(*longs)).alias("r")).select("r.*")
            )
        for t in tlist:
            if t.test == "unique":
                dup = (
                    df.filter(F.col(t.column).isNotNull())
                    .groupBy(t.column)
                    .agg(F.count(F.lit(1)).alias("_n"))
                    .filter(F.col("_n") > 1)
                    .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
                )
                results.append(
                    dup.select(
                        F.lit(tname).alias("table_name"),
                        F.lit(t.column).alias("column_name"),
                        F.lit("unique").alias("test_name"),
                        "n_violations",
                    )
                )
            elif t.test == "relationships":
                if t.to_table not in tables:
                    raise ValueError(
                        f"generic_schema_tests: relationships test on "
                        f"{tname}.{t.column} references unknown parent "
                        f"table {t.to_table!r}; known tables: "
                        f"{sorted(tables)}"
                    )
                parent = (
                    tables[t.to_table]
                    .select(F.col(t.to_field).alias("_pk"))
                    .distinct()
                )
                orphan = (
                    df.filter(F.col(t.column).isNotNull())
                    .join(
                        parent,
                        F.col(t.column) == F.col("_pk"),
                        "left_anti",
                    )
                    .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
                )
                results.append(
                    orphan.select(
                        F.lit(tname).alias("table_name"),
                        F.lit(t.column).alias("column_name"),
                        F.lit("relationships").alias("test_name"),
                        "n_violations",
                    )
                )
    if not results:
        # Empty spec (or only unrecognized test names): return an EMPTY
        # report with the contract schema rather than IndexError — callers
        # treat "no tests declared" as vacuously passing.
        if not tables:
            raise ValueError(
                "generic_schema_tests: no tables provided and no tests "
                "produced a result"
            )
        spark = next(iter(tables.values())).sparkSession
        return spark.createDataFrame(
            [],
            "table_name string, column_name string, "
            "test_name string, n_violations long",
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.orderBy("table_name", "column_name", "test_name")


def canary_leak_audit(
    raw: DataFrame,
    anonymized: DataFrame,
    canaries: Sequence[str],
    *,
    text_col: str = "text",
) -> DataFrame:
    """X126 plant-and-verify CANARY audit — the "secret sharer"
    extraction check (Carlini et al. 2019) applied at the
    corpus-anonymization gate: count the documents containing each
    planted canary BEFORE and AFTER the anonymization pass. A scrub/
    erasure/masking pipeline is only trusted when every canary's
    post-pass count is zero; a nonzero ``leaked`` row is the audit
    evidence that a redaction regex or term list has a hole.

    The canary list is bounded audit state (tens of literals), so each
    table is scanned ONCE with one sum-of-contains aggregate per canary
    (codegen conditions, no join, no shuffle beyond the 1-row partial
    agg); only the 2·m counts cross the driver. Returns
    ``(canary, n_raw, n_anonymized, leaked)``.
    """
    spark = raw.sparkSession
    canaries = list(canaries)
    if not canaries:  # nothing planted -> empty audit, not an agg error
        return spark.createDataFrame(
            [],
            "canary string, n_raw bigint, n_anonymized bigint, "
            "leaked boolean",
        )

    def counts(df: DataFrame) -> list[int]:
        row = df.agg(
            *[
                F.sum(
                    F.col(text_col).contains(F.lit(c)).cast("long")
                ).alias(f"_c{i}")
                for i, c in enumerate(canaries)
            ]
        ).collect()[0]
        return [int(row[f"_c{i}"] or 0) for i in range(len(canaries))]

    n_raw = counts(raw)
    n_anon = counts(anonymized)
    return spark.createDataFrame(
        [
            (c, r, a, a > 0)
            for c, r, a in zip(canaries, n_raw, n_anon)
        ],
        "canary string, n_raw bigint, n_anonymized bigint, leaked boolean",
    )


def fd_conformance(
    df: DataFrame,
    lhs_cols: list[str],
    rhs_col: str,
) -> DataFrame:
    """Functional-dependency conformance report: does ``lhs_cols →
    rhs_col`` hold, and how badly not — the schema-level data-quality
    check (Codd FDs; the profiling primitive behind tools like
    Deequ's uniqueness/consistency constraints) a pipeline runs before
    trusting a column as a join key or a generalization target.

    A left-hand-side group VIOLATES the FD when it maps to more than
    one distinct non-NULL ``rhs_col`` value (NULL rhs values are
    ignored — SQL distinct-aggregate convention, documented). Released
    as ONE summary row, all exact integers:
    ``(n_groups, n_violating, n_rows_violating, conformance_ppm)``
    with ``conformance_ppm = 1e6·(n_groups − n_violating) div
    n_groups`` (NULL when the frame is empty).

    Scale shape: one distinct-aggregate groupBy over the lhs key
    (map-side partial on (lhs, rhs) distinct), one 1-row rollup — no
    window, no join, no second corpus pass.
    """
    g = df.groupBy(*[F.col(c) for c in lhs_cols]).agg(
        F.countDistinct(F.col(rhs_col)).alias("_nd"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    viol = F.when(F.col("_nd") > 1, 1).otherwise(0)
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(viol).cast("long").alias("n_violating"),
        F.sum(F.when(F.col("_nd") > 1, F.col("_n")).otherwise(0))
        .cast("long")
        .alias("n_rows_violating"),
    ).select(
        "n_groups",
        "n_violating",
        "n_rows_violating",
        F.when(
            F.col("n_groups") > 0,
            F.expr(
                "(n_groups - n_violating) * 1000000 div n_groups"
            ),
        )
        .cast("long")
        .alias("conformance_ppm"),
    )
