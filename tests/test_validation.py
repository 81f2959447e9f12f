

def test_canary_leak_audit_catches_leaky_scrubber(spark):
    """The audit must flag a canary that survives anonymization and
    clear the ones that were removed."""
    from dbt_gdpr_anonymizer_spark.operators.validate import (
        canary_leak_audit,
    )

    raw = spark.createDataFrame(
        [
            (1, "mail CANARY-A in doc"),
            (2, "mail CANARY-B in doc"),
            (3, "clean"),
            (4, "another CANARY-A mention"),
        ],
        ["doc_id", "text"],
    )
    # a "scrubber" that only removed CANARY-B
    anonymized = spark.createDataFrame(
        [
            (1, "mail CANARY-A in doc"),
            (2, "mail [REDACTED] in doc"),
            (3, "clean"),
            (4, "another [REDACTED] mention"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["canary"]: (r["n_raw"], r["n_anonymized"], r["leaked"])
        for r in canary_leak_audit(
            raw, anonymized, ["CANARY-A", "CANARY-B"]
        ).collect()
    }
    assert out["CANARY-A"] == (2, 1, True)  # leaked: survives in doc 1
    assert out["CANARY-B"] == (1, 0, False)
