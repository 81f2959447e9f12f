"""operators/unicode_norm: NFC normalization tier (X138) — UDF semantics,
single-evaluation plan shape, and cross-engine agreement with DuckDB's
utf8proc implementation."""

import duckdb


def test_unicode_profile_composes_and_fingerprints(spark):
    from dbt_gdpr_anonymizer_spark.operators.unicode_norm import (
        unicode_profile,
    )

    rows = [
        (1, "café"),   # decomposed -> composes, length shrinks
        (2, "café"),    # precomposed -> unchanged
        (3, "plain"),
        (4, None),
        (5, "ÅB"),     # ring above -> Å
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in unicode_profile(df).collect()}
    assert (got[1]["n_chars_raw"], got[1]["n_chars_nfc"]) == (5, 4)
    assert got[1]["changed"] and not got[2]["changed"]
    # decomposed and precomposed café converge on one fingerprint —
    # the property dedup needs
    assert got[1]["md5_nfc"] == got[2]["md5_nfc"]
    assert got[4]["md5_nfc"] is None and got[4]["changed"] is None
    # cross-engine: DuckDB's nfc_normalize md5 agrees byte-for-byte
    duck = duckdb.connect().execute(
        "select md5(nfc_normalize('cafe' || chr(769)))"
    ).fetchone()[0]
    assert got[1]["md5_nfc"] == duck


def test_nfc_udf_evaluated_once(spark):
    """The profile projection must contain exactly ONE ArrowEvalPython
    evaluation of the normalizer (reused thrice), not three."""
    from dbt_gdpr_anonymizer_spark.operators.unicode_norm import (
        unicode_profile,
    )

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    plan = unicode_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("_nfc_series") == 1
