"""functions/text additions: X143 Unicode script profile."""


def test_script_counts_and_dominant(spark):
    """X143: explicit-range script counting + fixed-order tie-break."""
    from dbt_gdpr_anonymizer_spark.functions.text import (
        dominant_script,
        script_counts,
    )

    rows = [
        (1, "hello Привет"),     # 5 latin, 6 cyrillic -> cyrillic
        (2, "abc где"),          # 3 latin, 3 cyrillic -> tie -> latin
        (3, "你好 world"),        # cjk 2, latin 5 -> latin
        (4, "1234 !?"),          # no script chars
        (5, None),
    ]
    df = spark.createDataFrame(rows, ["i", "t"])
    counts = script_counts("t")
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            counts["latin"].alias("lat"),
            counts["cyrillic"].alias("cyr"),
            counts["cjk"].alias("cjk"),
            dominant_script("t").alias("dom"),
        ).collect()
    }
    assert (out[1]["lat"], out[1]["cyr"], out[1]["dom"]) == (5, 6, "cyrillic")
    assert out[2]["dom"] == "latin"  # strict > keeps the earlier script
    assert (out[3]["cjk"], out[3]["dom"]) == (2, "latin")
    assert out[4]["dom"] == "none"
    assert out[5]["dom"] == "none" and out[5]["lat"] == 0
