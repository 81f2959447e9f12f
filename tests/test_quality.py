"""operators/quality additions: X139 char-entropy gibberish gate."""


def test_char_entropy_profile(spark):
    """X139: entropy in nats (floor*1e4), integer companions, and the
    empty/NULL contract."""
    import math
    from dbt_gdpr_anonymizer_spark.operators.quality import (
        char_entropy_profile,
    )

    rows = [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, None)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: tuple(r)[1:] for r in char_entropy_profile(df).collect()}
    assert got[1] == (4, 1, 4, 16, 0)  # zero entropy, max collision
    assert got[2] == (4, 2, 2, 8, math.floor(math.log(2) * 10000))
    assert got[3] == (4, 4, 1, 4, math.floor(math.log(4) * 10000))
    assert got[4] == (0, 0, None, 0, None)
    assert got[5] == (0, 0, None, 0, None)
