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


def test_char_entropy_code_points(spark):
    """The r10 contract: characters are CODE POINTS (what the DuckDB
    oracle's regexp_split_to_array produces), not UTF-16 code units —
    an astral-plane char (U+1F600) counts once, not as two surrogates."""
    import math
    from dbt_gdpr_anonymizer_spark.operators.quality import (
        char_entropy_profile,
    )

    df = spark.createDataFrame(
        [(1, "\U0001F600\U0001F600a")], ["doc_id", "text"]
    )
    (r,) = char_entropy_profile(df).collect()
    assert r.n_chars == 3
    assert r.n_distinct_chars == 2
    assert r.top_char_count == 2
    assert r.simpson_num == 5
    # entropy of {2/3, 1/3}, folded code-point ascending ('a' < emoji)
    p1, p2 = 1 / 3, 2 / 3
    want = -((p1 * math.log(p1)) + (p2 * math.log(p2)))
    assert r.entropy_e4 == math.floor(want * 10000)
