"""X173 mojibake (encoding-artifact) detector."""


def test_mojibake_counts_and_ppm(spark):
    from dbt_gdpr_anonymizer_spark.operators.unicode_norm import (
        mojibake_profile,
    )

    docs = [
        # "Café" double-encoded: é (U+00E9) -> UTF-8 C3 A9 -> Latin-1 Ã©
        (1, "CafÃ© time"),
        # cp1252 wreck of a right single quote: ’ -> E2 80 99 -> â€™
        (2, "donâ€™t stop"),
        # NBSP wreck Â + NBSP, plus a replacement char
        (3, "priceÂ 100 � end"),
        (4, "perfectly clean ascii text"),
        (5, ""),
        (6, None),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = {r.doc_id: r for r in mojibake_profile(df).collect()}

    r1 = rows[1]
    assert r1.n_utf8_latin1 == 1
    assert r1.n_smart_quote_seq == 0 and r1.n_replacement == 0
    assert r1.n_chars == len("CafÃ© time")
    assert r1.mojibake_ppm == 1_000_000 * 1 // r1.n_chars

    r2 = rows[2]
    assert r2.n_smart_quote_seq == 1
    assert r2.n_utf8_latin1 == 0

    r3 = rows[3]
    assert r3.n_nbsp_seq == 1 and r3.n_replacement == 1
    assert r3.mojibake_ppm == 1_000_000 * 2 // r3.n_chars

    assert rows[4].mojibake_ppm == 0
    assert tuple(rows[5])[1:] == (0, 0, 0, 0, 0, 0)
    assert tuple(rows[6])[1:] == (0, 0, 0, 0, 0, 0)


def test_mojibake_multiple_hits_count_separately(spark):
    from dbt_gdpr_anonymizer_spark.operators.unicode_norm import (
        mojibake_profile,
    )

    text = "Ã©Ã¼Ã±"  # é ü ñ all wrecked
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    (r,) = mojibake_profile(df).collect()
    assert r.n_utf8_latin1 == 3
    assert r.n_chars == 6
    assert r.mojibake_ppm == 1_000_000 * 3 // 6


def test_mojibake_bare_a_tilde_not_flagged(spark):
    """A bare Ã or Â with no continuation-range follower is legitimate
    text (e.g. Portuguese 'São' has Ã + 'o', outside U+0080-U+00BF) —
    must not count."""
    from dbt_gdpr_anonymizer_spark.operators.unicode_norm import (
        mojibake_profile,
    )

    df = spark.createDataFrame(
        [(1, "SÃo Paulo"), (2, "Â capital letter")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in mojibake_profile(df).collect()}
    assert rows[1].n_utf8_latin1 == 0
    assert rows[2].n_nbsp_seq == 0
    assert rows[1].mojibake_ppm == 0 and rows[2].mojibake_ppm == 0


def test_mojibake_cross_engine_positive_cases(spark):
    """The corpus data is clean, so the oracle check never exercises
    POSITIVE matches — pin the Java-dialect and RE2-dialect patterns
    against each other on actual mojibake fixtures."""
    import duckdb

    from dbt_gdpr_anonymizer_spark.operators.unicode_norm import (
        mojibake_profile,
    )

    fixtures = [
        (1, "CafÃ© time"),
        (2, "donâ€™t"),
        (3, "priceÂ\xa0x�"),
        (4, "SÃo Paulo"),
        (5, "Ã©Ã¼Ã±"),
    ]
    df = spark.createDataFrame(fixtures, ["doc_id", "text"])
    got = {
        r.doc_id: (
            r.n_utf8_latin1,
            r.n_smart_quote_seq,
            r.n_nbsp_seq,
            r.n_replacement,
        )
        for r in mojibake_profile(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "create table t as select * from (values "
        + ", ".join(f"({i}, ?)" for i, _ in fixtures)
        + ") v(doc_id, s)",
        [t for _, t in fixtures],
    )
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            r"""
            select doc_id,
              len(regexp_extract_all(s, '\x{00C3}[\x{0080}-\x{00BF}]')),
              len(regexp_extract_all(s, '\x{00E2}\x{20AC}')),
              len(regexp_extract_all(s, '\x{00C2}[\x{00A0}-\x{00BF}]')),
              len(regexp_extract_all(s, '\x{FFFD}'))
            from t
            """
        ).fetchall()
    }
    assert got == want
    assert got[1][0] == 1 and got[5][0] == 3  # positives really fire


def test_mojibake_property_vs_python_re(spark):
    """Hypothesis: arbitrary text over an alphabet that includes the
    signature characters must match a python `re` replay of the same
    classes exactly (counts and the integer ppm)."""
    import re

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from dbt_gdpr_anonymizer_spark.operators.unicode_norm import (
        mojibake_profile,
    )

    alphabet = "ab \u00c3\u00c2\u00e2\u20ac\u0080\u00a0\ufffd\u00bf\u00a9e"
    pats = [
        re.compile("\u00c3[\u0080-\u00bf]"),
        re.compile("\u00e2\u20ac"),
        re.compile("\u00c2[\u00a0-\u00bf]"),
        re.compile("\ufffd"),
    ]

    @given(
        texts=st.lists(
            st.text(alphabet=alphabet, max_size=30), min_size=1, max_size=8
        )
    )
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r.doc_id: (
                r.n_chars,
                r.n_utf8_latin1,
                r.n_smart_quote_seq,
                r.n_nbsp_seq,
                r.n_replacement,
                r.mojibake_ppm,
            )
            for r in mojibake_profile(df).collect()
        }
        want = {}
        for i, t in enumerate(texts):
            cs = [len(p.findall(t)) for p in pats]
            n = len(t)
            ppm = 1_000_000 * sum(cs) // n if n else 0
            want[i] = (n, *cs, ppm)
        assert got == want

    run()
