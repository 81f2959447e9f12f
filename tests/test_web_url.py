"""Cross-engine behavior pin for operators/web.url_canonicalize: the Spark
Column chain and the DuckDB SQL twin must agree byte-for-byte on every
canonicalization rule (case, default ports, fragments, tracking params,
param sort, pass-through, null/empty)."""

import duckdb
import pytest

CASES = [
    # (raw, canonical)
    (
        "https://WWW.Example.COM:443/doc/5?utm_source=feed&b=2&a=1#frag",
        "https://www.example.com/doc/5?a=1&b=2",
    ),
    ("https://www.example.com/doc/5?a=1&b=2",
     "https://www.example.com/doc/5?a=1&b=2"),
    ("HTTP://Host.ORG:8080/x", "http://host.org:8080/x"),  # non-default port
    ("http://host.org:80/", "http://host.org/"),
    ("http://host.org", "http://host.org/"),  # empty path -> /
    (
        "http://User@Host.org:80/A/B?z=9&y=8&utm_campaign=c",
        "http://user@host.org/A/B?y=8&z=9",  # params sorted, path case kept
    ),
    ("not a url", "not a url"),  # schemeless pass-through
    ("", ""),
    (None, ""),
    ("https://h/p?utm_x=1", "https://h/p"),  # query vanishes entirely
    ("ftp://Host.Com:21/file", "ftp://host.com:21/file"),  # non-http port kept
    ("https://a.b/p?x=1&x=1&ref=tw", "https://a.b/p?x=1&x=1"),  # dup params kept
]


def test_url_canonicalize_spark(spark):
    from dbt_gdpr_anonymizer_spark.operators.web import url_canonicalize

    df = spark.createDataFrame([(r,) for r, _ in CASES], ["u"])
    got = [r[0] for r in df.select(url_canonicalize("u")).collect()]
    assert got == [want for _, want in CASES]


def test_url_canonicalize_duckdb_twin():
    from dbt_gdpr_anonymizer_spark.operators.web import url_canonicalize_sql

    con = duckdb.connect()
    sql = url_canonicalize_sql("u")
    for raw, want in CASES:
        got = con.execute(
            f"select {sql} from (select ? as u)", [raw]
        ).fetchone()[0]
        assert got == want, (raw, got, want)


def test_domain_cap_hot_domain(spark):
    """domain_cap keeps exactly `cap` smallest-id docs in the hot domain,
    passes every under-cap domain row through, and reports true totals."""
    from dbt_gdpr_anonymizer_spark.operators.web import domain_cap

    rows = [(i, f"https://m{i % 2}.hot.example.org/p/{i}") for i in range(10)]
    rows += [(100 + i, f"https://a.site-{i}.example.org/x") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = {r["doc_id"]: r for r in domain_cap(df, "url", cap=4).collect()}
    assert len(out) == 13  # every input row gets a verdict
    hot = [r for r in out.values() if r["domain"] == "example.org"]
    # all 13 rows share the two-label registered domain example.org? no —
    # hot rows: m0/m1.hot.example.org -> example.org; site-i rows ->
    # example.org too (last two labels). So ALL 13 collapse to one domain.
    assert len(hot) == 13
    kept = sorted(r["doc_id"] for r in hot if r["kept"])
    assert kept == [0, 1, 2, 3]  # smallest ids win
    assert all(r["domain_total"] == 13 for r in hot)


def test_domain_cap_under_cap_passthrough_and_validation(spark):
    from dbt_gdpr_anonymizer_spark.operators.web import domain_cap

    rows = [
        (1, "https://x.alpha-one.com/a"),
        (2, "https://y.beta-two.net/b"),
        (3, "https://z.beta-two.net/c"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = domain_cap(df, "url", cap=2).collect()
    assert all(r["kept"] for r in out)
    assert {r["domain"] for r in out} == {"alpha-one.com", "beta-two.net"}
    with pytest.raises(ValueError):
        domain_cap(df, "url", cap=0)


def test_domain_cap_null_domain_rows_survive(spark):
    """r9 (the md5_bucketed_rank lesson): a NULL url yields a NULL
    registered domain — an ordinary group to groupBy and the rank window,
    so the every-input-row contract must hold for it too (the name-list
    join silently dropped those rows)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from dbt_gdpr_anonymizer_spark.operators.web import domain_cap

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("url", StringType(), True),
        ]
    )
    rows = [(i, None) for i in range(5)] + [
        (10, "https://a.alpha-one.com/a"),
    ]
    df = spark.createDataFrame(rows, schema)
    out = {r["doc_id"]: r for r in domain_cap(df, "url", cap=3).collect()}
    assert len(out) == 6  # every input row gets a verdict
    null_rows = [r for r in out.values() if r["domain"] is None]
    assert len(null_rows) == 5
    assert all(r["domain_total"] == 5 for r in null_rows)
    # the NULL-domain group is over cap: smallest 3 ids kept
    assert sorted(r["doc_id"] for r in null_rows if r["kept"]) == [0, 1, 2]
    assert out[10]["kept"] and out[10]["domain"] == "alpha-one.com"
