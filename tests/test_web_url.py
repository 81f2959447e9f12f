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
