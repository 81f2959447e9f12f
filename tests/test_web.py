"""X127 web-corpus extraction: HTML -> text, link harvest, URL parts
(operators/web). Edge cases the registry query's synthetic wrapper can't
reach: script bodies containing closing tags, entity double-encoding,
tag-free text, NULL input, hosts without a dot, and the DuckDB twin
generators replaying the exact same chain."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.operators import web

CASES = [
    # (html, expected_text)
    (
        '<html><head><title>T</title><style>.x{a:b}</style></head>'
        "<body><p>hello   world</p><div>second</div></body></html>",
        "hello world\nsecond",
    ),
    # script content with a closing </p> inside a string still drops whole
    (
        '<body><SCRIPT type="x">var a = "</p>";</SCRIPT><p>kept</p></body>',
        "kept",
    ),
    # entities: &amp;lt; must decode to the LITERAL "&lt;", not "<"
    (
        "<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; &nbsp; &amp;lt; &amp; e</p>",
        'a <b> "c" \'d\' &lt; & e',
    ),
    # comments (multiline) drop; <br> becomes a newline
    ("<div>one<!-- x\ny -->two<br/>three</div>", "onetwo\nthree"),
    # no markup at all passes through with whitespace canonicalized
    ("  plain\t text  ", "plain text"),
    # head drops whole, including its title text
    ("<head><title>Meta Title</title></head><p>body</p>", "body"),
]


def test_html_to_text_cases(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], ["id", "h"]
    )
    got = {
        r.id: r.t
        for r in df.select("id", web.html_to_text("h").alias("t")).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_html_to_text_null_is_empty(spark):
    df = spark.createDataFrame([(1, None)], "id long, h string")
    assert df.select(web.html_to_text("h").alias("t")).first().t == ""


def test_duckdb_twin_matches_spark_on_all_cases(spark):
    """The generated SQL chain IS the Java chain: byte-equal output."""
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], ["id", "h"]
    )
    srows = {
        r.id: (r.t, list(r.links))
        for r in df.select(
            "id",
            web.html_to_text("h").alias("t"),
            web.extract_links("h").alias("links"),
        ).collect()
    }
    con = duckdb.connect()
    for i, (h, _) in enumerate(CASES):
        t, links = con.execute(
            f"select {web.html_to_text_sql('?')}, "
            f"{web.extract_links_sql('?')}",
            [h, h],
        ).fetchone()
        assert (t, list(links)) == srows[i], f"case {i}"


def test_extract_links_order_and_case(spark):
    html = (
        '<a href="https://a.example.com/1">x</a>'
        '<A HREF = "http://b.example.org/2?q=1">y</A>'
        "<a name=nohref>z</a>"
    )
    df = spark.createDataFrame([(1, html)], ["id", "h"])
    r = df.select(web.extract_links("h").alias("l")).first()
    assert list(r.l) == [
        "https://a.example.com/1",
        "http://b.example.org/2?q=1",
    ]


@pytest.mark.parametrize(
    "url,host,dom",
    [
        ("https://www.Example.COM/a/b?q=1#f", "www.example.com", "example.com"),
        ("HTTP://Sub.Host.ORG:8080/path", "sub.host.org", "host.org"),
        ("ftp://files.example.net", "files.example.net", "example.net"),
        ("not a url", "", ""),
        ("https://localhost/x", "localhost", ""),  # no dot: no reg. domain
    ],
)
def test_url_parts(spark, url, host, dom):
    df = spark.createDataFrame([(1, url)], ["id", "u"])
    r = df.select(
        web.url_host("u").alias("h"),
        web.url_registered_domain("u").alias("d"),
    ).first()
    assert (r.h, r.d) == (host, dom)
    got = duckdb.connect().execute(
        f"select {web.url_host_sql('?')}, "
        f"{web.url_registered_domain_sql('?')}",
        [url, url],
    ).fetchone()
    assert tuple(got) == (host, dom)


def test_html_chain_is_pure_codegen(spark):
    """No UDF, no shuffle: the extraction must stay in one codegen stage."""
    df = spark.createDataFrame([(1, "<p>x</p>")], ["id", "h"])
    plan = (
        df.select(web.html_to_text("h"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# X131 WARC ingest tier
# ---------------------------------------------------------------------------

from dbt_gdpr_anonymizer_spark.operators.web import (  # noqa: E402
    make_warc_gz,
    parse_warc_members,
    read_warc,
)


def test_warc_round_trip_multi_member():
    recs = [("http://a/1", "hello"), ("http://a/2", "wörld × ✓")]
    out = parse_warc_members(make_warc_gz(recs))
    assert [(r["uri"], r["payload"]) for r in out] == recs
    # Content-Length is BYTES, not chars
    assert out[1]["content_length"] == len("wörld × ✓".encode())


def test_warc_empty_blob_and_empty_payload():
    assert parse_warc_members(b"") == []
    out = parse_warc_members(make_warc_gz([("u", "")]))
    assert out == [{"uri": "u", "content_length": 0, "payload": ""}]


def test_warc_malformed_rejected():
    import gzip

    good = make_warc_gz([("u", "x")])
    with pytest.raises(ValueError, match="failed to decompress"):
        parse_warc_members(b"\x1f\x8b" + b"\x00" * 10)
    # record without the version line
    bad = gzip.compress(b"NOPE/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="version line"):
        parse_warc_members(bad)
    # record without Content-Length
    bad = gzip.compress(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nx\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_members(bad)
    # truncated payload block
    bad = gzip.compress(b"WARC/1.0\r\nContent-Length: 10\r\n\r\nshort\r\n\r\n")
    with pytest.raises(ValueError, match="malformed"):
        parse_warc_members(bad)
    assert len(parse_warc_members(good)) == 1  # control


def test_read_warc_stage(spark):
    blob_a = make_warc_gz([("http://a/1", "one"), ("http://a/2", "two")])
    blob_b = make_warc_gz([("http://b/9", "nine")])
    files = spark.createDataFrame(
        [("fa", bytearray(blob_a)), ("fb", bytearray(blob_b))],
        "file_id string, warc binary",
    )
    rows = sorted(
        (r.file_id, r.uri, r.content_length, r.payload)
        for r in read_warc(files).collect()
    )
    assert rows == [
        ("fa", "http://a/1", 3, "one"),
        ("fa", "http://a/2", 3, "two"),
        ("fb", "http://b/9", 4, "nine"),
    ]


class TestRobotsGate:
    def _gate(self, spark, robots_rows, url_rows):
        from dbt_gdpr_anonymizer_spark.operators.web import robots_gate

        robots = spark.createDataFrame(
            robots_rows, ["domain", "robots_txt"]
        )
        urls = spark.createDataFrame(
            url_rows, ["doc_id", "domain", "path"]
        )
        return {
            r.doc_id: (r.allowed, r.rule_len)
            for r in robots_gate(robots, urls).collect()
        }

    def test_rfc_semantics(self, spark):
        robots = [(
            "d1",
            "# comment\nUser-agent: *\nDisallow: /private*\n"
            "Allow: /private/ok\nDisallow: /tmp\n\n"
            "User-agent: evilbot\nDisallow: /",
        )]
        urls = [
            (1, "d1", "/private/x"),   # wildcard disallow
            (2, "d1", "/private/ok"),  # longer allow wins
            (3, "d1", "/tmpfile"),     # PREFIX match (RFC), not exact
            (4, "d1", "/public"),      # no rule → allowed
            (5, "d2", "/anything"),    # no robots.txt → allowed
        ]
        got = self._gate(spark, robots, urls)
        assert got[1] == (False, 9)
        assert got[2] == (True, 11)
        assert got[3] == (False, 4)
        assert got[4] == (True, 0)
        assert got[5] == (True, 0)

    def test_multi_agent_group_and_empty_disallow(self, spark):
        robots = [(
            "d1",
            "User-agent: gptbot\nUser-agent: *\nDisallow: /all/\n"
            "Allow:\n",
        )]
        got = self._gate(
            spark, robots, [(1, "d1", "/all/page"), (2, "d1", "/ok")]
        )
        assert got[1] == (False, 5)
        assert got[2] == (True, 0)

    def test_tie_goes_to_allow(self, spark):
        robots = [(
            "d1",
            "User-agent: *\nDisallow: /ab\nAllow: /ab\n",
        )]
        got = self._gate(spark, robots, [(1, "d1", "/abc")])
        assert got[1] == (True, 3)

    def test_dollar_anchor_refused(self, spark):
        import pytest

        robots = [("d1", "User-agent: *\nDisallow: /x$\n")]
        with pytest.raises(NotImplementedError):
            self._gate(spark, robots, [(1, "d1", "/x")])


class TestRobotsGateR8:
    """r8 ADVICE fixes: CRLF-terminated files and the RFC 9309 fallback
    to the '*' group for agents with no group of their own."""

    def _gate(self, spark, robots_rows, url_rows, agent="*"):
        from dbt_gdpr_anonymizer_spark.operators.web import robots_gate

        robots = spark.createDataFrame(
            robots_rows, ["domain", "robots_txt"]
        )
        urls = spark.createDataFrame(
            url_rows, ["doc_id", "domain", "path"]
        )
        return {
            r.doc_id: (r.allowed, r.rule_len)
            for r in robots_gate(robots, urls, agent=agent).collect()
        }

    def test_crlf_line_endings(self, spark):
        # RFC 9309 permits CRLF; before the \r?\n split a trailing \r on
        # every directive made no rule match — silently allowing all.
        robots = [(
            "d1",
            "User-agent: *\r\nDisallow: /private*\r\n"
            "Allow: /private/ok\r\nDisallow: /tmp\r\n",
        )]
        got = self._gate(spark, robots, [
            (1, "d1", "/private/x"),
            (2, "d1", "/private/ok"),
            (3, "d1", "/tmpfile"),
            (4, "d1", "/public"),
        ])
        assert got[1] == (False, 9)
        assert got[2] == (True, 11)
        assert got[3] == (False, 4)
        assert got[4] == (True, 0)

    def test_agent_falls_back_to_star_group(self, spark):
        # d1 has ONLY a '*' group: somebot must inherit it (RFC 9309
        # group selection), not evaluate zero rules.
        robots = [("d1", "User-agent: *\nDisallow: /no\n")]
        got = self._gate(
            spark, robots, [(1, "d1", "/no/x"), (2, "d1", "/ok")],
            agent="somebot",
        )
        assert got[1] == (False, 3)
        assert got[2] == (True, 0)

    def test_specific_group_shadows_star(self, spark):
        # a domain WITH a somebot group uses only that group; a domain
        # without one falls back to its '*' group — per-domain decision.
        robots = [
            (
                "d1",
                "User-agent: somebot\nDisallow: /only-some\n\n"
                "User-agent: *\nDisallow: /star\n",
            ),
            ("d2", "User-agent: *\nDisallow: /star\n"),
        ]
        got = self._gate(
            spark,
            robots,
            [
                (1, "d1", "/star/x"),       # star rule must NOT apply
                (2, "d1", "/only-some/x"),  # somebot rule applies
                (3, "d2", "/star/x"),       # fallback to '*' on d2
            ],
            agent="somebot",
        )
        assert got[1] == (True, 0)
        assert got[2] == (False, 10)
        assert got[3] == (False, 5)
