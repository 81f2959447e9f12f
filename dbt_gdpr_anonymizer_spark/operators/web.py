"""Web-corpus extraction operators: HTML -> text, link harvest, URL parts.

The first stage of every web-scale LLM training pipeline (C4, RefinedWeb,
FineWeb) is turning crawled HTML into clean text plus link metadata. This
module expresses that stage as a chain of native ``regexp_replace`` /
``regexp_extract_all`` Column expressions, so at 100 TB the extraction runs
entirely inside whole-stage codegen — zero Python, zero shuffle, one scan.

Determinism contract: every regex here uses only syntax shared by Java's
``java.util.regex`` (Spark) and RE2 (DuckDB) — inline ``(?is)`` flags,
non-greedy ``.*?``, character classes, alternation. No lookaround, no
backreferences (RE2 has neither). Each function has an exact DuckDB twin
emitted by :func:`html_to_text_sql` / :func:`url_host_sql` so the oracle
harness replays extraction bit-for-bit.

Extension surface beyond the reference (tabodino/dbt-gdpr-anonymizer has no
web ops; its ingest reads pre-extracted JSONL — ``download_data.py``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "html_to_text",
    "html_to_text_sql",
    "extract_links",
    "extract_links_sql",
    "url_host",
    "url_host_sql",
    "url_registered_domain",
    "url_registered_domain_sql",
    "make_warc_gz",
    "parse_warc_members",
    "read_warc",
]

# Ordered (pattern, replacement) chain. Order is load-bearing:
#   1.   the <head> element drops whole (title/meta are metadata, not text);
#   2-3. body script/style elements drop with their CONTENT (non-greedy,
#        dotall);
#   4.   comments drop with content;
#   5.   closing block-level tags and <br> become newlines (so block
#        structure survives as line structure, like trafilatura/jusText);
#   6.   every remaining tag drops;
#   <entity decode happens here — _ENTITY_CHAIN below, LITERAL replaces>
#   7.   spaces/tabs/CRs collapse to one space;
#   8.   each newline absorbs surrounding spaces/newlines into one;
#   9.   outer whitespace trims.
_HTML_PRE_CHAIN: list[tuple[str, str]] = [
    (r"(?is)<head[^>]*>.*?</head>", ""),
    (r"(?is)<script[^>]*>.*?</script>", ""),
    (r"(?is)<style[^>]*>.*?</style>", ""),
    (r"(?s)<!--.*?-->", ""),
    (r"(?i)</(p|div|li|h[1-6]|tr|table|ul|ol|blockquote|section|article)>"
     r"|<br[^>]*>", "\n"),
    (r"(?s)<[^>]*>", ""),
]

# The five standard entities, ``&amp;`` strictly LAST so ``&amp;lt;``
# decodes to the literal ``&lt;`` (not ``<``) exactly as a browser would.
# LITERAL string replaces (Spark/DuckDB `replace`) — measurably faster
# than regexp passes and semantically identical for fixed needles.
_ENTITY_CHAIN: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", "\""),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

_HTML_POST_CHAIN: list[tuple[str, str]] = [
    (r"[ \t\r]+", " "),
    (r" ?\n[\n ]*", "\n"),
    (r"^\s+|\s+$", ""),
]

_HREF_RE = r"(?i)href\s*=\s*\"([^\"]*)\""

# scheme://host[:port]/... -> host (group 1 stops at :port, /path, ?query, #frag)
_HOST_RE = r"(?i)^[a-z][a-z0-9+.-]*://([^/?#:]+)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def html_to_text(c: Column | str) -> Column:
    """Extract readable text from an HTML document (Column -> Column).

    Drops script/style/comment content, converts block boundaries to
    newlines, strips tags, decodes the five standard entities (literal
    replaces — no regex engine for fixed needles), and canonicalizes
    whitespace. Pure codegen: chained regexp_replace/replace expressions,
    no UDF.
    """
    out = F.coalesce(_col(c), F.lit(""))
    for pat, repl in _HTML_PRE_CHAIN:
        out = F.regexp_replace(out, pat, repl)
    for needle, repl in _ENTITY_CHAIN:
        out = F.replace(out, F.lit(needle), F.lit(repl))
    for pat, repl in _HTML_POST_CHAIN:
        out = F.regexp_replace(out, pat, repl)
    return out


def html_to_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`html_to_text` over SQL expression ``expr``."""
    # DuckDB single-quoted literals keep backslashes verbatim, so the Java
    # regex source string IS the RE2 source string — no re-escaping.
    out = f"coalesce({expr}, '')"
    for pat, repl in _HTML_PRE_CHAIN:
        p = pat.replace("'", "''")
        r = repl.replace("'", "''")
        if r == "\n":
            out = f"regexp_replace({out}, '{p}', chr(10), 'g')"
        else:
            out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    for needle, repl in _ENTITY_CHAIN:
        n = needle.replace("'", "''")
        r = repl.replace("'", "''")
        out = f"replace({out}, '{n}', '{r}')"
    for pat, repl in _HTML_POST_CHAIN:
        p = pat.replace("'", "''")
        r = repl.replace("'", "''")
        if r == "\n":
            out = f"regexp_replace({out}, '{p}', chr(10), 'g')"
        else:
            out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return out


def extract_links(c: Column | str) -> Column:
    """All ``href="..."`` targets in document order (array<string>)."""
    return F.regexp_extract_all(
        F.coalesce(_col(c), F.lit("")), F.lit(_HREF_RE), F.lit(1)
    )


def extract_links_sql(expr: str) -> str:
    """DuckDB twin of :func:`extract_links`."""
    p = _HREF_RE.replace("'", "''")
    return f"regexp_extract_all(coalesce({expr}, ''), '{p}', 1)"


def url_host(c: Column | str) -> Column:
    """Lowercased host of a URL; port/path/query stripped; '' if unparseable."""
    return F.lower(F.regexp_extract(_col(c), _HOST_RE, 1))


def url_host_sql(expr: str) -> str:
    """DuckDB twin of :func:`url_host`."""
    return f"lower(regexp_extract({expr}, '{_HOST_RE}', 1))"


def url_registered_domain(c: Column | str) -> Column:
    """Heuristic registered domain: last two dot-labels of the host
    (``sub.example.org`` -> ``example.org``). A public-suffix-list lookup
    (for ``co.uk`` etc.) is a broadcast-join swap-in; the two-label
    heuristic keeps the operator dependency-free and oracle-exact.
    """
    h = url_host(c)
    return F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)


def url_registered_domain_sql(expr: str) -> str:
    """DuckDB twin of :func:`url_registered_domain`."""
    return (
        f"regexp_extract({url_host_sql(expr)}, '([^.]+\\.[^.]+)$', 1)"
    )


# ---------------------------------------------------------------------------
# WARC ingest tier (ISO 28500): the Common Crawl container format.
# ---------------------------------------------------------------------------

def make_warc_gz(records: list[tuple[str, str]]) -> bytes:
    """Build a REAL .warc.gz file (public ISO 28500 + RFC 1952): one gzip
    MEMBER per record (the Common Crawl layout — members concatenate and
    remain independently seekable), ``mtime=0`` for determinism. Each
    record is a ``WARC/1.0`` response with CRLF headers, a Content-Length
    of the payload block, and the spec's trailing CRLF CRLF."""
    import gzip

    out = bytearray()
    for uri, payload in records:
        body = payload.encode("utf-8")
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + f"Content-Length: {len(body)}\r\n".encode()
            + b"\r\n"
            + body
            + b"\r\n\r\n"
        )
        out += gzip.compress(rec, mtime=0)
    return bytes(out)


def parse_warc_members(blob: bytes) -> list[dict]:
    """Split a .warc.gz blob into records: walk the concatenated gzip
    members (``zlib.decompressobj`` + ``unused_data`` — no member index
    needed), parse the version line and CRLF headers, slice the payload
    by Content-Length, and verify the record's closing CRLF CRLF. Returns
    ``[{"uri", "content_length", "payload"}]`` in file order."""
    import zlib

    recs: list[dict] = []
    rest = blob
    while rest:
        d = zlib.decompressobj(wbits=31)
        try:
            raw = d.decompress(rest)
        except zlib.error as e:
            raise ValueError(f"warc.gz member failed to decompress: {e}")
        if not raw and not d.eof:
            raise ValueError("warc.gz member failed to decompress")
        rest = d.unused_data
        head, sep, tail = raw.partition(b"\r\n\r\n")
        if not sep:
            raise ValueError("WARC record missing header terminator")
        lines = head.split(b"\r\n")
        if not lines or not lines[0].startswith(b"WARC/"):
            raise ValueError("WARC record missing version line")
        headers = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing Content-Length")
        body = tail[:clen]
        if len(body) != clen or tail[clen : clen + 4] != b"\r\n\r\n":
            raise ValueError("WARC payload block malformed")
        recs.append(
            {
                "uri": headers.get(b"warc-target-uri", b"").decode(),
                "content_length": clen,
                "payload": body.decode("utf-8"),
            }
        )
    return recs


def read_warc(files, payload_as="payload"):
    """DataFrame stage: explode ``(file_id, warc binary)`` rows into WARC
    records via Arrow-batched ``mapInPandas`` — Python cost is per gzip
    member (unavoidable: DEFLATE is not a Column expression), splitting is
    streaming (no member index), and the stage is narrow: record rows
    inherit the file rows' partitioning, so a 100 TB crawl parses with
    zero shuffle. Output: ``(file_id, uri, content_length, payload)``."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for fid, blob in zip(pdf["file_id"], pdf["warc"]):
                for rec in parse_warc_members(bytes(blob)):
                    rows.append(
                        (
                            fid,
                            rec["uri"],
                            rec["content_length"],
                            rec["payload"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["file_id", "uri", "content_length", payload_as],
            )

    schema = (
        "file_id string, uri string, content_length long, "
        f"{payload_as} string"
    )
    return files.mapInPandas(run, schema)
