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
    "url_canonicalize",
    "url_canonicalize_sql",
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



# Query parameters dropped by url_canonicalize: the tracking params every
# crawler normalizer strips (utm suite, click ids, share ids). Anchored
# match against "name=" or bare "name".
_TRACK_PARAM_RE = (
    r"^(utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|igshid|ref|ref_src)(=.*)?$"
)
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"


def url_canonicalize(c: Column | str) -> Column:
    """Crawler-grade URL canonicalization (Column -> Column): lowercase
    scheme+authority, strip default ports (http:80 / https:443), drop the
    fragment, remove tracking query params (:data:`_TRACK_PARAM_RE`),
    SORT the surviving params (binary order — both engines), empty path
    becomes '/'. URLs without a ``scheme://`` prefix pass through
    unchanged. Pure codegen (regexp extracts + one array
    filter/sort/join) — no UDF, no shuffle; the dedup key a 100 TB crawl
    frontier needs.
    """
    u = F.coalesce(_col(c), F.lit(""))
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
        .otherwise(auth)
    )
    rest = F.regexp_extract(u, _REST_RE, 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda x: (x != "") & ~x.rlike(_TRACK_PARAM_RE),
        )
    )
    qc = F.array_join(params, "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(qc == "", F.lit("")).otherwise(F.concat(F.lit("?"), qc)),
    )
    return F.when(scheme == "", u).otherwise(rebuilt)


def url_canonicalize_sql(expr: str) -> str:
    """DuckDB twin of :func:`url_canonicalize` (same regexes, list ops)."""
    t = _TRACK_PARAM_RE.replace("'", "''")
    u = f"coalesce({expr}, '')"
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    auth0 = f"lower(regexp_extract({u}, '{_AUTH_RE}', 1))"
    auth = (
        f"(case when {scheme} = 'http'"
        f" then regexp_replace({auth0}, ':80$', '')"
        f" when {scheme} = 'https'"
        f" then regexp_replace({auth0}, ':443$', '')"
        f" else {auth0} end)"
    )
    rest = f"regexp_extract({u}, '{_REST_RE}', 1)"
    path0 = f"regexp_extract({rest}, '^([^?]*)', 1)"
    path = f"(case when {path0} = '' then '/' else {path0} end)"
    q = rf"regexp_extract({rest}, '\?(.*)$', 1)"
    params = (
        f"list_sort(list_filter(string_split({q}, '&'),"
        f" x -> x <> '' and not regexp_matches(x, '{t}')))"
    )
    # array_to_string([]) is NULL in DuckDB but '' in Spark's array_join
    qc = f"coalesce(array_to_string({params}, '&'), '')"
    rebuilt = (
        f"({scheme} || '://' || {auth} || {path} ||"
        f" (case when {qc} = '' then '' else '?' || {qc} end))"
    )
    return f"(case when {scheme} = '' then {u} else {rebuilt} end)"

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


# ---------------------------------------------------------------------------
# X136 per-domain document caps (C4/FineWeb-style host balancing).
# ---------------------------------------------------------------------------


def domain_cap(
    docs: DataFrame,
    url_col: str = "url",
    *,
    cap: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """X136 per-domain document cap — the crawler-balance curation step
    (C4 keeps ≤ a fixed page count per host; FineWeb caps dominant
    domains so one forum mirror cannot swamp the corpus): keep at most
    ``cap`` documents per registered domain, smallest ``id_col`` first
    (deterministic — ids are the crawl-order surrogate).

    Skew-aware two-phase plan, because the whole point of the operator is
    that domain frequency is Zipfian: a naive
    ``row_number() over (partition by domain)`` sorts EVERY domain's rows,
    and the one hot domain (the reason you're capping) becomes the
    straggler partition. Instead:

    1. one map-side-partial count per domain;
    2. the OVER-cap domain set — small by construction (few domains
       exceed any sane cap) — broadcasts;
    3. rows in under-cap domains pass through with NO window sort — one
       totals join (AQE broadcasts it when the domain table fits) and a
       filter;
    4. only the over-cap slice — selected by a broadcast semi-join on the
       small over-cap domain set — pays the rank window, so sort work is
       proportional to the capped domains' rows, not the corpus.

    Returns ``(id_col, domain, domain_total BIGINT, kept BOOLEAN)`` for
    every input row — callers filter ``kept`` to enforce, or aggregate
    the flag for a cap-impact report.
    """
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError(f"domain_cap: cap must be >= 1, got {cap}")
    base = docs.select(
        F.col(id_col),
        url_registered_domain(F.col(url_col)).alias("domain"),
    )
    totals = base.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("domain_total")
    )
    over = totals.filter(F.col("domain_total") > cap)
    # totals is one row per domain — small for most corpora but NOT
    # guaranteed broadcastable at web scale (millions of hosts), so the
    # join is left to Catalyst/AQE (runtime-broadcast when it fits, one
    # domain-keyed shuffle when not). Only `over` is broadcast
    # unconditionally: few domains exceed any sane cap by construction.
    # Both joins are NULL-SAFE on the domain key (r9, the
    # md5_bucketed_rank lesson): a NULL registered domain (NULL url) is
    # an ordinary group to groupBy and to the rank window's partitionBy,
    # but a name-list inner join would silently drop those rows —
    # violating the every-input-row contract.
    with_tot = base.join(
        totals.select(
            F.col("domain").alias("_dj"), "domain_total"
        ),
        F.col("domain").eqNullSafe(F.col("_dj")),
    ).drop("_dj")
    under = with_tot.filter(F.col("domain_total") <= cap).select(
        id_col, "domain", "domain_total", F.lit(True).alias("kept")
    )
    w = Window.partitionBy("domain").orderBy(F.col(id_col).asc())
    capped = (
        with_tot.join(
            F.broadcast(over.select(F.col("domain").alias("_do"))),
            F.col("domain").eqNullSafe(F.col("_do")),
        )
        .drop("_do")
        .withColumn("_rk", F.row_number().over(w))
        .select(
            id_col,
            "domain",
            "domain_total",
            (F.col("_rk") <= cap).alias("kept"),
        )
    )
    return under.unionByName(capped)


def robots_gate(
    robots,  # DataFrame (domain, robots_txt)
    urls,  # DataFrame (id_col, domain, path)
    *,
    id_col: str = "doc_id",
    domain_col: str = "domain",
    path_col: str = "path",
    agent: str = "*",
):
    """X156 robots.txt compliance gate (RFC 9309) — the crawl-compliance
    step a responsible web corpus runs before ingest: per URL, is it
    allowed under the domain's robots.txt for the given user-agent
    group? Verdict rule is the RFC's: among matching allow/disallow
    rules the LONGEST pattern wins, an exact tie goes to allow, and a
    URL with no matching rule (or a domain with no robots.txt) is
    allowed.

    Parsing is pure DataFrame ops: lines split/posexploded (per-domain
    files are small — the windows below order within one domain's
    lines, bounded by file length, never corpus size), comments
    stripped, directives lower-cased; a user-agent line FOLLOWING a
    non-user-agent line opens a new group (running-sum window), and
    rules belong to every agent named by their group's user-agent
    lines. Only groups naming ``agent`` are evaluated.

    Matching is PURE ``LIKE`` — no regex engine: ``*`` wildcards
    translate to ``%`` and every pattern is prefix-anchored with a
    trailing ``%`` (RFC prefix semantics). That keeps the predicate
    codegen-friendly AND engine-portable (SQL LIKE is identical in
    Spark and DuckDB), which is what lets the oracle replay the whole
    parse+match. Patterns using the RFC's ``$`` end-anchor raise
    ``NotImplementedError`` (documented gap; the LIKE translation
    cannot express it) — LIKE metacharacters ``%`` and ``_`` in rule
    paths are rejected the same way rather than silently mis-matching.

    Scale: rules join URLs on the domain (hash equi-join; the rule
    table is robots-file-bounded, per-domain rule counts are small), a
    per-URL struct-max picks the winning rule (map-side combinable
    aggregate, no window over URLs). Returns ``(id_col, domain_col,
    path_col, allowed BOOLEAN, rule_len BIGINT)`` — ``rule_len`` 0 when
    no rule matched.
    """
    from pyspark.sql import Window

    # Split on \r?\n, not "\n": RFC 9309 explicitly permits CRLF line
    # endings (common in the wild), and trim() in both Spark and DuckDB
    # strips only spaces — a trailing \r left on every directive/value
    # would make NO rule match, silently reporting every URL allowed
    # (the worst failure mode for a compliance gate).
    lines = robots.select(
        F.col(domain_col),
        F.posexplode(F.split(F.col("robots_txt"), r"\r?\n")).alias(
            "_ln", "_raw"
        ),
    ).select(
        domain_col,
        "_ln",
        F.trim(F.regexp_replace("_raw", "#.*$", "")).alias("_line"),
    ).filter(F.col("_line") != "")
    parsed = lines.select(
        domain_col,
        "_ln",
        F.lower(
            F.trim(F.regexp_extract("_line", r"^([^:]+):", 1))
        ).alias("_dir"),
        F.trim(F.regexp_extract("_line", r"^[^:]+:(.*)$", 1)).alias(
            "_val"
        ),
    ).filter(F.col("_dir").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy(domain_col).orderBy("_ln")
    grouped = parsed.select(
        domain_col,
        "_ln",
        "_dir",
        "_val",
        F.sum(
            F.when(
                (F.col("_dir") == "user-agent")
                & (
                    F.lag("_dir").over(w).isNull()
                    | (F.lag("_dir").over(w) != "user-agent")
                ),
                1,
            ).otherwise(0)
        ).over(w).alias("_grp"),
    )
    # RFC 9309 group selection: use the groups naming ``agent`` when the
    # file has any; otherwise FALL BACK to the '*' groups (per domain —
    # the fallback is a property of each robots.txt file). Without the
    # fallback, robots_gate(agent="somebot") against a file containing
    # only 'User-agent: *' evaluated zero rules and allowed everything —
    # permissive failure in a compliance gate.
    my_groups = (
        grouped.filter(
            (F.col("_dir") == "user-agent")
            & (F.lower("_val") == agent.lower())
        )
        .select(domain_col, "_grp")
        .distinct()
    )
    if agent != "*":
        star_groups = (
            grouped.filter(
                (F.col("_dir") == "user-agent") & (F.col("_val") == "*")
            )
            .select(domain_col, "_grp")
            .distinct()
        )
        # domains with at least one specific-agent group keep ONLY those;
        # all other domains use their '*' groups (anti-join is bounded by
        # the robots table, never corpus size)
        my_groups = my_groups.unionByName(
            star_groups.join(
                my_groups.select(domain_col).distinct(),
                domain_col,
                "left_anti",
            )
        )
    rules = (
        grouped.filter(F.col("_dir").isin("allow", "disallow"))
        .join(my_groups, [domain_col, "_grp"], "left_semi")
        .filter(F.col("_val") != "")  # empty disallow = allow all
        .select(
            domain_col,
            (F.col("_dir") == "allow").alias("_is_allow"),
            F.col("_val").alias("_rule"),
            F.length("_val").cast("bigint").alias("_rlen"),
        )
    )
    u = urls.select(id_col, domain_col, path_col)
    matched = (
        u.join(rules, domain_col)
        .withColumn(
            # prefix semantics + '*' wildcard → LIKE translation;
            # metacharacter rules were rejected by the contract guard
            "_pat",
            F.concat(F.regexp_replace("_rule", r"\*", "%"), F.lit("%")),
        )
        .filter(F.expr(f"{path_col} like _pat"))
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("_rlen"),
                    F.col("_is_allow").cast("int").alias("_a"),
                )
            ).alias("_win")
        )
    )
    # contract guard: refuse rules the LIKE translation cannot express
    bad = rules.filter(
        F.col("_rule").contains("$")
        | F.col("_rule").contains("%")
        | F.col("_rule").contains("_")
    )
    if bad.limit(1).count() > 0:
        raise NotImplementedError(
            "robots_gate: '$' end-anchor / LIKE metacharacters in rule "
            "paths are not expressible in the LIKE translation"
        )
    return u.join(matched, id_col, "left").select(
        id_col,
        domain_col,
        path_col,
        F.coalesce(F.col("_win._a") == 1, F.lit(True)).alias("allowed"),
        F.coalesce(F.col("_win._rlen"), F.lit(0)).cast("bigint").alias(
            "rule_len"
        ),
    )
