"""Text-analysis expression library for large-scale corpus pipelines.

Everything is built from native ``pyspark.sql.functions`` (higher-order array
functions included) so the hot path stays JVM-side and whole-stage-codegen'd:
at 100 TB these run as per-row expressions with zero shuffle and zero Python.

Determinism contract: each function here has an exact DuckDB-SQL equivalent
(used by the oracle harness). Hashes are md5-based (both engines agree on
md5/sha256 hex output), never engine-native ``hash()`` (which differs).

Extension surface beyond the reference (tabodino/dbt-gdpr-anonymizer has no
text ops): language-ID, quality scoring, token counting, fingerprinting,
shingling, MinHash, SimHash — the operators an LLM training-data pipeline
needs on a `documents` corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "words",
    "token_count_ws",
    "token_count_regex",
    "stopword_hits",
    "lang_id",
    "punct_ratio",
    "quality_score",
    "doc_fingerprint",
    "rolling_fingerprint",
    "md5_hex32",
    "scrub_pii",
    "SCRUB_EMAIL_RE",
    "SCRUB_FR_PHONE_RE",
    "shingles",
    "minhash_signature",
    "simhash",
]

# Tiny, fixed stopword lists — enough signal for a heuristic language call.
FR_STOPWORDS = (
    "le la les un une des et ou est sont dans pour avec sur par pas que qui "
    "ne se au aux du de ce cette il elle nous vous ils elles mais donc si"
).split()
EN_STOPWORDS = (
    "the a an and or is are in for with on by not that which no to of this "
    "it she he we you they but so if at as be was were from has have"
).split()

_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
_PUNCT_RE = "[^A-Za-z0-9\\s]"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_text(c: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, collapse runs, trim."""
    c = F.lower(_col(c))
    c = F.regexp_replace(c, "[^a-z0-9]+", " ")
    return F.trim(c)


def words(c: Column | str) -> Column:
    """Array of normalized word tokens (empty array for blank text)."""
    n = normalize_text(c)
    return F.when(n == "", F.array().cast("array<string>")).otherwise(
        F.split(n, " ")
    )


def token_count_ws(c: Column | str) -> Column:
    """Whitespace token count on the raw text (split on whitespace runs)."""
    t = F.trim(_col(c))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, "\\s+")))


def token_count_regex(c: Column | str) -> Column:
    """BPE-ish token count: alpha runs, digit runs, single punctuation."""
    return F.regexp_count(_col(c), F.lit(_TOKEN_RE))


def stopword_hits(ws: Column, stopwords: list[str]) -> Column:
    """How many tokens of ``ws`` are in the stopword list."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))


def lang_id(c: Column | str, ws: Column | None = None) -> Column:
    """Heuristic language ID: majority stopword vote fr/en, else 'unknown'.

    Pass a pre-projected ``ws`` (words column) when scoring several
    functions over one text column: lambda-captured expressions are
    re-evaluated per element, so deriving words once in a projection and
    sharing the COLUMN is the linear-cost shape.
    """
    ws = words(c) if ws is None else ws
    fr = stopword_hits(ws, FR_STOPWORDS)
    en = stopword_hits(ws, EN_STOPWORDS)
    return (
        F.when(fr > en, F.lit("fr"))
        .when(en > fr, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def punct_ratio(c: Column | str) -> Column:
    """Punctuation chars / total chars (0.0 for empty text)."""
    c = _col(c)
    n = F.length(c)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.regexp_count(c, F.lit(_PUNCT_RE)).cast("double") / n.cast("double")
    )


def quality_score(c: Column | str, ws: Column | None = None) -> Column:
    """Composite quality in [0,1]: length, stopword, punctuation, word-shape.

    A deliberately simple, fully-deterministic heuristic: mean of
      - length_ok:   1 if 100 <= n_chars <= 20000 else 0
      - stop_ok:     1 if stopword ratio in [0.05, 0.6] else 0
      - punct_ok:    1 if punct ratio <= 0.2 else 0
      - wordlen_ok:  1 if mean word length in [2, 12] else 0

    ``ws``: optional pre-projected words column (see ``lang_id``).
    """
    c = _col(c)
    ws = words(c) if ws is None else ws
    nw = F.size(ws)
    n = F.length(c)
    stop_ratio = F.when(nw == 0, F.lit(0.0)).otherwise(
        stopword_hits(ws, FR_STOPWORDS + EN_STOPWORDS).cast("double")
        / nw.cast("double")
    )
    mean_wlen = F.when(nw == 0, F.lit(0.0)).otherwise(
        F.aggregate(ws, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w))
        .cast("double")
        / nw.cast("double")
    )
    length_ok = F.when((n >= 100) & (n <= 20000), 1).otherwise(0)
    stop_ok = F.when((stop_ratio >= 0.05) & (stop_ratio <= 0.6), 1).otherwise(0)
    punct_ok = F.when(punct_ratio(c) <= 0.2, 1).otherwise(0)
    wordlen_ok = F.when((mean_wlen >= 2.0) & (mean_wlen <= 12.0), 1).otherwise(0)
    return (length_ok + stop_ok + punct_ok + wordlen_ok).cast("double") / F.lit(4.0)


def doc_fingerprint(c: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 of sorted distinct words.

    Plays the role of the classic rolling-hash fingerprint but is
    whitespace/punctuation/word-order robust and engine-portable.
    """
    ws = words(c)
    return F.md5(F.array_join(F.array_sort(F.array_distinct(ws)), " "))


def rolling_fingerprint(
    c: Column | str, base: int = 131, mod: int = 2147483647
) -> Column:
    """Order-SENSITIVE Rabin-Karp polynomial fingerprint over word tokens.

    Classic rolling-hash document fingerprint: Horner fold
    ``acc = (acc*base + h(token)) % mod`` over the normalized token sequence,
    where ``h(token)`` is the first 8 hex digits of md5(token) parsed
    positionally (engine-portable; both Spark and DuckDB agree on md5 hex).
    Unlike :func:`doc_fingerprint` (order-insensitive set hash), reordering
    words changes this fingerprint — the shape used for exact-sequence dedup
    and winnowing-style chunk fingerprints.

    Arithmetic bound: acc < mod = 2^31-1 and h < mod, so acc*base + h <
    2^38 + 2^31 — exact in a 64-bit integer in both engines (DuckDB BIGINT
    errors on overflow rather than wrapping, so staying far below 2^63
    matters). Empty/blank text folds over an empty array → 0.

    Cost shape: one md5 per token (the inner ``transform`` materializes the
    hex digest per element; the digit extraction references only the lambda
    variable, so nothing is re-evaluated per digit — see the lambda-capture
    note on :func:`lang_id`).
    """
    hashes = F.transform(words(c), F.md5)
    return F.aggregate(
        F.transform(hashes, lambda h: (md5_hex32(h) % F.lit(mod)).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: (acc * F.lit(base) + v) % F.lit(mod),
    )


def md5_hex32(h: Column) -> Column:
    """First 8 hex digits of an md5 HEX-DIGEST column as bigint in [0, 2³²).

    Engine-portable 32-bit hash value (Spark and DuckDB agree on md5 hex;
    neither exposes a cross-compatible integer hash). Takes the already-
    computed digest — materialize it first via ``F.transform(arr, F.md5)``
    when mapping over arrays so the md5 isn't re-evaluated downstream.
    ``conv(_, 16, 10)`` parses the hex prefix in one JVM call (verified
    bit-equal to, and ~2× faster than, a per-digit positional fold).
    """
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")


# RE2-compatible (no lookaheads/backrefs) so DuckDB's regexp_replace scrubs
# byte-identically — unlike the validation patterns (operators/validate.py),
# which keep the reference's lookaheads and therefore run Spark-side only.
SCRUB_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SCRUB_FR_PHONE_RE = r"(\+33[ .-]?|0)[1-9]([ .-]?[0-9]{2}){4}"


def scrub_pii(c: Column | str) -> Column:
    """Redact PII inside FREE TEXT: emails → ``[EMAIL]``, French phone
    numbers → ``[PHONE]``.

    The reference masks structured columns only; for an LLM training
    corpus the PII lives in the text itself, and scrubbing must run
    distributed over every document. Two chained ``regexp_replace`` calls —
    JVM-side, whole-stage-codegen, no UDF. Email first, so a phone-like
    digit run inside an address's local part is already gone when the
    phone pass runs.
    """
    out = F.regexp_replace(_col(c), SCRUB_EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(out, SCRUB_FR_PHONE_RE, "[PHONE]")


def shingles(c: Column | str, n: int = 3) -> Column:
    """Word ``n``-gram shingles; docs shorter than ``n`` words yield the
    whole (space-joined) token sequence as a single shingle."""
    ws = words(c)
    nw = F.size(ws)
    grams = F.transform(
        F.sequence(F.lit(1), nw - (n - 1)),
        lambda i: F.array_join(F.slice(ws, i, n), " "),
    )
    return F.when(nw >= n, grams).otherwise(F.array(F.array_join(ws, " ")))


def minhash_signature(sh: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: per hash-index i, the lexicographic min of
    ``md5(i || ':' || shingle)`` — string-min is identical across engines."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)))
        ),
    )


def _hex_val(ch: Column) -> Column:
    """Value of one lowercase hex digit char, via position in the alphabet."""
    return F.call_function("instr", F.lit("0123456789abcdef"), ch) - 1


def simhash(c: Column | str, bits: int = 16) -> Column:
    """SimHash fingerprint over word tokens, ``bits`` wide (default 16).

    Per bit j: each token votes ±1 with bit j of md5(token); the fingerprint
    sets bit j iff the vote sum is positive. Bit j of a token's hash is
    extracted arithmetically from hex digit ``j div 4`` (shift ``3 - j%4``),
    which both Spark and DuckDB compute identically.
    """
    ws = words(c)

    def tok_bit(t: Column, j: Column) -> Column:
        hex_ch = F.substring(F.md5(t), (j / 4).cast("int") + 1, 1)
        shift = F.lit(3) - (j % 4)
        return (
            F.floor(_hex_val(hex_ch) / F.pow(F.lit(2.0), shift.cast("double")))
            % 2
        ).cast("bigint")

    def bit_contrib(j: Column) -> Column:
        vote = F.aggregate(
            ws,
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + (F.lit(2) * tok_bit(t, j) - 1),
        )
        return F.when(
            vote > 0, F.pow(F.lit(2.0), j.cast("double")).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))

    return F.aggregate(
        F.transform(F.sequence(F.lit(0), F.lit(bits - 1)), bit_contrib),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


# ---------------------------------------------------------------------------
# X143 Unicode script profile — multilingual corpus composition.
# ---------------------------------------------------------------------------

#: Script name -> single-char class of EXPLICIT codepoint ranges. Ranges
#: (not \p{script=...} properties) because the bracket-range syntax parses
#: identically in java.util.regex and RE2/DuckDB — property names differ
#: between the engines. Coverage is the core block of each script (enough
#: for composition profiling; extension blocks are a range append away).
SCRIPT_RANGES: dict[str, str] = {
    "latin": "[A-Za-zÀ-ɏ]",
    "cyrillic": "[Ѐ-ӿ]",
    "greek": "[Ͱ-Ͽ]",
    "arabic": "[؀-ۿ]",
    "cjk": "[一-鿿]",
    "hangul": "[가-힯]",
}


def script_counts(c: Column | str) -> dict[str, Column]:
    """Per-script character counts (Column map). Counting is the
    length-difference trick — ``length(s) - length(regexp_replace(s,
    class, ''))`` — one codegen regexp pass per script, no explode; the
    identical expression replays in DuckDB."""
    s = F.coalesce(_col(c), F.lit(""))
    return {
        name: (
            F.length(s) - F.length(F.regexp_replace(s, rng, ""))
        ).cast("bigint")
        for name, rng in SCRIPT_RANGES.items()
    }


def dominant_script(c: Column | str) -> Column:
    """Name of the script with the most characters; ties break by the
    fixed SCRIPT_RANGES order (latin first); ``'none'`` when no script
    char occurs. A greatest-so-far fold over the fixed script list —
    pure CASE chain, deterministic cross-engine."""
    counts = script_counts(c)
    best_name = F.lit("none")
    best_n = F.lit(0).cast("bigint")
    for name, cnt in counts.items():  # dict preserves insertion order
        take = cnt > best_n
        best_name = F.when(take, F.lit(name)).otherwise(best_name)
        best_n = F.when(take, cnt).otherwise(best_n)
    return best_name
