"""Unicode NFC normalization tier (X138).

Dedup and tokenization both break when the same text arrives in different
Unicode normal forms: ``é`` as U+00E9 and as ``e`` + U+0301 hash to
different fingerprints, split into different BPE merges, and defeat exact
dedup. Every serious web-corpus pipeline (CCNet, FineWeb, the HF
tokenizers' default pre-normalizer) therefore NFC-normalizes before any
content hashing.

Spark has no native normalization expression, so this is one of the
repo's few sanctioned Python tiers: an Arrow-batched ``pandas_udf`` over
``unicodedata.normalize`` (stdlib — dependency-free, vectorized transfer,
per-batch Python cost). The profile statistics around it (lengths,
changed flag, post-normalization content hash) are native Column
expressions, so the UDF does exactly one thing. A JVM swap-in
(``java.text.Normalizer`` via a Scala UDF or Spark's collation support)
is the production fast path; the semantics here are the contract.

Cross-engine determinism: DuckDB's ``nfc_normalize`` (utf8proc) and
CPython's ``unicodedata`` implement the same UAX #15 canonical
composition; the oracle harness replays normalization bit-for-bit and the
md5 release would catch any Unicode-version skew between them.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["mojibake_profile", "nfc_normalize", "unicode_profile"]


def _nfc_series(s: pd.Series) -> pd.Series:
    return s.map(
        lambda x: None if x is None else unicodedata.normalize("NFC", x)
    )


def nfc_normalize(c: Column | str) -> Column:
    """NFC-normalize a string column (Arrow-batched pandas UDF). The UDF
    is created per call because ``pandas_udf`` registration needs an
    active SparkSession (module import must stay session-free)."""
    udf = F.pandas_udf(_nfc_series, "string")
    return udf(F.col(c) if isinstance(c, str) else c)


def unicode_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document normalization profile: codepoint counts before/after
    NFC, whether normalization changed the text, and the md5 of the
    normalized form (the post-normalization dedup fingerprint). One
    narrow projection — the UDF runs once per row, everything else is
    codegen."""
    nfc = nfc_normalize(text_col)
    return docs.select(
        F.col(id_col),
        F.length(text_col).cast("bigint").alias("n_chars_raw"),
        F.length(nfc).cast("bigint").alias("n_chars_nfc"),
        (nfc != F.col(text_col)).alias("changed"),
        F.md5(nfc.cast("binary")).alias("md5_nfc"),
    )


def mojibake_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """X173 encoding-artifact (mojibake) detector — pure codegen, no
    UDF: counts the characteristic scars of UTF-8 bytes decoded as
    Latin-1/cp1252 (the single most common web-corpus corruption, the
    reason ftfy exists) plus hard decoder failures:

    * ``n_utf8_latin1`` — U+00C3 followed by a char in U+0080-U+00BF:
      a 2-byte UTF-8 sequence (lead 0xC3) read as Latin-1, i.e. every
      double-encoded e-acute / u-umlaut / n-tilde.
    * ``n_smart_quote_seq`` — the U+00E2 U+20AC digraph: a 3-byte
      General-Punctuation sequence (lead 0xE2 0x80) read as cp1252 —
      wrecked curly quotes, dashes, ellipses.
    * ``n_nbsp_seq`` — U+00C2 followed by U+00A0-U+00BF (lead 0xC2
      read as Latin-1; overwhelmingly the no-break-space wreck).
    * ``n_replacement`` — U+FFFD replacement characters (a decoder
      already gave up upstream).

    ``mojibake_ppm`` is the integer-exact density
    ``1e6 * sum(counts) div n_chars`` (0 for empty/NULL text) — the
    gate column a corpus-quality pass thresholds on. Counting is
    ``regexp_count`` with non-overlapping leftmost matches in both
    engines; each engine spells the same character classes in its own
    regex dialect (Java ``\\uXXXX`` here, RE2 ``\\x{XXXX}`` in the
    oracle) — the established cross-engine-idiom stance. Detection
    only, by design: the *repair* (re-encode Latin-1 -> decode UTF-8)
    is a byte-level operation SQL cannot replay, so it stays out of
    the checked contract.

    Returns ``(id_col, n_chars, n_utf8_latin1, n_smart_quote_seq,
    n_nbsp_seq, n_replacement, mojibake_ppm)`` — all BIGINT.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = docs.select(
        F.col(id_col),
        F.length(t).cast("bigint").alias("n_chars"),
        F.regexp_count(t, F.lit("\\u00c3[\\u0080-\\u00bf]"))
        .cast("bigint")
        .alias("n_utf8_latin1"),
        F.regexp_count(t, F.lit("\\u00e2\\u20ac"))
        .cast("bigint")
        .alias("n_smart_quote_seq"),
        F.regexp_count(t, F.lit("\\u00c2[\\u00a0-\\u00bf]"))
        .cast("bigint")
        .alias("n_nbsp_seq"),
        F.regexp_count(t, F.lit("\\ufffd"))
        .cast("bigint")
        .alias("n_replacement"),
    )
    return counts.select(
        id_col,
        "n_chars",
        "n_utf8_latin1",
        "n_smart_quote_seq",
        "n_nbsp_seq",
        "n_replacement",
        F.when(
            F.col("n_chars") > 0,
            F.expr(
                "1000000 * (n_utf8_latin1 + n_smart_quote_seq"
                " + n_nbsp_seq + n_replacement) div n_chars"
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("mojibake_ppm"),
    )
