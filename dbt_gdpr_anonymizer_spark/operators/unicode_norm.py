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

__all__ = ["nfc_normalize", "unicode_profile"]


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
