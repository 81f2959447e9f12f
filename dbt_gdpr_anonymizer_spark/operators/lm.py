"""Statistical language-model scoring for corpus quality filtering.

CCNet / Gopher-style pipelines rank web documents by the perplexity of a
small LM trained on a trusted corpus and drop the worst tail. This module
implements that signal with a distributed **bigram model with Laplace
smoothing**, end to end in DataFrame ops:

  train:  bigram and unigram count tables (two map-side-combined groupBys
          over one exploded token frame);
  score:  per-document mean negative log-likelihood
          ``-ln P(w_i | w_{i-1})`` with ``P = (c12 + 1) / (c1 + V)``.

Scale design (100 TB): the exploded bigram frame is persisted and shared by
the model-count aggregation and the scoring join, so the corpus is tokenized
exactly once. The model tables are vocabulary-bounded (not corpus-bounded) —
the scoring joins are plain equi-joins on the bigram / prefix-word keys that
AQE converts to broadcasts when the vocabulary is small. No driver-side
state, no UDFs; ``ln`` is used (not ``log2``) because the two oracle engines
agree on natural log bit-for-bit (the bm25/tfidf precedent).

Extension surface beyond the reference (no LM anywhere in
tabodino/dbt-gdpr-anonymizer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.functions.text import words

__all__ = ["bigram_array", "bigram_lm_scores"]


def bigram_array(ws: Column) -> Column:
    """Adjacent-pair strings ``"w1 w2"`` of a token array (no explode)."""
    n = F.size(ws)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(ws, 1, n - 1),
            F.slice(ws, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train a Laplace-smoothed bigram LM on the corpus and score every
    document by mean ``-ln P(w_i | w_{i-1})``.

    Returns one row per input document: ``(id_col, n_bigrams BIGINT,
    xent DOUBLE)`` — ``xent`` is NULL for documents with fewer than two
    tokens (no bigram events to score). Self-scoring keeps every bigram
    in-vocabulary, so the smoothing term only shifts probabilities; a
    held-out corpus can be scored by passing it through the same joins
    with the model tables reused.
    """
    from dbt_gdpr_anonymizer_spark.operators.caching import track_caches

    toks = docs.select(F.col(id_col), words(text_col).alias("ws"))
    # One tokenization pass feeds both the model counts and the scoring
    # join: persist the exploded bigram events (released by the caller via
    # caching.release_caches after the action, per repo convention).
    events = toks.select(
        id_col, F.explode(bigram_array(F.col("ws"))).alias("bg")
    ).persist()
    bigrams = events.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    unigrams = (
        toks.select(F.explode("ws").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = unigrams.agg(F.count(F.lit(1)).alias("v"))

    neg_ll = -F.log(
        (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
    )
    scored = (
        events.withColumn("w1", F.split("bg", " ").getItem(0))
        .join(bigrams, "bg")
        .join(unigrams, F.col("w1") == F.col("w"))
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum(neg_ll) / F.count(F.lit(1))).alias("xent"),
        )
    )
    out = (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias(
                "n_bigrams"
            ),
            "xent",
        )
    )
    return track_caches(out, events)
