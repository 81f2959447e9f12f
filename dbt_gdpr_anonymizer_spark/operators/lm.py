"""Statistical language-model scoring for corpus quality filtering.

CCNet / Gopher-style pipelines rank web documents by the perplexity of a
small LM trained on a trusted corpus and drop the worst tail. This module
implements that signal with a distributed **bigram model with Laplace
smoothing**, end to end in DataFrame ops:

  train:  bigram and unigram count tables (two map-side-combined groupBys
          over one exploded token frame);
  score:  per-document mean negative log-likelihood
          ``-ln P(w_i | w_{i-1})`` with ``P = (c12 + 1) / (c1 + V)``.

Scale design (100 TB): the (id, tokens) frame is persisted and shared, so
the corpus is tokenized exactly once and the cached frame is array-per-doc —
far smaller than the exploded event stream. The smoothing arithmetic is
folded onto the vocabulary-bounded model table (one ``ln`` per DISTINCT
bigram, not per corpus event), leaving a single events-sized equi-join on
the bigram key that AQE converts to a broadcast when the vocabulary is
small. No driver-side state, no UDFs; ``ln`` is used (not ``log2``) because
the two oracle engines agree on natural log bit-for-bit (the bm25/tfidf
precedent).

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

    # One tokenization pass feeds everything: persist the (id, tokens)
    # frame and derive bigram events, unigram counts, and the id spine
    # from the cache. The exploded event stream is persisted TOO — it is
    # consumed twice (model counts + scoring join) and bigram_array is a
    # zip_with lambda, i.e. interpreted HOF work that must not re-run
    # per consumer (the char_entropy lesson). Both caches are released
    # by the caller via caching.release_caches after the action.
    toks = docs.select(F.col(id_col), words(text_col).alias("ws")).persist()
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

    # r9 job-count/CPU cut: fold the smoothing arithmetic onto the
    # vocabulary-bounded MODEL table — one ln per distinct bigram instead
    # of one per corpus event, and ONE events-sized equi-join instead of
    # two. The per-event double is bit-identical (same formula over the
    # same (c12, c1, v) inputs), so the oracle hash is unchanged.
    neg_ll = -F.log(
        (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
    )
    model = (
        bigrams.withColumn("w1", F.split("bg", " ").getItem(0))
        .join(unigrams, F.col("w1") == F.col("w"))
        .crossJoin(F.broadcast(vocab))
        .select("bg", neg_ll.alias("_nll"))
    )
    scored = (
        events.join(model, "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum("_nll") / F.count(F.lit(1))).alias("xent"),
        )
    )
    out = (
        toks.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias(
                "n_bigrams"
            ),
            "xent",
        )
    )
    return track_caches(out, toks, events)
