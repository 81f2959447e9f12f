"""Corpus quality / repetition filters (Gopher-style, Rae et al. 2021).

LLM training pipelines drop documents dominated by repetition (boilerplate,
scraped navigation, generation loops). Two classic signals, computed here
as exact integer ratios so any engine reproduces them bit-for-bit:

* duplicate-word fraction — ``1 - distinct_words / total_words``
* top-bigram fraction — occurrences of the most frequent word bigram over
  the total bigram count

Scale design: the bigram frequency table is built by EXPLODING bigrams and
aggregating ``(doc_id, bigram)`` — linear in corpus size, map-side partial
aggregation, two hash shuffles both keyed (or co-keyed) on ``doc_id``.
The per-doc alternative (higher-order ``aggregate`` over the bigram array)
is O(len²) per document inside codegen; explode+groupBy is the shape that
survives long documents and 100 TB. Fractions are emitted as exact
parts-per-million via integer division (``1e6·a div b``) — no float
rounding to diverge across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.functions import text as tx

PPM = 1_000_000


def repetition_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition metrics.

    Returns ``(id_col, n_words, dup_word_ppm, top_bigram_ppm)`` where the
    ppm columns are exact integer parts-per-million (0 for documents with
    too few words to have duplicates / bigrams).
    """
    ws = tx.words(text_col)
    base = docs.select(
        F.col(id_col),
        ws.alias("_ws"),
        F.size(ws).alias("n_words"),
        F.size(F.array_distinct(ws)).alias("_nd"),
    )

    # Bigram frequency table: explode once, count per (doc, bigram), keep
    # only each doc's max count. Both aggregations combine map-side.
    bigrams = base.select(
        id_col,
        F.explode(
            F.when(
                F.col("n_words") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.col("n_words") - 1),
                    lambda i: F.concat_ws(
                        " ", F.col("_ws")[i - 1], F.col("_ws")[i]
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("_bg"),
    )
    top_bigram = (
        bigrams.groupBy(id_col, "_bg")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_maxc"))
    )

    # `div` = exact integral division (DuckDB `//`) — no float rounding.
    out = base.join(top_bigram, id_col, "left").select(
        id_col,
        F.col("n_words").cast("long").alias("n_words"),
        F.when(
            F.col("n_words") > 0,
            F.expr(
                f"cast({PPM} as bigint) * (n_words - _nd) div n_words"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dup_word_ppm"),
        F.when(
            F.col("n_words") > 1,
            F.expr(
                f"cast({PPM} as bigint) * coalesce(_maxc, 0)"
                " div (n_words - 1)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("top_bigram_ppm"),
    )
    return out
