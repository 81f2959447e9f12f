"""Sequence packing: length-bucketed deterministic batch assignment.

Pretraining dataloaders pack variable-length documents into fixed token
budgets; done naively (random order) every batch mixes a 10-token doc with
a 4000-token one and pads to the max. The standard fix is length-bucketed
packing: group documents into coarse length buckets, order them
deterministically within the bucket, and cut batches by running token
count. This module computes that assignment as a DataFrame op so the
batch plan itself is reproducible, auditable, and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.functions import text as tx

__all__ = ["pack_sequences", "chunk_documents", "training_shard_plan"]


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 2048,
    bucket_width: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    emit_cum: bool = False,
) -> DataFrame:
    """Assign every document a ``(bucket, batch_id)``.

    * ``n_tokens``: whitespace token count (tx.token_count_ws).
    * ``bucket = n_tokens div bucket_width`` — coarse length class, so a
      batch only ever mixes documents within ``bucket_width`` tokens of
      each other (bounded padding waste).
    * within a bucket, documents are ordered by the md5 permutation of
      their id (deterministic shuffle — length-sorted order would
      correlate adjacent batches) and cut greedily:
      ``batch_id = cum_tokens_before div max_tokens``. A batch's token sum
      is ≤ max_tokens + the bucket's max document length; exact-budget
      bin packing is NP-hard and needs no distributed exactness here.

    One shuffle (the per-bucket window). Long-corpus skew valve: buckets
    are contiguous length classes, so a corpus dominated by one length
    class serializes in that bucket's window — shard the input first
    (e.g. partition by a path/date column and pack per shard, which is
    what a multi-host dataloader needs anyway) if one bucket exceeds an
    executor. All arithmetic is integer (exact window cumsum of longs);
    the assignment is bit-identical across engines and partitionings.
    ``emit_cum=True`` additionally releases the pre-cut running token
    count (``cum_before``, BIGINT) — the diagnostic surface for bisecting
    a cross-engine mismatch to tokenize / cumsum / division.
    """
    d = docs.select(
        id_col, tx.token_count_ws(text_col).cast("long").alias("n_tokens")
    ).withColumn("bucket", F.expr(f"n_tokens div {bucket_width}"))
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    extra = (
        [F.col("_cum").cast("long").alias("cum_before")] if emit_cum else []
    )
    return d.withColumn("_cum", cum_before).select(
        id_col,
        "n_tokens",
        "bucket",
        F.expr(f"_cum div cast({max_tokens} as bigint)").alias("batch_id"),
        *extra,
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into token-budget chunks with a sliding overlap —
    the context-window segmentation step in front of embedding or training
    (long docs can't enter a model whole; chunk boundaries that cut
    mid-context lose retrieval recall, hence the overlap).

    Pure per-row array arithmetic, fully parallel, NO shuffle: chunk
    starts are ``sequence(0, n-1, step)`` with ``step = max_tokens −
    overlap``, exploded and sliced from the normalized word array. Emits
    ``(doc_id, chunk_id, n_chunk_tokens, chunk_md5)`` — the md5 stands in
    for chunk text in oracle comparisons; real pipelines project the
    slice itself. Empty documents emit no chunks; the final chunk may be
    shorter than ``max_tokens``.
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    step = max_tokens - overlap
    ws = F.filter(tx.words(text_col), lambda w: w != "")
    d = docs.select(
        id_col, ws.alias("_ws"), F.size(ws).cast("long").alias("_n")
    ).filter(F.col("_n") > 0)
    starts = F.sequence(
        F.lit(0).cast("long"),
        F.col("_n") - 1,
        F.lit(step).cast("long"),
    )
    length = F.least(F.lit(max_tokens).cast("long"), F.col("_n") - F.col("_start"))
    return (
        d.select(id_col, "_ws", "_n", F.explode(starts).alias("_start"))
        .select(
            id_col,
            (F.col("_start") / step).cast("long").alias("chunk_id"),
            length.alias("n_chunk_tokens"),
            F.md5(
                F.array_join(
                    F.slice(
                        F.col("_ws"),
                        (F.col("_start") + 1).cast("int"),
                        length.cast("int"),
                    ),
                    " ",
                )
            ).alias("chunk_md5"),
        )
    )


def training_shard_plan(
    docs: DataFrame,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    salt: str = "shard_salt",
) -> DataFrame:
    """X148 deterministic global shuffle + shard plan — the step between
    a curated corpus and a distributed dataloader: every document gets a
    shard (which of ``n_shards`` output files / reader workers owns it)
    and a position inside that shard, such that the overall order is a
    reproducible pseudo-random permutation (training-order shuffling is
    a correctness requirement for SGD, and re-runs must see the SAME
    order to resume mid-epoch).

    Both coordinates derive from the md5 permutation key of ``id‖salt``
    (the uniform52 idiom, engine-exact): shard = key mod n_shards,
    position = rank of the key within the shard (id tie-break).
    Changing the salt reshuffles everything; changing nothing reproduces
    the plan bit-for-bit.

    Scale: shard assignment is a pure projection; the per-shard
    ``row_number`` is one hash-partition sort PER SHARD — md5 balances
    shard populations by construction (no skew), the per-shard sort is
    the materialization order a shard writer needs anyway, and shards
    are independent so the sort parallelism is exactly ``n_shards`` ×
    executor cores. No global sort, no driver state.

    Returns ``(id_col, shard BIGINT, pos BIGINT)`` — ``pos`` is 1-based
    within the shard.
    """
    from dbt_gdpr_anonymizer_spark.operators.privacy import uniform52

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = uniform52(
        F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))
    )
    base = docs.select(
        F.col(id_col), (key % n_shards).cast("bigint").alias("shard"),
        key.alias("_k"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("_k"), F.col(id_col))
    return base.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )
