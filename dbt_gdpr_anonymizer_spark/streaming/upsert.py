"""Streaming CDC upsert sink: micro-batch MERGE via ``foreachBatch``.

Structured Streaming's built-in sinks append; production pipelines
usually need UPSERT — "this key's latest state replaces its previous
state" (CDC apply, feature-store refresh, session snapshots). The Spark
idiom is ``foreachBatch``: each micro-batch runs a BATCH merge of the
delta into the target, so the same ``incremental_merge`` operator serves
batch backfill and streaming apply (one code path — the Structured
Streaming promise, same as the masking surface).

Exactly-once story: the sink is versioned-by-batch — batch N writes the
full merged state to ``state_v{N}`` derived from ``state_v{M}`` (the
newest M < N). A replayed batch (restart after crash) recomputes from
the same predecessor and overwrites the same directory — idempotent, no
partial state visible. ``latest_state`` reads the newest version. This
is Delta/Iceberg MERGE minus the transaction log, with the log replaced
by the checkpoint's batch ids; at 100 TB pair it with a partitioned
target and dynamic partition overwrite so each merge touches only the
partitions the delta hits (see ``incremental_merge``'s scale note).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.operators.relational import incremental_merge

__all__ = ["stream_upsert_parquet", "latest_state"]

_VERSION_RE = re.compile(r"^state_v(\d+)$")


def _versions(target_dir: str) -> list[int]:
    if not os.path.isdir(target_dir):
        return []
    out = []
    for name in os.listdir(target_dir):
        m = _VERSION_RE.match(name)
        if m and os.path.exists(os.path.join(target_dir, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def latest_state(spark: SparkSession, target_dir: str) -> DataFrame | None:
    """The newest committed merged state, or None before the first batch."""
    vs = _versions(target_dir)
    if not vs:
        return None
    return spark.read.parquet(f"{target_dir}/state_v{vs[-1]}")


def stream_upsert_parquet(
    stream: DataFrame,
    target_dir: str,
    keys: list[str],
    order_cols: list[str],
    checkpoint_dir: str,
):
    """Start an availableNow/continuous upsert of ``stream`` into
    ``target_dir``; returns the StreamingQuery.

    Each micro-batch is first reduced to ONE row per key (latest by
    ``order_cols`` — a batch can carry several updates for a key and
    ``incremental_merge`` must see a deterministic winner), then merged
    over the newest committed state. Updates always win over existing
    state, so ordering across batches rides on the source's time order —
    the same contract as any CDC apply.
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        w = Window.partitionBy(*keys).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        delta = (
            batch_df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
        prior_versions = [v for v in _versions(target_dir) if v < batch_id]
        if prior_versions:
            prev = spark.read.parquet(
                f"{target_dir}/state_v{prior_versions[-1]}"
            )
            merged = incremental_merge(prev, delta, keys)
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(
            f"{target_dir}/state_v{batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
