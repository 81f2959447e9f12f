"""Structured Streaming anonymization.

The masking surface is stateless per-row Column expressions (functions/
masking.py), so the SAME ``mask_model`` rewriter applies unchanged to a
streaming DataFrame — one code path for batch and streaming, the core
promise of Structured Streaming. This module adds the stream plumbing:
sources, sinks, and the watermarked windowed rollup for late events.

No reference equivalent (the reference is batch-only dbt); this is the
extension surface for continuous pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from dbt_gdpr_anonymizer_spark.config import EngineSettings, settings
from dbt_gdpr_anonymizer_spark.policy import TablePolicy, mask_model
from dbt_gdpr_anonymizer_spark.sources.ingest import SEED_SCHEMA

__all__ = [
    "read_seed_stream",
    "read_rate_events_stream",
    "parse_kafka_events",
    "EVENTS_PAYLOAD_SCHEMA",
    "stream_anonymize",
    "write_stream_parquet",
    "windowed_event_rollup",
    "stream_exact_dedup",
    "stream_scrub_text",
]


def read_seed_stream(
    spark: SparkSession, path: str, schema: T.StructType = SEED_SCHEMA
) -> DataFrame:
    """File-source stream of seed-shaped JSONL/CSV drops. Explicit schema —
    streaming reads never infer."""
    return spark.readStream.schema(schema).json(path)


def read_rate_events_stream(
    spark: SparkSession,
    rows_per_second: int = 1000,
    *,
    micro_batch: bool = False,
) -> DataFrame:
    """Unbounded message-bus-shaped source: Spark's built-in ``rate``
    source (monotonic ``timestamp``/``value`` at a fixed rate) projected
    into the events shape (event_id, user_id, event_type, ts, value).

    This is the stand-in for a Kafka/queue source in environments without
    one: swapping in Kafka is only ``format("kafka")`` + payload parsing —
    every downstream operator (``windowed_event_rollup``,
    ``stream_exact_dedup``, ``stream_anonymize``) consumes the same
    unbounded DataFrame contract. The synthetic columns are deterministic
    functions of ``value``, so tests can assert exact results.

    ``micro_batch=True`` switches to the ``rate-micro-batch`` source,
    which emits a fixed ``rows_per_second`` rows PER BATCH from a pinned
    start timestamp — fully deterministic and immediate, where the plain
    wall-clock ``rate`` source emits nothing until real time elapses
    (an ``availableNow`` drain right after start sees zero rows)."""
    if micro_batch:
        src = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", str(rows_per_second))
            .option("startTimestamp", "0")
            .load()
        )
    else:
        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(rows_per_second))
            .load()
        )
    return src.select(
        F.col("value").alias("event_id"),
        (F.col("value") % 97).alias("user_id"),
        F.when(F.col("value") % 3 == 0, F.lit("click"))
        .when(F.col("value") % 3 == 1, F.lit("view"))
        .otherwise(F.lit("purchase"))
        .alias("event_type"),
        F.col("timestamp").alias("ts"),
        ((F.col("value") % 1000).cast("double") / 10.0).alias("value"),
    )


# JSON payload contract for message-bus event records (the producer-side
# twin of read_rate_events_stream's projection). `ts` travels as an
# ISO-8601 string — the portable wire form; parsed to TIMESTAMP here.
EVENTS_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def parse_kafka_events(
    records: DataFrame,
    *,
    payload_schema: T.StructType = EVENTS_PAYLOAD_SCHEMA,
) -> DataFrame:
    """Kafka record batch → the events contract.

    ``read_rate_events_stream`` documents that swapping in Kafka is
    "format + payload parsing only" — this is that parsing: it takes the
    Kafka wire shape (``value`` as binary JSON; key/topic/partition/offset
    ignored), casts binary → string, ``from_json`` with the EXPLICIT
    payload schema (streams never infer), and projects to the exact
    columns every downstream streaming operator consumes
    (event_id, user_id, event_type, ts timestamp, value double).

    Malformed payloads parse to a NULL struct under from_json's default
    PERMISSIVE handling and are dropped by the ``event_id IS NOT NULL``
    gate — a poison message skips one record, never kills the query.
    Works identically on batch and streaming DataFrames (so the unit test
    drives it with a literal byte fixture, no broker needed)::

        spark.readStream.format("kafka")...load()           # wire shape
          |> parse_kafka_events                              # this parser
          |> windowed_event_rollup / stream_anonymize / ...  # unchanged
    """
    parsed = records.select(
        F.from_json(F.col("value").cast("string"), payload_schema).alias("_p")
    )
    return parsed.select(
        F.col("_p.event_id").alias("event_id"),
        F.col("_p.user_id").alias("user_id"),
        F.col("_p.event_type").alias("event_type"),
        F.to_timestamp(F.col("_p.ts")).alias("ts"),
        F.col("_p.value").alias("value"),
    ).filter(F.col("event_id").isNotNull())


def stream_anonymize(
    stream: DataFrame,
    policy: TablePolicy,
    conf: EngineSettings | None = None,
) -> DataFrame:
    """Apply the policy rewriter to a streaming DataFrame.

    Masking is a stateless projection, so this is exactly ``mask_model`` —
    no state store, no watermark needed; every microbatch is masked
    independently and the plan stays inside codegen.
    """
    return mask_model(stream, policy, conf or settings())


def write_stream_parquet(
    masked: DataFrame, out_path: str, checkpoint: str, *, available_now: bool = False
) -> StreamingQuery:
    """Append-mode parquet sink with checkpointing (exactly-once file sink).
    ``available_now`` drains what exists then stops — batch-backfill mode."""
    writer = (
        masked.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_exact_dedup(
    stream: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop any document whose content fingerprint
    was already seen within the watermark horizon.

    The batch operator (``operators/dedup.exact_dedup``) groups the whole
    corpus; a stream can't — unbounded state. ``dropDuplicatesWithinWatermark``
    keyed on the fingerprint is the bounded-state primitive: fingerprint
    state older than max(event time) − ``watermark`` is evicted, so memory
    is O(docs per horizon), not O(stream length). (Plain ``dropDuplicates``
    only evicts when the event-time column is PART of the keys — keying on
    (fingerprint, ts) would defeat dedup.) Duplicates farther apart than
    the horizon pass through — the documented deliberate trade; widen the
    watermark, or run the batch operator over the sink, for stricter
    guarantees.
    """
    from dbt_gdpr_anonymizer_spark.functions import text as tx

    fingerprinted = stream.withColumn(
        "fingerprint", tx.doc_fingerprint(text_col)
    )
    return fingerprinted.withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(["fingerprint"])


def windowed_event_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    group_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window rollup for late-arriving events.

    The watermark bounds state: windows older than max(event time) -
    ``watermark`` are finalized and evicted, so state size is O(active
    windows), not O(stream length) — the property that keeps this runnable
    forever on a cluster.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("window"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            group_col,
            "n_events",
            "total_value",
        )
    )


def stream_scrub_text(
    stream: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Scrub free-text PII (emails, FR phones → redaction tags) on a
    stream. Like masking, scrubbing is a stateless projection
    (functions/text.py ``scrub_pii``), so the batch operator applies to a
    streaming DataFrame verbatim — no state, no watermark; each microbatch
    is scrubbed independently inside codegen.
    """
    from dbt_gdpr_anonymizer_spark.functions.text import scrub_pii

    return stream.withColumn(text_col, scrub_pii(text_col))
