"""Stream-stream interval join: correlate two live event streams within a
bounded event-time window (clicks in the hour before each purchase, ad
impressions before conversions, …) without ever materializing either side.

This is the STREAMING twin of ``operators/relational.interval_join`` — the
batch operator buckets time to turn a range join into an equi-join; the
streaming one instead leans on Spark's stream-stream join state store:
both sides are watermarked, the range condition bounds how long a row can
possibly match, and Spark derives per-side state-eviction watermarks from
that condition — state is O(lookback × arrival rate), not O(stream
length). No reference counterpart (the reference is batch-only DuckDB
SQL); semantics pinned by the DuckDB oracle on the replayed batch.

Correctness window (inner join): a left row at time t is needed while
right rows with ts ∈ [t, t + lookback] can still arrive, i.e. until the
watermark passes t + lookback. Choosing ``watermark ≥ lookback + max
arrival disorder`` guarantees no needed state is evicted early, so the
drained result equals the batch range join exactly — that equality IS the
registry oracle check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_interval_join"]


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Inner-join two STREAMING frames on ``on`` where the left row's
    event time falls in ``[right_ts − lookback, right_ts]``.

    Both sides get the same watermark delay; the join condition carries
    the event-time range so Spark can compute state watermarks for both
    sides (without it, stream-stream join state grows unboundedly and
    the query is rejected). Columns from both sides survive with their
    original names except ``on``/timestamps, which are disambiguated as
    ``left_``/``right_`` prefixed outputs. Payload column names must
    therefore be DISJOINT between the two sides (and must not collide
    with the internal ``_lk``/``_lts``/``_rk``/``_rts`` staging names) —
    a collision is rejected up front with a ValueError naming the
    offending columns, instead of surfacing later as Spark's opaque
    ambiguous-reference error.

    Scale: state per key is bounded by rows inside the watermark
    horizon; the join itself is the standard symmetric hash join over
    the key — one shuffle per side, skew governed by the key's arrival
    distribution (salt upstream for hot keys, same as batch).

    ``how="left_outer"`` / ``"right_outer"`` adds the watermark-gated
    null emission: an outer-side row's null-padded result is emitted
    only when its state is EVICTED — i.e. once the watermark proves no
    future match can arrive (for the right/outer side here: watermark >
    row ts, from the range condition). Until then the row sits in
    state; a drain's final rows younger than the eviction horizon never
    emit their null form. Outer stream-stream joins REQUIRE the
    watermark + time-range condition; Spark rejects them otherwise.
    """
    left_payload = [c for c in left.columns if c not in (on, left_ts)]
    right_payload = [c for c in right.columns if c not in (on, right_ts)]
    shared = sorted(set(left_payload) & set(right_payload))
    if shared:
        raise ValueError(
            "stream_interval_join: payload column(s) present on BOTH sides "
            f"would be ambiguous in the output: {shared}; rename one side "
            "before joining"
        )
    reserved = sorted(
        (set(left_payload) | set(right_payload))
        & {"_lk", "_lts", "_rk", "_rts"}
    )
    if reserved:
        raise ValueError(
            "stream_interval_join: payload column(s) collide with internal "
            f"staging names: {reserved}; rename them before joining"
        )
    l = left.withWatermark(left_ts, watermark).select(
        F.col(on).alias("_lk"),
        F.col(left_ts).alias("_lts"),
        *[c for c in left.columns if c not in (on, left_ts)],
    )
    r = right.withWatermark(right_ts, watermark).select(
        F.col(on).alias("_rk"),
        F.col(right_ts).alias("_rts"),
        *[c for c in right.columns if c not in (on, right_ts)],
    )
    cond = (
        (l["_lk"] == r["_rk"])
        & (l["_lts"] >= r["_rts"] - F.expr(f"interval {lookback}"))
        & (l["_lts"] <= r["_rts"])
    )
    return l.join(r, cond, how).select(
        # coalesce: under outer joins the preserved side carries the key
        F.coalesce(F.col("_lk"), F.col("_rk")).alias(on),
        F.col("_lts").alias(f"left_{left_ts}"),
        F.col("_rts").alias(f"right_{right_ts}"),
        *[c for c in left.columns if c not in (on, left_ts)],
        *[c for c in right.columns if c not in (on, right_ts)],
    )
