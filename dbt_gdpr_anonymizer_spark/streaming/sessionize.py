"""Sessionization: native session windows + custom stateful operators.

Three tiers, matching how real pipelines choose:

* ``session_window_rollup`` — Spark's native ``F.session_window`` (gap-based
  merging). Works identically on batch DataFrames and streams (with a
  watermark); state is managed by the engine. Use this unless the session
  semantics are custom.

* ``streaming_sessionize_custom`` — ``applyInPandasWithState``: arbitrary
  per-key state in Python over Arrow batches, for semantics the built-in
  window cannot express (e.g. emit-on-close with custom close rules).
  Sessions close when a later event arrives past the gap; the open session
  stays in the state store. State per key is O(1) (just the open session's
  aggregates), so a million-key stream holds a million small rows of state.

* ``stream_sessionize`` — the same custom state PLUS an event-time timeout
  wired to the watermark: idle sessions close too, so state is evicted
  and output is complete under bounded lateness. Oracle-checked end to
  end by the ``stream_sessionize_events`` registry entry.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "session_window_rollup",
    "streaming_sessionize_custom",
    "stream_sessionize",
]


def session_window_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key session aggregates via native session windows: events within
    ``gap`` of each other merge; window end = last event + gap.

    On a stream pass ``watermark`` so the engine can finalize and evict
    sessions; on batch leave it None. Output: key, session_start,
    session_end, n_events.
    """
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


_SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)
# open-session state: (start_us, last_us, n_events)
_SESSION_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def streaming_sessionize_custom(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
) -> DataFrame:
    """Emit CLOSED sessions per user via ``applyInPandasWithState``.

    A session closes when a later event arrives more than ``gap_minutes``
    after the session's last event; the still-open session survives in the
    state store across microbatches. Events are processed in event-time
    order within each batch; late events older than the open session's last
    timestamp extend/merge conservatively (they count into the open
    session) — replace with custom logic as needed; that freedom is the
    point of the custom-state tier.
    """
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key: Any, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        closed: list[tuple[int, int, int, int]] = []
        for pdf in pdfs:
            ts_us = (
                pdf["ts"].astype("int64").sort_values()
            )  # event-time order within batch
            for t in ts_us:
                t = int(t) // 1000  # Arrow timestamps arrive as int64 ns
                if start_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    closed.append((user_id, start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
                else:
                    # a late in-gap event can precede the open session's
                    # start — the session extends BACKWARDS
                    start_us = min(start_us, t)
                    last_us = max(last_us, t)
                    n += 1
        state.update((start_us, last_us, n))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [
                        pd.Timestamp(c[1], unit="us") for c in closed
                    ],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        _SESSION_OUTPUT,
        _SESSION_STATE,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# Third tier: custom state + EVENT-TIME TIMEOUT. streaming_sessionize_custom
# (above) closes sessions only when a later event arrives; with a watermark
# wired to GroupStateTimeout.EventTimeTimeout, idle sessions also close —
# bounded state AND complete output under bounded lateness. This is the
# oracle-checked variant (`stream_sessionize_events` in the registry).
# ---------------------------------------------------------------------------

_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
_STATE_SCHEMA = "start bigint, last bigint, n bigint"


def _session_fn(gap_micros: int):
    """Per-group state transition (closure over the gap). State:
    (start, last, n) in epoch MICROS — integers round-trip exactly
    through the state store.

    r12 (guide §4.2 — vectorize inside the Python boundary): the per-key
    Python time dominated the drain (allUpdatesTimeMs ≈ 8.6 s summed per
    batch at sf0.1/8 partitions), so the per-element work is vectorized:
    one numpy floor-divide + C-level sort replaces the per-row
    ``int(v) // 1000`` genexp, and emitted frames are built from int64 /
    datetime64[us] arrays instead of per-row ``pd.Timestamp`` objects
    (same naive-UTC exact-micros values — ``.astype("int64")`` on the
    nanosecond Arrow series and the ``// 1000`` floor are unchanged)."""

    def fn(key, pdfs, state) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def emit(rows: list) -> "pd.DataFrame":
            # rows: [(start_us, last_us, n)] — exact micros as int64,
            # reinterpreted as naive datetime64[us] (no float, no tz)
            a = np.asarray(rows, dtype="int64")
            return pd.DataFrame(
                {
                    "user_id": np.full(len(rows), user_id, dtype="int64"),
                    "session_start": a[:, 0].view("datetime64[us]"),
                    "session_end": a[:, 1].view("datetime64[us]"),
                    "n_events": a[:, 2],
                }
            )

        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield emit([(start, last, n)])
            return

        parts = [
            # Arrow timestamps arrive as int64 NANOS → exact micros
            pdf["ts"].astype("int64").to_numpy() // 1000
            for pdf in pdfs
        ]
        arr = parts[0] if len(parts) == 1 else np.concatenate(parts)
        arr.sort()
        ts = arr.tolist()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts[0], ts[0] - 1, 0  # last < first event
        closed = []
        for t in ts:
            if t - last > gap_micros and n > 0:
                closed.append((start, last, n))
                start, n = t, 0
            # applyInPandasWithState delivers LATE rows too (it does not
            # watermark-filter the input): an in-gap event earlier than
            # the open session's start extends the session backwards
            start = min(start, t)
            last = max(last, t)
            n += 1
        state.update((start, last, n))
        # the open session times out when the watermark passes last + gap.
        # Clamp above the current watermark: for a session whose newest
        # event is already older than watermark − gap (late rows again),
        # the raw value would be ≤ the watermark, which Spark rejects with
        # IllegalArgumentException and kills the query; the clamped
        # timeout fires at the next watermark advance — exactly when an
        # at-watermark timeout would have fired.
        timeout_ms = (last + gap_micros) // 1000 + 1
        state.setTimeoutTimestamp(
            max(timeout_ms, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield emit(closed)

    return fn


def stream_sessionize(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming session windows: one row per CLOSED session
    (user_id, session_start, session_end, n_events).

    A session closes two ways, both deterministic under the watermark:
    in-stream (a later event of the same user arrives > gap after the
    previous one — emitted with the triggering batch) or by EVENT-TIME
    TIMEOUT (the watermark passes last_ts + gap with no new event —
    emitted by the first trigger after the watermark advance; availableNow
    drains run the final no-data batch, so finite replays flush eligible
    timeouts). Sessions still open when a drain ends stay in state and are
    NOT emitted — exactly what a resumed query needs.

    Late rows: ``applyInPandasWithState`` does NOT drop events below the
    watermark (unlike the native ``session_window`` aggregation), so the
    transition function handles them explicitly — an in-gap late event
    extends the open session backwards (``start = min(start, t)``), and
    the timeout timestamp is clamped above the current watermark (a raw
    ``last + gap`` for a very-late key would be ≤ the watermark, which
    Spark rejects). Results therefore depend on arrival order only in the
    way any watermarked stream does: what has already been EMITTED stays
    emitted; a late event that misses its closed session starts a new one.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = events.select(
        F.col(user_col).cast("bigint").alias("user_id"),
        F.col(ts_col).alias("ts"),
    ).withWatermark("ts", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60_000_000),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
