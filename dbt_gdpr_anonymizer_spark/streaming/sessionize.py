"""Sessionization: native session windows + a custom stateful operator.

Two tiers, matching how real pipelines choose:

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
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["session_window_rollup", "streaming_sessionize_custom"]


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
