"""Streaming CUSUM drift gate: the ONLINE deployment of the batch
two-sided CUSUM chart (operators/timeseries.cusum_fold — Page 1954),
as a per-key stateful operator on ``applyInPandasWithState``.

The batch chart measures deviations against the series' own mean; a
stream cannot know its mean ahead, so the deployed form scores against
a FIXED trained reference rate ``ref = ref_num / ref_den`` (the
trained-model stance used by the Fellegi–Sunter weights: estimation is
offline, scoring is deterministic). Deviations scale by ``ref_den`` so
every state update is exact integer arithmetic:

  ``pos' = max(0, pos + ref_den·x − ref_num)``
  ``neg' = max(0, neg + ref_num − ref_den·x)``

State per key is two BIGINTs — a million-key stream holds a million
tiny state rows; rows emit 1:1 with input (append mode) carrying both
sides and the alarm flag, so downstream can route alarms without a
second pass.

Ordering contract: within a micro-batch each key's rows process in
``order_col`` order; across micro-batches, arrival order (the file
queue / offset order). That is the same cross-batch contract the quota
gate ships with — a total event-time order under late data needs the
watermark/transformWithState timer machinery and is a different
operator.

No DuckDB oracle: custom stateful streaming is the documented
non-SQL-expressible class — the end-to-end test drives real
micro-batches through the memory sink and compares against a pure
python fold of the same rows in the same order.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

__all__ = ["stream_cusum"]


def stream_cusum(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
    ref_num: int,
    ref_den: int = 1,
    threshold: int | None = None,
) -> DataFrame:
    """Per-key streaming two-sided CUSUM against the trained reference
    ``ref_num / ref_den``; emits every input row with its running
    (pos, neg) in ``ref_den``-scaled units plus ``alarm`` (1 when
    either side has reached ``threshold``, 0 otherwise; always 0 when
    no threshold is given). Key/order/value columns must be integral.
    """
    import pandas as pd

    if ref_den < 1:
        raise ValueError("stream_cusum: ref_den must be >= 1")
    num, den, thr = int(ref_num), int(ref_den), threshold

    def fn(
        key: Any, pdfs: Iterator["pd.DataFrame"], state
    ) -> Iterator["pd.DataFrame"]:
        sp, sn = state.get if state.exists else (0, 0)
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(order_col)
        out = []
        for x, o in zip(rows[value_col], rows[order_col]):
            x = int(x)
            d = den * x - num
            sp = max(0, sp + d)
            sn = max(0, sn - d)
            alarm = int(thr is not None and (sp >= thr or sn >= thr))
            out.append((int(key[0]), int(o), x, sp, sn, alarm))
        state.update((sp, sn))
        yield pd.DataFrame(
            out,
            columns=[
                key_col, order_col, value_col,
                "cusum_pos_dx", "cusum_neg_dx", "alarm",
            ],
        )

    out_schema = (
        f"{key_col} long, {order_col} long, {value_col} long, "
        "cusum_pos_dx long, cusum_neg_dx long, alarm int"
    )
    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        "sp long, sn long",
        "append",
        GroupStateTimeout.NoTimeout,
    )
