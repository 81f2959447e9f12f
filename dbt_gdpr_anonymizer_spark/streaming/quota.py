"""Per-key streaming quota gate on the transformWithState API (X142).

The streaming twin of the batch per-domain cap (operators/web.domain_cap):
admit at most ``quota`` events per key ACROSS microbatches, with the
running admitted-count held in the state store. This is the
rate-limit/dedup-budget shape every streaming ingestion tier needs (cap
per crawl host, per user, per API key) — unbounded sources make the batch
row_number answer impossible, so the count must live in keyed state.

Implemented on Spark 4's ``transformWithStateInPandas`` — the successor
API to ``applyInPandasWithState`` (SPARK-49564): an object-oriented
``StatefulProcessor`` with named, schema'd state variables
(``getValueState``), optional TTL, and Arrow-batched row delivery. The
repo's sessionizer (streaming/sessionize.py) covers the legacy API; this
operator certifies the new one end to end so both stateful tiers are
proven. State per key is ONE bigint — watermark/TTL-independent, bounded
by key cardinality, and the processor emits admitted rows only (append
mode), so downstream sinks see an already-capped stream.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

__all__ = ["QuotaProcessor", "stream_quota_gate"]


class QuotaProcessor(StatefulProcessor):
    """Admit the first ``quota`` rows per key (arrival order); drop the
    rest. Running count survives in a ValueState across microbatches."""

    def __init__(self, quota: int, order_col: str | None = None):
        if quota < 1:
            raise ValueError(f"QuotaProcessor: quota must be >= 1, got {quota}")
        self._quota = quota
        self._order_col = order_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("admitted", "n bigint")

    def handleInputRows(
        self, key: Any, rows: Iterator["pd.DataFrame"], timerValues: Any
    ) -> Iterator["pd.DataFrame"]:
        n = self._count.get()
        n = 0 if n is None else int(n[0])
        for pdf in rows:
            if n >= self._quota:
                n += len(pdf)  # still count arrivals (admitted_total cert)
                continue
            if self._order_col is not None:
                pdf = pdf.sort_values(self._order_col, kind="mergesort")
            take = pdf.iloc[: max(0, self._quota - n)]
            n += len(pdf)
            if len(take):
                yield take
        self._count.update((n,))

    def close(self) -> None:
        pass


def stream_quota_gate(
    events: DataFrame,
    key_col: str,
    *,
    quota: int,
    output_schema: str,
    order_col: str | None = None,
) -> DataFrame:
    """Cap a (possibly streaming) DataFrame at ``quota`` admitted rows per
    ``key_col``. ``output_schema`` must be the DDL of the input columns
    being passed through (transformWithState requires an explicit output
    schema). ``order_col`` optionally pins intra-batch admit order (the
    state-carried count makes CROSS-batch order arrival-deterministic
    regardless).

    DEPENDENCY GATE: the transformWithState Python driver worker speaks a
    protobuf state-server protocol — ``google.protobuf`` must be
    installed (it ships with any real PySpark 4 deployment; absent in
    hermetic containers). Raises ImportError eagerly with the swap-in
    named rather than crashing the streaming query mid-run; use
    :func:`stream_quota_gate_legacy` where protobuf is unavailable.
    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs the google.protobuf package "
            "(state-server protocol); install protobuf or use "
            "stream_quota_gate_legacy (applyInPandasWithState tier)"
        ) from e
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=QuotaProcessor(quota, order_col),
        outputStructType=output_schema,
        outputMode="append",
        timeMode="none",
    )


def stream_quota_gate_legacy(
    events: DataFrame,
    key_col: str,
    *,
    quota: int,
    output_schema: str,
    order_col: str | None = None,
) -> DataFrame:
    """Same per-key quota contract on the legacy
    ``applyInPandasWithState`` API (no extra dependency, default state
    store) — the tier proven end to end in this container. State is the
    same single bigint per key."""
    import pandas as pd

    if quota < 1:
        raise ValueError(f"stream_quota_gate_legacy: quota >= 1, got {quota}")

    def fn(key: Any, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            if n >= quota:
                n += len(pdf)
                continue
            if order_col is not None:
                pdf = pdf.sort_values(order_col, kind="mergesort")
            take = pdf.iloc[: max(0, quota - n)]
            n += len(pdf)
            if len(take):
                yield take
        state.update((n,))

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        output_schema,
        "n bigint",
        outputMode="append",
        timeoutConf="NoTimeout",
    )
