"""Arbitrary stateful processing v2 (Spark 4 `transformWithStateInPandas`).

The reference's record-sync keeps its per-device "what have I already
written" watermark by re-reading the sink (pipeline.py:97-99 twin);
round 1 rebuilt that as `applyInPandasWithState`. Spark 4 ships the
successor API — `StatefulProcessor` with named, independently-typed
state variables, timers, and TTL — which is where new custom stateful
operators should land: state schema evolves per-variable instead of
one monolithic tuple, and the runtime can expire state without the
operator hand-rolling timeout bookkeeping.

This module ports the *running per-user totals* semantics (the T5
exactly-once counter) to the v2 API: one `ValueState` holding
(n_events, total_value), updated per micro-batch, emitting the
post-batch totals for every user seen in the batch — the streaming
twin of `q_lifetime_summary`'s batch aggregation.

100 TB posture: state is two numbers per user key, hash-partitioned
by the stream's groupBy — RocksDB state backend holds billions of
keys; emission is one row per active key per batch, so downstream
sinks see update-mode deltas, never a full state dump.

Environment note: the v2 state protocol rides google.protobuf, which
this container does not ship — the pytest skip-gates on that import
(tests/test_streaming.py::test_running_totals_stateful_v2), and the
applyInPandasWithState twins (streaming/sessionize.py,
streaming/anomaly.py) carry the executable custom-stateful coverage
here. On a standard cluster (protobuf present) this module runs as
written.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

TOTALS_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("total_value", T.DoubleType(), False),
])

_TOTALS_STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType(), True),
    T.StructField("total_value", T.DoubleType(), True),
])


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user lifetime (count, value-sum) in a named ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _TOTALS_STATE_SCHEMA)

    def handleInputRows(
        self,
        key: tuple[Any, ...],
        rows: Iterator[pd.DataFrame],
        timerValues: Any,
    ) -> Iterator[pd.DataFrame]:
        n, total = (self._totals.get() or (0, 0.0)) if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            if len(pdf):
                n += int(len(pdf))
                total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
            }
        )

    def close(self) -> None:
        pass


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Streaming running totals per user via stateful processing v2.

    ``events`` is a streaming DataFrame with at least
    (user_id long, value double). Returns update-mode rows
    (user_id, n_events, total_value) — the lifetime totals after each
    micro-batch, exactly-once under checkpointing because state and
    offsets commit atomically (the fix for reference
    pipeline.py:562-568's read-modify-write race, v2 form)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=TOTALS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
