"""Custom stateful streaming operator via applyInPandasWithState:
running per-key totals that survive across micro-batches.

This is the escape hatch for operators Structured Streaming's built-in
aggregations can't express (arbitrary per-key state machines). State is
per key, Arrow-batched, and bounded by key cardinality — the watermark/
timeout config governs eviction in production."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events_total", LongType()),
        StructField("sum_value_total", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        (n, s) = state.get
    else:
        n, s = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events_total": [n], "sum_value_total": [s]}
    )


def running_user_totals(stream_df: DataFrame) -> DataFrame:
    """Emit one updated (user_id, running count, running sum) row per
    key per micro-batch. Input needs columns user_id, value."""
    return (
        stream_df.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            RUNNING_TOTALS_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------

try:  # the new API ships with Spark 4; guard so Spark 3 sessions degrade
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotalsProcessor(StatefulProcessor):
        """Per-user running (count, sum) — the transformWithState twin
        of ``running_user_totals``. ValueState replaces the tuple-state
        plumbing of applyInPandasWithState, and the handle surface
        (list/map state, timers, TTL) is what arbitrary per-key state
        machines get beyond the legacy API."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, s DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            if self._totals.exists():
                n, s = self._totals.get()
            else:
                n, s = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events_total": [n],
                    "sum_value_total": [s],
                }
            )

        def close(self) -> None:
            pass

    def running_user_totals_tws(stream_df: DataFrame) -> DataFrame:
        """transformWithStateInPandas version of running_user_totals:
        same output contract (one updated row per key per micro-batch),
        built on the Spark 4 arbitrary-state operator. State lives in
        the state store per (key, operator), Arrow-batched; TTL and
        event-time timers are available on the same handle when
        production eviction policies are needed.

        Runtime requirements: the RocksDB state store provider
        (``spark.sql.streaming.stateStore.providerClass``) and the
        ``protobuf`` package (the python<->JVM state-server protocol);
        tests/test_transform_with_state.py skips when either is
        absent."""
        return (
            stream_df.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=_RunningTotalsProcessor(),
                outputStructType=RUNNING_TOTALS_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )

except ImportError:  # pragma: no cover - Spark < 4 fallback
    running_user_totals_tws = None
