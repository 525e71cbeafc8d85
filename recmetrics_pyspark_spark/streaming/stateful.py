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
