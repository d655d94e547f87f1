"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.10: the API for operators Spark's built-in streaming aggregations
can't express — arbitrary per-key state with explicit update logic).

The demonstrator keeps running per-user totals across microbatches: state is
a (n_events, sum_value) pair per user_id, updated from each batch's Arrow
frames and emitted as the user's current cumulative totals. The same shape
carries any per-key accumulator — e.g. a per-GLL-point partial series
builder, or a per-user sessionizer with richer semantics than
session_window.

Scale posture: state lives in the state store keyed by the groupBy key —
distributed across executors, checkpointed per batch; only the touched keys'
state is loaded per microbatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [total]}
    )


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, sum) maintained in explicit state; emits
    the updated totals for every user touched by each microbatch
    (outputMode 'update')."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
