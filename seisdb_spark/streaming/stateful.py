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


# --- transformWithStateInPandas (Spark 4 arbitrary-stateful v2) -----------
TYPE_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _make_type_totals_processor():
    """Build the StatefulProcessor lazily (the class lives in a module that
    exists only on Spark >= 4.0)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TypeTotals(StatefulProcessor):
        """Running (count, sum) per event_type in a ValueState — the
        transformWithState successor to applyInPandasWithState: typed
        composable state handles (value/list/map), timers, and TTL support
        instead of one opaque state tuple."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, sum_value DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"event_type": [key[0]], "n": [n], "sum_value": [total]}
            )

        def close(self) -> None:
            pass

    return TypeTotals()


def running_type_totals_tws(events: DataFrame) -> DataFrame:
    """Per-event-type cumulative (count, sum) via transformWithStateInPandas
    (Spark 4's arbitrary-stateful v2 API): ValueState keyed by event_type,
    one update row per touched key per microbatch. State distributes by the
    groupBy key across executors exactly like the v1 operator; the typed
    handle API additionally supports list/map state, timers, and TTL for
    richer operators on the same layout.

    ENV-GATED: the v2 state-server protocol requires ``google.protobuf``,
    which this container does not provide (its driver worker crashes at
    startup otherwise — fail loudly and early instead). The v1 operator
    (:func:`running_user_totals_stream`) is the fully tested stateful path;
    the batch-equivalence test runs this one whenever protobuf is present."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf (the state "
            "server protocol), which this environment does not provide; "
            "use running_user_totals_stream (applyInPandasWithState) instead"
        ) from exc
    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=_make_type_totals_processor(),
        outputStructType=TYPE_TOTALS_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
