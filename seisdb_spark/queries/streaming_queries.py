"""Driver-facing entries for the Structured Streaming variants: each runs
the stream to completion (availableNow trigger, memory sink) and returns the
final result table, so the driver's DuckDB oracle can hash-compare it like
any batch query — streamed-vs-batch equivalence IS the correctness claim.

The long-running form (real triggers, watermark-driven append emission,
foreachBatch snapshot ingest into the encode tail) lives in
``seisdb_spark.streaming`` and is batch-equivalence tested in
tests/test_streaming.py.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession

from seisdb_spark.queries.registry import REGISTRY, query
from seisdb_spark.streaming import (
    read_events_stream,
    run_to_memory,
    sessionize_stream,
    tumbling_counts_stream,
)

_run_counter = itertools.count()


def _unique(name: str) -> str:
    # memory-sink query names are session-global; keep re-runs collision-free
    return f"{name}_{next(_run_counter)}"


@query(
    "streaming_tumbling_counts",
    oracle=REGISTRY["tumbling_window_counts"].oracle,
    doc="Structured Streaming twin of tumbling_window_counts: file-source "
    "stream over the events table, 2h watermark, 1h tumbling event-time "
    "windows, availableNow to a memory sink. Same oracle as the batch twin "
    "— the hash match proves stream==batch on complete data. State is keyed "
    "by (window, event_type): distributed, watermark-bounded.",
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = tumbling_counts_stream(read_events_stream(spark, sf_dir))
    return run_to_memory(stream, _unique("drv_tumbling"))


@query(
    "streaming_sessionize",
    oracle=f"""
        SELECT user_id, n_events, session_start, session_end
        FROM ({REGISTRY["sessionize_events"].oracle})
    """,
    doc="Structured Streaming sessionization via the built-in "
    "session_window (30 min gap, 2h watermark), availableNow to a memory "
    "sink. Oracle = the batch lag+running-sum sessionizer minus its ordinal "
    "session_id — identical session boundaries is the equivalence claim.",
)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = sessionize_stream(read_events_stream(spark, sf_dir))
    return run_to_memory(stream, _unique("drv_sessions"))
