"""Structured Streaming ingest: watermarked event-time windows over the
events stream, and a SPECFEM snapshot file stream feeding the batch encode
tail via foreachBatch.

Design notes (100 TB posture):
  * Event aggregations keep state keyed by (window, event_type) /
    (user_id, session) — the same shuffle keys as the batch twins, so state
    distributes across executors; the watermark bounds state size.
  * Snapshot ingest is decode-only per microbatch (narrow, no shuffle):
    files land, are decoded by the SAME mapInPandas kernels as the batch
    scan (sources/specfem.py), and append to a staging table. The wide
    assembly/encode runs once at finalize over the staging table — the
    correct split because SGT encoding needs each point's FULL time series
    (a per-key sort over all steps), which a running stream cannot emit
    incrementally without holding every sample in state anyway.
"""

from __future__ import annotations

import os
import threading
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seisdb_spark.schemas import STRAIN_SCHEMA, STRAIN_PARAS
from seisdb_spark.sources.specfem import N_GLL_PER_ELEMENT, SNAPSHOT_RE, decode_strain

# A streaming file source needs its schema up front; the events table's
# physical ts layout has drifted upstream once already (timestamp[ns] in
# rounds 1-4, timestamp[us] since), so read_events_stream probes the
# batch-resolved schema per layout (tables.events_ts_layout) and picks the
# matching stream schema: TIMESTAMP_NTZ / TIMESTAMP for modern layouts, or
# the legacy raw-int64-nanos schema below — in which case the nanosAsLong
# conf must stay set for the stream's lifetime (each microbatch re-reads
# footers) and is restored via a StreamingQueryListener once the session's
# last active stream terminates. Batch loaders scope the conf per-read.
_EVENTS_FIELDS_AROUND_TS = (
    [T.StructField("event_id", T.LongType())],
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ],
)


def _events_schema(ts_type: T.DataType) -> T.StructType:
    pre, post = _EVENTS_FIELDS_AROUND_TS
    return T.StructType(pre + [T.StructField("ts", ts_type)] + post)


EVENTS_RAW_SCHEMA_LEGACY_NANOS = _events_schema(T.LongType())

BINARYFILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"
_nanos_lock = threading.Lock()
#: sessions whose nanosAsLong conf is currently held open for a stream:
#: id(session) -> mutable [listener, prior_value, generation].  The
#: generation bumps on every re-assert, so a termination event that raced
#: a newly built (not yet started) stream defers its restore to the next
#: termination instead of yanking the conf from under the new stream.
_nanos_holds: dict[int, list] = {}


def _hold_nanos_conf(spark: SparkSession) -> None:
    """Set nanosAsLong for a stream's lifetime and arrange restoration:
    a StreamingQueryListener restores the prior value when the session's
    LAST active streaming query terminates (the conf must hold while any
    stream that read it is running — microbatches re-read parquet footers).
    If the caller never starts the stream, the conf stays set until some
    stream runs and terminates; batch reads stay safe via
    ``tables.load_table``, which scopes the conf per read."""
    from pyspark.sql.streaming import StreamingQueryListener

    with _nanos_lock:
        hold = _nanos_holds.get(id(spark))
        if hold is not None:
            hold[2] += 1  # a new consumer under the same hold
            spark.conf.set(_NANOS_CONF, "true")
            return
        prior = spark.conf.get(_NANOS_CONF, None)
        spark.conf.set(_NANOS_CONF, "true")

        class _Restore(StreamingQueryListener):
            seen_gen = 0

            def onQueryStarted(self, event):  # noqa: D102
                pass

            def onQueryProgress(self, event):  # noqa: D102
                pass

            def onQueryIdle(self, event):  # noqa: D102
                pass

            def onQueryTerminated(self, event):  # noqa: D102
                with _nanos_lock:
                    cur = _nanos_holds.get(id(spark))
                    if cur is None or cur[0] is not self:
                        return
                    # a stream built after this listener last looked may not
                    # have started yet; defer restore to its termination
                    if cur[2] != self.seen_gen:
                        self.seen_gen = cur[2]
                        return
                    if spark.streams.active:
                        return
                    _nanos_holds.pop(id(spark), None)
                    if prior is None:
                        spark.conf.unset(_NANOS_CONF)
                    else:
                        spark.conf.set(_NANOS_CONF, prior)
                spark.streams.removeListener(self)

        listener = _Restore()
        spark.streams.addListener(listener)
        _nanos_holds[id(spark)] = [listener, prior, 0]


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the events table with event-time ``ts``.

    Probes the batch-resolved ts layout once (tables.events_ts_layout) and
    declares the matching stream schema — a user-supplied schema on a file
    stream is NOT validated against the footers, so a layout mismatch here
    is a silent-wrong-answer bug, not a crash (round 4 shipped exactly that:
    int64-physical timestamp[us] read through a Long-nanos schema compressed
    every event time 1000x).  For the legacy timestamp[ns] layout this sets
    ``spark.sql.legacy.parquet.nanosAsLong=true`` for the stream's lifetime
    and RESTORES the prior value once the session's last active stream
    terminates (see :func:`_hold_nanos_conf`).
    """
    from seisdb_spark.sources.tables import events_ts_layout

    layout, _ = events_ts_layout(spark, os.path.join(sf_dir, "events.parquet"))
    # the file stream source lists a DIRECTORY; pathGlobFilter narrows it to
    # the events file (a single-file path is rejected: basePath must be a dir)
    def _stream(schema: T.StructType) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )

    if layout == "native":
        return _stream(_events_schema(T.TimestampType()))
    if layout == "ntz":
        # session tz is UTC (session.py): NTZ -> TIMESTAMP is wall-clock
        # identity, and keeps windows/watermarks on one timestamp type.
        raw = _stream(_events_schema(T.TimestampNTZType()))
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    _hold_nanos_conf(spark)
    raw = _stream(EVENTS_RAW_SCHEMA_LEGACY_NANOS)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


DOCUMENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


EMBEDDINGS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def read_embeddings_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the embeddings table — the arriving-vector
    side of streaming quantize-on-ingest (no timestamp columns, no conf
    side effects)."""
    return (
        spark.readStream.schema(EMBEDDINGS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )


def read_documents_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the documents table — the arriving-corpus
    side of streaming curation (no timestamp columns, no conf side
    effects)."""
    return (
        spark.readStream.schema(DOCUMENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def tumbling_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of queries/relational.py::tumbling_window_counts —
    1-hour tumbling event-time windows; the watermark lets append-mode sinks
    finalize a window 2h after its end while bounding state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming sessionization via the built-in session_window: events
    within ``gap`` of each other merge into one growing session per user.

    Semantics note vs the batch twin (lag + running-sum, gap *strictly*
    greater than 30 min starts a new session): session_window's interval is
    half-open, so two events exactly 30:00.000000 apart are the same session
    in batch but different sessions here — an edge that cannot occur at
    microsecond resolution with the driver's generator and is asserted
    equivalent in tests/test_streaming.py."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "n_events", "session_start", "session_end")
    )


def sliding_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding event-time windows (1 hour long, every 30 minutes — each
    event lands in 2 overlapping windows). Same state shape as the tumbling
    variant, 2x the state keys; the watermark bounds both identically."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: first arrival of each event_id wins, later
    duplicates are dropped. The watermark bounds the seen-keys state — ids
    older than the watermark are evicted, so state is O(events per 2h), not
    O(all history). Emits the surviving rows (append semantics)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def enrich_stream_static(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static join: each microbatch of events joins the (batch)
    customer dimension on user_id == c_custkey, then aggregates per market
    segment. The static side is broadcast — the stream never shuffles for
    the join, only for the final segment aggregate."""
    dim = F.broadcast(
        customers.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    return (
        events.join(dim, "user_id")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink and return the result table — the test/driver harness path."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def snapshot_ingest_stream(
    spark: SparkSession,
    force_dirs: list[str],
    nspec: int,
    staging_dir: str,
    checkpoint_dir: str,
    name_data: str = "strain_field",
    max_files_per_trigger: int = 3,
):
    """Stream SPECFEM snapshot files as they land (S6 streaming variant):
    binaryFile source per force dir -> the SAME strain decode kernel as the
    batch scan -> append to a staging parquet table via foreachBatch.

    Returns the started StreamingQuery; callers trigger availableNow (tests)
    or leave it running (production). Decode is narrow — each microbatch is
    files-in, long-rows-out, no shuffle, no state."""
    force_by_dir = {os.path.normpath(d): i for i, d in enumerate(force_dirs)}

    streams = []
    for d in force_dirs:
        glob = os.path.join(d, f"proc*_{name_data}_Step_*.bin")
        streams.append(
            spark.readStream.format("binaryFile")
            .schema(BINARYFILE_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .load(glob)
            .select("path", "content")
        )
    binaries = streams[0]
    for s in streams[1:]:
        binaries = binaries.unionByName(s)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                m = SNAPSHOT_RE.search(os.path.basename(path))
                if not m:
                    continue
                proc, step = int(m.group(1)), int(m.group(3))
                force = force_by_dir[os.path.normpath(os.path.dirname(path.removeprefix("file:")))]
                full = decode_strain(bytes(content), nspec)
                nsp = full.shape[1]
                ncell = nsp * N_GLL_PER_ELEMENT
                cols = {
                    "proc": np.full(ncell, proc, dtype=np.int32),
                    "force": np.full(ncell, force, dtype=np.int32),
                    "step": np.full(ncell, step, dtype=np.int32),
                    "i_spec": np.repeat(np.arange(nsp, dtype=np.int32), N_GLL_PER_ELEMENT),
                    "i_gll": np.tile(np.arange(N_GLL_PER_ELEMENT, dtype=np.int32), nsp),
                }
                for i, para in enumerate(STRAIN_PARAS):
                    cols[para] = full[i].ravel()
                yield pd.DataFrame(cols)

    decoded = binaries.mapInPandas(decode, STRAIN_SCHEMA)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(staging_dir)

    return (
        decoded.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def finalize_sgt_from_staging(
    spark: SparkSession,
    staging_dir: str,
    model_glob: str,
    nspec: int,
    step0: int,
    step1: int,
    dstep: int,
    points_per_element: int = 27,
    encoding_level: int | None = None,
):
    """Run the batch assembly + encode tail over the streamed-in staging
    table. Steps valid = present in all 3 forces *in the staged data* (the
    staging table is the listing); otherwise identical to pipeline.sgt_build."""
    from seisdb_spark.pipeline.build import (
        add_start_offsets,
        assemble_series,
        encode_records,
        select_gll_points,
    )
    from seisdb_spark.schemas import ENCODING_LEVEL_DEFAULT
    from seisdb_spark.sources.specfem import read_ibool

    snaps = spark.read.parquet(staging_dir)
    candidates = list(range(step0, step1, dstep))
    steps = (
        snaps.select("proc", "step", "force")
        .distinct()
        .filter(F.col("step").isin(candidates))
        .groupBy("proc", "step")
        .agg(F.countDistinct("force").alias("nf"))
        .filter(F.col("nf") == 3)
        .select("proc", "step")
    )
    ibool = read_ibool(spark, model_glob, nspec)
    points = select_gll_points(ibool, points_per_element)
    series = assemble_series(snaps, points, steps, kind="SGT")
    level = ENCODING_LEVEL_DEFAULT if encoding_level is None else encoding_level
    return add_start_offsets(encode_records(series, level))


def novelty_probe(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    batch_pred=None,
) -> DataFrame:
    """Ingest-path NOVELTY scoring: each arriving document is scored by the
    fraction of its distinct word shingles ABSENT from the static corpus's
    gram inventory — the streaming reading of
    queries/extensions.py::ngram_novelty_score, with the semantics shifted
    the way ingest requires: novelty is measured against the EXISTING
    corpus (batch docs never interact), not against ingestion order inside
    one batch.

    Streaming-curation conventions shared with the incremental-dedup probe
    (queries/streaming_queries.py::streaming_incremental_dedup):

    * the static corpus is doc_id % 10 != 0; the arriving batch is
      doc_id % 10 == 0 (override via ``batch_pred``);
    * the corpus gram inventory is computed ONCE and persisted across
      microbatches (Spark never reuses exchanges across foreachBatch
      actions); production writes it as a gram-bucketed parquet table so
      the per-batch membership join prunes buckets instead of scanning;
    * per-batch results land in a batch_id-derived OVERWRITE path —
      idempotent under checkpoint-recovery replays (foreachBatch is
      at-least-once per batch_id);
    * per-batch cost scales with the batch: the batch gram set is the
      (small) build side of the membership join, the corpus side is
      pruned/streamed, never collected.

    Returns the union of all batch outputs:
    (doc_id, n_shingles, n_novel, novelty).
    """
    import os
    import shutil

    from seisdb_spark.functions.text import shingle_tokens
    from seisdb_spark.sources.tables import load_table

    if batch_pred is None:
        batch_pred = F.col("doc_id") % 10 == 0

    corpus = load_table(spark, sf_dir, "documents").filter(~batch_pred)
    corpus_grams = (
        shingle_tokens(corpus).select("sh").distinct()
        .withColumn("in_corpus", F.lit(1))
        .persist()
    )

    shutil.rmtree(out_root, ignore_errors=True)
    scores_dir = os.path.join(out_root, "scores")
    ckpt = os.path.join(out_root, "ckpt")

    def probe(bdf: DataFrame, batch_id: int) -> None:
        batch = bdf.filter(batch_pred)
        bsh = shingle_tokens(batch)
        novel = F.sum(F.when(F.col("in_corpus").isNull(), 1).otherwise(0))
        (
            bsh.join(corpus_grams, "sh", "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_shingles"),
                novel.cast("long").alias("n_novel"),
                F.round(
                    novel.cast("double") / F.count(F.lit(1)), 6
                ).alias("novelty"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(scores_dir, f"batch-{batch_id}"))
        )

    q = (
        read_documents_stream(spark, sf_dir)
        .writeStream.foreachBatch(probe)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        corpus_grams.unpersist()
    return spark.read.schema(
        "doc_id long, n_shingles long, n_novel long, novelty double"
    ).parquet(os.path.join(scores_dir, "batch-*"))


def read_lineitem_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the lineitem table — the arriving edge-
    observation side of the streaming PageRank edge-log twin.  Same
    batch-resolved-schema + drift-tripwire discipline as
    ``read_orders_stream`` (a user-supplied schema on a file stream is
    not validated against the footers)."""
    from seisdb_spark.sources.tables import check_table_schema

    path = os.path.join(sf_dir, "lineitem.parquet")
    schema = spark.read.parquet(path).schema
    check_table_schema("lineitem", schema, path)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "lineitem.parquet")
        .parquet(sf_dir)
    )


def read_orders_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the orders table — the arriving change-log
    side of the streaming SCD2 build.  The stream schema is the BATCH-
    resolved schema of the same files (one footer probe), never a
    hard-coded one: a user-supplied schema on a file stream is not
    validated against the footers, so a drifted physical layout (the
    events.ts lesson) would be a silent-wrong-answer bug here too."""
    from seisdb_spark.sources.tables import check_table_schema

    path = os.path.join(sf_dir, "orders.parquet")
    schema = spark.read.parquet(path).schema
    # the same one-line drift tripwire every batch load applies — a
    # drifted physical layout must fail HERE, not deep inside scd2_deltas
    check_table_schema("orders", schema, path)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "orders.parquet")
        .parquet(sf_dir)
    )
