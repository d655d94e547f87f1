#!/usr/bin/env python
"""Interleaved same-session A/B: one k-core peel per driver action (r18
shape) vs TWO peels per action in the broadcast regime (r19 candidate —
the WCC three-hop mechanism applied to the peel loop: each extra peel in
a round is one more map pass over the in-memory survivor checkpoint plus
exchange-free aggregates and broadcast builds, and the round count is
what pays the per-action driver floor).

Value safety: peeling is monotone (survivor edges only shrink) and
idempotent at the fixpoint, so an unchanged edge count across a whole
batch certifies that EVERY peel in it changed nothing; peels past the
fixpoint are identity. The peel budget (max_peels) is still enforced on
TOTAL peels, so the non-convergence raise semantics vs the unrolled
oracle are unchanged.

Asserts identical membership tables before timing."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from seisdb_spark.functions.graph import (  # noqa: E402
    LOOP_STATE_ROW_BYTES,
    _aqe_off,
    _auto_broadcast_bytes,
    hint_broadcast_if_small,
    partitioned_edge_checkpoint,
    release_checkpoint,
    symmetrize,
)
from seisdb_spark.queries.graph_queries import (  # noqa: E402
    KCORE_K,
    KCORE_MAX_PEELS,
    copurchase_edges,
    kcore_core,
)
from seisdb_spark.session import get_spark  # noqa: E402
from seisdb_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ACTIONS = {"old": [], "new": []}


def kcore_batched(edges, k=KCORE_K, max_peels=KCORE_MAX_PEELS, batch=2):
    """kcore_core with `batch` peels per driver action in the broadcast
    regime (scale regime keeps one peel per action, as before)."""
    spark = edges.sparkSession
    n_canonical = edges.count()
    e = partitioned_edge_checkpoint(
        symmetrize(edges, "u", "v"), "src", 2 * n_canonical, eager=False
    )
    first = e.agg(
        F.count(F.lit(1)).alias("m"), F.countDistinct("src").alias("nv")
    ).first()
    m, n_nodes = int(first[0] or 0), int(first[1] or 0)
    broadcast_keep = (
        n_nodes * LOOP_STATE_ROW_BYTES <= _auto_broadcast_bytes(spark)
    )
    e_owned = True
    peels_left = max_peels
    n_actions = 0
    converged = False
    while peels_left > 0 and not converged:
        if m == 0:
            converged = True
            break
        this_batch = min(batch, peels_left) if broadcast_keep else 1
        peels_left -= this_batch
        e2_join = e
        for _ in range(this_batch):
            keep = (
                e2_join.groupBy("src")
                .agg(F.count(F.lit(1)).alias("d"))
                .where(F.col("d") >= k)
                .select("src")
            )
            keep_u = hint_broadcast_if_small(
                keep, n_nodes if broadcast_keep else None
            )
            keep_v = hint_broadcast_if_small(
                keep.withColumnRenamed("src", "dst"),
                n_nodes if broadcast_keep else None,
            )
            e2_join = (
                e2_join.join(keep_u, "src").join(keep_v, "dst").select("src", "dst")
            )
        if broadcast_keep:
            with _aqe_off(spark):
                e2 = e2_join.localCheckpoint(eager=False)
        else:
            e2 = e2_join.localCheckpoint(eager=False)
        m2 = e2.count()
        n_actions += 1
        if m2 == m:
            release_checkpoint(e2)
            converged = True
            break
        if e_owned:
            release_checkpoint(e)
        e, m, e_owned = e2, m2, True
    if not converged:
        raise RuntimeError("k-core did not converge within the peel budget")
    ACTIONS["new"].append(n_actions)
    return (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .select(F.col("src").cast("bigint").alias("part_id"), "core_degree")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-kcore-batch")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, SF_DIR, "lineitem")

    def run_old():
        e = copurchase_edges(li)
        try:
            return kcore_core(e)
        finally:
            release_checkpoint(e)

    def run_new():
        e = copurchase_edges(li)
        try:
            return kcore_batched(e)
        finally:
            release_checkpoint(e)

    a = sorted(map(tuple, run_old().collect()))
    b = sorted(map(tuple, run_new().collect()))
    assert a == b, "MEMBERSHIP DIFFERS — abort"
    print(f"results identical ({len(a)} rows)")

    t_old, t_new = [], []
    for _ in range(n):
        t0 = time.perf_counter()
        run_old().count()
        t_old.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_new().count()
        t_new.append(time.perf_counter() - t0)
    print(f"actions/run (new batched): {ACTIONS['new'][-1]}")
    print(
        f"old median {statistics.median(t_old):.3f} {sorted(round(t, 3) for t in t_old)}"
    )
    print(
        f"new median {statistics.median(t_new):.3f} {sorted(round(t, 3) for t in t_new)}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
