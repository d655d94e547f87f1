"""Connected components over near-duplicate pairs — dedup clustering.

Near-duplicate detection yields PAIRS; corpus curation needs COMPONENTS
(the transitive closure: if A~B and B~C, one canonical doc should represent
{A,B,C} even when A~C was never scored).

Two forms:

* :func:`cc_exact_lazy` — a fully LAZY plan: the edge list (near-dup
  pairs — a tiny fraction of the corpus, LSH-candidate-sized) shuffles to
  one task which runs an exact union-find in a single Arrow-batched pass.
  Correct for ANY component diameter; scalability is bounded by the EDGE
  count, never the corpus.  Driver queries use this form (a ``queries()``
  entry must never run jobs at plan build time, and Spark has no lazy
  fixpoint operator — an unrolled join-per-round plan re-references its
  input 4x per round, exploding the logical tree exponentially, which is
  why that formulation is deliberately absent here).
* :func:`connected_components` — the unbounded-scale iterative form:
  min-label propagation with POINTER JUMPING (``label <- label(label)``
  composes the mapping with itself, doubling the propagation radius per
  round, so O(log diameter) rounds).  The symmetric edge set is
  checkpointed ONCE, hash-partitioned + sorted by ``src`` with the
  partitioning preserved into the checkpoint scan (r18,
  :func:`partitioned_edge_checkpoint`), so per round only the |V|-row
  labeling ever shuffles — broadcast when its exact count fits the
  session threshold (then the round plan carries ZERO shuffle
  exchanges and runs THREE propagation hops, cutting the round count
  ~3x), sort-merge against the pre-clustered edge side otherwise.
  ``localCheckpoint`` per round cuts lineage; ONE aggregate action per
  round materializes the checkpoint and doubles as the convergence
  certificate.  This is the same alternating-contraction idea as the
  large-star/small-star CC algorithm; use it when the dup-pair edge
  list itself outgrows one task (billions of edges).
* :func:`cc_auto` — the ACTION-path dispatcher: materializes the pair
  list once, counts it, and picks the single-task form below
  :data:`CC_SINGLE_TASK_MAX_EDGES` edges and the distributed form above.
  ``build_training_set`` (the production composition) routes through
  this, so a web-scale dup-pair list never funnels into one task.
"""

from __future__ import annotations

import logging
import math
import os
from collections.abc import Iterator
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seisdb_spark.plancheck import final_plan

_LOG = logging.getLogger(__name__)
_RELEASE_FAILED_ONCE = False

#: Executed per-round plans of the LAST :func:`connected_components` run
#: (one entry per propagation round), captured for the scale harness: the
#: returned labeling's plan only shows a projection over the last
#: checkpointed iterate — the neighbour-min + pointer-jump joins execute
#: behind localCheckpoint boundaries during the loop, so a predicate that
#: reads only the final plan would certify nothing about the supersteps
#: that dominate the cost (the KCORE_ROUND_PLANS discipline).
CC_ROUND_PLANS: list[str] = []

#: Monotone suffix for the per-round temp-view names (:func:`_cc_round`):
#: unique per call so concurrent loops in one session (driver-thread
#: overlap, guide §2.6) can never read each other's bindings.
_CC_VIEW_SEQ = 0


def release_checkpoint(df: DataFrame) -> None:
    """Unpersist the checkpointed RDD behind a localCheckpoint DataFrame.

    A long propagation/peel cascade otherwise holds every superseded
    round's blocks for the query lifetime (r14 advice).  Safe ONLY for
    checkpoints the caller created and will never read again: a
    localCheckpointed RDD has no lineage to recompute from once its
    blocks are dropped.

    A py4j surface drift (``queryExecution().analyzed().rdd()`` moving)
    would silently turn every release into a no-op and let long cascades
    re-accumulate blocks — so the first failure logs loudly (once per
    process; r15 advice), and ``tests/test_graph_scale_shapes.py`` pins
    that persistent-RDD count actually shrinks across a peel.

    Releasing also DEREGISTERS the df from the session-lifetime
    checkpoint list (``register_session_checkpoint``) when present:
    loop callers (sssp/bfs/wcc and the streaming twins) release their
    copurchase_edges copy at build time, and without the removal each
    fixpoint bench pass appended one dead DataFrame ref that only
    ``clear_plan_cache`` would prune — unbounded list growth in a
    long-lived service running loop queries between hook calls (r17
    advice)."""
    global _RELEASE_FAILED_ONCE
    try:
        lst = df.sparkSession.__dict__.get("_seisdb_session_checkpoints")
        if lst is not None:
            for i, tracked in enumerate(lst):
                if tracked is df:
                    del lst[i]
                    break
    except Exception:
        pass  # deregistration is best-effort; the unpersist below is the point
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        # non-checkpoint input / py4j drift: leak, don't crash — the
        # blocks die with the session either way.  But say so ONCE.
        if not _RELEASE_FAILED_ONCE:
            _RELEASE_FAILED_ONCE = True
            _LOG.warning(
                "release_checkpoint failed (py4j surface drift?) — "
                "superseded checkpoint blocks will accumulate for the "
                "session lifetime",
                exc_info=True,
            )


#: Conservative per-row footprint (bytes) assumed when gating a loop-state
#: broadcast: an UnsafeRow of two bigint fields is 8 (null bitset) + 16
#: (fields) = 24 bytes; 32 leaves headroom for the broadcast hash
#: relation's bucket array.  Deliberately pessimistic — over-estimating
#: only declines a profitable broadcast, never OOMs one.
LOOP_STATE_ROW_BYTES = 32


def _auto_broadcast_bytes(spark) -> int:
    """The session's own ``spark.sql.autoBroadcastJoinThreshold`` in bytes
    (0 when disabled/unparseable) — the gated-broadcast helpers below size
    against the SAME knob the planner uses, so one production setting
    governs both the optimizer's estimates and our exact-count hints."""
    raw = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    mult = 1
    for suf, m in (
        ("kb", 2**10), ("mb", 2**20), ("gb", 2**30), ("tb", 2**40),
        ("k", 2**10), ("m", 2**20), ("g", 2**30), ("t", 2**40), ("b", 1),
    ):
        if raw.endswith(suf):
            mult, raw = m, raw[: -len(suf)]
            break
    try:
        n = int(float(raw))
    except ValueError:
        return 0
    return max(n * mult, 0)


def hint_broadcast_if_small(df: DataFrame, n_rows: int | None) -> DataFrame:
    """Broadcast-hint a driver-loop's per-round small side when its KNOWN
    row count fits the session's broadcast threshold; otherwise return it
    unchanged.

    Why the hint is needed at all (guide §3.1): every loop's round state
    (labeling / cost table / frontier / survivor set) is a localCheckpoint,
    which scans as a LogicalRDD with UNKNOWN stats — the static planner
    can never pick the broadcast join itself, and AQE only rewrites
    SMJ -> BHJ after BOTH sides' exchanges have materialized, so the big
    (edge) side pays a full shuffle write per round for a join that ends
    up broadcast anyway (measured r18: ~0.4 s/round of the k-core peel at
    sf0.1 was exactly this).  The loops, unlike the planner, know the
    EXACT row count of their round state — the convergence certificate /
    frontier count they already compute — so the decision here is made
    from real numbers, sized against ``spark.sql.autoBroadcastJoinThreshold``
    (the one knob a production deployment already tunes).  Above the
    threshold — the 100 TB regime, e.g. the x1000 tier's 25.7M-vertex
    labeling — the input is returned unchanged and the round keeps the
    shuffle join that AQE skew-handles.  Pure strategy hint: join results
    are identical either way."""
    if n_rows is None:
        return df
    if n_rows * LOOP_STATE_ROW_BYTES <= _auto_broadcast_bytes(df.sparkSession):
        return F.broadcast(df)
    return df


#: Target bytes per partition of a loop's persisted edge checkpoint —
#: guide §2.2/§6: partitions in the 100 MB - 1 GB band, derived from the
#: ACTUAL row count rather than a constant tuned for one scale.  Env-
#: overridable for deployments with different executor memory budgets.
EDGE_PARTITION_TARGET_BYTES = int(
    os.environ.get("SEISDB_EDGE_PARTITION_BYTES", str(128 * 1024 * 1024))
)
#: Conservative serialized footprint of one symmetric edge row (2-3 bigint
#: fields as an UnsafeRow) used only for partition-count sizing.
EDGE_ROW_BYTES = 24
#: Parallelism floor granularity: one partition per this many edge rows,
#: capped at the session's core count — a 51k-row graph gets ONE task per
#: round (32 would pay 32x the scheduling for microsecond task bodies,
#: measured r18), a 2.4M-row graph ~10, and byte sizing takes over long
#: before the x1000 tier.
EDGE_ROWS_PER_TASK = 250_000


@contextmanager
def _aqe_off(spark):
    """Temporarily disable AQE while BUILDING a localCheckpoint.

    Why (guide §2.4, measured r18): ``Dataset.localCheckpoint`` preserves
    the physical plan's outputPartitioning into the checkpoint's
    LogicalRDD — but only when the plan is NOT wrapped in an
    AdaptiveSparkPlan (whose outputPartitioning is unknown before
    execution, so under AQE every checkpoint scans as
    UnknownPartitioning and every downstream keyed operator re-shuffles
    it).  Probed on this Spark: an AQE-off ``repartition(N, key)`` +
    localCheckpoint scans back as hashpartitioning(key, N) and a
    downstream (AQE-ON) groupBy/distinct/join on the key plans with ZERO
    Exchange.  The toggle covers only the checkpoint-build statement —
    the plans built inside are exchange-light by construction
    (repartition/explode/broadcast-hinted joins), so no AQE feature
    (skew split, SMJ->BHJ rewrite, coalescing) is lost where this is
    used."""
    key = "spark.sql.adaptive.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, old)


def edge_partitions(spark, n_rows: int, row_bytes: int = EDGE_ROW_BYTES) -> int:
    """Scale-adaptive partition count for a persisted edge checkpoint
    (guide §2.2) — the AQE-off build below cannot rely on AQE coalescing,
    so the count is derived from the MEASURED row count:

    * bytes ceiling: at least ``n_rows * row_bytes /
      EDGE_PARTITION_TARGET_BYTES`` partitions, so x1000-tier corpora get
      memory-sized sort runs (~450 at 2.4B rows);
    * parallelism floor: ~one partition per :data:`EDGE_ROWS_PER_TASK`
      rows, capped at the session's core count — enough tasks to use the
      machine on CPU-bound rounds without paying per-task scheduling for
      microsecond task bodies on small graphs (a flat shuffle.partitions
      floor made sf0.1 WCC rounds ~3x slower: 32 tasks x 5 stages x 7
      rounds of almost-empty work)."""
    try:
        cores = spark.sparkContext.defaultParallelism
    except Exception:
        cores = 8
    by_bytes = math.ceil(n_rows * row_bytes / EDGE_PARTITION_TARGET_BYTES)
    by_rows = min(cores, math.ceil(n_rows / EDGE_ROWS_PER_TASK))
    return max(by_bytes, by_rows, 1)


def symmetrize(edges: DataFrame, src: str, dst: str, *extra: str) -> DataFrame:
    """(u, v) -> both-direction (src, dst, *extra) rows via ONE explode —
    the union form scans its input twice per consumer; the explode form
    reads each checkpoint block once and generates both directions
    in-stage (guide §2.3: fewer bytes read per pass)."""
    both = F.array(
        F.struct(F.col(src).alias("src"), F.col(dst).alias("dst"), *extra),
        F.struct(F.col(dst).alias("src"), F.col(src).alias("dst"), *extra),
    )
    cols = ["e.src", "e.dst", *[f"e.{c}" for c in extra]]
    return edges.select(F.explode(both).alias("e")).select(*cols)


def partitioned_edge_checkpoint(
    df: DataFrame, key: str, n_rows: int, eager: bool = True
) -> DataFrame:
    """Materialize a loop's edge table hash-partitioned (and sorted) by its
    per-round JOIN key, with the partitioning PRESERVED into the
    checkpoint's LogicalRDD (see :func:`_aqe_off`).

    This is the 'persist the edges, shuffle only the state' superstep
    shape made literal: every round's edge-side join input is already
    clustered+sorted by the join key, so the per-round plan re-shuffles
    (and re-sorts, for sort-merge rounds at scale) only the loop STATE —
    at the x1000 tier that is 25.7M labels instead of 2.4B edge rows per
    round.  ``n_rows`` (the measured edge count) sizes the layout
    scale-adaptively via :func:`edge_partitions`."""
    spark = df.sparkSession
    n_part = edge_partitions(spark, n_rows)
    with _aqe_off(spark):
        return (
            df.repartition(n_part, key)
            .sortWithinPartitions(key)
            .localCheckpoint(eager=eager)
        )


_CC_SCHEMA = T.StructType(
    [
        T.StructField("v", T.LongType(), False),
        T.StructField("component", T.LongType(), False),
    ]
)


def undirect(pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """(a, b) pairs -> symmetric (src, dst) edge list."""
    a = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    b = pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return a.unionByName(b)


def cc_exact_lazy(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Exact connected components as one lazy plan: single-partition
    union-find with path compression over the edge list.  Returns
    (v, component) where component = min vertex id of v's component."""
    # repartition(1), not coalesce(1): coalesce is a narrow dependency that
    # would collapse the upstream verify-join stage into the same single
    # task; the explicit shuffle keeps candidate generation parallel and
    # single-threads only the union-find itself.
    edges = pairs.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).repartition(1)

    def union_find(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for pdf in batches:
            for a, b in zip(pdf["src"], pdf["dst"], strict=True):
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        comp = {v: find(v) for v in parent}
        yield pd.DataFrame(
            {"v": list(comp.keys()), "component": list(comp.values())}
        ).astype("int64")

    return edges.mapInPandas(union_find, _CC_SCHEMA)


def _cc_round_sql(e_view: str, m_view: str, broadcast_state: bool, hops: int) -> str:
    """The FULL propagation round (``hops`` neighbour-min hops + one
    pointer jump) as ONE SQL statement over two temp views.

    Why SQL and not the former per-hop DataFrame composition (r19, guide
    §7.3 — planning time itself as the bottleneck): every PySpark
    DataFrame transformation eagerly runs the analyzer over the whole
    accumulated tree, so a 3-hop round paid ~17 incremental analyses plus
    as many py4j round trips — measured 0.55 s of pure driver-side plan
    construction per WARM round at sf0.1, ~2x the round's entire
    distributed execution.  One ``spark.sql`` statement parses and
    analyzes the identical tree ONCE (probe: build 8.1 -> 3.6 s over a
    5-round loop, same session, results hash-identical and the executed
    round plan node-for-node the same — zero shuffle exchanges, same
    BroadcastHashJoin count, ReusedExchange still deduplicating the nb
    broadcast).  Per-round driver work is what bounds the loop at ANY
    data scale, so this is a 100 TB optimization, not an sf0.1 trick.

    Neighbour-min keying is by PHYSICAL regime, exactly as before (r18,
    guide §2.4):

    * ``broadcast_state``: the labeling is broadcast (gated on its exact
      count), so the join costs nothing either way — key on ``dst`` and
      aggregate by ``src``, the edge checkpoint's preserved partitioning
      key, making the aggregate EXCHANGE-FREE (the round plan carries
      zero shuffle exchanges).
    * otherwise (the 100 TB regime): key on ``src`` — the edge side of
      the sort-merge join is already clustered AND sorted by src (see
      :func:`partitioned_edge_checkpoint`), so only the |V|-row labeling
      shuffles per round; the aggregate (by dst) then moves map-side
      partial minima, bounded by |V| per partition, never edge rows.
      Scale rounds carry NO broadcast hints — the joins stay shuffle
      joins that AQE skew-handles."""
    cte: list[str] = []
    prev = m_view
    for h in range(1, hops + 1):
        if broadcast_state:
            nb = (
                f"nb{h} AS (SELECT /*+ BROADCAST({prev}) */ e.src AS v, "
                f"min({prev}.l) AS nb_l FROM {e_view} e "
                f"JOIN {prev} ON e.dst = {prev}.v GROUP BY e.src)"
            )
            m_hint = f"/*+ BROADCAST(nb{h}) */ "
        else:
            nb = (
                f"nb{h} AS (SELECT e.dst AS v, "
                f"min({prev}.l) AS nb_l FROM {e_view} e "
                f"JOIN {prev} ON e.src = {prev}.v GROUP BY e.dst)"
            )
            m_hint = ""
        cte.append(nb)
        cte.append(
            f"m{h} AS (SELECT {m_hint}{prev}.v, "
            f"least({prev}.l, coalesce(nb{h}.nb_l, {prev}.l)) AS l "
            f"FROM {prev} LEFT JOIN nb{h} ON {prev}.v = nb{h}.v)"
        )
        prev = f"m{h}"
    lk_hint = "/*+ BROADCAST(lk) */ " if broadcast_state else ""
    return (
        "WITH "
        + ",\n".join(cte)
        + f",\nlk AS (SELECT v AS lv, l AS ll FROM {prev})\n"
        + f"SELECT {lk_hint}{prev}.v, lk.ll AS l "
        + f"FROM {prev} JOIN lk ON {prev}.l = lk.lv"
    )


def _cc_round(
    m: DataFrame, edges: DataFrame, n_vertices: int | None = None
) -> DataFrame:
    """One propagation round: neighbour-min (twice in the broadcast
    regime) then pointer jump.

    ``m`` is the current labeling (v, l); ``edges`` is symmetric.  Labels
    are always existing vertex ids (they start as vertex ids and only ever
    copy), so the pointer-jump join is inner.

    ``n_vertices`` is the labeling's exact row count (the previous round's
    convergence-certificate count — constant across rounds): when it fits
    the session broadcast threshold, every state-side join in the round is
    broadcast (see :func:`hint_broadcast_if_small`) and the round runs
    THREE neighbour-min hops instead of one (r18 introduced two, r19
    measured three): with the state broadcast each extra hop is one more
    map pass over the in-memory edge checkpoint plus an exchange-free
    aggregate — nearly free — and fewer rounds beat cheaper rounds while
    driver-side planning + stage scheduling is the round cost floor
    (sf0.1 interleaved A/B: 2 hops = 7 rounds / 5.65 s, 3 hops = 5
    rounds / 5.02 s, 4 hops = 4 rounds / 6.14 s — per-round plan growth
    overtakes the saved actions at 4, so 3 is the measured optimum).
    Above the threshold (the 100 TB regime) every extra hop would
    multiply the per-round shuffle bytes to save a fraction of the
    rounds — a net loss — so scale rounds keep ONE hop; both regimes
    converge to the identical labeling (each hop is a value no-op at the
    fixpoint, and the certificate only reports convergence when a whole
    round changed nothing).

    The jump join references the post-min labeling ``m3`` on BOTH sides
    (probe + lookup).  That is NOT a double computation: Catalyst's
    ReuseExchange rule deduplicates the identical exchange subtrees, so
    the neighbour-min aggregate executes once per round and the second
    reference reads the reused shuffle/broadcast (verified in the
    captured round plans — ``ReusedExchange`` over the m3 subtree).
    One jump per round: r18 tried doubling it (label <- m1.l[m1.l[l]],
    shared lookup, broadcast reused) and round counts did NOT drop at
    either driver SF — the cascade is bounded by the neighbour-min's
    propagation radius, not label-tree height.

    The round is issued as ONE ``spark.sql`` statement over two
    uniquely-named temp views (r19; see :func:`_cc_round_sql` for the
    measured driver-planning rationale).  The views are dropped before
    returning — ``spark.sql`` analyzes eagerly, so the returned
    DataFrame no longer needs them."""
    spark = m.sparkSession
    broadcast_state = (
        n_vertices is not None
        and n_vertices * LOOP_STATE_ROW_BYTES <= _auto_broadcast_bytes(spark)
    )
    hops = 3 if broadcast_state else 1
    global _CC_VIEW_SEQ
    _CC_VIEW_SEQ += 1
    e_view = f"seisdb_cc_e_{_CC_VIEW_SEQ}"
    m_view = f"seisdb_cc_m_{_CC_VIEW_SEQ}"
    edges.createOrReplaceTempView(e_view)
    m.createOrReplaceTempView(m_view)
    try:
        return spark.sql(_cc_round_sql(e_view, m_view, broadcast_state, hops))
    finally:
        spark.catalog.dropTempView(e_view)
        spark.catalog.dropTempView(m_view)


def connected_components(
    pairs: DataFrame, src: str = "src", dst: str = "dst", max_rounds: int = 50
) -> tuple[DataFrame, int]:
    """Iterate :func:`_cc_round` over a pair list to the fixpoint (no label
    changed).  Returns ``(labels, rounds_run)``; labels are (v, component).

    The input may be directed and asymmetric: edges are symmetrized
    internally (labels propagate dst->src in :func:`_cc_round`, and the
    initial labeling is built from ``src`` — without symmetrization a
    dst-only vertex would silently never be labeled).  Each round
    localCheckpoints the labeling — cutting the lineage that would
    otherwise grow 4x per round.

    Convergence probe — the sssp certificate discipline: per-vertex
    labels are monotone NON-INCREASING across rounds (neighbour-min
    takes ``least``; the pointer jump maps l to m1's label for vertex l,
    itself <= l) over a CONSTANT vertex set (every label is an existing
    vertex id, so the jump's inner join drops nothing), so the
    (row count, BIGINT label sum) pair is unchanged iff NO label
    changed — and it comes from the SAME aggregate action that
    materializes the round's checkpoint.  This replaces the earlier
    nxt-join-previous probe, saving one |V|-row equi-join (two
    exchanges) per round.  Overflow headroom (the PageRank discipline):
    under ANSI mode (the Spark 4 default) an overflowing BIGINT sum
    raises mid-loop; under non-ANSI it wraps mod 2^64, and a wrap could
    fake convergence only if one round's TOTAL label decrease were an
    exact positive multiple of 2^64 — impossible while |V| * max(vertex
    id) < 2^64 (the x1000 tier is ~2.6e10 ids * 2.6e7 vertices ~ 7e17).
    The precondition is GUARDED at runtime, not just documented (r17
    advice): the seed aggregate takes try_sum (NULL, never a raise, on
    overflow) plus max(l) — the max VERTEX id, since labels only
    decrease — and the loop refuses to run when |V| * max_id >= 2^63
    (the conservative signed bound), converting both failure modes
    (ANSI mid-loop raise, non-ANSI silent wrap) into one principled
    early refusal; densely re-map vertex ids first (zipWithIndex /
    hash-rank) at that scale.  Past the guard, every round's sum is
    bounded by the seed sum (labels are non-increasing), so the plain
    F.sum in the loop can neither raise nor wrap.

    Each round's executed plan is appended to :data:`CC_ROUND_PLANS`
    for the scale harness (the final labeling's plan cannot show the
    propagation joins), and the superseded previous round's
    checkpointed blocks are released once the round's aggregate has
    materialized its successor (the k-core discipline: driver state is
    one (count, sum) pair + the CURRENT labeling; a 50-round cascade
    must not hold 50 rounds of blocks)."""
    CC_ROUND_PLANS.clear()
    # count the pair list first (cheap: materializes the caller's lazy
    # checkpoint, which the symmetrize below reads anyway) so the
    # symmetric edge checkpoint's partition count is sized from the REAL
    # row count (guide §2.2) — and lay it out hash-partitioned + sorted
    # by src with the partitioning preserved into the checkpoint scan,
    # so scale-regime rounds never re-shuffle or re-sort the edge side
    # and broadcast-regime rounds get exchange-free neighbour-min
    # aggregates (see partitioned_edge_checkpoint).
    n_pairs = pairs.count()
    edges = partitioned_edge_checkpoint(
        symmetrize(pairs, src, dst), "src", 2 * n_pairs
    )
    m = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("v"), F.col("src").alias("l"))
        # lazy: the seed aggregate below is the materializing action —
        # an eager build here would pay one extra job for the same pass
        .localCheckpoint(eager=False)
    )
    seed = m.agg(
        F.count(F.lit(1)),
        F.try_sum("l").cast("bigint"),  # NULL (not an ANSI raise) on overflow
        F.max("l").cast("bigint"),
    ).first()
    prev_cert = (seed[0], seed[1])
    n_vertices, max_id = int(seed[0] or 0), int(seed[2] or 0)
    if n_vertices * max_id >= 2**63:
        # the (count, label-sum) certificate is only wrap-sound while the
        # true label sums stay representable; refuse rather than risk a
        # silently faked convergence on a future huge-id tier (r17 advice)
        release_checkpoint(edges)
        release_checkpoint(m)
        raise ValueError(
            "connected_components certificate precondition violated: "
            f"|V| ({n_vertices}) * max vertex id ({max_id}) >= 2^63 — "
            "densely re-map vertex ids before clustering at this scale"
        )
    for i in range(1, max_rounds + 1):
        nxt_join = _cc_round(m, edges, n_vertices)
        nxt = nxt_join.localCheckpoint(eager=False)
        cert = tuple(
            nxt.agg(F.count(F.lit(1)), F.sum("l").cast("bigint")).first()
        )
        CC_ROUND_PLANS.append(final_plan(nxt_join))
        release_checkpoint(m)  # the aggregate materialized nxt
        m = nxt
        if cert == prev_cert:
            release_checkpoint(edges)  # the labeling no longer reads it
            return m.select("v", F.col("l").alias("component")), i
        prev_cert = cert
    # non-convergence: nothing useful survives the raise, so release the
    # symmetrized edge set AND the last labeling before failing — the
    # convergence path releases edges but this path otherwise leaked both
    # for the session lifetime (r16 advice).
    release_checkpoint(edges)
    release_checkpoint(m)
    raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")


#: Above this many verified dup pairs, :func:`cc_auto` switches from the
#: single-task union-find to distributed pointer jumping.  At ~16 bytes of
#: Arrow payload per edge plus a Python dict entry (~100 bytes) per touched
#: vertex, 5M edges bounds the single task around a GB — comfortably inside
#: one executor core; a web-scale corpus's billions of pairs are not.
CC_SINGLE_TASK_MAX_EDGES = 5_000_000


def cc_auto(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_single_task_edges: int = CC_SINGLE_TASK_MAX_EDGES,
) -> DataFrame:
    """Connected components for ACTION paths: materialize the pair list
    once (localCheckpoint — it feeds both the count and the chosen CC
    form without recomputing the LSH verify), count it, and dispatch:
    single-task union-find when the edge list fits one task, distributed
    pointer jumping when it doesn't.  Runs jobs — never use in a lazy
    ``queries()`` plan builder (those hard-code :func:`cc_exact_lazy`)."""
    edges = pairs.select(
        F.col(src).cast("long").alias(src), F.col(dst).cast("long").alias(dst)
    ).localCheckpoint(eager=True)
    if edges.count() <= max_single_task_edges:
        return cc_exact_lazy(edges, src, dst)
    labels, _rounds = connected_components(edges, src, dst)
    return labels
