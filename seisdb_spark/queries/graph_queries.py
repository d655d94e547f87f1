"""Graph-analytics surface beyond connected components: fixed-point
PageRank over the part-supplier bipartite graph.

functions/graph.py gives the engine pointer-jumping connected components
(the dedup-cluster workhorse); this module adds the OTHER canonical
distributed graph primitive — iterative rank propagation — expressed as a
fixed number of unrolled DataFrame join+aggregate rounds, which is exactly
how PageRank runs on any Spark cluster (GraphX/GraphFrames do the same
join-shuffle per superstep under the hood).

Exact-integer discipline: ranks live in BIGINT "nano-rank" units
(initial rank 10^9 per node) and every per-edge contribution is a BIGINT
floor division (``pr div out_degree`` — truncation == floor for the
all-positive ranks here), so three iterations produce bit-identical
BIGINTs on any engine and the result value-hashes.  The float form's
sum-order drift is structurally impossible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seisdb_spark.queries.registry import query
from seisdb_spark.sources.tables import load_table

#: nano-rank scale: initial mass per node.
PR_SCALE = 1_000_000_000
#: damping 0.85 split into the exact-integer base + factor.
PR_BASE = 150_000_000  # (1 - 0.85) * PR_SCALE
PR_ITERS = 3
PR_TOPK = 20


def _pagerank_oracle() -> str:
    base = f"""
        WITH pairs AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        ), e AS (
            SELECT 2 * l_partkey AS src, 2 * l_suppkey + 1 AS dst FROM pairs
            UNION ALL
            SELECT 2 * l_suppkey + 1, 2 * l_partkey FROM pairs
        ), deg AS (
            SELECT src, count(*) AS d FROM e GROUP BY src
        ), it0 AS (
            SELECT src AS node, CAST({PR_SCALE} AS BIGINT) AS pr FROM deg
        )"""
    for i in range(1, PR_ITERS + 1):
        base += f""", it{i} AS (
            SELECT e.dst AS node,
                   CAST({PR_BASE} + (85 * sum(r.pr // deg.d)) // 100
                        AS BIGINT) AS pr
            FROM e
            JOIN it{i - 1} r ON e.src = r.node
            JOIN deg ON e.src = deg.src
            GROUP BY e.dst
        )"""
    return base + f"""
        SELECT node AS node_id,
               CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END
                   AS node_kind,
               pr AS pr_nano
        FROM it{PR_ITERS}
        ORDER BY pr DESC, node
        LIMIT {PR_TOPK}
    """


@query(
    "graph_pagerank_topk",
    oracle=_pagerank_oracle(),
    doc="FIXED-POINT PAGERANK, TOP-K (iterative rank propagation — the "
    "graph-analytics class connected components does not cover): the "
    "part-supplier bipartite graph from DISTINCT lineitem pairs, "
    "symmetrized (node ids 2*part / 2*supplier+1, so every node has "
    "out-degree >= 1 and the edge set is closed), run for exactly 3 "
    "damped iterations in BIGINT nano-rank fixed point: contribution = "
    "pr div out_degree (floor), new pr = 0.15e9 + (85 * sum) div 100 — "
    "all-integer, so both engines produce bit-identical ranks and the "
    "top-20 (rank desc, node id) value-hashes exactly.  Spark shape: "
    "the oracle's CTE chain IS the Spark plan — per iteration ONE "
    "src-keyed equi-join (ranks are |nodes| rows, edges the big side) "
    "plus ONE dst-keyed combiner aggregate; out-degrees come from a "
    "src-partitioned window so the join reuses that partitioning.  At "
    "100 TB the edge table is persisted once and every superstep "
    "shuffles only the rank table — implemented: the edge+degree table "
    "is a lazy localCheckpoint, built the first time the plan executes "
    "and joined by every superstep after that.  TakeOrdered bounds the "
    "driver transfer to k rows.",
    bench=True,
)
def graph_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    fwd = pairs.select(
        (2 * F.col("l_partkey")).alias("src"),
        (2 * F.col("l_suppkey") + 1).alias("dst"),
    )
    rev = pairs.select(
        (2 * F.col("l_suppkey") + 1).alias("src"),
        (2 * F.col("l_partkey")).alias("dst"),
    )
    edges = fwd.unionByName(rev).select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    )
    # out-degree via a src-partitioned window: the per-iteration rank join
    # then lands on already-co-located keys instead of adding a deg join.
    # The edge table is a lazy localCheckpoint (the heavy_hitters vocab
    # precedent — contract-safe, nothing runs at plan-build time): it
    # materializes the first time the plan executes and every superstep
    # joins the persisted copy instead of re-running the lineitem scan +
    # distinct + degree window — the 'persist the edges, shuffle only
    # ranks' shape every production PageRank uses.  (Under the registry
    # plan cache the checkpoint then lives for the session, so repeat
    # executions of the same handle skip the edge build too; the tier
    # harness evicts per pass and pays it every run.)
    edges_deg = edges.withColumn(
        "d", F.count(F.lit(1)).over(Window.partitionBy("src"))
    ).localCheckpoint(eager=False)
    # seed from the CHECKPOINTED table — seeding from `edges` would
    # re-run the raw lineage once more per action just to list the nodes
    ranks = edges_deg.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(PR_SCALE).cast("bigint").alias("pr")
    )
    for _ in range(PR_ITERS):
        contribs = edges_deg.join(
            ranks, edges_deg.src == ranks.node
        ).select("dst", F.expr("pr div d").alias("c"))
        ranks = contribs.groupBy("dst").agg(
            (
                F.lit(PR_BASE) + F.expr("(85 * sum(c)) div 100")
            ).cast("bigint").alias("pr")
        ).select(F.col("dst").alias("node"), "pr")
    return (
        ranks.select(
            F.col("node").alias("node_id"),
            F.when(F.col("node") % 2 == 0, F.lit("part"))
            .otherwise(F.lit("supplier"))
            .alias("node_kind"),
            F.col("pr").alias("pr_nano"),
        )
        .orderBy(F.desc("pr_nano"), "node_id")
        .limit(PR_TOPK)
    )
