"""Scale-stress harness: empirical evidence for the 100 TB design claims.

Every "100 TB shape" claim in the operator docstrings is backed by
plan-shape assertions at sf0.1 (~17 MB).  This harness adds one order of
magnitude of EMPIRICAL scaling: it synthesizes a factor-N corpus from the
sf0.1 driver tables, re-times the heaviest pipelines at both scales, and
re-asserts the executed-plan shapes at the larger scale (broadcasts must
stay broadcasts, the packing shuffle must stay a single hash Exchange,
nothing may flip to a cartesian product).

Corpus construction (deterministic, no RNG state):
  * documents — replica 0 is the original; replica r suffixes every word
    with ``_r{r}``.  This preserves the length/language/dup-structure of
    each replica EXACTLY (the suffix map is a bijection on shingles) while
    sharing zero shingles across replicas — so the corpus-wide duplicate
    RATE is constant and ~linear runtime is the correct expectation.  Doc
    ids for replica r >= 1 are 10*orig + 1 + r*10^8 (== 1 mod 10): scaled
    replicas contribute NO holdout/batch docs, because production eval
    suites and ingest batches are constant-size regardless of corpus
    scale (round-8 change — see REPLICA_DOC_OFFSET; the proportional
    holdout previously OOMed the decon broadcast at x1000, a generator
    artifact).
  * embeddings — replica 0 original; replica r gets fresh pseudo-random
    vectors from a hash-sin generator (fract(sin(a*i + b*d + c) * 43758.5)
    — the classic shader hash), decorrelated from the originals so near-dup
    and cluster populations stay realistic instead of exploding with exact
    copies.
  * events — replica r shifts ts by r hours and offsets event/user ids, so
    per-user and per-window volumes stay constant while total volume scales.

Usage:
    python tools/scale_stress.py [--factor 10] [--out /tmp/seisdb_scale]
Writes BENCH_SCALE.json (machine) and refreshes the table in BENCH_SCALE.md
(human; committed).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from seisdb_spark.plancheck import count_exchanges, final_plan, has_node  # noqa: E402
from seisdb_spark.queries import REGISTRY  # noqa: E402
from seisdb_spark.sources.tables import load_table  # noqa: E402

SRC_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_OFFSET = 10**7  # multiple of DECON_BENCH_MOD: holdout fraction preserved


def _graph_round_plans_ok(attr: str) -> bool:
    """Assert graph_queries' captured driver-loop round plans (the peel /
    frontier supersteps run behind localCheckpoint boundaries at plan
    build — the final plan the harness sees cannot show them)."""
    from seisdb_spark.queries import graph_queries

    return graph_queries.round_plans_ok(getattr(graph_queries, attr))

#: The stress set: the heaviest composed pipelines + the two round-6 ops.
#: Each entry: name -> plan predicate (applied at BOTH scales).
STRESS_QUERIES = {
    "curation_keep_set": lambda p: not has_node(p, "CartesianProduct"),
    "dedup_cluster_components": lambda p: not has_node(p, "CartesianProduct"),
    "dedup_incremental_probe": lambda p: not has_node(p, "CartesianProduct"),
    # the probe set must stay a broadcast equi-join on the bucket key
    "ann_signbucket_topk": lambda p: has_node(p, "BroadcastHashJoin [bucket"),
    # the benchmark shingle set must stay broadcast (never corpus-shuffled)
    "decontamination_overlap": lambda p: has_node(p, "BroadcastHashJoin"),
    # the 1-row bloom words table arrives via broadcast nested-loop (a
    # single-row side, never a cartesian of real extents); survivors'
    # exact verify stays a broadcast hash join — the corpus side must
    # never shuffle before the bloom filter prunes it
    "bloom_decontamination": lambda p: (
        has_node(p, "BroadcastNestedLoopJoin")
        and has_node(p, "BroadcastHashJoin")
        and not has_node(p, "CartesianProduct")
        and not has_node(p, "SortMergeJoin")
    ),
    # exactly ONE shuffle (hash on shard), never a global range sort
    "sequence_packing": lambda p: (
        count_exchanges(p, key="shard") == 1
        and count_exchanges(p) == 1
        and not has_node(p, "rangepartitioning")
    ),
    "repeated_passage_spans": lambda p: not has_node(p, "CartesianProduct"),
    # seeds broadcast; assignment stays map-only (no per-vector argmax
    # Window — the round-6 n*K-row shuffle); no cartesian degeneration
    "semantic_dedup": lambda p: (
        has_node(p, "Broadcast")
        and not has_node(p, "CartesianProduct")
        and not has_node(p, "Window")
    ),
    # 1-row corpus stats must stay broadcast; top-k must stay TakeOrdered —
    # no keyed shuffle of corpus-sized data at any scale
    "bm25_topk": lambda p: (
        has_node(p, "TakeOrderedAndProject")
        and not has_node(p, "hashpartitioning")
        and not has_node(p, "rangepartitioning")
    ),
    # exactly the one groupBy(doc_id) shuffle of hashed-weight partial sums
    "quality_classifier_score": lambda p: (
        count_exchanges(p, key="doc_id") == 1
        and not has_node(p, "rangepartitioning")
    ),
    # the induced vocab must broadcast back; top-V must stay TakeOrdered
    "vocab_coverage": lambda p: (
        has_node(p, "BroadcastHashJoin")
        and has_node(p, "TakeOrderedAndProject")
        and not has_node(p, "CartesianProduct")
    ),
    # the audit is one shard-keyed aggregate — no window pass, no sort
    "packing_efficiency": lambda p: (
        count_exchanges(p, key="shard") == 1
        and not has_node(p, "rangepartitioning")
    ),
    # freq-table join may be broadcast OR shuffle (AQE picks by vocabulary
    # size — the flip at scale is the designed behavior); never cartesian
    "token_rarity_score": lambda p: (
        not has_node(p, "CartesianProduct")
        and not has_node(p, "rangepartitioning")
    ),
    # LM scoring: the 1-row vocab size arrives via broadcast nested-loop
    # (single-row side, fine); the two LM count-table joins are equi-
    # joins (AQE picks broadcast vs shuffle by vocabulary size, the
    # token_rarity_score contract); the per-doc rollup is a hash
    # exchange — never a cartesian, never a global sort.  The trained
    # model is localCheckpointed at plan build, so the harness ratio
    # times the SCORING scan (the term that scales); the train cost is
    # vocab-bounded either way.
    "ngram_lm_perplexity": lambda p: (
        has_node(p, "BroadcastNestedLoopJoin")
        and not has_node(p, "CartesianProduct")
        and not has_node(p, "rangepartitioning")
    ),
    # histogram quantile sketch: the (source, bin) partials aggregation
    # is the only corpus-keyed shuffle — everything after the histogram
    # collapse runs on <= 64-row frames (their tiny windows may sort,
    # which is why rangepartitioning is NOT forbidden here); never a
    # cartesian, never a Python boundary.
    "hist_quantile_rollup": lambda p: (
        has_node(p, "hashpartitioning(source")
        and not has_node(p, "CartesianProduct")
        and not has_node(p, "BatchEvalPython")
    ),
    # exact-vs-sketch quantile certification: BOTH paths key on source —
    # the sketch partials aggregate and the exact side's rank window are
    # source-hash-partitioned (the window sort is partition-local), the
    # est/exact join is an equi-join on (source, rank) — never a global
    # range sort, cartesian, or Python boundary; output is sources x
    # probes rows
    "quantile_exact_sketch_cert": lambda p: (
        has_node(p, "hashpartitioning(source")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "CartesianProduct")
        and not has_node(p, "BatchEvalPython")
    ),
    # E-S weighted sampling: one hash-partitioned per-lang window
    # (partition-local sort) — never a global range sort, never a
    # Python boundary; rejected rows never leave their partition.
    "weighted_sample_wor": lambda p: (
        has_node(p, "hashpartitioning(lang")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
        and not has_node(p, "CartesianProduct")
    ),
    # corpus collapses to source-sized rows before the 1-row total rejoins
    "source_mix_weights": lambda p: (
        has_node(p, "Broadcast") and not has_node(p, "CartesianProduct")
    ),
    # one corpus scan serves the whole query batch: queries table, per-term
    # df, and 1-row stats all broadcast; shuffles touch hit rows only
    "bm25_multiquery": lambda p: (
        has_node(p, "BroadcastHashJoin")
        and not has_node(p, "CartesianProduct")
        and not has_node(p, "rangepartitioning")
    ),
    # fusion of two BOUNDED top-10 lists — expensive work stays inside the
    # sub-pipelines; the fused re-rank must stay a TakeOrdered, no cartesian
    "hybrid_rrf_topk": lambda p: (
        has_node(p, "TakeOrderedAndProject")
        and not has_node(p, "CartesianProduct")
    ),
    # same candidates-only dedup shape plus candidate-sized split joins
    "split_leakage_audit": lambda p: (
        not has_node(p, "CartesianProduct")
        and not has_node(p, "rangepartitioning")
    ),
    # the PRODUCTION-V (32768) vocab audit, stressed on the vocab-rich
    # corpus (see RICHVOCAB below): the top-32768 selection must stay a
    # TakeOrderedAndProject (never a global sort / single-partition window
    # over the vocabulary) and the 32768-row induced vocab must still
    # broadcast back for the anti-membership sums
    "vocab_coverage_32k": lambda p: (
        has_node(p, "TakeOrderedAndProject")
        and has_node(p, "BroadcastHashJoin")
        and not has_node(p, "CartesianProduct")
        and not has_node(p, "rangepartitioning")
    ),
    # --- round-7 late additions -------------------------------------------
    # exactly ONE gram-key exchange serves the per-doc distinct AND the
    # first-owner window; the doc rollup re-shuffles partials only
    "ngram_novelty_score": lambda p: (
        count_exchanges(p, key="sh") == 1
        and not has_node(p, "rangepartitioning")
    ),
    # bucket stats + totals broadcast back; selection stays TakeOrdered —
    # never a corpus-wide rank window
    "dsir_importance_weights": lambda p: (
        has_node(p, "BroadcastHashJoin")
        and has_node(p, "TakeOrderedAndProject")
        and not has_node(p, "rangepartitioning")
    ),
    # vocab-table pair counts: top-K stays TakeOrdered, no global sort
    "bpe_merge_candidates": lambda p: (
        has_node(p, "TakeOrderedAndProject")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "CartesianProduct")
    ),
    # LSH blocking + per-candidate Levenshtein: candidate-bounded verify,
    # never cartesian, never a global sort
    "editdist_neardup_join": lambda p: (
        not has_node(p, "CartesianProduct")
        and not has_node(p, "rangepartitioning")
    ),
    # three bounded top-10 lists fused: the heavy lifting is inside the
    # sub-pipelines (each asserted separately); the eval must not introduce
    # a cartesian or a corpus-wide shuffle of its own
    "retrieval_eval_recall": lambda p: not has_node(p, "CartesianProduct"),
    # the cluster table is dup-rate-dependent, so its join must NOT carry
    # a mandatory broadcast hint (r7 verdict weak mark) — AQE is free to
    # broadcast when the runtime stats say it is small; the keep argmax
    # partitions by cluster — no global sort.  The no-hint property itself
    # is asserted on the analyzed plan in tests/test_extensions.py
    # (test_dedup_keep_best_no_forced_broadcast).
    "dedup_keep_best": lambda p: (
        not has_node(p, "CartesianProduct")
        and not has_node(p, "rangepartitioning")
    ),
    # stats collapse to EMBEDDING_DIM keys; the (mins, steps) row must
    # BROADCAST back and encoding must stay map-only — the only exchanges
    # are the dim-stats pair, never a per-vector shuffle
    "embedding_int8_quantize": lambda p: (
        has_node(p, "Broadcast")
        and not has_node(p, "CartesianProduct")
        and not has_node(p, "rangepartitioning")
        and count_exchanges(p, key="vec_id") == 0
    ),
    # sketch partials collapse to (lang, source) keys; the union-merge is
    # a lang-keyed exchange of kilobyte sketches; no sort, no cartesian
    "hll_sketch_rollup": lambda p: (
        not has_node(p, "CartesianProduct")
        and not has_node(p, "rangepartitioning")
    ),
    # exact top-K stays a TakeOrdered over the one vocab-key exchange;
    # the sketch agg adds no extra corpus shuffle; the capacity-sized
    # tracked list is semi-joined down to the K exact heavy-hitter words
    # BEFORE broadcasting, so the gate join's broadcast side is k rows
    # (not the up-to-1M-entry tracked list)
    "heavy_hitters_gate": lambda p: (
        has_node(p, "TakeOrderedAndProject")
        and has_node(p, "Broadcast")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "CartesianProduct")
    ),
    # tokenize-apply: the vocab segmentation is expression-only at the
    # demo merge count (no Python boundary; past the documented bound the
    # dispatcher switches to the Arrow kernel and MapInPandas would be
    # expected), the count join back to the corpus word stream stays an
    # equi-join, and nothing introduces a global sort.  NOTE the timed
    # collect covers the APPLY pipeline; the 8-iteration training loop
    # runs at plan-build time (untimed), matching bpe_train_merges being
    # deliberately un-benched — it is a training job, not a query
    "bpe_apply_tokenize": lambda p: (
        not has_node(p, "CartesianProduct")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
        and not has_node(p, "NestedLoopJoin")
    ),
    # KMV signatures: the per-source bottom-k window must stay GROUP-
    # partitioned (hash exchange on source, never a global range sort);
    # the 5-row signature pair join rides a broadcast; the only real-
    # extent joins are vocab-sized equi-joins
    "kmv_jaccard_gate": lambda p: (
        has_node(p, "Broadcast")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "CartesianProduct")
    ),
    # the sketch build's exchange is the (source,d,col) combiner shuffle
    # (bounded by groups x depth x width, not by token count); the merged
    # table rides a broadcast into the probe, the 1-row total arrives via
    # broadcast nested-loop, and nothing may flip to a sort or cartesian
    "cm_sketch_gate": lambda p: (
        has_node(p, "Broadcast")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "CartesianProduct")
        and not has_node(p, "SortMergeJoin")
    ),
    # round-8 vector-store rows: encode/projection are MAP-ONLY literal
    # folds (no keyed shuffle of vectors at any scale; the one-time
    # seed/mean collects happen at plan build, outside the scan)
    "pq_encode_codes": lambda p: (
        not has_node(p, "hashpartitioning")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "HashJoin")
    ),
    "pca_project": lambda p: (
        not has_node(p, "hashpartitioning")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "Window")
    ),
    # probe-pruned ADC: TakeOrdered over the codes scan, never a sort or
    # a cartesian
    "ivfpq_adc_topk": lambda p: (
        has_node(p, "TakeOrderedAndProject")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "CartesianProduct")
    ),
    # pure row-local arithmetic: NO keyed exchange of any kind (the only
    # allowed exchange is the small-table spread's round-robin)
    "embedding_int4_block_quantize": lambda p: (
        not has_node(p, "hashpartitioning")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "HashJoin")
        and not has_node(p, "Window")
    ),
    # time-series gap-fill: the grid explode is bounded by per-user
    # active spans; the obs/grid join and LOCF window share the user
    # key family — never a cartesian, never a global range sort, never
    # a Python boundary
    "timeseries_gapfill": lambda p: (
        not has_node(p, "CartesianProduct")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
    ),
    # SCD2 build: one combiner-friendly (cust, date) exchange + one
    # cust exchange feeding a SINGLE Window node (partition-local sort
    # only — a rangepartitioning here would mean the per-customer sort
    # degenerated to a global one)
    "scd2_history_build": lambda p: (
        has_node(p, "Window")
        and not has_node(p, "CartesianProduct")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
    ),
    # point-in-time lookup: the window-merge union must never become a
    # pairwise interval match (no cartesian, no nested-loop of real
    # extents); the orderkey probe join is the one fact-fact equi-join
    # (SMJ/SHJ both acceptable — AQE decides); the as-of fill is a
    # partition-local sort under ONE custkey window
    "pointintime_balance_lookup": lambda p: (
        has_node(p, "Window")
        and not has_node(p, "CartesianProduct")
        and not has_node(p, "NestedLoopJoin")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
    ),
    # funnel: ONE user-keyed exchange (collect_list groupBy) + a 1-row
    # final aggregate; the greedy fold is whole-stage codegen — never a
    # join of event streams, never a sort, never a Python boundary
    "funnel_conversion_steps": lambda p: (
        count_exchanges(p, key="user_id") == 1
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
        and not has_node(p, "CartesianProduct")
    ),
    # sessionized funnel: the sessionize windows and the per-(user,
    # session) fold share the user-keyed partition family — exactly ONE
    # exchange hashed on user_id leading (the (user_id, session_id)
    # fold groupBy reuses the window's partitioning: user_id-prefixed
    # keys are co-located already); never a global sort, Python
    # boundary, or cartesian
    "funnel_sessionized": lambda p: (
        count_exchanges(p, key="user_id") >= 1
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
        and not has_node(p, "CartesianProduct")
    ),
    # interval RANGE frame: ONE user-keyed exchange + ONE Window node
    # evaluating the sliding frame partition-locally — never a self-join
    # of the event stream against its trailing window, never a global
    # sort, never a Python boundary
    "window_range_trailing_day": lambda p: (
        count_exchanges(p, key="user_id") == 1
        and has_node(p, "Window")
        and not has_node(p, "Join")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
    ),
    # INTERSECT ALL: per-value signed-count aggregate + generate — ONE
    # exchange on the value, never a join of the two extents
    "intersect_all_priorities": lambda p: (
        count_exchanges(p, key="o_orderpriority") == 1
        and has_node(p, "Generate")
        and not has_node(p, "Join")
        and not has_node(p, "rangepartitioning")
    ),
    # cohort retention: the corpus collapses to DISTINCT (user, month)
    # pairs before any join; the signup/activity joins are user-keyed
    # equi-joins (AQE picks broadcast vs shuffle by cohort size); the
    # final aggregate is cohort x offset — never a cartesian, never a
    # global sort, never a Python boundary
    "cohort_retention": lambda p: (
        not has_node(p, "CartesianProduct")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
    ),
    # transition matrix: ONE user-keyed window (partition-local sort) +
    # a |types|^2 aggregate — never a global sort, join, or Python
    "event_transition_matrix": lambda p: (
        count_exchanges(p, key="user_id") == 1
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
        and not has_node(p, "CartesianProduct")
    ),
    # CDC last-writer-wins replay: ONE custkey-keyed aggregate exchange
    # (struct max plans as SortAggregate — map-side partials still
    # collapse before the shuffle) — never a per-key window sort of the
    # full version sequence, never a join, never a Python boundary
    "cdc_snapshot_apply": lambda p: (
        count_exchanges(p, key="o_custkey") == 1
        and not has_node(p, "Window")
        and not has_node(p, "Join")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
    ),
    # OHLC bars: ONE (event_type, bar)-keyed aggregate exchange; the
    # struct-extrema argmin/argmax must never become a window or a join
    "ohlc_time_bars": lambda p: (
        count_exchanges(p, key="event_type") == 1
        and not has_node(p, "Window")
        and not has_node(p, "Join")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
    ),
    # trailing anomaly gate: ONE user-keyed exchange + ONE sliding RANGE
    # frame evaluated partition-locally — never a self-join of the
    # stream against its history, never a global sort
    "anomaly_trailing_zscore": lambda p: (
        count_exchanges(p, key="user_id") == 1
        and has_node(p, "Window")
        and not has_node(p, "Join")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
    ),
    # NTILE deciles: ONE priority-keyed exchange shared by the window
    # and the decile aggregate (priority-prefixed keys are co-located)
    "ntile_price_deciles": lambda p: (
        count_exchanges(p, key="o_orderpriority") == 1
        and has_node(p, "Window")
        and not has_node(p, "Join")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
    ),
    # PageRank: 3 unrolled join+aggregate supersteps — equi-joins only
    # (AQE picks broadcast vs shuffle by rank-table size), the top-k a
    # TakeOrdered, never a cartesian/global sort/Python boundary
    "graph_pagerank_topk": lambda p: (
        not has_node(p, "CartesianProduct")
        and not has_node(p, "NestedLoopJoin")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
    ),
    # triangles: degree-oriented adjacency intersection — every join an
    # equi-join (the two m-row out-neighbor-array attachments keyed on
    # dst then src; wedge candidates enumerate in-stage inside
    # array_intersect and never appear as join rows), the report a
    # TakeOrdered; never a cartesian/nested-loop, global sort, or Python
    # boundary at any scale.  Runs on the GRAPH-scaled corpus
    # (DIR_OVERRIDE) — the plain replicas keep l_partkey constant and
    # only multiply edge multiplicity, leaving the census size flat.
    "graph_triangle_counts": lambda p: (
        has_node(p, "TakeOrderedAndProject")
        and not has_node(p, "CartesianProduct")
        and not has_node(p, "NestedLoopJoin")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
    ),
    # k-core peeling: the FINAL membership plan is one aggregate over the
    # last checkpointed survivor set (never a cartesian / global sort /
    # Python boundary), and — because the peel rounds execute behind
    # localCheckpoint boundaries at plan build — the predicate also
    # asserts over the captured per-round plans: every peel superstep is
    # equi-join-only, partition-local, JVM-side, and reads its
    # predecessor through a checkpoint scan instead of re-running the
    # loop history (graph_queries.KCORE_ROUND_PLANS, populated by the
    # run the harness just timed; time_query defeats the plan cache for
    # fixpoint specs, so the plans are from THIS corpus).  Runs on the
    # graphscale corpus like the other graph-structure operators.
    "graph_kcore_membership": lambda p: (
        not has_node(p, "CartesianProduct")
        and not has_node(p, "NestedLoopJoin")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
        and _graph_round_plans_ok("KCORE_ROUND_PLANS")
    ),
    # multi-source BFS: same driver-loop discipline — the final hop-table
    # plan is a union of checkpointed frontier scans, and every captured
    # frontier-expansion round is an equi-join superstep (no cartesian /
    # nested-loop / global sort / Python) over checkpointed inputs.
    "graph_bfs_hops": lambda p: (
        not has_node(p, "CartesianProduct")
        and not has_node(p, "NestedLoopJoin")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
        and _graph_round_plans_ok("BFS_ROUND_PLANS")
    ),
    # bounded Bellman-Ford: every relaxation round ONE src-keyed
    # equi-join + ONE min-combiner aggregate over the checkpointed cost
    # table — same captured-round-plan discipline as k-core/BFS.
    "graph_sssp_cost": lambda p: (
        not has_node(p, "CartesianProduct")
        and not has_node(p, "NestedLoopJoin")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
        and _graph_round_plans_ok("SSSP_ROUND_PLANS")
    ),
    # distributed pointer-jumping WCC (the 100 TB dedup-clustering form,
    # functions/graph.py connected_components): every propagation round is
    # a dst-keyed neighbour-min equi-join + aggregate and a label-keyed
    # pointer-jump equi-join over checkpointed inputs — same captured-
    # round-plan discipline as k-core/BFS/SSSP.
    "graph_wcc_membership": lambda p: (
        not has_node(p, "CartesianProduct")
        and not has_node(p, "NestedLoopJoin")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
        and _graph_round_plans_ok("CC_ROUND_PLANS")
    ),
    # TWAP: ONE (user, day)-keyed exchange shared by the lead() window
    # and the aggregate — never a join, never a global sort
    "twap_daily_value": lambda p: (
        count_exchanges(p, key="user_id") == 1
        and has_node(p, "Window")
        and not has_node(p, "Join")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
    ),
    # exact per-dim quantile profile: ONE dim-keyed exchange + the
    # row_number/count window evaluated partition-locally — never a join,
    # never a global sort (parallelism deliberately = EMBEDDING_DIM; the
    # 100 TB path is the histq sketch, documented in the query)
    "embedding_dim_quantiles": lambda p: (
        count_exchanges(p, key="dim") == 1
        and has_node(p, "Window")
        and not has_node(p, "Join")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
    ),
    # Z-order layout gate: binning is row-local against broadcast 1-row
    # bounds (BroadcastNestedLoopJoin with a single-row side — never a
    # cartesian of real extents); the only corpus-keyed exchange is the
    # (layout, bucket) zone-map combiner aggregate (<= 128 groups), the
    # probe joins carry 3-row broadcast sides, and nothing may flip to a
    # global sort or a Python boundary at any scale
    "zorder_layout_gate": lambda p: (
        has_node(p, "BroadcastNestedLoopJoin")
        and not has_node(p, "CartesianProduct")
        and not has_node(p, "SortMergeJoin")
        and not has_node(p, "rangepartitioning")
        and not has_node(p, "BatchEvalPython")
    ),
}

#: Queries whose RESULT row count scales with the corpus (everything else
#: returns gates/top-ks/group summaries): timed via the noop sink, never
#: collected to the driver (see time_query).
OUTPUT_UNBOUNDED = {
    "timeseries_gapfill",
    "scd2_history_build",
    "pointintime_balance_lookup",
    "window_range_trailing_day",  # one output row per event
    "intersect_all_priorities",  # bag semantics: output ~ half the orders
    "cdc_snapshot_apply",  # one row per live customer key
    "ohlc_time_bars",  # bars ~ types x hours; the events replicas shift hours
    "anomaly_trailing_zscore",  # flagged rows ~ a few percent of events
    "twap_daily_value",  # one row per active (user, day)
    "graph_kcore_membership",  # one row per core node (~19k x factor)
    "graph_bfs_hops",  # one row per reached node (~20k x factor)
    "graph_sssp_cost",  # one row per reachable node (~20k x factor)
    "graph_wcc_membership",  # one row per windowed node (~17k x factor)
}

#: Queries stressed on a DERIVED corpus instead of the plain scaled one.
#: vocab_coverage_32k needs a vocabulary LARGER than V=32768 for the top-V
#: and broadcast-back claims to be non-vacuous; the driver corpus has only
#: ~31 distinct words (~3100 at x100).  RICHVOCAB suffixes every word with
#: _d{doc_id % 4096}, a per-doc bijection on the token stream: ~127k
#: distinct words even at base scale, with per-(lang, word) counts still
#: realistic (Zipf-ish head preserved within each doc class).
DIR_OVERRIDE = {
    "vocab_coverage_32k": "richvocab",
    # graph-STRUCTURE operators scale on disjoint graph copies — the plain
    # replicas keep l_partkey constant, so the distinct edge set (and with
    # it the census / superstep cost) would stay sf0.1-sized at every
    # factor.  graph_pagerank_topk's r12 plain-corpus rows (ratios ~1.35,
    # measuring the distinct scan only) remain in the artifacts as the
    # historical record; rows from r14 on use graphscale.
    "graph_triangle_counts": "graphscale",
    "graph_pagerank_topk": "graphscale",
    "graph_kcore_membership": "graphscale",
    "graph_bfs_hops": "graphscale",
    "graph_sssp_cost": "graphscale",
    "graph_wcc_membership": "graphscale",
}


#: Replica r >= 1 document ids: 10*orig + 1 + r * 10^8 — injective,
#: order-preserving, and == 1 (mod 10), so scaled replicas contribute
#: ZERO holdout/batch docs (doc_id % 10 == 0 selects none of them).
#: Production eval suites and per-ingest batches are CONSTANT-SIZE
#: regardless of the training corpus; the previous scheme (orig + r*10^7,
#: a multiple of 10) grew the benchmark holdout proportionally with the
#: corpus, and at x1000 the decontamination gate's (correctly) broadcast
#: benchmark-shingle table outgrew the broadcast limit — a generator
#: artifact, not an operator flaw.  Replica-0 keeps original ids, so the
#: holdout is exactly the sf0.1 one at every factor.
REPLICA_DOC_OFFSET = 10**8


def _replica_doc_id(r_col):
    # BIGINT arithmetic throughout: r (int32 in the union path's lit)
    # times 10^8 overflows int32 under ANSI for r >= 22
    return (
        F.col("doc_id") * 10
        + 1
        + r_col.cast("long") * F.lit(REPLICA_DOC_OFFSET).cast("long")
    )


def _gen_documents(docs: DataFrame, factor: int) -> DataFrame:
    if factor > 100:
        # identical rows to the union form below, but built as ONE
        # broadcast range cross-join: a 1000-branch union takes Catalyst
        # minutes to analyze and serializes the write into 1000 tiny jobs
        reps = F.broadcast(
            docs.sparkSession.range(factor).select(F.col("id").alias("r"))
        )
        return docs.crossJoin(reps).select(
            F.when(F.col("r") == 0, F.col("doc_id"))
            .otherwise(_replica_doc_id(F.col("r")))
            .alias("doc_id"),
            F.when(F.col("r") == 0, F.col("text"))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.expr(
                        "transform(split(text, ' '), "
                        "x -> concat(x, '_r', CAST(r AS STRING)))"
                    ),
                )
            )
            .alias("text"),
            "lang",
            "source",
        ).withColumn("n_chars", F.length("text").cast("long"))
    parts = [docs]
    for r in range(1, factor):
        parts.append(
            docs.select(
                _replica_doc_id(F.lit(r)).alias("doc_id"),
                F.concat_ws(
                    " ", F.expr(f"transform(split(text, ' '), x -> concat(x, '_r{r}'))")
                ).alias("text"),
                "lang",
                "source",
            ).withColumn("n_chars", F.length("text"))
        )
    out = parts[0].select("doc_id", "text", "lang", "source", "n_chars")
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _gen_embeddings(emb: DataFrame, factor: int) -> DataFrame:
    dim = 64
    parts = [emb]
    for r in range(1, factor):
        # fract(sin(vec_id*12.9898 + d*78.233 + r*37.719) * 43758.5453) - 0.5
        rand = (
            f"transform(sequence(0, {dim - 1}), d -> CAST("
            f"(sin(CAST(vec_id AS DOUBLE) * 12.9898 + CAST(d AS DOUBLE) * 78.233"
            f" + {r} * 37.719) * 43758.5453) - "
            f"floor(sin(CAST(vec_id AS DOUBLE) * 12.9898 + CAST(d AS DOUBLE) * 78.233"
            f" + {r} * 37.719) * 43758.5453) - 0.5 AS FLOAT))"
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + r * ID_OFFSET).alias("vec_id"),
                F.expr(rand).alias("embedding"),
                "label",
            )
        )
    out = parts[0].select("vec_id", "embedding", "label")
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _replicas(df: DataFrame, factor: int) -> DataFrame:
    """One broadcast range cross-join producing a replica-index column r
    in [0, factor): identical rows to a factor-branch union, but the plan
    is CONSTANT in factor (a 1000-branch union takes Catalyst minutes to
    analyze and serializes the write into 1000 tiny jobs — the
    _gen_documents factor>100 lesson, applied to every table)."""
    reps = F.broadcast(
        df.sparkSession.range(factor).select(F.col("id").alias("r"))
    )
    return df.crossJoin(reps)


def _gen_events(ev: DataFrame, factor: int) -> DataFrame:
    return _replicas(ev, factor).select(
        (F.col("event_id") + F.col("r") * ID_OFFSET).alias("event_id"),
        (
            F.col("ts")
            + F.expr("make_interval(0, 0, 0, 0, r, 0, 0)")
        ).alias("ts"),
        (F.col("user_id") + F.col("r") * ID_OFFSET).alias("user_id"),
        "event_type",
        "value",
        "props",
    )


def _gen_orders(orders: DataFrame, factor: int) -> DataFrame:
    """Replica r offsets order and customer ids by r*ID_OFFSET and keeps
    every date: the customer POPULATION scales while each customer's
    change-log size stays constant — the regime the SCD2/point-in-time
    window claims are about (per-partition state must not grow with
    corpus size)."""
    return _replicas(orders, factor).select(
        (F.col("o_orderkey") + F.col("r") * ID_OFFSET).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("r") * ID_OFFSET).alias("o_custkey"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )


def _gen_lineitem(line: DataFrame, factor: int) -> DataFrame:
    """Replica r re-keys l_orderkey in lockstep with _gen_orders, so every
    scaled lineitem still joins its (scaled) order."""
    cols = [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ]
    return _replicas(line, factor).select(
        (F.col("l_orderkey") + F.col("r") * ID_OFFSET).alias("l_orderkey"),
        *cols[1:],
    )


def _gen_documents_richvocab(docs: DataFrame, factor: int) -> DataFrame:
    """The scaled corpus with every word suffixed _d{doc_id % 4096}: a
    per-doc-class bijection on tokens, so distinct-word count multiplies by
    the number of doc classes (~127k words at factor 1) while per-word
    count shapes stay realistic.  Exists to make V=32768 vocabulary
    induction non-vacuous (see DIR_OVERRIDE)."""
    scaled = _gen_documents(docs, factor)
    return scaled.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.expr(
                "transform(split(text, ' '), "
                "x -> concat(x, '_d', CAST(doc_id % 4096 AS STRING)))"
            ),
        ).alias("text"),
        "lang",
        "source",
    ).withColumn("n_chars", F.length("text"))


def generate(
    spark: SparkSession,
    out_dir: str,
    factor: int,
    tables: list[str] | None = None,
) -> None:
    gens = {
        "documents": _gen_documents,
        "embeddings": _gen_embeddings,
        "events": _gen_events,
        "orders": _gen_orders,
        "lineitem": _gen_lineitem,
    }
    if tables is not None:
        gens = {n: g for n, g in gens.items() if n in tables}
    for name, gen in gens.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            continue
        src = load_table(spark, SRC_DIR, name)
        gen(src, factor).write.mode("overwrite").parquet(path)
        print(f"generated {path}", file=sys.stderr)


def generate_richvocab(spark: SparkSession, root: str, factor: int) -> str:
    """Writes the vocab-rich documents table for DIR_OVERRIDE queries at
    the given factor (factor 1 = the rich-vocab BASELINE dir) and returns
    the directory usable as an sf_dir."""
    out_dir = os.path.join(root, f"richvocab_x{factor}")
    path = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(out_dir, exist_ok=True)
        src = load_table(spark, SRC_DIR, "documents")
        _gen_documents_richvocab(src, factor).write.mode("overwrite").parquet(path)
        print(f"generated {path}", file=sys.stderr)
    return out_dir


def generate_graphscale(spark: SparkSession, root: str, factor: int) -> str:
    """Writes a GRAPH-scaled lineitem for DIR_OVERRIDE graph queries:
    replica r offsets l_orderkey, l_partkey AND l_suppkey by r*ID_OFFSET,
    so the co-purchase graph becomes factor disjoint copies of the sf0.1
    graph — nodes, edges, wedges, and triangles all scale linearly with
    per-node degree structure (including hub skew) preserved exactly.
    The plain ``_gen_lineitem`` corpus keeps l_partkey constant across
    replicas, which only multiplies edge MULTIPLICITY: the distinct edge
    set — and therefore the whole census after the first distinct —
    would stay sf0.1-sized, making a 'scale' row vacuous for any
    graph-structure operator.  Factor 1 is the identity: SRC_DIR."""
    if factor <= 1:
        return SRC_DIR
    out_dir = os.path.join(root, f"graphscale_x{factor}")
    path = os.path.join(out_dir, "lineitem.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(out_dir, exist_ok=True)
        line = load_table(spark, SRC_DIR, "lineitem")
        cols = [
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        ]
        off = F.col("r") * ID_OFFSET
        _replicas(line, factor).select(
            (F.col("l_orderkey") + off).alias("l_orderkey"),
            (F.col("l_partkey") + off).alias("l_partkey"),
            (F.col("l_suppkey") + off).alias("l_suppkey"),
            *cols,
        ).write.mode("overwrite").parquet(path)
        print(f"generated {path}", file=sys.stderr)
    return out_dir


#: DIR_OVERRIDE tag -> derived-corpus generator (spark, root, factor) -> dir.
OVERRIDE_GENERATORS = {
    "richvocab": generate_richvocab,
    "graphscale": generate_graphscale,
}


def time_query(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    n: int = 3,
    warmup: bool = True,
):
    """Median wall time over n warm runs (one untimed warm-up) + the
    AQE-final executed plan of the last run.

    Each timed run EVICTS the registry's per-(name, sf_dir) plan cache and
    rebuilds the DataFrame: re-collecting the SAME DataFrame object lets
    Spark skip every completed shuffle map stage (shuffle-output reuse), so
    a cached handle times only the result stage — for shuffle-bearing
    queries that silently drops the map-side scan/tokenize cost from the
    measurement (caught when a full-corpus tokenize 'ran' in 29 ms at
    x100).  A fresh DataFrame re-executes all stages; generated code still
    comes warm from Spark's codegen cache (same source), which is the
    warm-executor steady state the scaling claim is about."""
    spec = REGISTRY[name]

    def fresh() -> "DataFrame":
        spark.__dict__.get("_seisdb_plan_cache", {}).pop((name, sf_dir), None)
        return spec.spark(spark, sf_dir)

    def run(df: "DataFrame") -> None:
        # gate-style queries return bounded frames — collect() is the
        # honest full-pipeline action.  Queries whose OUTPUT scales with
        # the corpus (the gap-fill grid, per-lineitem enrichment rows)
        # must NOT ship the result to the driver — a 100M-row collect is
        # a harness OOM, not an operator cost.  Executing the frame's OWN
        # physical plan as a JVM-side RDD count runs every stage (physical
        # RDD count prunes nothing) and discards rows executor-side —
        # crucially through df's queryExecution, so the AQE plan
        # final_plan() inspects afterwards is the plan that actually ran
        # (a noop-sink write creates a SEPARATE QueryExecution and would
        # leave df's plan un-finalized: assertions would silently run
        # against the pre-AQE initial plan).
        if name in OUTPUT_UNBOUNDED:
            df._jdf.queryExecution().executedPlan().execute().count()
        else:
            df.collect()

    def reclaim_shuffle_disk() -> None:
        # Shuffle files of a completed pass are only deleted when the JVM
        # GC collects the dropped DataFrame's ShuffleDependency (Spark's
        # ContextCleaner is reference-triggered).  Between x1000 passes of
        # a 600M-row join that lag is ~25 GB of dead spill per pass — four
        # passes filled the disk (round-12 pointintime incident).  Forcing
        # a JVM GC bounds live shuffle space to one pass's worth; it runs
        # BETWEEN timed passes, so it costs no measured time.
        spark.sparkContext._jvm.System.gc()

    if warmup:
        run(fresh())  # warm-up: codegen + file listing
    # --no-warmup is the x1000 single-pass protocol: a >30-minute tier
    # pass cannot afford a second full execution just to warm codegen,
    # and for fixpoint queries every pass rebuilds the loop anyway — the
    # recorded number is then a COLD pass, stated in the tier notes.
    times, df = [], None
    for _ in range(n):
        df = None  # drop the prior pass's Dataset BEFORE the GC, or its
        # ShuffleDependency is still strongly reachable via py4j and the
        # collection frees only the pass-before-last's files
        reclaim_shuffle_disk()
        if spec.fixpoint:
            # driver-loop queries (k-core peel, BFS frontier) iterate at
            # PLAN BUILD — timing only run(df) would price the final
            # aggregate (~70x under k-core's honest cost, the r14
            # headline caveat); fresh() defeats the plan cache, so
            # putting it inside the timed region prices the loop too
            t0 = time.time()
            df = fresh()
            run(df)
        else:
            df = fresh()
            t0 = time.time()
            run(df)
        times.append(time.time() - t0)
    return statistics.median(times), final_plan(df)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/seisdb_scale")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--only",
        nargs="*",
        default=None,
        help="stress only these queries (iterating on one pipeline); the "
        "committed BENCH_SCALE.json must come from a full run",
    )
    ap.add_argument(
        "--tables",
        nargs="*",
        default=None,
        help="generate only these scaled tables (x1000 runs of document-"
        "only pipelines need not synthesize 100M events)",
    )
    ap.add_argument(
        "--artifact",
        default=None,
        help="write results to this JSON path even for --only runs (used "
        "for the per-factor BENCH_SCALE_x{N}.json tier artifacts)",
    )
    ap.add_argument(
        "--no-warmup",
        action="store_true",
        help="skip the untimed warm-up pass (the x1000 single-pass "
        "protocol: recorded numbers are then COLD passes)",
    )
    args = ap.parse_args()

    from seisdb_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    scale_dir = os.path.join(args.out, f"x{args.factor}")
    os.makedirs(scale_dir, exist_ok=True)
    generate(spark, scale_dir, args.factor, args.tables)

    stress = {
        n: p
        for n, p in STRESS_QUERIES.items()
        if args.only is None or n in args.only
    }
    results = {}
    for name, plan_ok in stress.items():
        if name in DIR_OVERRIDE:
            gen_override = OVERRIDE_GENERATORS[DIR_OVERRIDE[name]]
            base_dir = gen_override(spark, args.out, 1)
            big_dir = gen_override(spark, args.out, args.factor)
        else:
            base_dir, big_dir = SRC_DIR, scale_dir
        # evaluate each corpus's predicate IMMEDIATELY after its run: the
        # fixpoint graph predicates read module-global *_ROUND_PLANS,
        # which the NEXT run overwrites — deferring both evaluations past
        # the big-corpus run would silently certify the base row against
        # the big corpus's round plans (r15 advice)
        t_base, p_base = time_query(
            spark, name, base_dir, args.runs, warmup=not args.no_warmup
        )
        ok_base = bool(plan_ok(p_base))
        t_big, p_big = time_query(
            spark, name, big_dir, args.runs, warmup=not args.no_warmup
        )
        ok_big = bool(plan_ok(p_big))
        # graphscale rows carry a suffixed key so a full re-run can never
        # clobber a plain-corpus historical row with derived-corpus numbers
        # (graph_pagerank_topk has both kinds on record).  richvocab keeps
        # the plain key: vocab_coverage_32k has only ever been measured on
        # its derived corpus and the committed artifacts key it plainly.
        out_key = (
            f"{name}_graphscale"
            if DIR_OVERRIDE.get(name) == "graphscale"
            else name
        )
        results[out_key] = {
            "t_sf0.1_sec": round(t_base, 3),
            f"t_x{args.factor}_sec": round(t_big, 3),
            "ratio": round(t_big / t_base, 2),
            "plan_ok_sf0.1": ok_base,
            f"plan_ok_x{args.factor}": ok_big,
        }
        print(out_key, results[out_key], file=sys.stderr)

    out = {
        "factor": args.factor,
        "src": SRC_DIR,
        "scale_dir": scale_dir,
        "queries": results,
    }
    if args.only is None:  # partial runs must not clobber the full artifact
        with open("BENCH_SCALE.json", "w") as fh:
            json.dump(out, fh, indent=2)
    if args.artifact:
        with open(args.artifact, "w") as fh:
            json.dump(out, fh, indent=2)
    print(json.dumps(out))
    bad_plans = [
        n
        for n, r in results.items()
        if not (r["plan_ok_sf0.1"] and r[f"plan_ok_x{args.factor}"])
    ]
    return 1 if bad_plans else 0


if __name__ == "__main__":
    raise SystemExit(main())
