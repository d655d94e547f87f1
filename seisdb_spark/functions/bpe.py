"""Iterative BPE merge training over the word-frequency table.

``queries/extensions.py::bpe_merge_candidates`` is iteration 1 of BPE
tokenizer training (pair counts over the vocab, top-K candidates); this
module supplies the full bounded-iteration TRAINING LOOP — apply the top
merge, re-segment, re-count, repeat — re-expressed in Spark's execution
model the same way ``cluster.py`` re-expresses Lloyd:

* **the corpus is scanned once** — training runs over the word-FREQUENCY
  table (Zipf: orders of magnitude smaller than the corpus), segmented
  into a ``syms array<string>`` column.  No iteration touches the corpus.
* **pair counting is one combiner-friendly shuffle per iteration** —
  adjacent (left, right) symbol pairs weighted by word count; partial
  aggregation bounds the exchange by the pair-vocabulary size, not the
  word count.
* **the argmax is k-row-bounded driver state** — ``LIMIT 1`` via
  TakeOrderedAndProject; the driver holds ONE (left, right, n) row per
  iteration, the exact analogue of Lloyd's k*dim centroid state.
* **the merge application is a map-only higher-order fold** — the chosen
  pair becomes plan LITERALS (via ``F.lit``, so arbitrary symbol text is
  safe) and every word's segmentation is rewritten by one
  ``aggregate()`` lambda inside whole-stage codegen: greedy
  left-to-right non-overlapping replacement, the standard BPE merge
  semantics.  No join, no shuffle, no Python.
* **each iteration persists its vocab and unpersists the previous** so
  the bounded loop (default 8 iterations) reads the cached parent
  instead of replaying the lineage chain.

Determinism: counts are exact integers; the argmax total order is
(n DESC, left, right) — ties impossible beyond identical pairs.  The
loop stops early when no adjacent pair remains (every word fully
merged).  This makes the whole merge sequence reproducible across
partitionings, which is why the planted-merge and pure-Python-golden
tests can pin it exactly (tests/test_extensions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BPE_TRAIN_ITERS = 8

#: Merge-count bound for the expression-form tokenizer
#: (``segment_words``): each merge is one chained ``aggregate()`` fold,
#: and Catalyst resolves ONE nested higher-order lambda per analyzer
#: iteration — so the Resolution batch's fixed-point budget
#: (``spark.sql.analyzer.maxIterations`` = 100) is exhausted at ~96
#: chained folds ("Max iterations (100) reached for batch Resolution",
#: measured on Spark 4.1.2; analysis time is also linear in K: ~1 s at
#: K=32, ~2 s at K=64).  64 keeps comfortable headroom below the cliff
#: while covering demo-scale vocabularies; a production tokenizer
#: (~30k merges) uses ``segment_words_kernel`` — one Arrow-batched
#: ``mapInPandas`` whose plan size is CONSTANT in the merge count (the
#: merge list rides as a broadcast, the encode-kernel pattern).
SEGMENT_EXPR_MAX_MERGES = 64


def char_segment(wfreq: DataFrame) -> DataFrame:
    """(word, wn) -> (syms array<string>, wn): each distinct word split
    into single-character symbols.  Empty words are dropped (Spark's
    ``sequence(1, 0)`` yields a DESCENDING [1, 0], not an empty list —
    the same guard the shingle builder uses)."""
    return wfreq.select(
        F.expr(
            "CASE WHEN length(word) >= 1 THEN "
            "transform(sequence(1, length(word)), i -> substring(word, i, 1)) "
            "ELSE CAST(array() AS array<string>) END"
        ).alias("syms"),
        "wn",
    ).filter(F.size("syms") > 0)


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency — the one
    shuffle per training iteration, bounded by the pair vocabulary."""
    pairs = vocab.select(
        F.explode(
            F.expr(
                "CASE WHEN size(syms) >= 2 THEN "
                "transform(sequence(1, size(syms) - 1), "
                "          i -> struct(syms[i - 1] AS l, syms[i] AS r)) "
                "ELSE CAST(array() AS array<struct<l:string,r:string>>) END"
            )
        ).alias("p"),
        "wn",
    )
    return pairs.groupBy(
        F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
    ).agg(F.sum("wn").cast("long").alias("n"))


def apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every segmentation, replacing adjacent (left, right) with
    the merged token — greedy left-to-right non-overlapping (a fold whose
    accumulator's LAST element participates in the next comparison, so
    'aaa' under (a,a) becomes [aa, a], the standard BPE behaviour).
    Map-only; the pair enters the plan via ``F.lit`` (no text splicing)."""
    merged = left + right
    folded = F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return vocab.select(folded.alias("syms"), "wn")


def train_merges(
    wfreq: DataFrame, iters: int = BPE_TRAIN_ITERS
) -> list[dict]:
    """Run ``iters`` BPE merge iterations over the (word, wn) frequency
    table; returns one record per executed merge:
    ``{iter, left_sym, right_sym, merged, n, total_syms}`` where ``n`` is
    the pair's count when chosen and ``total_syms`` the corpus symbol
    total AFTER applying it (sum(wn * len(syms)) — the compression-
    progress metric; it must fall by exactly n per merge, which the
    tests assert).  Stops early when no adjacent pair remains."""
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    vocab = char_segment(wfreq).persist()
    merges: list[dict] = []
    try:
        for it in range(1, iters + 1):
            best = (
                pair_counts(vocab)
                .orderBy(F.col("n").desc(), "left_sym", "right_sym")
                .limit(1)
                .collect()
            )
            if not best:
                break
            b = best[0]
            nxt = apply_merge(vocab, b["left_sym"], b["right_sym"]).persist()
            total = nxt.select(
                F.sum(F.size("syms") * F.col("wn")).cast("long")
            ).collect()[0][0]
            vocab.unpersist()
            vocab = nxt
            merges.append(
                {
                    "iter": it,
                    "left_sym": b["left_sym"],
                    "right_sym": b["right_sym"],
                    "merged": b["left_sym"] + b["right_sym"],
                    "n": int(b["n"]),
                    "total_syms": int(total),
                }
            )
    finally:
        vocab.unpersist()
    return merges


def segment_words(
    words: DataFrame, merges: list[dict], col: str = "word"
) -> DataFrame:
    """Apply a trained merge sequence to every word — the TOKENIZE step.
    Adds ``syms array<string>`` and ``n_tokens int``; everything else is
    preserved.  Map-only: each merge is one higher-order fold (the same
    greedy left-to-right non-overlapping semantics training used) chained
    in merge order, all literals via ``F.lit``.  Intended for the DISTINCT
    word table (Zipf: segment the vocab once, join token counts back to
    the corpus), not the raw token stream."""
    if len(merges) > SEGMENT_EXPR_MAX_MERGES:
        raise ValueError(
            f"segment_words: {len(merges)} merges exceeds the expression "
            f"form's bound ({SEGMENT_EXPR_MAX_MERGES}) — each merge is a "
            "chained aggregate() fold and Catalyst resolves one nested "
            "lambda per analyzer iteration, so large merge lists exhaust "
            "the Resolution fixed-point budget (~96 on Spark 4.1); use "
            "segment_words_kernel for production-size vocabularies"
        )
    syms = F.expr(
        f"CASE WHEN length({col}) >= 1 THEN "
        f"transform(sequence(1, length({col})), i -> substring({col}, i, 1)) "
        "ELSE CAST(array() AS array<string>) END"
    )
    def one_merge(prev, left, right, merged):
        # a closure per merge: PySpark reads the lambda's ARITY to build
        # the higher-order function, so captures can't ride as defaults
        def step(acc, s):
            return F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (s == F.lit(right)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.lit(merged)),
                ),
            ).otherwise(F.concat(acc, F.array(s)))

        return F.aggregate(
            prev, F.expr("CAST(array() AS array<string>)"), step
        )

    for m in merges:
        syms = one_merge(syms, m["left_sym"], m["right_sym"], m["merged"])
    return words.withColumn("syms", syms).withColumn(
        "n_tokens", F.size("syms")
    )


def apply_merges_py(word: str, pairs: list[tuple[str, str, str]]) -> list[str]:
    """Pure-Python twin of the fold: apply (left, right, merged) pairs in
    merge order, each pass greedy left-to-right non-overlapping (the
    accumulator's LAST element participates in the next comparison, so
    'aaa' under (a,a) -> [aa, a]).  This IS the kernel's per-word body,
    public so tests and the driver-side golden share one definition."""
    syms = list(word)
    for left, right, merged in pairs:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = merged
            else:
                out.append(s)
        syms = out
    return syms


#: (SparkContext id, merge tuple) -> Broadcast — see segment_words_kernel.
_KERNEL_BROADCASTS: dict = {}


def segment_words_kernel(
    words: DataFrame, merges: list[dict], col: str = "word"
) -> DataFrame:
    """Arrow-batched twin of ``segment_words`` for production-size merge
    lists: ONE ``mapInPandas`` whose plan is CONSTANT in the merge count
    — the trained (left, right, merged) list rides to executors as a
    broadcast variable (a ~30k-merge vocabulary is < 1 MB) and each
    Arrow batch of words is segmented by the pure-Python greedy fold
    (``apply_merges_py``, byte-identical semantics to the expression
    form — pinned by tests/test_bpe_kernel.py on the trained golden).
    Same contract: adds ``syms array<string>`` and ``n_tokens int``,
    preserves every input column; map-only, zero shuffle, the
    ``pipeline/build.py::encode_records`` kernel pattern."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    if col not in words.columns:
        raise ValueError(f"segment_words_kernel: no column {col!r}")
    pairs = tuple(
        (m["left_sym"], m["right_sym"], m["merged"]) for m in merges
    )
    # one broadcast per DISTINCT merge list per SparkContext, memoized:
    # broadcasts cannot be unpersisted here (the returned lazy frame may
    # execute later), so without the memo every call would leak a fresh
    # up-to-~1 MB broadcast for the session lifetime (bench loops and
    # per-microbatch use call this repeatedly with the same vocabulary)
    sc = words.sparkSession.sparkContext
    key = (id(sc), pairs)
    bc = _KERNEL_BROADCASTS.get(key)
    if bc is None:
        bc = sc.broadcast(list(pairs))
        _KERNEL_BROADCASTS[key] = bc
    out_schema = StructType(
        list(words.schema.fields)
        + [
            StructField("syms", ArrayType(StringType()), False),
            StructField("n_tokens", IntegerType(), False),
        ]
    )

    def segment(batches):
        ps = bc.value
        for pdf in batches:
            pdf = pdf.copy()
            segs = [
                apply_merges_py(w, ps) if isinstance(w, str) and w else []
                for w in pdf[col]
            ]
            pdf["syms"] = segs
            pdf["n_tokens"] = [len(s) for s in segs]
            yield pdf

    return words.mapInPandas(segment, out_schema)


def segment_words_auto(
    words: DataFrame, merges: list[dict], col: str = "word"
) -> DataFrame:
    """Dispatcher: the expression form (whole-stage codegen, zero Python)
    under its documented merge-count bound, the Arrow kernel beyond it.
    Both produce identical rows; only the physical plan differs."""
    if len(merges) <= SEGMENT_EXPR_MAX_MERGES:
        return segment_words(words, merges, col=col)
    return segment_words_kernel(words, merges, col=col)
