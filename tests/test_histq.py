"""Tests for the mergeable histogram quantile sketch
(``functions/histq.py`` + ``hist_quantile_rollup`` +
``streaming_quantile_rollup``).

Oracle parity is covered by test_oracle_parity.py; these pin the
properties the oracle can't express: merge-equals-direct (the
mergeability contract, cell for cell), split-invariance under an
arbitrary repartitioning, exact agreement with a pure-Python golden on
a planted distribution, the clamped-tail contract, and stream==batch
across genuine microbatches.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_DIR, SMOKE_SF_DIR

from seisdb_spark.functions.histq import (
    HQ_BIN_W,
    HQ_NBINS,
    HQ_PROBE_PM,
    hist_merge,
    hist_partials,
    hist_quantile_bins,
)
from seisdb_spark.queries.registry import REGISTRY


def py_hist_quantiles(values: list[int]):
    """Pure-Python golden: histogram bins, per-probe rank and bin."""
    bins = [0] * HQ_NBINS
    for v in values:
        bins[min(v // HQ_BIN_W, HQ_NBINS - 1)] += 1
    n = len(values)
    out = {}
    for q_pm in HQ_PROBE_PM:
        r = (q_pm * n + 999) // 1000
        cum = 0
        for b, c in enumerate(bins):
            cum += c
            if cum >= r:
                out[q_pm] = (r, b)
                break
    return out


def test_merge_equals_direct_cell_for_cell(spark):
    """Partials grouped by source and addition-merged must equal the
    direct global histogram exactly — the mergeability contract."""
    from seisdb_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    merged = {
        r.bin: r.n
        for r in hist_merge(
            hist_partials(docs, "n_chars", ["source"])
        ).collect()
    }
    direct = {
        r.bin: r.n for r in hist_merge(hist_partials(docs, "n_chars", [])).collect()
    }
    assert merged == direct


def test_split_invariance_under_repartition(spark):
    """Partials computed over an arbitrary 7-way repartition (grouped
    by a synthetic split key) must merge to the same histogram — batch
    boundaries cannot change integer sums."""
    from pyspark.sql import functions as F

    from seisdb_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "split", (F.col("doc_id") % 7).cast("int")
    )
    by_split = {
        r.bin: r.n
        for r in hist_merge(
            hist_partials(docs, "n_chars", ["split"])
        ).collect()
    }
    direct = {
        r.bin: r.n
        for r in hist_merge(hist_partials(docs, "n_chars", [])).collect()
    }
    assert by_split == direct


def test_quantile_bins_match_python_golden(spark):
    """On a planted skewed distribution the estimated bins, ranks, and
    bin edges must equal the pure-Python golden exactly."""
    values = (
        [3] * 10 + [40] * 50 + [41] * 5 + [200] * 30 + [505] * 4 + [2000] * 1
    )
    df = spark.createDataFrame([(v,) for v in values], "n_chars long")
    qb = {
        r.q_pm: (r.r, r.est_bin, r.est_lo, r.est_hi)
        for r in hist_quantile_bins(
            hist_merge(hist_partials(df, "n_chars", []))
        ).collect()
    }
    golden = py_hist_quantiles(values)
    assert set(qb) == set(golden)
    for q_pm, (r, b) in golden.items():
        assert qb[q_pm][0] == r, q_pm
        assert qb[q_pm][1] == b, q_pm
        assert qb[q_pm][2] == b * HQ_BIN_W
        assert qb[q_pm][3] == (b + 1) * HQ_BIN_W


def test_clamped_tail_lands_in_last_bin_and_gate_holds(spark, tmp_path):
    """Values beyond the grid clamp into the last bin (bounded state is
    the contract), and the query's within_bin flag must still be 1 for
    a quantile that lands there — the OR-last-bin clause."""
    rows = [(i, "x", "en", "src0", 5000 + i) for i in range(10)]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    out = (
        REGISTRY["hist_quantile_rollup"]
        .spark(spark, str(tmp_path))
        .toPandas()
    )
    assert (out.est_lo == (HQ_NBINS - 1) * HQ_BIN_W).all()
    assert (out.exact_v >= 5000).all()
    assert (out.within_bin == 1).all()


def test_rollup_gate_all_green_on_corpus(spark):
    """Every probed quantile's exact value must lie inside its
    estimated bin on the driver corpus — the histogram guarantee."""
    out = REGISTRY["hist_quantile_rollup"].spark(spark, SF_DIR).toPandas()
    assert len(out) == len(HQ_PROBE_PM)
    assert (out.within_bin == 1).all()


def test_quantile_stream_equals_batch_across_microbatches(spark, tmp_path):
    """The streamed histogram table over documents split into 3 files
    (3 genuine microbatches) must produce the SAME gate rows as the
    batch twin — integer addition is split-invariant — and each
    microbatch must land partials in its own batch-id directory."""
    import os

    from seisdb_spark.queries.streaming_queries import (
        streaming_quantile_rollup,
    )
    from seisdb_spark.sources.tables import load_table

    src = str(tmp_path / "sf_split")
    os.makedirs(src)
    pdf = load_table(spark, SMOKE_SF_DIR, "documents").toPandas()
    for i in range(3):
        part = pdf[pdf.doc_id % 3 == i]
        os.makedirs(f"{src}/arrival{i}")
        part.to_parquet(f"{src}/arrival{i}/documents.parquet", index=False)

    out = str(tmp_path / "hq_stream")
    got = (
        streaming_quantile_rollup(spark, src + "/arrival*", out_dir=out)
        .toPandas()
        .sort_values("q_pm")
        .reset_index(drop=True)
    )
    want = (
        REGISTRY["hist_quantile_rollup"]
        .spark(spark, SMOKE_SF_DIR)
        .toPandas()
        .sort_values("q_pm")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(os.listdir(os.path.join(out, "hist"))) == 3


def test_rollup_plan_shape(spark):
    """The (source, bin) partials aggregation is the only corpus-keyed
    shuffle; everything downstream runs on <= 64-row frames.  No Python
    boundary, no cartesian; the tiny-frame windows may sort, but only
    AFTER the histogram collapse."""
    from seisdb_spark.plancheck import final_plan, has_node

    df = REGISTRY["hist_quantile_rollup"].spark(spark, SF_DIR)
    plan = final_plan(df)
    assert not has_node(plan, "BatchEvalPython")
    assert not has_node(plan, "CartesianProduct")
    assert has_node(plan, "hashpartitioning(source")


def test_cert_gate_holds_and_grouped_bins_match_ungrouped(spark):
    """quantile_exact_sketch_cert: (a) the within_bin gate must hold for
    every (source, q_pm) — the histogram guarantee is a theorem, not a
    tolerance; (b) one row per source x probe; (c) the grouped bin
    locator restricted to one source must equal the ungrouped locator
    run on that source's partials alone (hist_quantile_bins_by IS
    hist_quantile_bins per group)."""
    from seisdb_spark.functions.histq import hist_quantile_bins_by
    from seisdb_spark.sources.tables import load_table

    pdf = (
        REGISTRY["quantile_exact_sketch_cert"]
        .spark(spark, SMOKE_SF_DIR)
        .toPandas()
    )
    n_sources = pdf.source.nunique()
    assert len(pdf) == n_sources * len(HQ_PROBE_PM)
    assert (pdf.within_bin == 1).all()

    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    some_source = pdf.source.iloc[0]
    one = docs.where(f"source = '{some_source}'")
    grouped = (
        hist_quantile_bins_by(
            hist_partials(docs, "n_chars", ["source"]), ["source"]
        )
        .where(f"source = '{some_source}'")
        .drop("source")
        .toPandas()
        .sort_values("q_pm")
        .reset_index(drop=True)
    )
    ungrouped = (
        hist_quantile_bins(
            hist_merge(hist_partials(one, "n_chars", ["source"]))
        )
        .toPandas()
        .sort_values("q_pm")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(grouped, ungrouped)
