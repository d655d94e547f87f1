"""Tests for deterministic weighted sampling without replacement
(``weighted_sample_wor`` — Efraimidis-Spirakis with md5-derived
uniforms and the octave-Pade integer log).

Oracle parity is in test_oracle_parity.py; these pin what it can't:
exact agreement with a pure-Python E-S implementation (integer keys
leave no tolerance), the WEIGHT-PROPORTIONALITY of inclusion — the
property that makes it a weighted sampler rather than a hash shuffle —
via 200 deterministic two-doc strata, and the plan staying a
partition-local window.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from tests.conftest import SF_DIR

from seisdb_spark.queries.extensions import (
    ES_HASH_HEX,
    ES_SAMPLE_K,
    ES_U_DENOM,
)
from seisdb_spark.queries.registry import REGISTRY
from tests.test_ngram_lm import py_nll_nano


def py_es_key(doc_id: int, weight: int) -> int:
    """Pure-Python twin of the engine's priority key."""
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:ES_HASH_HEX], 16)
    return (py_nll_nano(ES_U_DENOM, h + 1) * 1_000_000) // weight


def _mk_docs(rows):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    return pdf


def test_sample_matches_python_golden_exactly(spark, tmp_path):
    """Keys, ranks, and the selected set must equal the pure-Python
    E-S sampler bit for bit."""
    rows = [
        (i, "t", f"l{i % 3}", "src0", 10 + (i * 7) % 90) for i in range(60)
    ]
    _mk_docs(rows).to_parquet(tmp_path / "documents.parquet")
    out = (
        REGISTRY["weighted_sample_wor"].spark(spark, str(tmp_path)).toPandas()
    )
    # golden: per-lang sort by (key, doc_id), take K
    golden = {}
    for doc_id, _, lang, _, n_chars in rows:
        golden.setdefault(lang, []).append(
            (py_es_key(doc_id, n_chars), doc_id, n_chars)
        )
    for lang, items in golden.items():
        items.sort()
        want = items[:ES_SAMPLE_K]
        got = out[out.lang == lang].sort_values("rank")
        assert len(got) == len(want)
        for rank0, (key, doc_id, w) in enumerate(want):
            row = got.iloc[rank0]
            assert (row.doc_id, row.weight, row.es_key, row["rank"]) == (
                doc_id,
                w,
                key,
                rank0 + 1,
            )


def test_inclusion_is_weight_proportional(spark, tmp_path):
    """The E-S guarantee: in a two-doc stratum with weights 9:1, the
    heavy doc wins rank 1 with probability 0.9.  200 deterministic
    strata (the hash IS the randomness) must land near 180 wins —
    [0.82, 0.97] covers +-3.5 sigma.  A rank-by-hash-only bug (weight
    ignored) would land at ~0.5 and fail loudly."""
    rows = []
    for g in range(200):
        rows.append((2 * g, "t", f"g{g}", "src0", 900))  # heavy
        rows.append((2 * g + 1, "t", f"g{g}", "src0", 100))  # light
    _mk_docs(rows).to_parquet(tmp_path / "documents.parquet")
    out = (
        REGISTRY["weighted_sample_wor"].spark(spark, str(tmp_path)).toPandas()
    )
    first = out[out["rank"] == 1]
    assert len(first) == 200
    heavy_wins = (first.doc_id % 2 == 0).mean()
    assert 0.82 <= heavy_wins <= 0.97, heavy_wins


def test_sample_is_exact_k_per_group_on_corpus(spark):
    """On the driver corpus every language must yield exactly K rows
    (all groups have > K docs) with dense ranks 1..K."""
    out = REGISTRY["weighted_sample_wor"].spark(spark, SF_DIR).toPandas()
    sizes = out.groupby("lang")["rank"].agg(["size", "min", "max"])
    assert (sizes["size"] == ES_SAMPLE_K).all()
    assert (sizes["min"] == 1).all()
    assert (sizes["max"] == ES_SAMPLE_K).all()


def test_plan_partition_local_window(spark):
    """The per-lang window must hash-partition on lang (partition-local
    sort) — never a global range sort — and stay JVM-side."""
    from seisdb_spark.plancheck import final_plan, has_node

    df = REGISTRY["weighted_sample_wor"].spark(spark, SF_DIR)
    plan = final_plan(df)
    assert has_node(plan, "hashpartitioning(lang")
    assert not has_node(plan, "rangepartitioning")
    assert not has_node(plan, "BatchEvalPython")
    assert not has_node(plan, "CartesianProduct")
