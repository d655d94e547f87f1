#!/usr/bin/env python
"""Interleaved same-session A/B: e1/e2 quantize window — min/max inlined
per reference (7 window functions) vs hoisted into two named window
columns (r19, guide §1.2 — the PQ-fold-hoist discipline applied to
ExtractWindowExpressions).

Asserts bit-identical results (full row compare via sorted collect of the
sha/csv outputs) before timing; prints medians + the window-function count
of each plan."""

from __future__ import annotations

import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from seisdb_spark.plancheck import final_plan  # noqa: E402
from seisdb_spark.queries import REGISTRY  # noqa: E402
from seisdb_spark.session import get_spark  # noqa: E402
from seisdb_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def e2_old(spark, sf_dir):
    """The pre-r19 shape: off/raw_scl window exprs inlined per reference."""
    import zlib
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import types as T

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    off = F.min("l_extendedprice").over(w)
    raw_scl = F.max("l_extendedprice").over(w) - off
    scl = F.when(raw_scl == 0, F.lit(1.0)).otherwise(raw_scl)
    code = F.when(raw_scl == 0, F.lit(0)).otherwise(
        F.floor(((F.col("l_extendedprice") - off) / scl) * 255)
    ).cast("int")
    coded = li.select("l_partkey", "l_orderkey", "l_linenumber", code.alias("code"))
    arr = F.transform(
        F.sort_array(F.collect_list(F.struct("l_orderkey", "l_linenumber", "code"))),
        lambda x: x["code"],
    )
    grouped = coded.groupBy("l_partkey").agg(arr.alias("codes"))
    out_schema = T.StructType(
        [
            T.StructField("l_partkey", T.LongType(), False),
            T.StructField("n_codes", T.LongType(), False),
            T.StructField("blob_len", T.LongType(), False),
            T.StructField("blob", T.BinaryType(), False),
        ]
    )

    def compress(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = [
                zlib.compress(np.asarray(c, dtype=np.uint8).tobytes())
                for c in pdf["codes"]
            ]
            yield pd.DataFrame(
                {
                    "l_partkey": pdf["l_partkey"].astype("int64"),
                    "n_codes": [len(c) for c in pdf["codes"]],
                    "blob_len": [len(b) for b in blobs],
                    "blob": blobs,
                }
            )

    packed = grouped.mapInPandas(compress, out_schema)
    return packed.select(
        "l_partkey", "n_codes", "blob_len", F.sha2("blob", 256).alias("blob_sha")
    )


def n_window_funcs(plan: str) -> int:
    """Max number of windowspecdefinition occurrences on one Window line."""
    best = 0
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            best = max(best, line.count("windowspecdefinition"))
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-e2-window")
    spark.sparkContext.setLogLevel("ERROR")

    new_fn = REGISTRY["e2_zlib_blob"].spark
    old_rows = sorted(map(tuple, e2_old(spark, SF_DIR).collect()))
    new_rows = sorted(map(tuple, new_fn(spark, SF_DIR).collect()))
    assert old_rows == new_rows, "RESULTS DIFFER — abort"
    print(f"results identical ({len(new_rows)} rows)")

    p_old, p_new = None, None
    t_old, t_new = [], []
    for _ in range(n):
        df = e2_old(spark, SF_DIR)
        t0 = time.perf_counter()
        df.count()
        t_old.append(time.perf_counter() - t0)
        p_old = final_plan(df)
        df = new_fn(spark, SF_DIR)
        t0 = time.perf_counter()
        df.count()
        t_new.append(time.perf_counter() - t0)
        p_new = final_plan(df)
    print(f"window funcs: old={n_window_funcs(p_old)} new={n_window_funcs(p_new)}")
    print(
        f"old median {statistics.median(t_old):.3f} {sorted(round(t, 3) for t in t_old)}"
    )
    print(
        f"new median {statistics.median(t_new):.3f} {sorted(round(t, 3) for t in t_new)}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
