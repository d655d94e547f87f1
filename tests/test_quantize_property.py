"""Hypothesis property test for the E1/E2 encode tail (SURVEY §5.2-3):
for ANY float32 series, decode(encode(x)) is within one quantization LSB.

Shrinking matters here: the failure modes live at weird boundaries (all-equal
values, denormals, huge dynamic range, negative-only series) that a fixed
random sweep can miss."""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from seisdb_spark.pipeline import encode_records

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from seisdb_spark.session import get_spark

        _spark = get_spark(app_name="seisdb-hypothesis")
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


# min/max bounds already exclude nan/inf; bounds must be exactly
# float32-representable for width=32
_BOUND = float(np.float32(1e30))
finite_f32 = st.floats(min_value=-_BOUND, max_value=_BOUND, width=32)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(series=st.lists(finite_f32, min_size=1, max_size=64))
def test_quantize_roundtrip_bound(series):
    spark = _get_spark()
    x32 = np.asarray(series, dtype=np.float32)
    df = spark.createDataFrame(
        pd.DataFrame(
            [(0, 1, 0, 0, len(series), [float(v) for v in x32])],
            columns=["proc", "gll_id", "i_spec", "i_gll", "n_values", "series"],
        )
    )
    enc = encode_records(df).toPandas().iloc[0]
    codes = np.frombuffer(zlib.decompress(enc.blob), dtype=np.uint8)
    assert codes.size == len(series)
    xhat = codes.astype(np.float64) / 255 * enc.scale + enc.offset
    x = x32.astype(np.float64)
    # one LSB of the quantizer + float32 slack on offset/scale arithmetic
    bound = enc.scale / 255 * 1.0001 + 1e-12 + abs(enc.offset) * 1e-6 + abs(enc.scale) * 1e-6
    assert np.max(np.abs(xhat - x)) <= bound, (x.tolist(), xhat.tolist(), enc.offset, enc.scale)
