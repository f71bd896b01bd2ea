"""Golden-fixture replay: the committed parquet goldens (reference test
vectors + the frozen ZTF regrid) must replay bit/tolerance-clean through
both the numpy kernel and the Spark kernel operator (FIXTURES.md §2-3).
Tolerance: all_close semantics, strict '<', abs 1e-6 (reference f32
cases) — the kernel itself is f64 so the regrid golden is bit-exact."""

import os

import numpy as np
import pandas as pd
import pytest

from light_curve_spark.kernels import all_close, interpolate, linspace

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def test_interp_goldens_replay_kernel():
    df = pd.read_parquet(os.path.join(FIXTURES, "interp_goldens.parquet"))
    assert len(df) == 5
    for _, row in df.iterrows():
        got = interpolate(row.x, row.y, row.target_x, row.left, row.right)
        if len(row.expected) == 0:
            assert got.shape == (0,)
        else:
            all_close(got, np.asarray(row.expected), 1e-6)


def test_ztf_regrid_golden_bit_exact():
    row = pd.read_parquet(os.path.join(FIXTURES, "ztf_bench_curve.parquet")).iloc[0]
    assert len(row.t) == 156  # the reference's real photometry curve
    grid = linspace(row.grid_start, row.grid_end, int(row.grid_n))
    got = interpolate(row.t, row.v, grid, row.left, row.right)
    # frozen golden: BIT equality (north_star bit-match requirement)
    assert got.tolist() == list(row.expected)


def test_ztf_regrid_golden_through_spark(spark):
    from light_curve_spark.operators.gapfill import regrid_kernel

    row = pd.read_parquet(os.path.join(FIXTURES, "ztf_bench_curve.parquet")).iloc[0]
    series = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["ztf"] * 156, "t": row.t, "v": row.v})
    )
    out = regrid_kernel(
        series, row.grid_start, row.grid_end, int(row.grid_n),
        left=row.left, right=row.right,
    ).head()
    assert list(out.grid_v) == list(row.expected)  # bit-exact through Spark
