"""Parity-check operator: broadcast join of produced rollups vs a golden
snapshot (bit-exact and tolerance modes)."""

import pytest
from pyspark.sql import functions as F

from light_curve_spark.operators.parity import assert_parity, verify_parity
from light_curve_spark.operators.rollup import rollup_tiers_arrays
from light_curve_spark.sources.synthetic import synthetic_sequences

KEYS = ["doc_id", "tier", "bucket"]
VALS = ["n_points", "v_sum", "v_min", "v_max"]


def test_parity_bit_exact_pass(spark):
    seq = synthetic_sequences(spark, 50, seed=42)
    a = rollup_tiers_arrays(seq)
    b = rollup_tiers_arrays(seq)
    assert verify_parity(a, b, KEYS, VALS, tol=0.0).count() == 0
    assert_parity(a, b, KEYS, VALS)  # no raise


def test_parity_detects_value_drift_and_missing_rows(spark):
    seq = synthetic_sequences(spark, 50, seed=42)
    golden = rollup_tiers_arrays(seq)
    drifted = golden.withColumn(
        "v_sum",
        F.when(F.col("doc_id") == "doc00000001", F.col("v_sum") + 1e-7).otherwise(
            F.col("v_sum")
        ),
    )
    bad = verify_parity(drifted, golden, KEYS, VALS, tol=0.0)
    assert bad.count() == golden.filter(F.col("doc_id") == "doc00000001").count()
    # within tolerance -> passes the all_close-style check
    assert verify_parity(drifted, golden, KEYS, VALS, tol=1e-6).count() == 0
    # missing rows are violations in bit-exact mode
    missing = verify_parity(golden.limit(10), golden, KEYS, VALS, tol=0.0)
    assert missing.count() > 0
    with pytest.raises(AssertionError):
        assert_parity(drifted, golden, KEYS, VALS)
    # broadcast hash join in the plan (map-side, no shuffle of produced)
    plan = (
        verify_parity(golden, golden, KEYS, VALS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
