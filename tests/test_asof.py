"""As-of join: hand-checked semantics incl. the inclusive-tie rule and
the no-prior-row null case; plan must be window-based (no nested-loop
range join)."""

import pandas as pd
from pyspark.sql import functions as F

from light_curve_spark.operators.asof import asof_join


def test_asof_join_hand_checked(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a", "a", "a", "b"], "t": [5.0, 10.0, 20.0, 7.0], "lv": [1, 2, 3, 4]}
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a", "a", "a", "b"], "t": [4.0, 10.0, 15.0, 9.0], "rv": [100.0, 200.0, 300.0, 400.0]}
        )
    )
    out = {
        (r.k, r.t): (r.asof_rv, r.asof_t)
        for r in asof_join(left, right, keys=["k"], value_cols=["rv"]).collect()
    }
    assert out[("a", 5.0)] == (100.0, 4.0)     # strictly before
    assert out[("a", 10.0)] == (200.0, 10.0)   # tie -> inclusive
    assert out[("a", 20.0)] == (300.0, 15.0)   # latest of several
    assert out[("b", 7.0)] == (None, None)     # no prior right row


def test_asof_join_plan_has_no_nested_loop(spark):
    left = spark.range(10).select(
        F.lit("k").alias("k"), F.col("id").cast("double").alias("t"), F.col("id").alias("lv")
    )
    right = spark.range(10).select(
        F.lit("k").alias("k"), F.col("id").cast("double").alias("t"), F.col("id").alias("rv")
    )
    plan = (
        asof_join(left, right, keys=["k"], value_cols=["rv"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_asof_join_duplicate_right_timestamps_deterministic(spark):
    """Among several right rows at the same (key, t), the winner is the
    greatest (value..., t) tuple — and it must not flicker with
    partitioning (the round-1 nondeterminism finding)."""
    import pandas as pd

    left = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "t": [10.0], "lv": [1]})
    )
    right_pdf = pd.DataFrame(
        {"k": ["a"] * 3, "t": [5.0, 5.0, 5.0], "rv": [7.0, 9.0, 3.0]}
    )
    for parts in (1, 3):
        right = spark.createDataFrame(right_pdf).repartition(parts)
        out = asof_join(left, right, keys=["k"], value_cols=["rv"]).collect()
        assert len(out) == 1
        assert out[0].asof_rv == 9.0  # max value wins, every time
        assert out[0].asof_t == 5.0


def test_asof_join_null_value_member_stays_whole_row(spark):
    """r2 review: per-column last(ignorenulls) could blend two right rows
    when the winner has a null value member; the struct winner must keep
    the whole row (null member included)."""
    import pandas as pd

    left = spark.createDataFrame(pd.DataFrame({"k": ["a"], "t": [10.0], "lv": [1]}))
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a"],
                "t": [5.0, 5.0],
                "v1": [9.0, 5.0],
                "v2": [None, 7.0],
            }
        )
    )
    out = asof_join(left, right, keys=["k"], value_cols=["v1", "v2"]).head()
    # winner is the greatest (v1, v2, t) tuple = (9.0, NULL, 5.0) — its
    # null v2 must NOT be replaced by the other row's 7.0
    assert out.asof_v1 == 9.0
    assert out.asof_v2 is None
    assert out.asof_t == 5.0
