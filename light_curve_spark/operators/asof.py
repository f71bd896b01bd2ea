"""As-of (point-in-time) join: attach to each left row the latest right
row at-or-before its timestamp, per key.

The reference's Interpolator is semantically an as-of/interval join
(SURVEY.md §2.4); this operator exposes the general backward as-of join
as a first-class primitive using the same shuffle-free-after-union plan
as gap-fill strategy R: tag the two sides, union, one key-partitioned
window pass with last(..., ignorenulls) — NO range join, NO
BroadcastNestedLoopJoin (the plan Catalyst would pick for the naive
``l.t >= r.t`` theta join, which is quadratic at scale).

Ties: a right row AT the left timestamp matches (inclusive, like
DuckDB/pandas ``ASOF JOIN`` backward semantics — the DuckDB twin in
__spark_entry__ cross-checks this). Among MULTIPLE right rows at the
same (key, t) the winner is deterministic: the row with the greatest
(value_cols..., t) tuple — pinned by a struct column in the window
order, tested against repartitionings in tests/test_asof.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    value_cols: list[str],
    t_col: str = "t",
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join. Output: every left row + ``prefix``-renamed
    right value columns (+ ``prefix``t = matching right timestamp), null
    when no right row precedes the left row."""
    lcols = [c for c in left.columns]
    l = left.select(
        *keys,
        F.col(t_col).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols if c not in keys and c != t_col],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[t_col].dataType).alias("_r_t"),
    )
    r = right.select(
        *keys,
        F.col(t_col).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys and c != t_col],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(t_col).alias("_r_t"),
    )
    u = l.unionByName(r).withColumn(
        # deterministic tie-break among DUPLICATE right timestamps: order
        # right rows by the struct of their value columns (+ _r_t), so
        # last() always picks the lexicographically-greatest right row.
        # Without this, orderBy('_t','_is_left') is not a total order and
        # the winner flickers across runs/partitionings.
        "_r_ord",
        F.struct(*[F.col(f"_r_{c}") for c in value_cols], F.col("_r_t")),
    )
    # right rows sort BEFORE left rows at equal t -> inclusive match
    # (left rows carry a null _r_ord but _is_left dominates the ordering,
    # and all last() sources are non-null only on right rows)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_is_left", "_r_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *u.columns,
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in value_cols
        ],
        F.last("_r_t", ignorenulls=True).over(w).alias(f"{prefix}t"),
    )
    out_cols = (
        keys
        + [F.col("_t").alias(t_col)]
        + [c for c in lcols if c not in keys and c != t_col]
        + [f"{prefix}{c}" for c in value_cols]
        + [f"{prefix}t"]
    )
    return filled.filter(F.col("_is_left") == 1).select(*out_cols)
