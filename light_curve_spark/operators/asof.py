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
same (key, t) the winner is deterministic AND whole-row: the right side
travels as one struct, so the output columns always come from a single
right row — the lexicographically-greatest (value_cols..., t) tuple —
even when that row has null value members (tested against
repartitionings and null-member rows in tests/test_asof.py).
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
    # the right side travels as ONE struct column: the window's single
    # last(_r_all, ignorenulls) then picks a whole ROW — per-column
    # last() would skip a null member of the winning row and blend in
    # another row's value (no such right row would exist)
    r_struct_cols = [F.col(c) for c in value_cols] + [F.col(t_col).alias("_rt")]
    r_struct_type = (
        right.select(F.struct(*r_struct_cols).alias("_r_all")).schema["_r_all"].dataType
    )
    l = left.select(
        *keys,
        F.col(t_col).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols if c not in keys and c != t_col],
        F.lit(None).cast(r_struct_type).alias("_r_all"),
    )
    r = right.select(
        *keys,
        F.col(t_col).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys and c != t_col],
        F.struct(*r_struct_cols).alias("_r_all"),
    )
    u = l.unionByName(r)
    # right rows sort BEFORE left rows at equal t -> inclusive match.
    # _r_all as the final order key pins a deterministic winner among
    # DUPLICATE right timestamps (lexicographically-greatest row);
    # without it the order is not total and the winner flickers across
    # partitionings. Left rows carry a null _r_all, but _is_left
    # dominates their ordering.
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_is_left", "_r_all")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    winner = F.last("_r_all", ignorenulls=True).over(w)
    filled = u.select(
        *u.columns,
        *[winner[c].alias(f"{prefix}{c}") for c in value_cols],
        winner["_rt"].alias(f"{prefix}t"),
    )
    out_cols = (
        keys
        + [F.col("_t").alias(t_col)]
        + [c for c in lcols if c not in keys and c != t_col]
        + [f"{prefix}{c}" for c in value_cols]
        + [f"{prefix}t"]
    )
    return filled.filter(F.col("_is_left") == 1).select(*out_cols)
