"""Gap-fill and regrid operators: LOCF + linear interpolation.

Three operators (SURVEY.md §2.6, north_rule "LOCF + linear-interpolation
gap-fill"):

- :func:`locf` — last-observation-carried-forward over an ordered series
  (pure window built-ins, one shuffle by key).
- :func:`interpolate_relational` — strategy R (SURVEY.md §2.1 op #3):
  grid rows are unioned under the series and a single key-partitioned
  window pass derives (prev knot, next knot) per grid point; the lerp and
  the left/right boundary fills are plain expressions. SQL-checkable
  (DuckDB twin in __spark_entry__). Duplicate-knot semantics match the
  reference (first dup for exact hits / right neighbor, last dup for the
  left neighbor — light-curve-interpol/src/lib.rs:55), cross-checked
  against the kernel path on duplicate-t data in tests.
- :func:`regrid_kernel` — strategy K, the golden-parity path: per-series
  applyInPandas around kernels.interpolate (bit-exact reference
  semantics, /root/reference/light-curve-interpol/src/lib.rs:32-71),
  regridding every series onto a shared linspace grid
  (the reference benchmark's workload shape, benches/lib.rs:325-336).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StructField,
    StructType,
)

from light_curve_spark.kernels.grid import linspace
from light_curve_spark.kernels.interpolate import interpolate
from light_curve_spark.kernels.sorting import cosort


def locf(series: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Fill null ``v`` by carrying the last non-null value forward in
    ``t`` order within each key (SURVEY.md §2.6)."""
    keys = keys or ["doc_id"]
    w = (
        Window.partitionBy(*keys)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return series.withColumn("v_filled", F.last("v", ignorenulls=True).over(w))


def grid_points(start: float, end: float, n: int) -> F.Column:
    """Array column with the reference linspace accumulation formula
    start + step*i (light-curve-common/src/linspace.rs:23-25)."""
    step = (end - start) / (n - 1)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: F.lit(float(start)) + F.lit(float(step)) * i.cast("double"),
    )


def interpolate_relational(
    series: DataFrame,
    grid: DataFrame,
    left: float,
    right: float,
    keys: list[str] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Regrid ``series`` (key..., t, v) onto ``grid`` (key..., t) rows.

    One unionByName + one hash partition by key feeding two mirrored
    window passes (prev/next knot); no join. Output: (key..., t, v).

    Duplicate-knot semantics match the reference kernel
    (light-curve-interpol/src/lib.rs:55): at duplicate knot timestamps an
    exact hit and the right-neighbor use the FIRST duplicate, the
    left-neighbor uses the LAST. "First/last" follow ``order_col`` (the
    caller's row-order column) when given; otherwise the value itself is
    the deterministic tie order (first = smallest v) — pass ``order_col``
    whenever the original row order matters.
    """
    keys = keys or ["doc_id"]
    ord_src = order_col or "v"
    ord_type = series.schema[ord_src].dataType
    s = series.select(
        *keys, "t", "v", F.col(ord_src).alias("_ord"), F.lit(0).alias("is_grid")
    )
    g = grid.select(
        *keys,
        "t",
        F.lit(None).cast("double").alias("v"),
        F.lit(None).cast(ord_type).alias("_ord"),
        F.lit(1).alias("is_grid"),
    )
    u = s.unionByName(g)
    # grid rows sort BEFORE knots at equal t (is_grid DESC): the next-knot
    # window then still sees same-t knots, so an exact hit degenerates to
    # next_v == the FIRST duplicate knot, while the prev-knot window only
    # sees strictly-earlier knots (whose last duplicate wins) — exactly
    # the reference's searchsorted semantics.
    order = [F.col("t").asc(), F.col("is_grid").desc(), F.col("_ord").asc()]
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    knot_t = F.when(F.col("v").isNotNull(), F.col("t"))
    filled = (
        u.withColumn("prev_v", F.last("v", ignorenulls=True).over(w_prev))
        .withColumn("prev_t", F.last(knot_t, ignorenulls=True).over(w_prev))
        .withColumn("next_v", F.first("v", ignorenulls=True).over(w_next))
        .withColumn("next_t", F.first(knot_t, ignorenulls=True).over(w_next))
        .filter(F.col("is_grid") == 1)
    )
    alpha = (F.col("next_t") - F.col("t")) / (F.col("next_t") - F.col("prev_t"))
    v_out = (
        F.when(F.col("next_t") == F.col("t"), F.col("next_v"))  # exact hit
        .when(F.col("prev_t").isNull(), F.lit(left))  # before first knot
        .when(F.col("next_t").isNull(), F.lit(right))  # after last knot
        .otherwise(alpha * F.col("prev_v") + (F.lit(1.0) - alpha) * F.col("next_v"))
    )
    return filled.select(*keys, "t", v_out.alias("v"))


def regrid_kernel(
    series: DataFrame,
    grid_start: float,
    grid_end: float,
    grid_n: int,
    left: float = 0.0,
    right: float = 0.0,
    keys: list[str] | None = None,
) -> DataFrame:
    """Strategy K: per-series regrid with exact reference semantics.

    Input long form (key..., t, v); output one row per series with the
    regridded value array (array output keeps it one row per series —
    no explode, no second shuffle). Unsorted/duplicate-t input is handled
    by the kernel's cosort (stable, matches sort_multiple semantics).
    """
    keys = keys or ["doc_id"]
    target = linspace(grid_start, grid_end, grid_n)
    in_fields = {f.name: f for f in series.schema.fields}
    schema = StructType(
        [in_fields[k] for k in keys]
        + [StructField("grid_v", ArrayType(DoubleType(), False), False)]
    )

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        t = pdf["t"].to_numpy(dtype=np.float64)
        v = pdf["v"].to_numpy(dtype=np.float64)
        t, v = cosort(t, v)
        out = interpolate(t, v, target, left, right)
        return pd.DataFrame({**dict(zip(keys, key)), "grid_v": [out]})

    return series.groupBy(*keys).applyInPandas(fn, schema=schema)
