"""dm-dt map operator: per-key 2-D histogram over all ordered point
pairs (dt = t_j - t_i, dm = v_j - v_i, i<j by time).

Capability parity with the reference ecosystem's ``light-curve-dmdt``
crate (named at /root/reference/README.md:17; construction follows the
public Mahabal et al. 2017 dm-dt image definition, linear-bin variant).

Two implementations:
- :func:`dmdt_kernel` — per-key applyInPandas around
  kernels.features.dmdt_counts (outer-difference vectorization). O(n^2)
  pairs per key: the operator guards with ``max_points`` deterministic
  downsampling (every k-th point in time order) so one mega-key cannot
  quadratically blow a task — the skew story for pairwise operators.
- :func:`dmdt_relational` — time-ordered self-join twin (SQL-checkable,
  the DuckDB oracle in __spark_entry__).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from light_curve_spark.kernels.features import dmdt_counts
from light_curve_spark.kernels.sorting import cosort


def dmdt_kernel(
    series: DataFrame,
    dt_width: float,
    dm_width: float,
    n_dt: int,
    n_dm: int,
    dm_offset: float,
    keys: list[str] | None = None,
    max_points: int = 2048,
) -> DataFrame:
    """(key..., dt_bin, dm_bin, n_pairs), zero rows for empty cells."""
    keys = keys or ["doc_id"]
    in_fields = {f.name: f for f in series.schema.fields}
    schema = StructType(
        [in_fields[k] for k in keys]
        + [
            StructField("dt_bin", LongType(), False),
            StructField("dm_bin", LongType(), False),
            StructField("n_pairs", LongType(), False),
        ]
    )

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        t = pdf["t"].to_numpy(dtype=np.float64)
        v = pdf["v"].to_numpy(dtype=np.float64)
        t, v = cosort(t, v)
        if t.shape[0] > max_points:
            step = int(np.ceil(t.shape[0] / max_points))
            t, v = t[::step], v[::step]
        grid = dmdt_counts(t, v, dt_width, dm_width, n_dt, n_dm, dm_offset)
        ii, jj = np.nonzero(grid)
        return pd.DataFrame(
            {
                **dict(zip(keys, key)),
                "dt_bin": ii.astype(np.int64),
                "dm_bin": jj.astype(np.int64),
                "n_pairs": grid[ii, jj],
            }
        )

    return series.groupBy(*keys).applyInPandas(fn, schema=schema)


def dmdt_relational(
    series: DataFrame,
    dt_width: float,
    dm_width: float,
    n_dt: int,
    n_dm: int,
    dm_offset: float,
    keys: list[str] | None = None,
) -> DataFrame:
    """Self-join twin: same math as the kernel on keys with distinct
    timestamps (the pair order i<j is 'a.t < b.t')."""
    keys = keys or ["doc_id"]
    a = series.alias("a")
    b = series.alias("b")
    cond = F.col("a.t") < F.col("b.t")
    for k in keys:
        cond = (F.col(f"a.{k}") == F.col(f"b.{k}")) & cond
    dt = F.col("b.t") - F.col("a.t")
    dm = F.col("b.v") - F.col("a.v")
    bi = F.floor(dt / F.lit(dt_width))
    bj = F.floor((dm + F.lit(dm_offset)) / F.lit(dm_width))
    return (
        a.join(b, cond)
        .select(*[F.col(f"a.{k}").alias(k) for k in keys], bi.alias("dt_bin"), bj.alias("dm_bin"))
        .filter(
            (F.col("dt_bin") >= 0)
            & (F.col("dt_bin") < n_dt)
            & (F.col("dm_bin") >= 0)
            & (F.col("dm_bin") < n_dm)
        )
        .groupBy(*keys, "dt_bin", "dm_bin")
        .agg(F.count("*").alias("n_pairs"))
    )
