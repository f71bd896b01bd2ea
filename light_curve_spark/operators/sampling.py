"""Deterministic sampling / per-key selection for training-data curation.

- :func:`deterministic_sample` — reproducible uniform-ish subsample:
  rank rows per stratum by the MD5 of their id and keep the first k.
  Unlike ``df.sample()`` (seed + partition-count dependent) the result
  is a pure function of the DATA, so a re-run, a resize, or another
  engine (the DuckDB oracle) selects the same rows — the property a
  training-corpus freeze needs.
- :func:`top_k_per_key` — per-key top-k by an ordering column with a
  deterministic tie-break, via window row_number (SURVEY §2.7's per-key
  limits). One shuffle by key; no global sort.

Both are pure window expressions (codegen, SQL-twin-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def deterministic_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str,
) -> DataFrame:
    """First ``k`` rows per stratum in MD5(id) order (+ id tie-break)."""
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


def top_k_per_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Top-k rows per key by ``order_col``; ties broken deterministically
    by ``tiebreak_cols`` (required when order_col values can repeat)."""
    ordering = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    ordering += [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )
