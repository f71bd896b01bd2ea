"""Ingest validation (SURVEY.md §2.7): the reference PANICS on NaN sort
keys (sort_multiple.rs:34 unwraps partial_cmp); the engine's policy is
reject-at-ingest — filter NaN/null times and values out of the series
and COUNT the rejects into the metrics stream instead of failing the
job. At 10^12 rows a panic-per-bad-row is an outage; a reject counter is
an alert."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_series(
    series: DataFrame, t_col: str = "t", v_col: str = "v"
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean_series, reject_counts). A row is rejected when its
    time or value is null or NaN. reject_counts: one row per reason."""
    t, v = F.col(t_col), F.col(v_col)
    bad_t = t.isNull() | F.isnan(t)
    bad_v = v.isNull() | F.isnan(v)
    clean = series.filter(~bad_t & ~bad_v)
    rejects = (
        series.filter(bad_t | bad_v)
        .select(
            F.when(bad_t, F.lit("bad_time")).otherwise(F.lit("bad_value")).alias("reason")
        )
        .groupBy("reason")
        .agg(F.count("*").alias("n_rejected"))
    )
    return clean, rejects
