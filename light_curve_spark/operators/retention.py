"""Retention policy over the tiered rollup table (the 'retention' in
"rollup + downsample + retention engine", BASELINE.json north_star).

Classic tiered retention semantics (as in TimescaleDB/Gorilla-style
stores): fine tiers keep a SHORT horizon, coarse tiers keep a LONG one —
recent data stays queryable at full resolution while history survives
only in downsampled form. A bucket at tier T covers
``[bucket * width_T, (bucket+1) * width_T)``; it is retained iff its END
is within that tier's horizon of the watermark:

    (bucket + 1) * base_width * tier > watermark - horizon[tier]

Pure filter (no shuffle, partition-prunable when the table is written
partitioned by tier)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_retention(
    rollup: DataFrame,
    watermark: float,
    horizons: dict[int, float],
    base_width: float = 16.0,
) -> DataFrame:
    """Keep only buckets inside each tier's retention horizon. Tiers
    absent from ``horizons`` are kept forever."""
    cond = None
    for tier, horizon in horizons.items():
        end = (F.col("bucket") + 1) * F.lit(base_width * tier)
        keep = (F.col("tier") == tier) & (end > F.lit(watermark - horizon))
        cond = keep if cond is None else (cond | keep)
    others = ~F.col("tier").isin(list(horizons))
    cond = others if cond is None else (cond | others)
    return rollup.filter(cond)


def expired(rollup: DataFrame, watermark: float, horizons: dict[int, float],
            base_width: float = 16.0) -> DataFrame:
    """Complement of :func:`apply_retention`: the buckets a maintenance
    job would delete (Iceberg: DELETE WHERE on the partition column)."""
    kept = apply_retention(rollup, watermark, horizons, base_width)
    return rollup.exceptAll(kept)
