"""Continuous-aggregate rollups at 1x/10x/100x retention tiers.

north_rule: "rolls them into continuous aggregates at 1x/10x/100x
retention tiers". A tier-T bucket is ``floor(t / (base_width * T))``.

Cascade discipline (SURVEY.md §2.5): coarser tiers are computed FROM the
next-finer tier's partials — sum-of-sums, min-of-mins, max-of-maxs,
count-of-counts — never by re-scanning raw data. At 100 TB this is the
difference between one raw scan plus two tiny shuffles and three raw
scans; it is also exactly Spark's partial/final aggregate shape, so each
cascade step is a single hash-aggregate exchange that AQE coalesces.

Non-decomposable statistics (median, MAD) cannot cascade; policy is
recompute-from-raw per tier (:func:`rollup_quantiles`) — exactness beats
sketches for the golden-parity gate (SURVEY.md §7 phase 4).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLLUP_AGG_COLS = ("n_points", "v_sum", "v_min", "v_max")


def _base_rollup(series: DataFrame, keys: list[str], width: float) -> DataFrame:
    return series.groupBy(
        *keys, F.floor(F.col("t") / F.lit(width)).alias("bucket")
    ).agg(
        F.count("v").alias("n_points"),
        F.sum("v").alias("v_sum"),
        F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
    )


def _cascade(finer: DataFrame, keys: list[str], factor: int) -> DataFrame:
    """One cascade step: partials of partials, no raw re-scan."""
    return finer.groupBy(
        *keys,
        F.floor(F.col("bucket") / F.lit(factor)).alias("bucket"),
    ).agg(
        F.sum("n_points").alias("n_points"),
        F.sum("v_sum").alias("v_sum"),
        F.min("v_min").alias("v_min"),
        F.max("v_max").alias("v_max"),
    )


def rollup_tiers(
    series: DataFrame,
    keys: list[str] | None = None,
    base_width: float = 16.0,
    tiers: tuple[int, ...] = (1, 10, 100),
) -> DataFrame:
    """(key..., tier, bucket, n_points, v_sum, v_min, v_max, v_mean) for
    every retention tier, cascaded. ``tiers`` must be ascending and each
    divisible by its predecessor."""
    keys = keys or ["doc_id", "source"]
    tiered: list[DataFrame] = []
    cur = _base_rollup(series, keys, base_width * tiers[0])
    tiered.append(cur.withColumn("tier", F.lit(tiers[0])))
    for prev_t, t in zip(tiers, tiers[1:]):
        if t % prev_t != 0:
            raise ValueError(f"tier {t} not a multiple of {prev_t}")
        cur = _cascade(cur, keys, t // prev_t)
        tiered.append(cur.withColumn("tier", F.lit(t)))
    out = reduce(lambda a, b: a.unionByName(b), tiered)
    return out.select(
        *keys,
        "tier",
        "bucket",
        "n_points",
        "v_sum",
        "v_min",
        "v_max",
        (F.col("v_sum") / F.col("n_points")).alias("v_mean"),
    )


def rollup_quantiles(
    series: DataFrame,
    keys: list[str] | None = None,
    base_width: float = 16.0,
    tiers: tuple[int, ...] = (1, 10, 100),
) -> DataFrame:
    """Exact median/MAD per tier bucket, recomputed from raw (the
    non-decomposable companion to :func:`rollup_tiers`)."""
    keys = keys or ["doc_id", "source"]
    out = None
    for t in tiers:
        bucketed = series.withColumn(
            "bucket", F.floor(F.col("t") / F.lit(base_width * t))
        )
        med = bucketed.groupBy(*keys, "bucket").agg(F.median("v").alias("v_median"))
        mad = (
            bucketed.join(med, [*keys, "bucket"])
            .groupBy(*keys, "bucket")
            .agg(F.median(F.abs(F.col("v") - F.col("v_median"))).alias("v_mad"))
        )
        tier_df = med.join(mad, [*keys, "bucket"]).withColumn("tier", F.lit(t))
        out = tier_df if out is None else out.unionByName(tier_df)
    return out.select(*keys, "tier", "bucket", "v_median", "v_mad")
