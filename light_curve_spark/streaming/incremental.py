"""Incremental continuous aggregates over append-only snapshots.

The rollup partials (n_points, v_sum, v_min, v_max) form a commutative
monoid, so folding a new snapshot into an existing rollup is a groupBy
over the union of partials — identical math to the tier cascade
(operators/rollup.py), applied across TIME instead of across tiers.
This is the batch twin of a streaming windowed aggregation: per new
Iceberg snapshot the scheduler runs

    new_partials = rollup_tiers(explode_series(new_rows))
    rollup_table = merge_rollups(rollup_table, new_partials)

and appends the result — no state store, no watermark, exactly-once by
snapshot id (the checkpoint records which input snapshots are folded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_rollups(existing: DataFrame, new: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Fold two rollup partial tables (same schema as rollup_tiers
    output) into one. Decomposable stats only; v_mean is re-derived."""
    keys = keys or ["doc_id", "source"]
    group_cols = [*keys, "tier", "bucket"]
    both = existing.select(
        *group_cols, "n_points", "v_sum", "v_min", "v_max"
    ).unionByName(new.select(*group_cols, "n_points", "v_sum", "v_min", "v_max"))
    return both.groupBy(*group_cols).agg(
        F.sum("n_points").alias("n_points"),
        F.sum("v_sum").alias("v_sum"),
        F.min("v_min").alias("v_min"),
        F.max("v_max").alias("v_max"),
    ).withColumn("v_mean", F.col("v_sum") / F.col("n_points"))


def incremental_rollup(
    spark,
    storage,
    new_rows: DataFrame,
    keys: list[str] | None = None,
    base_width: float = 16.0,
    tiers: tuple[int, ...] = (1, 10, 100),
) -> str:
    """Fold ``new_rows`` (sequences) into the stored rollup table and
    append the merged result as a new snapshot; returns the snapshot id.

    The merged table is written whole (rollup tables are ~10^6x smaller
    than raw at tier 100); at true 10^12 scale the write switches to a
    MERGE INTO on (key, tier, bucket), which Iceberg supports natively.
    """
    from light_curve_spark.operators.rollup import rollup_tiers
    from light_curve_spark.operators.series import explode_series

    new_partials = rollup_tiers(
        explode_series(new_rows), keys=keys, base_width=base_width, tiers=tiers
    )
    try:
        # each snapshot holds the FULL merged state -> read latest only
        existing = storage.read_snapshot("rollup_continuous")
        merged = merge_rollups(existing, new_partials, keys=keys)
    except ValueError:
        merged = new_partials
    return storage.append(merged, "rollup_continuous")


def retract_rollup_state(
    storage,
    deleted,
    retained=None,
    keys: list[str] | None = None,
    base_width: float = 16.0,
    tiers: tuple[int, ...] = (1, 10, 100),
    table: str = "rollup_continuous",
) -> str:
    """Remove deleted data from the persisted continuous-aggregate state
    (the fold's right-to-be-forgotten twin, round 6) and append the
    reduced state as a new snapshot; returns the snapshot id. Earlier
    snapshots still hold the pre-delete state — a real deployment
    expires them (Iceberg ``expire_snapshots``; the parquet fallback's
    ``replace()`` via compaction), same posture as the tombstone tables.

    Two delete shapes, matching how continuous aggregates actually
    shrink:

    - ``retained is None``: ``deleted`` is a DataFrame of WHOLE key
      tuples (e.g. entire ``doc_id``/``user_id`` entities — the common
      GDPR case). Every bucket of a deleted key dies wholesale, so no
      extremum can survive partially and the retraction is ONE
      broadcast anti-join on the state table — no raw access at all.
    - ``retained`` given: both are LONG-FORM series (keys + t + v) and
      the partial-bucket math delegates to
      :func:`~light_curve_spark.operators.rollup.retract_from_rollup`
      (decomposables subtract; extrema recompute only in the buckets a
      deleted row topped, raw rescan bounded by that footprint).

    The result equals ``rollup_tiers`` over the corpus without the
    deleted data (pytest-gated both shapes)."""
    from light_curve_spark.operators.rollup import retract_from_rollup

    keys = keys or ["doc_id", "source"]
    existing = storage.read_snapshot(table)
    if retained is None:
        join_cols = [c for c in keys if c in deleted.columns]
        if not join_cols:
            raise ValueError(
                f"deleted carries none of the rollup keys {keys!r} — "
                "pass whole-key tuples, or long-form deleted+retained "
                "series for partial-bucket retraction"
            )
        reduced = existing.join(
            F.broadcast(deleted.select(*join_cols).distinct()),
            join_cols,
            "left_anti",
        )
    else:
        reduced = retract_from_rollup(
            existing,
            deleted,
            retained,
            keys=keys,
            base_width=base_width,
            tiers=tiers,
        )
    return storage.append(reduced, table)
