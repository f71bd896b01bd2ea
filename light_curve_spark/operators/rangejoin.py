"""Range (interval) join: points joined to the intervals containing
them — the general form of SURVEY §2.4's interpolate-as-range-join.

Catalyst plans a naive ``p.t BETWEEN i.start AND i.end`` theta join as a
BroadcastNestedLoopJoin — quadratic and a driver-killer at scale. The
scalable plan is the standard BUCKETIZATION trick: explode each interval
into the tumbling buckets it covers, bucket every point once, equi-join
on (key..., bucket), and re-check the exact predicate. Shuffle cost is
O(points + intervals * avg_buckets_per_interval); pick ``bucket_width``
near the typical interval length so the explode factor stays ~1-2.

Plan-asserted (no BroadcastNestedLoopJoin) and SQL-oracled in
__spark_entry__ (`events_in_signup_windows`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from light_curve_spark.functions import bucketize


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    bucket_width: float,
    t_col: str = "t",
    start_col: str = "start",
    end_col: str = "end",
    how: str = "inner",
) -> DataFrame:
    """Rows of ``points`` paired with every interval (same keys) whose
    [start, end] contains their ``t_col`` (inclusive both ends).

    Only ``how='inner'`` is supported: the containment predicate is applied
    as a post-join filter, which would silently drop the null-padded rows
    an outer join is supposed to keep (degrading 'left'/'outer' to inner).
    """
    if how != "inner":
        raise ValueError(
            "interval_join supports how='inner' only: the containment "
            "predicate is a post-join filter and would drop outer-join "
            f"null rows (got how={how!r})"
        )
    exploded = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                bucketize(start_col, bucket_width), bucketize(end_col, bucket_width)
            )
        ),
    )
    bucketed = points.withColumn("_bucket", bucketize(t_col, bucket_width))
    return (
        bucketed.join(exploded, [*keys, "_bucket"], how)
        .filter(
            (F.col(t_col) >= F.col(start_col)) & (F.col(t_col) <= F.col(end_col))
        )
        .drop("_bucket")
    )
