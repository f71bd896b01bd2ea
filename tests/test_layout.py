"""write_clustered: the data-skipping precondition must actually hold in
the parquet footers, and the read side must still push the predicate."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from light_curve_spark.sources.layout import file_column_ranges, write_clustered


def _overlap_count(ranges):
    """How many pairs of per-file [min, max] ranges overlap."""
    n = 0
    for i in range(len(ranges)):
        for j in range(i + 1, len(ranges)):
            (a_lo, a_hi), (b_lo, b_hi) = ranges[i], ranges[j]
            if a_lo <= b_hi and b_lo <= a_hi:
                n += 1
    return n


def test_write_clustered_tightens_file_ranges_and_keeps_pushdown(spark, tmp_path):
    df = spark.range(40_000).select(
        F.col("id"),
        F.pmod(F.col("id") * 2654435761, F.lit(10_000)).alias("bucket"),
        (F.col("id") % 97).cast("double").alias("v"),
    )

    # baseline: unclustered write -> every file spans ~the full domain
    flat = str(tmp_path / "flat")
    df.repartition(8).write.parquet(flat)
    flat_ranges = file_column_ranges(flat, "bucket")
    assert len(flat_ranges) >= 4
    assert _overlap_count(flat_ranges) == len(flat_ranges) * (len(flat_ranges) - 1) // 2

    # clustered write -> per-file ranges are disjoint (range partitioner
    # boundaries), so min/max pruning can skip all but ~one file
    clus = str(tmp_path / "clustered")
    write_clustered(df, clus, ["bucket"], num_files=8)
    clus_ranges = file_column_ranges(clus, "bucket")
    assert len(clus_ranges) >= 4
    assert _overlap_count(clus_ranges) == 0, clus_ranges

    # values survive the relayout
    back = spark.read.parquet(clus)
    assert back.count() == 40_000
    assert back.agg(F.sum("bucket")).head()[0] == df.agg(F.sum("bucket")).head()[0]

    # and the filtered read still pushes the predicate to the scan
    q = back.filter(F.col("bucket") == 123).select("id")
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [IsNotNull(bucket), EqualTo(bucket,123)]" in plan

    import pytest

    with pytest.raises(ValueError, match="cluster column"):
        write_clustered(df, str(tmp_path / "x"), [])
