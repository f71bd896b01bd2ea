"""File-layout control for data-skipping reads (SURVEY §4.3 at rest).

At 100 TB the cheapest predicate is the one the scan never evaluates:
parquet footers carry per-column min/max per row group, and both Spark's
parquet reader and Iceberg's file pruning skip units whose ranges miss
the filter. That only works if the WRITE clusters rows so ranges are
TIGHT — an unsorted write leaves every file spanning the full value
domain and the stats prune nothing.

:func:`write_clustered` is the write-side discipline:
``repartitionByRange`` on the cluster columns (one range shuffle, also
the skew-safe way to bound file sizes) + ``sortWithinPartitions`` so
row groups inside each file are tight too. The same layout feeds
Iceberg's sort-order spec verbatim on a real warehouse.

The test (tests/test_layout.py) asserts the skipping PRECONDITION
rather than reader internals: per-file footer min/max ranges over the
cluster column must be (near-)disjoint after write_clustered and
full-domain without it, and the filtered scan must still push the
predicate (PushedFilters)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    mode: str = "error",
) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_cols``.

    ``num_files`` bounds the file count (defaults to the session's
    shuffle parallelism via repartitionByRange's own default)."""
    if not cluster_cols:
        raise ValueError("write_clustered needs at least one cluster column")
    if num_files is not None:
        part = df.repartitionByRange(num_files, *cluster_cols)
    else:
        part = df.repartitionByRange(*cluster_cols)
    part.sortWithinPartitions(*cluster_cols).write.mode(mode).parquet(path)


def file_column_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` per parquet data file under ``path``,
    read straight from the footers (pyarrow) — the evidence a reader's
    min/max pruning acts on."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema != column or col.statistics is None:
                    continue
                st = col.statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((lo, hi))
    return out
