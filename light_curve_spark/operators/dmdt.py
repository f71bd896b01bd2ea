"""dm-dt map operator: per-key 2-D histogram over all ordered point
pairs (dt = t_j - t_i, dm = v_j - v_i, i<j by time).

Capability parity with the reference ecosystem's ``light-curve-dmdt``
crate (named at /root/reference/README.md:17; construction follows the
public Mahabal et al. 2017 dm-dt image definition, linear-bin variant).

Two implementations:
- :func:`dmdt_kernel` — collect_list + one ``mapInArrow`` pass around
  kernels.features.dmdt_counts (outer-difference vectorization). One
  partial+final aggregate gathers each key's points into an array row;
  the kernel batch then loops keys in numpy only (no per-group Spark
  dispatch — same pattern as features.extract_features_grouped, which
  measured ~7x over per-group applyInPandas). O(n^2) pairs per key:
  ``max_points`` deterministically downsamples mega-keys (every k-th
  point in time order) — the skew guard for pairwise operators at scale.
  Default is ``"auto"`` (= DEFAULT_MAX_POINTS): a single 10^6-point key
  would otherwise materialize a ~8 TB pair matrix and OOM the worker.
  Oracle-checked runs pass ``max_points=None`` EXPLICITLY to pin the
  exact path (and accept the quadratic cost knowingly).
- :func:`dmdt_relational` — time-ordered self-join twin (SQL-checkable,
  the DuckDB oracle in __spark_entry__). Deliberately quadratic — it is
  the ORACLE BASELINE; a ``max_input_rows`` ceiling refuses real-corpus
  inputs and points at the kernel as the scale twin.

Tie semantics: both paths drop tied-timestamp pairs (strict ``a.t <
b.t`` / ``dt > 0``), so they agree on any input.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from light_curve_spark.kernels.features import dmdt_counts
from light_curve_spark.kernels.sorting import cosort

# 4096 points -> a 4096x4096 f64 pair matrix = 134 MB per temporary
# (dmdt_counts holds ~3) — bounded well under an executor-core budget,
# while exact for every real-survey cadence (ZTF fields are ~10^3 points)
DEFAULT_MAX_POINTS = 4096


def dmdt_kernel(
    series: DataFrame,
    dt_width: float,
    dm_width: float,
    n_dt: int,
    n_dm: int,
    dm_offset: float,
    keys: list[str] | None = None,
    max_points: int | None | str = "auto",
) -> DataFrame:
    """(key..., dt_bin, dm_bin, n_pairs), zero rows for empty cells."""
    import pyarrow as pa

    if max_points == "auto":
        max_points = DEFAULT_MAX_POINTS
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
    g = series.groupBy(*keys).agg(F.collect_list(F.struct("t", "v")).alias("_pts"))

    def fn(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            pts = b.column(b.schema.get_field_index("_pts"))
            off = pts.offsets.to_numpy()
            lengths = (off[1:] - off[:-1]).astype(np.int64)
            starts = np.cumsum(lengths) - lengths
            flat = pts.flatten()
            t_flat = flat.field("t").to_numpy().astype(np.float64)
            v_flat = flat.field("v").to_numpy().astype(np.float64)
            row_idx, bis, bjs, cnts = [], [], [], []
            for i in range(b.num_rows):
                s, ln = starts[i], lengths[i]
                t, v = cosort(t_flat[s : s + ln], v_flat[s : s + ln])
                if max_points is not None and ln > max_points:
                    step = int(np.ceil(ln / max_points))
                    t, v = t[::step], v[::step]
                grid = dmdt_counts(
                    t, v, dt_width, dm_width, n_dt, n_dm, dm_offset, strict_dt=True
                )
                ii, jj = np.nonzero(grid)
                if ii.size:
                    row_idx.append(np.full(ii.size, i, dtype=np.int64))
                    bis.append(ii.astype(np.int64))
                    bjs.append(jj.astype(np.int64))
                    cnts.append(grid[ii, jj])
            if not row_idx:
                continue
            idx = pa.array(np.concatenate(row_idx))
            arrays = [
                b.column(b.schema.get_field_index(k)).take(idx) for k in keys
            ] + [
                pa.array(np.concatenate(bis)),
                pa.array(np.concatenate(bjs)),
                pa.array(np.concatenate(cnts)),
            ]
            yield pa.RecordBatch.from_arrays(
                arrays, [*keys, "dt_bin", "dm_bin", "n_pairs"]
            )

    return g.mapInArrow(fn, schema=schema)


def dmdt_relational(
    series: DataFrame,
    dt_width: float,
    dm_width: float,
    n_dt: int,
    n_dm: int,
    dm_offset: float,
    keys: list[str] | None = None,
    max_input_rows: int = 5_000_000,
) -> DataFrame:
    """Self-join twin: same math as the kernel (the pair order i<j is
    'a.t < b.t', so tied timestamps contribute no pair — both paths).

    ORACLE BASELINE, deliberately O(n^2)-per-key: refuses inputs above
    ``max_input_rows`` so nobody points it at a real corpus — use
    :func:`dmdt_kernel` (bounded max_points) as the scale twin."""
    n = series.count()
    if n > max_input_rows:
        raise ValueError(
            f"dmdt_relational is the quadratic oracle baseline; input has "
            f"{n} rows > max_input_rows={max_input_rows}. Use dmdt_kernel "
            "for real corpora."
        )
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
