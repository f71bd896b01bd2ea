"""Series views of the sequences table.

The engine treats each row's token stream as an irregularly-sampled
series (BASELINE.json north_star): ``t_i = i`` (position) by default,
``v_i = double(tokens[i])``; an irregular-time variant derives
deterministic per-point deltas from the token values themselves
(``delta_i = 1 + token_i mod 7``) so gap-fill paths are exercised without
extra columns (FIXTURES.md §1).

Two physical shapes (SURVEY.md §1.2):
- **array form** — one row per series, ``tokens`` kept nested. The unit
  fed to kernel operators (zero shuffle: a sequence is already one row).
- **long form** — ``posexplode`` to (key, t, v) rows. The shape for
  relational operators (rollups, window gap-fill) and for the DuckDB
  oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    series: DataFrame,
    gap: float,
    keys: list[str] | None = None,
    t_col: str = "t",
) -> DataFrame:
    """Assign a per-key ``session_id`` by inactivity gap: a new session
    starts when the time since the previous point exceeds ``gap``. The
    classic event-stream segmentation, as two stacked windows over ONE
    key partitioning (lag -> boundary flag -> running sum); Catalyst
    reuses the exchange, so it costs a single shuffle. Ties in ``t_col``
    are ordered deterministically by the remaining columns."""
    keys = keys or ["doc_id"]
    order = [F.col(t_col)] + [
        F.col(c) for c in series.columns if c not in keys and c != t_col
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    is_new = (
        F.when(F.col(t_col) - F.lag(t_col).over(w) > gap, 1)
        .otherwise(0)
    )
    run = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return series.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(run)
    ).drop("_new")


def ensure_double_series(
    series: DataFrame, cols: tuple[str, ...] = ("t", "v")
) -> DataFrame:
    """Cast-at-ingest for mixed float inputs: the reference is generic
    over f32/f64 (and mixed T,U — light-curve-interpol/src/lib.rs:4-9,
    tested at tol 1e-6 in light-curve-common/src/linspace.rs:17-20); the
    engine computes everything in f64 for determinism (SURVEY §4.2.4), so
    FloatType (or any numeric) series columns are widened to double here.
    f32→f64 is exact, so kernel results on f32 inputs agree with the f64
    path to within the inputs' own f32 quantization (tested)."""
    from pyspark.sql.types import DoubleType

    out = series
    for c in cols:
        if not isinstance(series.schema[c].dataType, DoubleType):
            out = out.withColumn(c, F.col(c).cast("double"))
    return out


def explode_series(seq: DataFrame, irregular: bool = False) -> DataFrame:
    """Long form: (doc_id, source, t double, v double).

    All JVM-side built-ins — posexplode + (for the irregular variant) a
    per-key running-sum window. The window shuffles by doc_id once; the
    regular variant is shuffle-free.
    """
    long_df = seq.select(
        "doc_id",
        "source",
        F.posexplode("tokens").alias("pos", "tok"),
    )
    if not irregular:
        return long_df.select(
            "doc_id",
            "source",
            F.col("pos").cast("double").alias("t"),
            F.col("tok").cast("double").alias("v"),
        )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # t_0 = 0; t_i = sum_{j<i} (1 + tok_j % 7)
    delta = F.lit(1) + F.pmod(F.col("tok"), F.lit(7))
    return (
        long_df.withColumn("t_next", F.sum(delta).over(w))
        .withColumn("t", (F.col("t_next") - delta).cast("double"))
        .select("doc_id", "source", "t", F.col("tok").cast("double").alias("v"))
    )
