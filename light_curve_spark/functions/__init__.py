"""Column-function surface (SURVEY.md §2.8): the engine's reusable
scalar/array expressions, composable like ``pyspark.sql.functions``.

Everything here is a pure Column-in/Column-out builder over Spark
built-ins (whole-stage codegen, no UDFs) — the shared vocabulary used by
the operators and available to users for ad-hoc queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(ts) -> Column:
    """TIMESTAMP/TIMESTAMP_NTZ -> epoch microseconds as double (exact in
    f64 below 2^53 — the engine's canonical time axis). NTZ wall time is
    interpreted in the session zone; pin it to UTC for cross-engine
    parity (see __spark_entry__._utc)."""
    if isinstance(ts, str):
        ts = F.col(ts)
    return F.unix_micros(ts.cast("timestamp")).cast("double")


def bucketize(t, width: float) -> Column:
    """Tumbling-bucket id: floor(t / width) as long — the rollup/retention
    bucket rule (same formula at every tier; coarser tiers divide)."""
    if isinstance(t, str):
        t = F.col(t)
    return F.floor(t / F.lit(float(width)))


def as_double_array(arr) -> Column:
    """Promote an array<float> to array<double> BEFORE arithmetic so
    products accumulate in f64 (f32*f32 squares the quantization error)."""
    if isinstance(arr, str):
        arr = F.col(arr)
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Sequential dot product of two numeric array columns (JVM-side
    aggregate, deterministic left-to-right order)."""
    return F.aggregate(
        F.zip_with(as_double_array(a), as_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> Column:
    return F.sqrt(
        F.aggregate(as_double_array(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a, b) -> Column:
    """Cosine similarity of two array columns."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def hamming64(a, b) -> Column:
    """Hamming distance between two 64-bit hashes (long columns)."""
    if isinstance(a, str):
        a = F.col(a)
    if isinstance(b, str):
        b = F.col(b)
    return F.bit_count(a.bitwiseXOR(b))


def jaccard_arrays(a, b) -> Column:
    """Exact Jaccard of two DISTINCT-element array columns:
    |A∩B| / (|A| + |B| - |A∩B|)."""
    if isinstance(a, str):
        a = F.col(a)
    if isinstance(b, str):
        b = F.col(b)
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


__all__ = [
    "epoch_us",
    "bucketize",
    "as_double_array",
    "dot",
    "l2_norm",
    "cosine",
    "hamming64",
    "jaccard_arrays",
]
