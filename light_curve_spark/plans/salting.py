"""Skew defusal (north_rule: "salted repartitioning by (source, doc_id
bucket) to defuse skew from long-tail n_tok distributions").

Two mechanisms, layered (SURVEY.md §4.2):

1. Explicit salted repartition before the expensive kernel stages: the
   partitioner key is (source, pmod(hash(doc_id), n_buckets), salt) where
   the salt spreads each bucket over ``salt_factor`` partitions. Because
   row-level kernels (features, compression) are per-sequence maps, the
   salt changes ONLY placement, never results.
2. AQE skew handling for the rollup/groupBy shuffles — enabled in
   session.py; the groupBys themselves stay declarative so AQE can split
   skewed partitions at runtime.

``weighted_salt`` goes further for the long tail: the salt is derived
from n_tok so that heavy sequences get spread across more partitions than
light ones, equalizing *bytes* per partition, not row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_bucket(n_buckets: int = 1024) -> F.Column:
    return F.pmod(F.hash("doc_id"), F.lit(n_buckets)).alias("doc_bucket")


def salted_repartition(
    seq: DataFrame,
    num_partitions: int,
    n_buckets: int = 1024,
    salt_factor: int = 8,
) -> DataFrame:
    """Repartition by (source, doc_id bucket, salt)."""
    salt = F.pmod(F.hash("doc_id", F.lit("salt")), F.lit(salt_factor))
    return seq.repartition(num_partitions, F.col("source"), doc_bucket(n_buckets), salt)


def weighted_salted_repartition(
    seq: DataFrame,
    num_partitions: int,
    salt_domain: int = 4096,
) -> DataFrame:
    """Byte-balancing salt: every row gets an independent wide-domain
    salt, so partition load converges to uniform in BYTES regardless of
    the n_tok long tail or the skewed source distribution (a (source)-
    or narrow-salt partitioner leaves one partition holding the web/
    outlier mass). Rows are unique sequences, so pure spreading — unlike
    the hot-KEY salting in :func:`salted_repartition` — is safe: nothing
    downstream regroups by the salt."""
    salt = F.pmod(F.hash("doc_id", F.lit("wsalt")), F.lit(salt_domain))
    return seq.repartition(num_partitions, salt)


def ensure_min_splits(df, min_partitions: int | None = None):
    """Round-robin repartition ONLY when the upstream has fewer splits
    than the session's parallelism — e.g. a single-row-group parquet
    file, which Spark cannot split below row-group granularity, so every
    downstream map stage would run as one task. A no-op whenever the
    source is already parallel (the normal case at scale — forcing an
    unconditional repartition would add a pointless full shuffle there).
    Use on per-row map pipelines only (round-robin is order-free)."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
