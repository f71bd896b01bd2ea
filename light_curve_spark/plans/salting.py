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
    target_tokens_per_part: int = 2_000_000,
) -> DataFrame:
    """Byte-weighted salting: a sequence with large n_tok lands in a salt
    domain proportional to its size, so one hot doc_id bucket full of
    16k-token outliers cannot dominate a partition."""
    weight = (F.col("n_tok") / F.lit(target_tokens_per_part) + F.lit(1)).cast("int")
    salt = F.pmod(F.hash("doc_id", F.lit("wsalt")), weight * F.lit(8))
    return seq.repartition(num_partitions, F.col("source"), salt)
