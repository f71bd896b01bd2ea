"""Skew defusal (north_rule): the byte-weighted salted repartition must
bound per-partition token-byte skew on the Zipf-tailed synthetic data
far better than partitioning by the natural skewed key (source, ~70%
web)."""

from pyspark.sql import functions as F

from light_curve_spark.plans.salting import (
    salted_repartition,
    weighted_salted_repartition,
)
from light_curve_spark.sources.synthetic import synthetic_sequences


def _partition_token_counts(df):
    return [
        r.tok
        for r in df.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(F.sum("n_tok").alias("tok"))
        .collect()
    ]


def test_weighted_salting_bounds_byte_skew(spark):
    seq = synthetic_sequences(spark, 4000, seed=42).persist()
    nparts = 16

    skewed = seq.repartition(nparts, F.col("source"))  # the naive plan
    salted = weighted_salted_repartition(seq, nparts)

    sk = _partition_token_counts(skewed)
    sa = _partition_token_counts(salted)

    def imbalance(counts):
        counts = counts + [0] * (nparts - len(counts))
        return max(counts) / (sum(counts) / nparts)

    # source-keyed partitioning concentrates ~70% of bytes in one
    # partition (imbalance >= ~8 at 16 partitions); salting must be
    # near-uniform
    assert imbalance(sk) > 4.0
    # residual imbalance is the single-largest-row effect (a 16k-token
    # outlier is ~20% of a partition's budget at this scale)
    assert imbalance(sa) < 2.0
    seq.unpersist()


def test_salted_repartition_preserves_rows(spark):
    seq = synthetic_sequences(spark, 500, seed=42)
    out = salted_repartition(seq, 8)
    assert out.count() == 500
    assert out.select(F.sum("n_tok")).head()[0] == seq.select(F.sum("n_tok")).head()[0]
