"""Structured Streaming rollup: watermarked windowed agg in the batch
base-tier schema, update-mode upsert snapshots, checkpointed resume
(second run processes ONLY the new file)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("value", DoubleType(), True),
    ]
)


def _write_file(spark, path: str, rows: list[tuple]) -> None:
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    spark.createDataFrame(pdf, schema=SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _batch_rollup(spark, path):
    df = spark.read.schema(SCHEMA).parquet(path)
    return {
        (r.user_id, r.bucket): (r.n_points, r.v_sum, r.v_min, r.v_max)
        for r in df.groupBy(
            "user_id",
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86400e6)
            ).alias("bucket"),
        )
        .agg(
            F.count("*").alias("n_points"),
            F.sum("value").alias("v_sum"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
        )
        .collect()
    }


def test_stream_rollup_upsert_and_resume(spark, tmp_path):
    from light_curve_spark.sources.catalog import ParquetSnapshotStorage
    from light_curve_spark.streaming.structured import run_stream_rollup

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    inp = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    store_root = str(tmp_path / "store")
    os.makedirs(inp, exist_ok=True)
    storage = ParquetSnapshotStorage(spark, store_root)

    _write_file(
        spark,
        inp,
        [
            (1, "2024-01-01 01:00:00", 10.0),
            (1, "2024-01-01 23:00:00", 30.0),
            (2, "2024-01-02 12:00:00", 5.0),
        ],
    )
    run_stream_rollup(
        spark, inp, SCHEMA, storage, "rollup_stream", ckpt, keys=["user_id"]
    )
    first = {
        (r.user_id, r.bucket): (r.n_points, r.v_sum, r.v_min, r.v_max)
        for r in storage.read_snapshot("rollup_stream").collect()
    }
    assert first[(1, 19723)] == (2, 40.0, 10.0, 30.0)
    assert first[(2, 19724)] == (1, 5.0, 5.0, 5.0)

    # second arrival: updates an existing bucket AND adds a new one;
    # the shared checkpoint means only this new file is processed
    _write_file(
        spark,
        inp,
        [
            (1, "2024-01-01 05:00:00", 2.0),
            (3, "2024-01-03 00:00:00", 7.0),
        ],
    )
    run_stream_rollup(
        spark, inp, SCHEMA, storage, "rollup_stream", ckpt, keys=["user_id"]
    )
    final = {
        (r.user_id, r.bucket): (r.n_points, r.v_sum, r.v_min, r.v_max)
        for r in storage.read_snapshot("rollup_stream").collect()
    }
    assert final == _batch_rollup(spark, inp)
    # upsert replaced, not duplicated, the updated bucket
    assert final[(1, 19723)] == (3, 42.0, 2.0, 30.0)
    # untouched bucket carried forward
    assert final[(2, 19724)] == first[(2, 19724)]


def test_stream_base_rollup_schema_matches_batch(spark):
    """The streaming aggregate must be row-compatible with the batch base
    tier so cascades/retention/merge are shared."""
    from light_curve_spark.streaming.structured import stream_base_rollup

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(
            (F.col("value") % 3).alias("user_id"),
            F.col("timestamp").alias("ts"),
            F.col("value").cast("double").alias("value"),
        )
    )
    agg = stream_base_rollup(stream, keys=["user_id"])
    assert agg.schema.fieldNames() == [
        "user_id",
        "bucket",
        "n_points",
        "v_sum",
        "v_min",
        "v_max",
    ]
    assert agg.isStreaming


def test_stream_stateful_totals_resume(spark, tmp_path):
    """applyInPandasWithState lifetime totals: state must carry across
    micro-batches AND across availableNow runs (checkpoint restore), and
    the final emitted totals must equal the batch aggregate."""
    import pyspark.sql.functions as SF

    from light_curve_spark.streaming.structured import stream_stateful_totals

    inp = str(tmp_path / "incoming2")
    ckpt = str(tmp_path / "ckpt2")
    out_dir = str(tmp_path / "totals")
    os.makedirs(inp, exist_ok=True)

    def run_once():
        src = spark.readStream.schema(SCHEMA).parquet(inp)
        totals = stream_stateful_totals(src, keys=["user_id"])
        # parquet sinks reject update mode -> foreachBatch append
        q = (
            totals.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out_dir)
            )
            .start()
        )
        q.awaitTermination()

    _write_file(
        spark,
        inp,
        [
            (1, "2024-01-01 01:00:00", 10.0),
            (1, "2024-01-01 02:00:00", 30.0),
            (2, "2024-01-01 03:00:00", 5.0),
        ],
    )
    run_once()
    _write_file(spark, inp, [(1, "2024-02-01 00:00:00", 2.0)])
    run_once()

    # latest emitted row per user must equal the batch lifetime aggregate
    emitted = spark.read.parquet(out_dir)
    latest = {
        r.user_id: (r.n_points, r.v_sum, r.v_min, r.v_max)
        for r in emitted.orderBy("n_points").collect()  # later rows overwrite
    }
    batch = {
        r.user_id: (r.n, r.s, r.mn, r.mx)
        for r in spark.read.schema(SCHEMA)
        .parquet(inp)
        .groupBy("user_id")
        .agg(
            SF.count("value").alias("n"),
            SF.sum("value").alias("s"),
            SF.min("value").alias("mn"),
            SF.max("value").alias("mx"),
        )
        .collect()
    }
    assert latest == batch
    assert latest[1] == (3, 42.0, 2.0, 30.0)  # state crossed the restart


def test_stream_tier_cascade_matches_batch(spark, tmp_path):
    """The streamed 1x/10x/100x cascade (incremental parent-bucket
    refresh per micro-batch) must equal the batch rollup_tiers cascade on
    the same input, across BOTH availableNow runs — including a second
    arrival that back-fills an already-rolled-up parent bucket."""
    from light_curve_spark.operators.rollup import rollup_tiers
    from light_curve_spark.plans.caching import release_operator_caches
    from light_curve_spark.sources.catalog import ParquetSnapshotStorage
    from light_curve_spark.streaming.structured import (
        read_stream_tiers,
        run_stream_rollup,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    inp = str(tmp_path / "incoming3")
    ckpt = str(tmp_path / "ckpt3")
    os.makedirs(inp, exist_ok=True)
    storage = ParquetSnapshotStorage(spark, str(tmp_path / "store3"))

    def run():
        run_stream_rollup(
            spark, inp, SCHEMA, storage, "casc", ckpt,
            keys=["user_id"], tiers=(1, 10, 100),
        )

    def streamed():
        return {
            (r.user_id, r.tier, r.bucket): (r.n_points, r.v_sum, r.v_min,
                                            r.v_max, r.v_mean)
            for r in read_stream_tiers(storage, "casc").collect()
        }

    def batch():
        series = (
            spark.read.schema(SCHEMA)
            .parquet(inp)
            .select(
                "user_id",
                F.unix_micros(F.col("ts").cast("timestamp"))
                .cast("double")
                .alias("t"),
                F.col("value").alias("v"),
            )
        )
        out = {
            (r.user_id, r.tier, r.bucket): (r.n_points, r.v_sum, r.v_min,
                                            r.v_max, r.v_mean)
            for r in rollup_tiers(
                series, keys=["user_id"], base_width=86400e6
            ).collect()
        }
        release_operator_caches()
        return out

    # wave 1: spans several base buckets under one tier-10 parent
    _write_file(
        spark,
        inp,
        [
            (1, "2024-01-01 01:00:00", 10.0),
            (1, "2024-01-04 23:00:00", 30.0),
            (2, "2024-01-02 12:00:00", 5.0),
        ],
    )
    run()
    assert streamed() == batch()

    # wave 2: back-fills a new base bucket under the ALREADY-ROLLED-UP
    # tier-10/100 parents (within the 2-day watermark), extends user 1
    # into a new tier-10 bucket, and opens a new user entirely
    _write_file(
        spark,
        inp,
        [
            (1, "2024-01-03 05:00:00", 2.0),
            (1, "2024-02-10 12:00:00", -4.0),
            (3, "2024-03-03 00:00:00", 7.0),
        ],
    )
    run()
    got = streamed()
    assert got == batch()
    assert {t for (_, t, _b) in got} == {1, 10, 100}

    with pytest.raises(ValueError, match="tiers"):
        run_stream_rollup(
            spark, inp, SCHEMA, storage, "casc", ckpt, tiers=(1, 10, 25)
        )
