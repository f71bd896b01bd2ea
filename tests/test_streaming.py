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
