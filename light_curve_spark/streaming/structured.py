"""Structured Streaming ingestion path for the rollup engine.

The engine's PRIMARY posture stays batch-snapshot resume (see package
docstring) — that is what makes bit-exact golden parity tractable. This
module is the streaming twin for deployments where rollups must follow
an arriving event stream instead of snapshot appends:

- ``readStream`` over a parquet directory (every new file is a
  micro-batch — the shape of an Iceberg/warehouse landing zone),
- event-time watermark bounding aggregation state for late data,
- tumbling ``window(ts, width)`` groupBy producing the SAME
  (key..., bucket, n_points, v_sum, v_min, v_max) schema as the batch
  base tier (operators/rollup._base_rollup), so every downstream
  operator (cascade, retention, merge) is shared with batch,
- ``update`` output mode + ``foreachBatch`` upsert into the snapshot
  store: updated buckets REPLACE their previous rows, everything else is
  carried forward — a continuous aggregate with replace-on-write
  snapshots (read with ``storage.read_snapshot``),
- checkpointed: re-running with the same checkpoint processes ONLY new
  files (exactly-once per file), which the test exercises.

Scale notes: state is bounded by (keys x active windows) thanks to the
watermark; the upsert is a key-partitioned anti-join against the current
snapshot — at 10^12 sequences the store would be an Iceberg MERGE, same
plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from light_curve_spark.functions import bucketize, epoch_us


def stream_base_rollup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    v_col: str = "value",
    width_seconds: int = 86400,
    watermark: str = "2 days",
) -> DataFrame:
    """Windowed streaming aggregation with the batch base-tier schema.

    ``bucket`` is floor(epoch_micros / width) of the window start —
    identical to the batch ``floor(t / width)`` bucketing, so streamed
    and batch rollups are row-compatible."""
    v = F.col(v_col)
    win = F.window(F.col(ts_col), f"{width_seconds} seconds")
    width_us = float(width_seconds) * 1e6
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, win.alias("_w"))
        .agg(
            # count(v), NOT count(*): the batch base tier counts non-null
            # values only — null-valued events must not skew n_points /
            # v_mean when streamed buckets feed the shared cascade/merge
            F.count(v).alias("n_points"),
            F.sum(v).alias("v_sum"),
            F.min(v).alias("v_min"),
            F.max(v).alias("v_max"),
        )
        .select(
            *keys,
            bucketize(epoch_us(F.col("_w.start")), width_us).alias("bucket"),
            "n_points",
            "v_sum",
            "v_min",
            "v_max",
        )
    )


def stream_stateful_totals(
    stream: DataFrame,
    keys: list[str] | None = None,
    v_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-key LIFETIME totals (n, sum, min, max) maintained in the state
    store across micro-batches — the shape for aggregates that outlive
    any window (e.g. a per-user all-time rollup row updated per batch).

    Each micro-batch emits one row per updated key with the totals SO
    FAR; state survives restarts through the query checkpoint (tested
    across two availableNow runs). Complements the watermarked window agg
    in :func:`stream_base_rollup`, which bounds state by active windows;
    here state is bounded by the key cardinality instead."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    keys = keys or ["user_id"]
    key_fields = [stream.schema[k] for k in keys]
    out_schema = StructType(
        key_fields
        + [
            StructField("n_points", LongType(), False),
            StructField("v_sum", DoubleType(), True),
            StructField("v_min", DoubleType(), True),
            StructField("v_max", DoubleType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType(), False),
            StructField("s", DoubleType(), True),
            StructField("mn", DoubleType(), True),
            StructField("mx", DoubleType(), True),
        ]
    )

    def fn(key, pdfs, state):
        import pandas as pd

        n, s, mn, mx = state.get if state.exists else (0, 0.0, None, None)
        for pdf in pdfs:
            v = pdf[v_col].dropna()
            if v.empty:
                continue
            n += int(v.shape[0])
            s += float(v.sum())
            bmn, bmx = float(v.min()), float(v.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        state.update((n, s, mn, mx))
        yield pd.DataFrame(
            [dict(zip([k.name for k in key_fields], key))
             | {"n_points": n, "v_sum": s, "v_min": mn, "v_max": mx}]
        )

    return stream.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def run_stream_rollup(
    spark: SparkSession,
    input_dir: str,
    input_schema,
    storage,
    table: str,
    checkpoint_dir: str,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    v_col: str = "value",
    width_seconds: int = 86400,
    watermark: str = "2 days",
) -> None:
    """One ``availableNow`` pass: process every not-yet-seen file under
    ``input_dir``, upserting updated buckets into ``storage``/``table``
    (replace-on-write snapshots; read with ``read_snapshot``). Returns
    after the trigger drains — a scheduler (or a long-lived query with a
    processing-time trigger) calls this per arrival."""
    keys = keys or ["user_id"]
    if not hasattr(storage, "read_snapshot"):
        # the upsert contract is replace-on-write FULL-state snapshots;
        # IcebergStorage appends rows (its streaming path would be an
        # Iceberg MERGE) — fail loudly instead of AttributeError inside
        # the micro-batch, or worse, silently accumulating stale buckets
        raise TypeError(
            "run_stream_rollup needs a replace-on-write snapshot store "
            "(read_snapshot/append), e.g. ParquetSnapshotStorage; got "
            f"{type(storage).__name__}"
        )
    src = spark.readStream.schema(input_schema).parquet(input_dir)
    agg = stream_base_rollup(
        src, keys, ts_col=ts_col, v_col=v_col,
        width_seconds=width_seconds, watermark=watermark,
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # update-mode batches carry the CURRENT value of every group
        # updated in this micro-batch: replace those rows, keep the rest
        updates = batch_df.persist()
        try:
            if updates.isEmpty():
                return
            try:
                current = storage.read_snapshot(table)
            except ValueError:
                current = None
            if current is None:
                merged = updates
            else:
                merged = current.join(
                    updates.select(*keys, "bucket"), [*keys, "bucket"], "left_anti"
                ).unionByName(updates)
            storage.append(merged, table)
        finally:
            updates.unpersist()

    q = (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .foreachBatch(upsert)
        .start()
    )
    q.awaitTermination()
