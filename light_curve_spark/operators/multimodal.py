"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (driver mandate).

The Spark-side machinery — schemas, batch shapes, partition sizing, UDF
signatures — is real and tested, and so is the default decode path:
``kernels/media.py`` parses WAV/PCM audio, BMP + PPM images, and
YUV4MPEG2 video with pure numpy (no external media libs). Exotic codecs
(JPEG/MP3/H.264) are out of scope in this container — a production
deployment swaps pillow/pyav into the same kernel seam. ``fake=True``
keeps the deterministic splitmix64 byte-moment decoder for synthetic
corpora where payloads are not real containers.

Scale notes: media rows are BYTES-heavy, not row-heavy, so operators here
repartition by estimated byte weight (same policy as
plans/salting.weighted_salted_repartition) and keep
``maxRecordsPerBatch`` low; a 1000-executor job is bounded by Arrow batch
memory, not row counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),  # opaque encoded bytes
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(DoubleType(), False), False),
    ]
)


def synthetic_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = splitmix64 byte stream),
    for exercising the plumbing."""
    from light_curve_spark.sources.synthetic import _splitmix64

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = np.array(["image", "audio", "video"])
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            rows = []
            for i in ids:
                # int() BEFORE the mod: numpy promotes uint64 % python-int
                # to float64, which rounds 2^63-scale hashes to multiples
                # of 2^11 and collapses the mod to ~always 0
                size = 64 + int(_splitmix64(np.array([i + np.uint64(seed)]))[0]) % 1024
                words = _splitmix64(
                    np.arange(size // 8 + 1, dtype=np.uint64)
                    + i * np.uint64(0x10001)
                    + np.uint64(seed)
                )
                payload = words.tobytes()[:size]
                kind = str(kinds[int(i) % 3])
                rows.append(
                    (
                        int(i),
                        kind,
                        payload,
                        f"application/x-fake-{kind}",
                        64 if kind == "image" else None,
                        64 if kind == "image" else None,
                        1000 if kind != "image" else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "payload",
                    "mime",
                    "width",
                    "height",
                    "duration_ms",
                ],
            )

    return spark.range(n_rows).mapInPandas(gen, schema=MEDIA_SCHEMA)


FEATURES_ERR_SCHEMA = StructType(
    list(FEATURES_SCHEMA.fields) + [StructField("error", StringType(), True)]
)


def decode_and_featurize(
    media: DataFrame,
    fake: bool = False,
    feat_dim: int = 8,
    on_error: str = "raise",
) -> DataFrame:
    """Decode payloads and emit a fixed-dim feature vector per item.

    Default path: REAL pure-numpy decode (kernels/media.py) — WAV/PCM
    audio -> [rate, channels, frames, mean, rms, min, max, zcr]; BMP/PPM
    image -> [w, h, mean_rgb..., std, min, max]; y4m video ->
    [frames, w, h, fps, plane means, std_y]. ``fake=True`` computes
    deterministic byte-moment features instead, for synthetic corpora
    whose payloads are not real containers.

    ``on_error``: ``'raise'`` (default) fails the task on the first
    undecodable payload — corruption must surface, not zero-fill.
    ``'mark'`` is the long-ingest posture: a corrupt row yields an empty
    feature vector plus the decode error message in an ``error`` column
    (schema gains that nullable field), so one bad file in a billion-row
    scan costs one quarantined row, not the job. The caller routes
    ``error IS NOT NULL`` rows to a quarantine table and the rest
    onward; nothing is silently dropped either way."""
    from light_curve_spark.kernels.media import media_features

    if on_error not in ("raise", "mark"):
        raise ValueError(f"on_error must be 'raise' or 'mark', got {on_error!r}")
    mark = on_error == "mark"
    out_schema = FEATURES_ERR_SCHEMA if mark else FEATURES_SCHEMA

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes, errs = [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                raw = bytes(payload)
                nbytes.append(len(raw))
                try:
                    if fake:
                        data = np.frombuffer(raw, dtype=np.uint8).astype(
                            np.float64
                        )
                        chunks = np.array_split(data, feat_dim)
                        feats.append(
                            np.array(
                                [c.mean() if c.size else 0.0 for c in chunks]
                            )
                        )
                    else:
                        feats.append(np.asarray(media_features(kind, raw)))
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001 — quarantined per-row
                    if not mark:
                        raise
                    feats.append(np.array([], dtype=np.float64))
                    errs.append(f"{type(exc).__name__}: {exc}")
            cols = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": nbytes,
                "feature": feats,
            }
            if mark:
                cols["error"] = errs
            yield pd.DataFrame(cols)

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, schema=out_schema
    )


def frame_sample(media: DataFrame, every_ms: int = 200) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled timestamp
    (built-in sequence/explode on metadata — no decode needed to plan the
    sampling; the actual frame extraction joins this against the decoded
    stream)."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "sample_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)).cast("long"),
                    F.lit(every_ms).cast("long"),
                )
            ),
        )
        .select("media_id", "sample_ms")
    )
