"""Media decode stress (round-4 verdict item 7): the real pure-numpy
WAV/BMP/PPM/y4m decoders (kernels/media.py) had only 9-fixture-file
evidence; this pushes a ~1 GB deterministic synthetic corpus through the
production ingest path (binaryFile -> operators/multimodal
.decode_and_featurize) on local[N].

Protocol:
1. synthesize WAV (2s 44.1 kHz stereo 16-bit), BMP (512x512), PPM
   (512x512) and y4m (QCIF, 12 frames) files — deterministic integer
   content via the same encoders that produced the committed fixtures
   (scripts/make_media_fixtures.py), ~1 GB total
   (SPARK_GRAFT_MEDIA_GB scales it);
2. plant N_CORRUPT corrupt payloads (truncated container, garbage
   magic, bad bpp);
3. decode with on_error='mark': the job must COMPLETE, every planted
   corrupt row must surface with its error message, every healthy row
   must decode — per-row quarantine, not job death;
4. report decode MB/s (min of reps) + corruption accounting.

Run: PYTHONPATH=.:scripts python scripts/stress_media.py
Prints a JSON line; transcribed into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_media_fixtures import bmp_bytes, ppm_bytes, wav_bytes, y4m_bytes  # noqa: E402

N_CORRUPT = 7


def _gen_corpus(root: str, target_gb: float) -> tuple[int, int]:
    """Write the deterministic corpus; returns (n_files, n_bytes).
    File name pattern matches the engine's ingest regex:
    {media_id}_{audio|image|video}.{ext}"""
    os.makedirs(root, exist_ok=True)
    target = int(target_gb * 1e9)
    total = 0
    media_id = 0

    def emit(name: str, payload: bytes) -> None:
        nonlocal total, media_id
        with open(os.path.join(root, name), "wb") as f:
            f.write(payload)
        total += len(payload)
        media_id += 1

    rng_wave = np.arange(2 * 44100, dtype=np.int64)
    while total < target:
        i = media_id
        kind = i % 4
        if kind == 0:  # WAV: ~353 KB each
            samples = np.stack(
                [
                    ((rng_wave * (13 + i)) % 4001) - 2000,
                    ((rng_wave * (29 + i)) % 3001) - 1500,
                ],
                axis=1,
            )
            emit(f"{i:06d}_audio.wav", wav_bytes(44100, 16, samples))
        elif kind == 1:  # BMP: ~786 KB each
            h = w = 512
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(yy * 3 + i) % 256, (xx * 7 + i) % 256, ((xx + yy) * 11 + i) % 256],
                axis=-1,
            ).astype(np.uint8)
            emit(f"{i:06d}_image.bmp", bmp_bytes(img, top_down=(i % 8 == 1)))
        elif kind == 2:  # PPM: ~786 KB each
            h = w = 512
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(yy * 5 + i) % 256, (xx * 3 + i) % 256, ((xx * yy) + i) % 256],
                axis=-1,
            ).astype(np.uint8)
            emit(f"{i:06d}_image.ppm", ppm_bytes(img, comment=(i % 8 == 2)))
        else:  # y4m C420: 176x144, 12 frames ~ 456 KB
            w, h = 176, 144
            frames = []
            for k in range(12):
                y = ((np.add.outer(np.arange(h), np.arange(w)) * (k + 1) + i) % 256
                     ).astype(np.uint8)
                u = np.full((h // 2, w // 2), (i + k) % 256, dtype=np.uint8)
                v = np.full((h // 2, w // 2), (i * 3 + k) % 256, dtype=np.uint8)
                frames.append((y, u, v))
            emit(f"{i:06d}_video.y4m", y4m_bytes(w, h, 30000, 1001, "C420", frames))

    # planted corruption: ids >= media_id, deterministic failure modes
    corrupt_ids = []
    for j in range(N_CORRUPT):
        i = media_id
        corrupt_ids.append(i)
        mode = j % 4
        if mode == 0:    # truncated WAV (header only, data chunk cut)
            emit(f"{i:06d}_audio.wav", wav_bytes(8000, 16, np.zeros((64, 1), np.int64))[:40])
        elif mode == 1:  # garbage magic
            emit(f"{i:06d}_image.bmp", b"NOTABMP" + b"\x00" * 100)
        elif mode == 2:  # PPM claiming 16-bit maxval
            emit(f"{i:06d}_image.ppm", b"P6\n4 4\n65535\n" + b"\x00" * 96)
        else:            # y4m with corrupt FRAME marker
            w, h = 16, 16
            y = np.zeros((h, w), np.uint8)
            good = y4m_bytes(w, h, 25, 1, "C444", [(y, y, y)])
            emit(f"{i:06d}_video.y4m", good.replace(b"FRAME", b"FLAME"))
    return media_id, total


def main() -> None:
    from pyspark.sql import functions as F

    from light_curve_spark.operators.multimodal import decode_and_featurize
    from light_curve_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    target_gb = float(os.environ.get("SPARK_GRAFT_MEDIA_GB", "1.0"))
    spark = build_session(
        app_name="stress-media", master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        # bytes-heavy rows: keep Arrow batches small so executor memory is
        # bounded by ~batch_rows * payload, not by row count defaults
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "64"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="media-stress-")
    t0 = time.time()
    n_files, n_bytes = _gen_corpus(root, target_gb)  # n_files INCLUDES corrupt
    gen_s = time.time() - t0

    pat = r"(\d+)_(audio|image|video)\.\w+$"
    media = (
        spark.read.format("binaryFile").load(root)
        .select(
            F.regexp_extract("path", pat, 1).cast("long").alias("media_id"),
            F.regexp_extract("path", pat, 2).alias("kind"),
            F.col("content").alias("payload"),
        )
        .repartition(4 * cpus)
    )

    def run_once() -> float:
        t = time.time()
        decode_and_featurize(media, on_error="mark").write.mode(
            "overwrite"
        ).format("noop").save()
        return time.time() - t

    walls = [run_once() for _ in range(3)]
    decode_s = min(walls)

    out = decode_and_featurize(media, on_error="mark").persist()
    n_rows = out.count()
    bad = out.filter(F.col("error").isNotNull())
    n_bad = bad.count()
    bad_ids = sorted(r.media_id for r in bad.select("media_id").collect())
    ok_all_decoded = (
        out.filter(F.col("error").isNull())
        .filter(F.size("feature") == 0)
        .count()
        == 0
    )
    out.unpersist()

    expected_bad = list(range(n_files - N_CORRUPT, n_files))
    res = {
        "n_files": n_files,
        "corpus_mb": round(n_bytes / 1e6, 1),
        "cpus": cpus,
        "gen_s": round(gen_s, 1),
        "decode_walls_s": [round(w, 1) for w in walls],
        "decode_s": round(decode_s, 1),
        "decode_mb_per_s": round(n_bytes / 1e6 / decode_s, 1),
        "n_rows": n_rows,
        "n_corrupt_planted": N_CORRUPT,
        "n_corrupt_surfaced": n_bad,
        "corrupt_ids_match": bad_ids == expected_bad,
        "healthy_rows_all_decoded": ok_all_decoded,
    }
    print(json.dumps(res))
    assert bad_ids == expected_bad, (bad_ids, expected_bad)
    assert ok_all_decoded


if __name__ == "__main__":
    main()
