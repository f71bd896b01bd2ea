"""Real media decode (kernels/media.py): container corner cases,
cross-check vs stdlib wave, and the Spark binaryFile -> decode path."""

import glob
import io
import os
import wave

import numpy as np
import pytest

from light_curve_spark.kernels.media import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    decode_y4m,
    image_features,
    media_features,
    wav_features,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MEDIA = os.path.join(REPO, "fixtures", "media")


def _fixtures(kind: str) -> list[str]:
    return sorted(glob.glob(os.path.join(MEDIA, f"*_{kind}.*")))


def test_wav_decode_matches_stdlib_wave():
    """The stdlib wave module is an independent RIFF/PCM reader — every
    committed WAV (16-bit mono/stereo, 8-bit, junk chunks, odd padded
    data chunk) must decode identically."""
    paths = _fixtures("audio")
    assert len(paths) == 3
    for p in paths:
        buf = open(p, "rb").read()
        rate, frames = decode_wav(buf)
        with wave.open(io.BytesIO(buf)) as wf:
            assert wf.getframerate() == rate
            assert wf.getnchannels() == frames.shape[1]
            assert wf.getnframes() == frames.shape[0]
            raw = wf.readframes(wf.getnframes())
            if wf.getsampwidth() == 2:
                ref = np.frombuffer(raw, "<i2").astype(np.int64)
            else:
                ref = np.frombuffer(raw, np.uint8).astype(np.int64) - 128
        assert (frames.reshape(-1) == ref).all()


def test_bmp_decode_known_pixels_bottom_up_and_padding():
    """Hand-built 2x2 24bpp BMP: bottom-up row order, BGR channels, and
    4-byte row padding must all be undone."""
    import struct

    # rows as stored (bottom first), BGR, 2 px * 3 B = 6 B -> pad to 8
    bottom_row = bytes([10, 20, 30, 40, 50, 60, 0, 0])  # -> image row 1
    top_row = bytes([1, 2, 3, 4, 5, 6, 0, 0])  # -> image row 0
    px = bottom_row + top_row
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(px), 0, 0, 0, 0)
    img = decode_bmp(hdr + dib + px)
    assert img.shape == (2, 2, 3)
    # stored BGR -> returned RGB
    assert img[0, 0].tolist() == [3, 2, 1]
    assert img[0, 1].tolist() == [6, 5, 4]
    assert img[1, 0].tolist() == [30, 20, 10]
    assert img[1, 1].tolist() == [60, 50, 40]

    # top-down variant (negative height): rows already in image order
    dib_td = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, len(px), 0, 0, 0, 0)
    img_td = decode_bmp(hdr + dib_td + px)
    assert img_td[0, 0].tolist() == [30, 20, 10]
    assert img_td[1, 0].tolist() == [3, 2, 1]


def test_ppm_decode_with_comments():
    buf = b"P6\n# a comment\n2\n# another\n1 255\n" + bytes([9, 8, 7, 6, 5, 4])
    img = decode_ppm(buf)
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [9, 8, 7]
    assert img[0, 1].tolist() == [6, 5, 4]


def test_y4m_c420_plane_shapes_and_fps():
    buf = open(_fixtures("video")[1], "rb").read()  # 008: C420 8x6 F24000:1001
    w, h, fps, frames = decode_y4m(buf)
    assert (w, h) == (8, 6)
    assert abs(fps - 24000 / 1001) < 1e-12
    assert len(frames) == 2
    y, u, v = frames[0]
    assert y.shape == (6, 8) and u.shape == (3, 4) and v.shape == (3, 4)


def test_decode_errors_surface():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope" * 10)
    with pytest.raises(ValueError, match="BMP"):
        decode_bmp(b"XX" + b"\x00" * 60)
    with pytest.raises(ValueError, match="kind"):
        media_features("hologram", b"data")


def test_features_match_scalar_reference():
    """Vectorized kernel features must BIT-match the naive stdlib-only
    reference decoders (exact int64 sums + identical f64 formulas)."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from oracle_impl import image_features_ref, wav_features_ref, y4m_features_ref

    refs = {"audio": wav_features_ref, "image": image_features_ref,
            "video": y4m_features_ref}
    n = 0
    for kind, ref in refs.items():
        for p in _fixtures(kind):
            buf = open(p, "rb").read()
            assert media_features(kind, buf) == ref(buf), p
            n += 1
    assert n == 9


def test_spark_binaryfile_decode_path(spark):
    """End-to-end: binaryFile ingest -> mapInPandas real decode."""
    from pyspark.sql import functions as F

    from light_curve_spark.operators.multimodal import decode_and_featurize

    pat = r"(\d+)_(audio|image|video)\.\w+$"
    media = (
        spark.read.format("binaryFile")
        .load(MEDIA)
        .select(
            F.regexp_extract("path", pat, 1).cast("long").alias("media_id"),
            F.regexp_extract("path", pat, 2).alias("kind"),
            F.col("content").alias("payload"),
        )
    )
    rows = {r.media_id: r for r in decode_and_featurize(media, fake=False).collect()}
    assert len(rows) == 9
    wav0 = open(os.path.join(MEDIA, "000_audio.wav"), "rb").read()
    assert list(rows[0].feature) == wav_features(wav0)
    bmp3 = open(os.path.join(MEDIA, "003_image.bmp"), "rb").read()
    assert list(rows[3].feature) == image_features(bmp3)
    assert rows[3].n_bytes == len(bmp3)


def test_wav_empty_data_chunk_zero_row_matches_reference():
    """A structurally valid WAV whose data chunk is empty yields the
    documented zero-filled feature row in BOTH the kernel and the scalar
    reference (ADVICE r3: the ref used to crash on samples[0])."""
    import struct
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from oracle_impl import wav_features_ref

    from light_curve_spark.kernels.media import wav_features

    rate, channels, bits = 8000, 2, 16
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits,
    )
    buf = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    expected = [float(rate), float(channels), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    assert wav_features(buf) == expected
    assert wav_features_ref(buf) == expected
