"""Generate the committed tiny real-media fixtures (fixtures/media/).

Deterministic, integer-formula content — no RNG — so the files are
reproducible byte-for-byte. The ENCODERS live here only (the engine just
decodes); they deliberately exercise the containers' corner cases:
unknown RIFF chunks + odd-sized (padded) data chunks, BMP row padding and
top-down (negative height) orientation, PPM header comments, y4m C444
and C420 with non-integer frame rates.

Run: PYTHONPATH=. python scripts/make_media_fixtures.py
"""

from __future__ import annotations

import os
import struct

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "media")


def wav_bytes(rate: int, bits: int, samples: np.ndarray, junk_chunk: bool = False) -> bytes:
    """samples: (n_frames, n_channels) ints."""
    channels = samples.shape[1]
    if bits == 16:
        data = samples.astype("<i2").tobytes()
    else:
        data = (samples + 128).astype(np.uint8).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits,
    )
    body = b""
    if junk_chunk:  # decoders must skip unknown chunks
        body += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd -> pad
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def bmp_bytes(img: np.ndarray, top_down: bool = False) -> bytes:
    """img: (h, w, 3) uint8 RGB."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    bgr = img[..., ::-1]
    if not top_down:
        bgr = bgr[::-1]
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    px = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0, len(px),
        2835, 2835, 0, 0,
    )
    return header + dib + px


def ppm_bytes(img: np.ndarray, comment: bool = False) -> bytes:
    h, w = img.shape[:2]
    hdr = b"P6\n"
    if comment:
        hdr += b"# tiny fixture\n"
    hdr += f"{w} {h}\n255\n".encode()
    return hdr + img.tobytes()


def y4m_bytes(w: int, h: int, fn: int, fd: int, cs: str, frames) -> bytes:
    out = f"YUV4MPEG2 W{w} H{h} F{fn}:{fd} Ip A1:1 {cs}\n".encode()
    for y, u, v in frames:
        out += b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes()
    return out


def _grid(h: int, w: int, c: int = 3, a: int = 3, b: int = 7, cc: int = 11) -> np.ndarray:
    yy, xx, ch = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(c), indexing="ij"
    )
    return ((xx * a + yy * b + ch * cc) % 256).astype(np.uint8)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    files: dict[str, bytes] = {}

    i = np.arange(1200)
    files["000_audio.wav"] = wav_bytes(
        8000, 16, (((i * i * 13 + i * 7) % 2001) - 1000).reshape(-1, 1)
    )
    i = np.arange(900)
    stereo = np.stack(
        [((i * 31) % 1601) - 800, ((i * 17 + 5) % 1201) - 600], axis=1
    )
    files["001_audio.wav"] = wav_bytes(44100, 16, stereo, junk_chunk=True)
    i = np.arange(701)  # odd byte count -> padded data chunk
    files["002_audio.wav"] = wav_bytes(
        11025, 8, (((i * 3) % 201) - 100).reshape(-1, 1)
    )

    files["003_image.bmp"] = bmp_bytes(_grid(9, 17))  # odd width -> row padding
    files["004_image.bmp"] = bmp_bytes(_grid(5, 8, a=5, b=13), top_down=True)
    files["005_image.ppm"] = ppm_bytes(_grid(7, 13, a=9, b=2, cc=29), comment=True)
    files["006_image.ppm"] = ppm_bytes(_grid(4, 4, a=50, b=60, cc=70))

    def planes(w, h, uw, uh, k):
        y = ((np.arange(w * h).reshape(h, w) * (k + 3)) % 251).astype(np.uint8)
        u = ((np.arange(uw * uh).reshape(uh, uw) * (k + 5) + 7) % 253).astype(np.uint8)
        v = ((np.arange(uw * uh).reshape(uh, uw) * (k + 7) + 11) % 249).astype(np.uint8)
        return y, u, v

    files["007_video.y4m"] = y4m_bytes(
        6, 4, 30, 1, "C444", [planes(6, 4, 6, 4, k) for k in range(3)]
    )
    files["008_video.y4m"] = y4m_bytes(
        8, 6, 24000, 1001, "C420", [planes(8, 6, 4, 3, k) for k in range(2)]
    )

    for name, data in files.items():
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes")


if __name__ == "__main__":
    main()
