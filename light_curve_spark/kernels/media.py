"""Pure-numpy media decoders: WAV/PCM (audio), BMP + PPM (image),
YUV4MPEG2 (video).

Real decode for the multimodal column path (driver mandate) without any
external media library: each format is a simple public container whose
payload is raw integer samples/pixels, parseable with header arithmetic
plus ``np.frombuffer``. These are the honest end-to-end decoders behind
``operators.multimodal.decode_and_featurize(fake=False)``; exotic
codecs (JPEG/MP3/H.264...) stay out of scope — a production deployment
swaps pillow/pyav into the same kernel seam.

Feature math is designed for cross-implementation bit-parity with the
naive scalar reference in scripts/oracle_impl.py: all sums/sum-of-squares
accumulate in exact int64 (samples and pixels are small ints), and every
derived float applies the same f64 formula to those exact integers, so
vectorized-vs-loop reduction order cannot diverge.
"""

from __future__ import annotations

import numpy as np

FEAT_DIM = 8


def _le(buf: bytes, off: int, n: int, signed: bool = False) -> int:
    return int.from_bytes(buf[off : off + n], "little", signed=signed)


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM integer 8/16-bit)
# ---------------------------------------------------------------------------


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """-> (sample_rate, frames[n_frames, n_channels] int64).

    RIFF chunk walk (chunks pad to even sizes); PCM format 1 only,
    8-bit (unsigned, recentred to signed) or 16-bit (signed LE)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = _le(buf, pos + 4, 4)
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = _le(fmt, 0, 2)
    channels = _le(fmt, 2, 2)
    rate = _le(fmt, 4, 4)
    bits = _le(fmt, 14, 2)
    if audio_format != 1 or bits not in (8, 16) or channels < 1:
        raise ValueError(
            f"only integer PCM 8/16-bit WAV is supported "
            f"(format={audio_format}, bits={bits}, channels={channels})"
        )
    if bits == 16:
        usable = len(data) // (2 * channels) * (2 * channels)
        x = np.frombuffer(data, dtype="<i2", count=usable // 2).astype(np.int64)
    else:
        usable = len(data) // channels * channels
        x = np.frombuffer(data, dtype=np.uint8, count=usable).astype(np.int64) - 128
    return rate, x.reshape(-1, channels)


def wav_features(buf: bytes) -> list[float]:
    """[sample_rate, n_channels, n_frames, mean, rms, min, max, zcr]
    over all samples (zcr on channel 0; sign(0) counts as +)."""
    rate, frames = decode_wav(buf)
    x = frames.reshape(-1)
    n = int(x.shape[0])
    if n == 0:
        return [float(rate), float(frames.shape[1]), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    s = int(x.sum())
    ss = int((x * x).sum())
    ch0 = frames[:, 0]
    neg = ch0 < 0
    zcr = int(np.count_nonzero(neg[1:] != neg[:-1]))
    return [
        float(rate),
        float(frames.shape[1]),
        float(frames.shape[0]),
        s / n,
        float(np.sqrt(ss / n)),
        float(x.min()),
        float(x.max()),
        float(zcr),
    ]


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, uncompressed 24bpp) and PPM (P6, maxval <= 255)
# ---------------------------------------------------------------------------


def decode_bmp(buf: bytes) -> np.ndarray:
    """-> RGB pixels [h, w, 3] uint8. Rows are 4-byte padded, stored
    bottom-up (top-down when height is negative), channels BGR."""
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    px_off = _le(buf, 10, 4)
    w = _le(buf, 18, 4, signed=True)
    h = _le(buf, 22, 4, signed=True)
    bpp = _le(buf, 28, 2)
    comp = _le(buf, 30, 4)
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        raise ValueError(f"only uncompressed 24bpp BMP is supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, np.uint8, count=stride * h, offset=px_off).reshape(
        h, stride
    )
    img = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        img = img[::-1]
    return img[..., ::-1]


def decode_ppm(buf: bytes) -> np.ndarray:
    """-> RGB pixels [h, w, 3] uint8. P6 binary; header tokens separated
    by whitespace, ``#`` comments allowed; maxval <= 255."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(buf):
        c = buf[pos : pos + 1]
        if c == b"#":
            pos = buf.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(buf) and not buf[end : end + 1].isspace():
                end += 1
            tokens.append(int(buf[pos:end]))
            pos = end
    pos += 1  # the single whitespace byte after maxval
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = tokens
    if maxval > 255 or w <= 0 or h <= 0:
        raise ValueError(f"only 8-bit PPM is supported (maxval={maxval})")
    return np.frombuffer(buf, np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)


def image_features(buf: bytes) -> list[float]:
    """[w, h, mean_r, mean_g, mean_b, std_all, min_all, max_all];
    dispatches BMP vs PPM on magic bytes."""
    img = decode_bmp(buf) if buf[:2] == b"BM" else decode_ppm(buf)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3).astype(np.int64)
    n = h * w
    ch_sums = flat.sum(axis=0)
    all_n = n * 3
    s = int(ch_sums.sum())
    ss = int((flat * flat).sum())
    mean = s / all_n
    var = ss / all_n - mean * mean
    return [
        float(w),
        float(h),
        int(ch_sums[0]) / n,
        int(ch_sums[1]) / n,
        int(ch_sums[2]) / n,
        float(np.sqrt(var)),
        float(flat.min()),
        float(flat.max()),
    ]


# ---------------------------------------------------------------------------
# YUV4MPEG2 (y4m, C444 / C420 planar frames)
# ---------------------------------------------------------------------------


def decode_y4m(buf: bytes) -> tuple[int, int, float, list[tuple[np.ndarray, ...]]]:
    """-> (w, h, fps, frames) with frames = [(Y, U, V) uint8 planes].

    C420 variants keep their subsampled U/V planes (features are plane
    means — no upsampling needed)."""
    nl = buf.index(b"\n")
    parts = buf[:nl].decode("ascii").split(" ")
    if parts[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fn, fd = 25, 1
    cs = "C420"
    for p in parts[1:]:
        if p.startswith("W"):
            w = int(p[1:])
        elif p.startswith("H"):
            h = int(p[1:])
        elif p.startswith("F"):
            fn, fd = (int(x) for x in p[1:].split(":"))
        elif p.startswith("C"):
            cs = p
    if w is None or h is None:
        raise ValueError("y4m header missing W/H")
    if cs.startswith("C444"):
        uw, uh = w, h
    elif cs.startswith("C420"):
        uw, uh = w // 2, h // 2
    else:
        raise ValueError(f"unsupported y4m colorspace {cs}")
    ysz, usz = w * h, uw * uh
    frames = []
    pos = nl + 1
    while pos < len(buf):
        fend = buf.index(b"\n", pos)
        if buf[pos : pos + 5] != b"FRAME":
            raise ValueError("corrupt y4m FRAME marker")
        pos = fend + 1
        y = np.frombuffer(buf, np.uint8, count=ysz, offset=pos).reshape(h, w)
        u = np.frombuffer(buf, np.uint8, count=usz, offset=pos + ysz).reshape(uh, uw)
        v = np.frombuffer(buf, np.uint8, count=usz, offset=pos + ysz + usz).reshape(
            uh, uw
        )
        frames.append((y, u, v))
        pos += ysz + 2 * usz
    return w, h, fn / fd, frames


def y4m_features(buf: bytes) -> list[float]:
    """[n_frames, w, h, fps, mean_y, mean_u, mean_v, std_y] across all
    frames."""
    w, h, fps, frames = decode_y4m(buf)
    ys = int(sum(int(f[0].astype(np.int64).sum()) for f in frames))
    us = int(sum(int(f[1].astype(np.int64).sum()) for f in frames))
    vs = int(sum(int(f[2].astype(np.int64).sum()) for f in frames))
    yss = int(
        sum(int((f[0].astype(np.int64) ** 2).sum()) for f in frames)
    )
    ny = len(frames) * w * h
    nu = len(frames) * frames[0][1].size if frames else 0
    mean_y = ys / ny if ny else 0.0
    var_y = yss / ny - mean_y * mean_y if ny else 0.0
    return [
        float(len(frames)),
        float(w),
        float(h),
        fps,
        mean_y,
        us / nu if nu else 0.0,
        vs / nu if nu else 0.0,
        float(np.sqrt(var_y)),
    ]


def media_features(kind: str, buf: bytes) -> list[float]:
    """Dispatch on the declared kind (payload magic re-checked inside
    each decoder). Raises ValueError on unsupported containers — decode
    failures must surface, not silently zero-fill."""
    if kind == "audio":
        return wav_features(buf)
    if kind == "image":
        return image_features(buf)
    if kind == "video":
        return y4m_features(buf)
    raise ValueError(f"unknown media kind {kind!r}")
