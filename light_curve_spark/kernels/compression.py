"""Chunk compression kernels: delta-of-delta timestamps + Gorilla XOR values.

Mandated by BASELINE.json (north_rule: "Gorilla/delta-of-delta compression";
per-row invariant: exact token-array equality through the round trip).
Scheme follows Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time
Series Database", VLDB 2015 (public paper):

Timestamps (§4.1.1 of the paper, exact):
    header: n (uint32 LE) + t0 (int64 LE); bitstream encodes the n-1
    delta-of-deltas (first delta is taken relative to prev_delta = 0):
        dod == 0                -> '0'
        dod in [-63, 64]        -> '10'   + 7-bit  (dod + 63)
        dod in [-255, 256]      -> '110'  + 9-bit  (dod + 255)
        dod in [-2047, 2048]    -> '1110' + 12-bit (dod + 2047)
        else                    -> '1111' + 64-bit two's-complement dod

Values (§4.1.2, one deliberate deviation):
    header: n (uint32 LE) + v0 (uint64 LE raw); bitstream encodes n-1
    XOR tokens (xor_i = v_i ^ v_{i-1}):
        xor == 0 -> '0'
        else     -> '1' + 6-bit leading-zero count + 6-bit (meaningful_len
                    - 1) + the meaningful bits
    DEVIATION from the paper: the '10' control branch (reuse the previous
    token's leading/length window) is omitted and every nonzero token
    carries its own explicit window. The paper's window reuse makes the
    encoder a sequential state machine (the window only advances on '11'
    emissions), which cannot be expressed as vectorized numpy and would
    force a per-element Python loop — forbidden by input_hint ("no per-row
    Python"). The explicit window costs at most 12 extra bits per *changed*
    value and keeps encode O(n) vectorized; at 10^12 sequences the encode
    throughput dominates the few-percent ratio loss. Round-trip exactness
    (the actual correctness gate) is unaffected.

Both encoders are fully vectorized: per-element payloads are materialized
as (hi, lo) uint64 pairs + bit lengths, then flattened to a bit array with
repeat/cumsum indexing and np.packbits — no per-element Python in encode.
Decode is an inherently sequential bit-walk (as in the reference
implementation of Gorilla); it runs chunk-at-a-time inside pandas UDFs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_U64 = np.uint64
_MASK6 = np.uint64(0x3F)

# 256-entry leading/trailing-zero tables for bytes (value for 0 is 8).
_CLZ8 = np.array([8] + [7 - int(i).bit_length() + 1 for i in range(1, 256)], dtype=np.int64)
for _i in range(1, 256):
    _CLZ8[_i] = 8 - int(_i).bit_length()
_CTZ8 = np.zeros(256, dtype=np.int64)
_CTZ8[0] = 8
for _i in range(1, 256):
    _CTZ8[_i] = (int(_i) & -int(_i)).bit_length() - 1


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (returns 64 for 0)."""
    b = x.astype("<u8").byteswap().view(np.uint8).reshape(-1, 8)  # big-endian bytes
    nz = b != 0
    anynz = nz.any(axis=1)
    first = np.argmax(nz, axis=1)
    out = first * 8 + _CLZ8[b[np.arange(b.shape[0]), first]]
    out[~anynz] = 64
    return out


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (returns 64 for 0)."""
    b = x.astype("<u8").view(np.uint8).reshape(-1, 8)  # little-endian bytes
    nz = b != 0
    anynz = nz.any(axis=1)
    first = np.argmax(nz, axis=1)
    out = first * 8 + _CTZ8[b[np.arange(b.shape[0]), first]]
    out[~anynz] = 64
    return out


def _pack_varbits(hi: np.ndarray, lo: np.ndarray, lengths: np.ndarray) -> bytes:
    """Flatten per-element payloads into a packed MSB-first bitstream.

    Element i contributes its low ``lengths[i]`` bits of the 128-bit value
    ``hi[i] << 64 | lo[i]``, written most-significant-first. Vectorized:
    one repeat + one cumsum + one packbits, no Python loop.
    """
    lengths = lengths.astype(np.int64)
    total = int(lengths.sum())
    if total == 0:
        return b""
    elem = np.repeat(np.arange(lengths.shape[0]), lengths)
    offsets = np.cumsum(lengths) - lengths
    pos_in_elem = np.arange(total, dtype=np.int64) - offsets[elem]
    shift = lengths[elem] - 1 - pos_in_elem  # MSB-first
    in_lo = shift < 64
    sh = np.where(in_lo, shift, shift - 64).astype(_U64)
    src = np.where(in_lo, lo[elem], hi[elem])
    bits = ((src >> sh) & _U64(1)).astype(np.uint8)
    return np.packbits(bits).tobytes()


class _BitReader:
    """Sequential MSB-first bit reader over a packed byte buffer."""

    __slots__ = ("bits", "pos")

    def __init__(self, buf: bytes):
        self.bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
        self.pos = 0

    def read(self, k: int) -> int:
        p = self.pos
        self.pos = p + k
        v = 0
        for b in self.bits[p : p + k]:
            v = (v << 1) | int(b)
        return v


def encode_timestamps(t: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 timestamp array. Vectorized."""
    t = np.asarray(t, dtype=np.int64)
    n = t.shape[0]
    header = struct.pack("<I", n)
    if n == 0:
        return header
    header += struct.pack("<q", int(t[0]))
    if n == 1:
        return header
    delta = np.diff(t)
    dod = delta.copy()
    dod[1:] = delta[1:] - delta[:-1]  # first delta relative to prev_delta=0

    zero = dod == 0
    c1 = ~zero & (dod >= -63) & (dod <= 64)
    c2 = ~zero & ~c1 & (dod >= -255) & (dod <= 256)
    c3 = ~zero & ~c1 & ~c2 & (dod >= -2047) & (dod <= 2048)
    c4 = ~zero & ~c1 & ~c2 & ~c3

    m = dod.shape[0]
    lo = np.zeros(m, dtype=_U64)
    hi = np.zeros(m, dtype=_U64)
    lengths = np.ones(m, dtype=np.int64)  # class '0' -> 1 bit, payload 0

    lo[c1] = (_U64(0b10) << _U64(7)) | (dod[c1] + 63).astype(_U64)
    lengths[c1] = 9
    lo[c2] = (_U64(0b110) << _U64(9)) | (dod[c2] + 255).astype(_U64)
    lengths[c2] = 12
    lo[c3] = (_U64(0b1110) << _U64(12)) | (dod[c3] + 2047).astype(_U64)
    lengths[c3] = 16
    lo[c4] = dod[c4].astype(np.int64).view(_U64) if dod[c4].size else lo[c4]
    hi[c4] = _U64(0b1111)
    lengths[c4] = 68

    return header + _pack_varbits(hi, lo, lengths)


def decode_timestamps(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_timestamps`. Sequential bit-walk per chunk."""
    (n,) = struct.unpack_from("<I", buf, 0)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    (t0,) = struct.unpack_from("<q", buf, 4)
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    if n == 1:
        return out
    r = _BitReader(buf[12:])
    prev_delta = 0
    prev_t = t0
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            v = r.read(64)
            dod = v - (1 << 64) if v >= (1 << 63) else v
        prev_delta += dod
        prev_t += prev_delta
        out[i] = prev_t
    return out


def encode_values(v: np.ndarray) -> bytes:
    """Gorilla-style XOR encode of an int64/uint64 value array. Vectorized."""
    v = np.asarray(v)
    if v.dtype != _U64:
        v = v.astype(np.int64).view(_U64)
    n = v.shape[0]
    header = struct.pack("<I", n)
    if n == 0:
        return header
    header += struct.pack("<Q", int(v[0]))
    if n == 1:
        return header
    xor = v[1:] ^ v[:-1]
    m = xor.shape[0]
    nonzero = xor != 0

    lead = _clz64(xor)
    trail = _ctz64(xor)
    mlen = np.maximum(64 - lead - trail, 1)  # meaningful bits (>=1 if nonzero)

    lengths = np.ones(m, dtype=np.int64)
    lo = np.zeros(m, dtype=_U64)
    hi = np.zeros(m, dtype=_U64)

    nz = np.flatnonzero(nonzero)
    if nz.size:
        L = lead[nz].astype(_U64)
        ml = mlen[nz].astype(_U64)
        meaningful = xor[nz] >> trail[nz].astype(_U64)
        head = (_U64(1) << _U64(12)) | (L << _U64(6)) | (ml - _U64(1))  # 13 bits
        # payload = head << mlen | meaningful; mlen can be 64, so split the
        # shift into two <=63-bit steps (well-defined, drops overflow bits).
        s1 = np.minimum(ml, _U64(63))
        s2 = ml - s1
        lo[nz] = ((head << s1) << s2) | meaningful
        hi[nz] = head >> (_U64(64) - ml)
        lengths[nz] = 13 + mlen[nz]

    return header + _pack_varbits(hi, lo, lengths)


def decode_values(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_values`; returns uint64 array."""
    (n,) = struct.unpack_from("<I", buf, 0)
    if n == 0:
        return np.empty(0, dtype=_U64)
    (v0,) = struct.unpack_from("<Q", buf, 4)
    out = np.empty(n, dtype=_U64)
    out[0] = v0
    if n == 1:
        return out
    r = _BitReader(buf[12:])
    prev = v0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        lead = r.read(6)
        mlen = r.read(6) + 1
        meaningful = r.read(mlen)
        trail = 64 - lead - mlen
        prev ^= meaningful << trail
        out[i] = prev
    return out


def encode_chunk(t: np.ndarray, v: np.ndarray) -> dict:
    """Encode one series chunk into the chunk-struct fields
    (SURVEY.md §1.2): ts_dod + vals_gorilla binaries, n, crc32 checksum
    over the raw little-endian (t, v) bytes."""
    t = np.asarray(t, dtype=np.int64)
    v = np.asarray(v, dtype=np.int64)
    if t.shape[0] != v.shape[0]:
        raise ValueError("t and v should have same size")
    crc = zlib.crc32(t.astype("<i8").tobytes())
    crc = zlib.crc32(v.astype("<i8").tobytes(), crc)
    return {
        "t0": int(t[0]) if t.shape[0] else 0,
        "n": int(t.shape[0]),
        "ts_dod": encode_timestamps(t),
        "vals_gorilla": encode_values(v),
        "checksum": crc,
    }


def decode_chunk(chunk: dict) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_chunk`; verifies the checksum."""
    t = decode_timestamps(chunk["ts_dod"])
    v = decode_values(chunk["vals_gorilla"]).view(np.int64)
    crc = zlib.crc32(t.astype("<i8").tobytes())
    crc = zlib.crc32(v.astype("<i8").tobytes(), crc)
    if crc != chunk["checksum"]:
        raise ValueError(f"chunk checksum mismatch: {crc} != {chunk['checksum']}")
    return t, v
