"""Experiment: Gorilla value-codec '10' window-reuse branch (Pelkonen
et al. VLDB'15 §4.1.2) — measure what the deliberately-omitted branch
(kernels/compression.py rationale) would buy on this engine's data.

The engine's codec always emits the '11' form (13-bit header + payload
per nonzero XOR). The paper's '10' form reuses the window (leading/
meaningful lengths) established by the most recent '11' token, costing
2 + prev_mlen bits when the current XOR fits inside it — a SEQUENTIAL
dependency (each decision depends on the active window, which depends on
all prior decisions), which is why the vectorized encoder skips it.

This script implements the exact sequential rule (reference-style loop)
plus a VECTORIZABLE block-envelope variant (emit one '11' per K-token
block with the block's envelope window, '10' for the rest — an encoder
choice any paper decoder accepts), and reports bits/token for:

  A. synthetic training tokens (engine input_hint distribution)
  B. smooth series (cumsum of small deltas — classic monitoring shape)
  C. the reference's ZTF flux benchmark curve (f64 bit patterns)

Run: PYTHONPATH=. python scripts/experiment_window_reuse.py
Conclusion from 2026-08-16 run: see BENCH.md appendix / commit message.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from light_curve_spark.kernels.compression import _clz64, _ctz64


def _xor_stream(v: np.ndarray) -> np.ndarray:
    u = np.asarray(v, dtype=np.int64).view(np.uint64)
    x = u.copy()
    x[1:] = u[1:] ^ u[:-1]
    return x[1:]  # first value is a raw 64-bit header in every scheme


def bits_current(xor: np.ndarray) -> int:
    """Engine codec: '0' for zero XOR; '1' + 12-bit window + payload."""
    nz = xor[xor != 0]
    total = int(xor.size)  # 1 control bit each
    if nz.size:
        mlen = np.maximum(64 - _clz64(nz) - _ctz64(nz), 1)
        total += int((12 + mlen).sum())
    return total


def bits_paper_sequential(xor: np.ndarray) -> int:
    """Exact §4.1.2 rule: '0' / '10'+payload(prev window) / '11'+5-bit
    lead+6-bit len+payload. Sequential window state."""
    lead = _clz64(np.maximum(xor, 1))
    trail = _ctz64(np.maximum(xor, 1))
    total = 0
    cur_lead, cur_trail = -1, -1  # no active window
    for i in range(xor.size):
        if xor[i] == 0:
            total += 1
            continue
        li, ti = int(lead[i]), int(trail[i])
        if (
            cur_lead >= 0
            and li >= cur_lead
            and ti >= cur_trail
        ):
            total += 2 + (64 - cur_lead - cur_trail)  # '10' reuse
        else:
            total += 2 + 5 + 6 + (64 - li - ti)  # '11' new window
            cur_lead, cur_trail = li, ti
    return total


def bits_block_envelope(xor: np.ndarray, k: int = 8) -> int:
    """Vectorizable encoder choice: one '11' per k-token block using the
    block's nonzero-XOR envelope window, '10' for the block's remaining
    nonzeros. Decodes with any paper decoder. (Loop below is per BLOCK
    for clarity; production form is reduceat over block ids.)"""
    total = 0
    for s in range(0, xor.size, k):
        blk = xor[s : s + k]
        nz = blk[blk != 0]
        total += int(blk.size - nz.size)  # '0' bits
        if nz.size == 0:
            continue
        lead = int(_clz64(nz).min())
        trail = int(_ctz64(nz).min())
        mlen = 64 - lead - trail
        total += 2 + 5 + 6 + mlen  # block's '11'
        total += int((nz.size - 1) * (2 + mlen))  # '10' reuses
    return total


def report(name: str, series: list[np.ndarray]) -> None:
    xors = [_xor_stream(v) for v in series if v.size > 1]
    n_tok = sum(x.size for x in xors)
    cur = sum(bits_current(x) for x in xors)
    seq = sum(bits_paper_sequential(x) for x in xors)
    blk = sum(bits_block_envelope(x) for x in xors)
    print(
        f"{name:28s} tokens={n_tok:8d}  current={cur/n_tok:6.2f} b/tok  "
        f"paper-seq={seq/n_tok:6.2f} ({1-seq/cur:+.1%})  "
        f"block-env(k=8)={blk/n_tok:6.2f} ({1-blk/cur:+.1%})"
    )


def main() -> None:
    rng = np.random.default_rng(42)

    # A. engine input: synthetic training tokens (uniform [0, 50257))
    from light_curve_spark.sources.synthetic import row_fields

    _, _, tokens = row_fields(np.arange(500), seed=42)
    report("A synthetic tokens", [t.astype(np.int64) for t in tokens])

    # B. smooth monitoring-style series: cumsum of small int deltas
    smooth = [
        np.cumsum(rng.integers(-3, 4, size=1000)).astype(np.int64)
        for _ in range(100)
    ]
    report("B smooth cumsum", smooth)

    # C. reference ZTF flux curve (f64 bit patterns, the classic Gorilla
    # target shape)
    import pyarrow.parquet as pq

    t = pq.read_table("/root/repo/fixtures/ztf_bench_curve.parquet")
    flux = np.asarray(t.column("v").to_pylist()[0], dtype=np.float64)
    report("C ZTF flux f64 bits", [flux.view(np.int64)])

    # D. repeated/quantized values (best case for reuse)
    quant = [
        (rng.integers(0, 16, size=1000) * 8 + 1000).astype(np.int64)
        for _ in range(50)
    ]
    report("D quantized values", quant)


if __name__ == "__main__":
    main()
