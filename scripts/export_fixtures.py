"""Export the golden fixtures (FIXTURES.md §2-3) as parquet under
fixtures/: the reference's unit-test vectors verbatim, the ZTF benchmark
curve (de-interleaved from light-curve-interpol/benches/lib.rs:11-324),
and the frozen regrid golden computed once by the parity kernel.

    PYTHONPATH=. python scripts/export_fixtures.py
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from light_curve_spark.kernels import interpolate, linspace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "fixtures")
REF_BENCH = "/root/reference/light-curve-interpol/benches/lib.rs"

# reference unit-test vectors, verbatim (cites in FIXTURES.md §2)
INTERP_CASES = [
    # (case, x, y, target_x, left, right, expected)
    ("interp_one_point", [0.0], [1.0], [-2.0, -1.0, 0.0, 1.0, 2.0], -3.0, -8.0,
     [-3.0, -3.0, 1.0, -8.0, -8.0]),
    ("interp_two_points", [0.0, 1.0], [1.0, 2.0],
     [-1.25, -0.75, -0.25, 0.25, 0.75, 1.25, 1.75], -3.0, -8.0,
     [-3.0, -3.0, -3.0, 1.25, 1.75, -8.0, -8.0]),
    ("interp_equal_time", [0.0, 1.0, 1.0, 2.0], [1.0, 2.0, 3.0, 4.0],
     [0.5, 1.5], -1.0, -1.0, [1.5, 3.5]),
    ("interp_broken_line",
     [-7/3, -4/3, -1.0, -1/3, 1.0, 4/3, 7/3],
     [2.5, 2.0, 0.5, 1.0, 0.5, 1.5, 3.0],
     [-2.0, -5/3, -4/3, -1.0, -2/3, -1/3, 0.0, 1/3, 2/3, 1.0, 4/3, 5/3, 2.0],
     -1.0, -1.0,
     [7/3, 13/6, 2.0, 0.5, 0.75, 1.0, 0.875, 0.75, 0.625, 0.5, 1.5, 2.0, 2.5]),
    ("interp_empty_target", [0.0, 1.0], [0.0, 1.0], [], 0.0, 0.0, []),
]


def export_interp_cases() -> None:
    rows = [
        {"case": c, "x": x, "y": y, "target_x": tx, "left": l, "right": r,
         "expected": exp}
        for c, x, y, tx, l, r, exp in INTERP_CASES
    ]
    pd.DataFrame(rows).to_parquet(os.path.join(OUT, "interp_goldens.parquet"))


def export_ztf_curve() -> None:
    with open(REF_BENCH) as f:
        src = f.read()
    body = src[src.index("let initial_xy = ["): src.index("];")]
    nums = [float(m) for m in re.findall(r"-?\d+\.\d+e[+-]\d+", body)]
    assert len(nums) == 312, len(nums)
    x = np.array(nums[0::2])
    y = np.array(nums[1::2])
    grid = linspace(58194.5, 58482.5, 145)
    expected = interpolate(x, y, grid, 0.0, 0.0)  # frozen by the parity kernel
    pd.DataFrame(
        [{
            "t": x, "v": y,
            "grid_start": 58194.5, "grid_end": 58482.5, "grid_n": 145,
            "left": 0.0, "right": 0.0,
            "expected": expected,
        }]
    ).to_parquet(os.path.join(OUT, "ztf_bench_curve.parquet"))


def export_rollup_golden(n_rows: int = 300, seed: int = 42) -> None:
    """FIXTURES.md §4: committed rollup-tier golden over the synthetic
    sequences (scalar re-derivation, scripts/oracle_impl.py). Integer-
    valued tokens make every bucket sum exact in f64, so engine output
    must BIT-match (north_star), not just round-trip a tolerance."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from oracle_impl import rollup_tiers_ref, sequence_row_ref, sequence_source_ref

    rows = []
    for rid in range(n_rows):
        doc_id, _, tokens = sequence_row_ref(rid, seed)
        source = sequence_source_ref(rid, seed)
        for tier, b, n, s, mn, mx, mean in rollup_tiers_ref(tokens):
            rows.append((doc_id, source, tier, b, n, s, mn, mx, mean))
    pd.DataFrame(
        rows,
        columns=[
            "doc_id", "source", "tier", "bucket",
            "n_points", "v_sum", "v_min", "v_max", "v_mean",
        ],
    ).astype({"tier": "int32", "bucket": "int64", "n_points": "int64"}).to_parquet(
        os.path.join(OUT, "rollup_tiers_golden.parquet"), index=False
    )


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    export_interp_cases()
    export_ztf_curve()
    export_rollup_golden()
    print("fixtures written to", OUT)
