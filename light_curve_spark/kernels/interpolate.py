"""Linear regrid of an irregular series onto an ascending target grid.

Semantics replicate the reference ``Interpolator::interpolate`` exactly
(/root/reference/light-curve-interpol/src/lib.rs:32-71), re-expressed as a
vectorized numpy kernel instead of the reference's streaming two-pointer
merge:

- target left of the first knot            -> ``left`` fill   (lib.rs:56)
- target exactly equal to some knot x      -> that knot's y; under
  duplicate x the FIRST knot at that x wins (lib.rs:55)
- target strictly inside an interval       -> ``alpha*y_l + (1-alpha)*y_r``
  with ``alpha = (x_r - target) / (x_r - x_l)``  (lib.rs:60-65)
- target right of the last knot            -> ``right`` fill  (lib.rs:68)
- duplicate-x knots form a zero-width interval that the merge skips for
  targets beyond it, so interior interpolation after a duplicate uses the
  LAST knot at that x (verified against ``interpolate_equal_time``,
  lib.rs:141-154: x=[0,1,1,2], y=[1,2,3,4] -> f(1.5)=3.5)

Error contract: length mismatch or empty input raise ``ValueError``
(reference panics, lib.rs:33-34). Empty target -> empty output.

Preconditions (same as the reference's implicit forward-merge contract,
SURVEY.md §1.1): ``x`` and ``target_x`` ascending. Use
:func:`light_curve_spark.kernels.sorting.cosort` first if unsorted.
"""

from __future__ import annotations

import numpy as np


def interpolate(
    x: np.ndarray,
    y: np.ndarray,
    target_x: np.ndarray,
    left: float,
    right: float,
) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    target_x = np.asarray(target_x, dtype=np.float64)
    if x.shape[0] != y.shape[0]:
        raise ValueError("x and y should have same size")
    if x.shape[0] == 0:
        raise ValueError("input arrays should have not zero-length")
    if target_x.shape[0] == 0:
        return np.empty(0, dtype=np.float64)

    out = np.empty(target_x.shape[0], dtype=np.float64)

    # idx_l: first index with x[idx] >= target (so exact hits pick the
    # FIRST duplicate, matching lib.rs:55).
    idx = np.searchsorted(x, target_x, side="left")

    below = target_x < x[0]
    above = target_x > x[-1]
    inside = ~below & ~above

    out[below] = left
    out[above] = right

    ii = np.flatnonzero(inside)
    if ii.size:
        idx_in = idx[ii]
        exact = x[idx_in] == target_x[ii]
        # Exact hit: first knot at that x (lib.rs:55).
        ex = ii[exact]
        out[ex] = y[idx[ex]]
        # Interior, no exact hit: idx is the first index with x > target;
        # idx-1 is the LAST index with x < target, which is the last knot
        # of any duplicate run (lib.rs:141-154 semantics).
        it = ii[~exact]
        if it.size:
            ridx = idx[it]
            lidx = ridx - 1
            alpha = (x[ridx] - target_x[it]) / (x[ridx] - x[lidx])
            # alpha*left.y + (1-alpha)*right.y, exact formula order
            # (lib.rs:61-64) for bit-parity.
            out[it] = alpha * y[lidx] + (1.0 - alpha) * y[ridx]
    return out
