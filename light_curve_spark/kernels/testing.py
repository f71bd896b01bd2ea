"""Testing comparator mirroring the reference ``all_close``
(/root/reference/light-curve-common/src/allclose.rs:26-41):
equal lengths, elementwise ``|a - b| < tol`` — STRICT less-than, absolute
tolerance only (unlike ``np.allclose`` which adds rtol and uses ``<=``).
Raises ``AssertionError`` with both arrays printed, as the reference panics.
"""

from __future__ import annotations

import numpy as np


def all_close(actual, desired, tol: float) -> None:
    a = np.asarray(actual, dtype=np.float64)
    d = np.asarray(desired, dtype=np.float64)
    if a.shape != d.shape:
        raise AssertionError(f"length mismatch: {a.shape} vs {d.shape}")
    bad = ~(np.abs(a - d) < tol)
    if bad.any():
        raise AssertionError(f"not all close (tol={tol}):\nactual={a!r}\ndesired={d!r}")
