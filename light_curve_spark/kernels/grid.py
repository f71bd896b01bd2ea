"""Uniform grid construction.

Semantics replicate the reference ``linspace`` exactly
(/root/reference/light-curve-common/src/linspace.rs:17-26): the step is
``(end - start) / (size - 1)`` and element *i* is ``start + step * i``
(accumulation formula, NOT numpy.linspace's interior formula, so that
golden outputs are bit-identical to the reference).

Callers must pass ``size >= 2``; the reference underflows at ``size == 0``
and produces an infinite step at ``size == 1``, which we surface as
``ValueError`` instead of UB.
"""

from __future__ import annotations

import numpy as np


def linspace(start: float, end: float, size: int) -> np.ndarray:
    """Inclusive uniform grid of ``size`` float64 points from start to end.

    >>> linspace(0.0, 1.0, 3).tolist()
    [0.0, 0.5, 1.0]
    """
    if size < 2:
        raise ValueError("linspace requires size >= 2")
    step = (end - start) / (size - 1)
    # start + step*i, replicated exactly (linspace.rs:23-25).
    return start + step * np.arange(size, dtype=np.float64)
