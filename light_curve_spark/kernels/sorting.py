"""Co-sorting of parallel columns.

Semantics replicate the reference ``sort_multiple``
(/root/reference/light-curve-common/src/sort_multiple.rs:20-41): build an
index permutation by sorting the FIRST array only, then gather every array
through that permutation. Later arrays never participate in tie-breaking.

Differences from the reference, by design (SURVEY.md §2.7):
- stable argsort (determinism beats the reference's unstable sort for
  golden parity; under ties the outputs differ only in tied positions,
  which the reference leaves unspecified);
- NaN in the key column raises ``ValueError`` instead of panicking
  (the reference unwraps ``partial_cmp`` at sort_multiple.rs:34).
"""

from __future__ import annotations

import numpy as np


def cosort(*arrays: np.ndarray) -> list[np.ndarray]:
    """Sort all arrays by the first one; returns new arrays.

    >>> [a.tolist() for a in cosort(np.array([1, 2, 3, 0, 4]), np.array([3, 2, 1, 4, 0]))]
    [[0, 1, 2, 3, 4], [4, 3, 2, 1, 0]]
    """
    if not arrays:
        return []
    key = np.asarray(arrays[0])
    n = key.shape[0]
    for a in arrays[1:]:
        if np.asarray(a).shape[0] != n:
            raise ValueError("all arrays must have the same length")
    if key.dtype.kind == "f" and np.isnan(key).any():
        raise ValueError("NaN in sort key")
    order = np.argsort(key, kind="stable")
    return [np.asarray(a)[order] for a in arrays]
