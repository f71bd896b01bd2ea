"""Persist lifecycle for library operators.

Some operators MUST persist an intermediate to stop Catalyst recomputing
a shared subtree for every consumer (e.g. the pruned gram inverted index
feeds its own document-frequency aggregate AND both sides of a
self-join — without a persist that is ~4 full corpus scans at 100 TB).
But a bare ``df.persist()`` inside a library function leaks storage into
the caller's session: repeated calls in a long-running app accumulate
cached partials forever.

:func:`cached` persists AND registers the DataFrame in a session-scoped
registry; applications call :func:`release_operator_caches` at a batch
boundary (the pipeline does this per run; benchmarks between queries).
Storage level is MEMORY_AND_DISK: at 100 TB the pruned intermediates are
orders of magnitude smaller than raw, and spilling beats recomputing.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_ACTIVE: list[DataFrame] = []


def cached(
    df: DataFrame, storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df`` and register it for batch-boundary release."""
    df = df.persist(storage_level)
    _ACTIVE.append(df)
    return df


def release_operator_caches(since: int = 0) -> int:
    """Unpersist operator-cached DataFrames registered after position
    ``since`` (default: all of them); returns how many were released.
    Safe to call anytime — lazily-defined queries simply recompute after
    release."""
    n = 0
    while len(_ACTIVE) > since:
        df = _ACTIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    return n


@contextmanager
def cache_scope():
    """Release ONLY the caches registered inside the ``with`` block.

    Library operators that persist internally (e.g. the per-round label
    tables of dedup_clusters) must not unpersist caches registered by
    OTHER in-flight operators — a global release is correct but forces
    silent full recomputes on composed pipelines. The scope snapshots the
    registry position on entry and pops back to it on exit.

    The context yields a ``keep(df)`` function: a cached DataFrame passed
    to it SURVIVES the scope exit and is re-registered in the enclosing
    scope (for an operator whose internals are scoped but whose RESULT
    stays cached for the caller to release at a batch boundary)."""
    start = len(_ACTIVE)
    kept: list[DataFrame] = []

    def keep(df: DataFrame) -> DataFrame:
        kept.append(df)
        return df

    try:
        yield keep
    finally:
        keep_ids = {id(df) for df in kept}
        scoped = _ACTIVE[start:]
        del _ACTIVE[start:]
        for df in scoped:
            if id(df) in keep_ids:
                continue
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — session may already be gone
                pass
        # re-register survivors in the enclosing scope, in order
        _ACTIVE.extend(df for df in scoped if id(df) in keep_ids)
