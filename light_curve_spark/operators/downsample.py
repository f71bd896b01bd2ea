"""LTTB downsampling (Steinarsson 2013, "Largest-Triangle-Three-Buckets"
— the standard visual-fidelity downsampler for time series): reduce each
series to ``n_out`` points, keeping first/last and, per bucket, the point
forming the largest triangle with the previously selected point and the
next bucket's centroid.

Complements the regrid operator: regrid resamples onto a uniform grid
(value interpolation); LTTB SELECTS real observed points (shape
preservation) — what a dashboard wants. Per-key applyInPandas around a
vectorized-per-bucket numpy kernel (inherently sequential across buckets
— each choice depends on the previous — but each bucket's triangle areas
are computed vectorized)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType



def lttb(t: np.ndarray, v: np.ndarray, n_out: int) -> tuple[np.ndarray, np.ndarray]:
    """Kernel: downsample one (sorted) series to n_out points."""
    n = t.shape[0]
    if n_out >= n or n_out < 3:
        return t, v
    # bucket boundaries over the interior points (excluding first/last)
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    sel = np.empty(n_out, dtype=np.int64)
    sel[0] = 0
    a = 0
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo, nhi = edges[i + 1], (n if i + 1 == n_out - 2 else edges[i + 2])
        cx = t[nlo:nhi].mean() if nhi > nlo else t[-1]
        cy = v[nlo:nhi].mean() if nhi > nlo else v[-1]
        # triangle area vs previous selected point and next-bucket centroid
        area = np.abs(
            (t[a] - cx) * (v[lo:hi] - v[a]) - (t[a] - t[lo:hi]) * (cy - v[a])
        )
        a = lo + int(np.argmax(area))
        sel[i + 1] = a
    sel[-1] = n - 1
    return t[sel], v[sel]


def downsample_lttb(
    series: DataFrame, n_out: int, keys: list[str] | None = None
) -> DataFrame:
    """(key..., t_ds: array<double>, v_ds: array<double>) per key."""
    keys = keys or ["doc_id"]
    in_fields = {f.name: f for f in series.schema.fields}
    schema = StructType(
        [in_fields[k] for k in keys]
        + [
            StructField("t_ds", ArrayType(DoubleType(), False), False),
            StructField("v_ds", ArrayType(DoubleType(), False), False),
        ]
    )

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        t = pdf["t"].to_numpy(dtype=np.float64)
        v = pdf["v"].to_numpy(dtype=np.float64)
        # (t, v) lexsort, NOT stable-by-t-only cosort: with duplicate
        # timestamps the stable order would be partition-arrival order,
        # making the SELECTED points flicker across runs (the same
        # nondeterminism class fixed in asof/interpolate this round)
        order = np.lexsort((v, t))
        td, vd = lttb(t[order], v[order], n_out)
        return pd.DataFrame({**dict(zip(keys, key)), "t_ds": [td], "v_ds": [vd]})

    return series.groupBy(*keys).applyInPandas(fn, schema=schema)
