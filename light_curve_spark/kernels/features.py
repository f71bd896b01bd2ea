"""Per-series feature kernels (vectorized numpy).

Definitions follow Malanchev et al. 2021, MNRAS 502, 5147 — the public
paper the reference itself cites as the home of its feature set
(/root/reference/README.md:30-50); the snapshot's sibling crate
``light-curve-feature`` is not present, so the paper is the normative
source (SURVEY.md §2.5).

All kernels take the value series ``m`` (float64) and, where relevant, the
time series ``t`` (float64). Reduction order is fixed (plain sequential
numpy sums over the natural index order) so outputs are bit-stable across
runs — required by the golden-parity gate (BASELINE.json north_star).

Empty-series policy: ``ValueError`` (mirrors the reference's empty-input
panic, light-curve-interpol/src/lib.rs:34). Features needing N>=2 return
NaN for N==1 (sample std undefined).
"""

from __future__ import annotations

import numpy as np

#: names and order of the scalar features emitted by :func:`feature_vector`
FEATURE_NAMES = (
    "mean",
    "std",
    "min",
    "max",
    "median",
    "count",
    "amplitude",
    "beyond_1_std",
    "beyond_2_std",
    "mad",
    "stetson_k",
)

PERIODOGRAM_NAMES = (
    "pg_mean",
    "pg_std",
    "pg_skew",
    "pg_kurt",
    "pg_peak_freq",
)


def _check(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    if m.shape[0] == 0:
        raise ValueError("empty series")
    return m


def amplitude(m: np.ndarray) -> float:
    """(max - min) / 2 (Malanchev+21 §Amplitude)."""
    m = _check(m)
    return (np.max(m) - np.min(m)) / 2.0


def beyond_n_std(m: np.ndarray, n: float) -> float:
    """Fraction of points with |m_i - mean| > n * sample-std."""
    m = _check(m)
    N = m.shape[0]
    if N < 2:
        return float("nan")
    mu = np.mean(m)
    sigma = np.std(m, ddof=1)
    return float(np.count_nonzero(np.abs(m - mu) > n * sigma)) / N


def median_absolute_deviation(m: np.ndarray) -> float:
    """median(|m_i - median(m)|)."""
    m = _check(m)
    return float(np.median(np.abs(m - np.median(m))))


def stetson_k(m: np.ndarray) -> float:
    """Stetson K with unit per-point errors (tokens carry none):
    K = mean(|m - mean|) / sqrt(mean((m - mean)^2)).
    The sqrt(N/(N-1)) normalizations cancel in the ratio (SURVEY.md §2.5).
    """
    m = _check(m)
    if m.shape[0] < 2:
        return float("nan")
    d = m - np.mean(m)
    denom = np.sqrt(np.mean(d * d))
    if denom == 0.0:
        return float("nan")
    return float(np.mean(np.abs(d)) / denom)


def feature_vector(m: np.ndarray) -> dict[str, float]:
    """All scalar features in one pass over the series."""
    m = _check(m)
    N = m.shape[0]
    mu = float(np.mean(m))
    mn = float(np.min(m))
    mx = float(np.max(m))
    med = float(np.median(m))
    if N >= 2:
        sigma = float(np.std(m, ddof=1))
        d = m - mu
        rms = float(np.sqrt(np.mean(d * d)))
        b1 = float(np.count_nonzero(np.abs(d) > 1.0 * sigma)) / N
        b2 = float(np.count_nonzero(np.abs(d) > 2.0 * sigma)) / N
        k = float(np.mean(np.abs(d)) / rms) if rms != 0.0 else float("nan")
    else:
        sigma = b1 = b2 = k = float("nan")
    return {
        "mean": mu,
        "std": sigma,
        "min": mn,
        "max": mx,
        "median": med,
        "count": float(N),
        "amplitude": (mx - mn) / 2.0,
        "beyond_1_std": b1,
        "beyond_2_std": b2,
        "mad": float(np.median(np.abs(m - med))),
        "stetson_k": k,
    }


def periodogram_power(
    t: np.ndarray, m: np.ndarray, freqs: np.ndarray
) -> np.ndarray:
    """Direct trigonometric-sum power spectrum on a fixed frequency grid
    ("Lomb-Scargle-free", BASELINE.json north_star):

        P(f_k) = (sum_i m'_i cos(2*pi*f_k*t_i))^2
               + (sum_i m'_i sin(2*pi*f_k*t_i))^2

    over the mean-subtracted series m'. O(N*K), fully vectorized as one
    matrix product per trig term.
    """
    t = np.asarray(t, dtype=np.float64)
    m = _check(m)
    if t.shape[0] != m.shape[0]:
        raise ValueError("t and m should have same size")
    freqs = np.asarray(freqs, dtype=np.float64)
    md = m - np.mean(m)
    phase = 2.0 * np.pi * np.outer(freqs, t)  # (K, N)
    c = np.cos(phase) @ md
    s = np.sin(phase) @ md
    return c * c + s * s


def periodogram_moments(
    t: np.ndarray, m: np.ndarray, freqs: np.ndarray
) -> dict[str, float]:
    """Moments of the normalized power spectrum (mean, sample-std,
    skewness, excess kurtosis of P/sum(P)) plus argmax frequency."""
    p = periodogram_power(t, m, freqs)
    tot = np.sum(p)
    if tot == 0.0 or p.shape[0] < 2:
        nan = float("nan")
        return {
            "pg_mean": nan,
            "pg_std": nan,
            "pg_skew": nan,
            "pg_kurt": nan,
            "pg_peak_freq": float(freqs[int(np.argmax(p))]) if p.size else nan,
        }
    q = p / tot
    mu = float(np.mean(q))
    sd = float(np.std(q, ddof=1))
    z = (q - mu) / sd if sd != 0.0 else np.zeros_like(q)
    return {
        "pg_mean": mu,
        "pg_std": sd,
        "pg_skew": float(np.mean(z**3)),
        "pg_kurt": float(np.mean(z**4) - 3.0),
        "pg_peak_freq": float(freqs[int(np.argmax(p))]),
    }
