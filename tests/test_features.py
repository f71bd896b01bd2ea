"""Feature kernel tests — definitions from Malanchev et al. 2021 (the
reference's own citation, /root/reference/README.md:30-50); oracles are
independent closed-form computations on tiny hand-checked series."""

import numpy as np
import pytest

from light_curve_spark.kernels import (
    amplitude,
    beyond_n_std,
    feature_vector,
    linspace,
    median_absolute_deviation,
    periodogram_moments,
    periodogram_power,
    stetson_k,
)


def test_amplitude():
    assert amplitude(np.array([1.0, 5.0, 3.0])) == 2.0


def test_amplitude_constant():
    assert amplitude(np.full(10, 4.0)) == 0.0


def test_beyond_n_std_hand_checked():
    # m = [0,0,0,0,10]: mean=2, std_samp=sqrt(80/4)=~4.472
    # |m-2| = [2,2,2,2,8]; only 8 > 1*4.472 -> 1/5
    m = np.array([0.0, 0.0, 0.0, 0.0, 10.0])
    assert beyond_n_std(m, 1.0) == pytest.approx(0.2)
    assert beyond_n_std(m, 2.0) == 0.0


def test_beyond_n_std_singleton_nan():
    assert np.isnan(beyond_n_std(np.array([1.0]), 1.0))


def test_mad_hand_checked():
    # median([1,2,3,4,100])=3; |m-3|=[2,1,0,1,97]; median=1
    assert median_absolute_deviation(np.array([1.0, 2.0, 3.0, 4.0, 100.0])) == 1.0


def test_stetson_k_two_point():
    # m=[0,2]: d=[-1,1]; mean|d|=1; rms=1 -> K=1
    assert stetson_k(np.array([0.0, 2.0])) == pytest.approx(1.0)


def test_stetson_k_normal_limit():
    # for Gaussian data K -> sqrt(2/pi) ~ 0.7979
    rng = np.random.default_rng(0)
    k = stetson_k(rng.normal(size=200_000))
    assert abs(k - np.sqrt(2 / np.pi)) < 0.01


def test_stetson_k_constant_nan():
    assert np.isnan(stetson_k(np.full(5, 3.0)))


def test_feature_vector_consistency():
    rng = np.random.default_rng(1)
    m = rng.integers(0, 50257, size=500).astype(np.float64)
    fv = feature_vector(m)
    assert fv["amplitude"] == amplitude(m)
    assert fv["mad"] == median_absolute_deviation(m)
    assert fv["stetson_k"] == pytest.approx(stetson_k(m), abs=1e-15)
    assert fv["beyond_1_std"] == pytest.approx(beyond_n_std(m, 1.0), abs=1e-15)
    assert fv["beyond_2_std"] == pytest.approx(beyond_n_std(m, 2.0), abs=1e-15)
    assert fv["count"] == 500.0
    assert fv["mean"] == pytest.approx(np.mean(m))


def test_feature_vector_empty_raises():
    with pytest.raises(ValueError):
        feature_vector(np.array([]))


def test_von_neumann_eta_white_noise_limit():
    # for iid data eta -> 2 (von Neumann 1941)
    from light_curve_spark.kernels.features import von_neumann_eta

    rng = np.random.default_rng(3)
    eta = von_neumann_eta(rng.normal(size=100_000))
    assert abs(eta - 2.0) < 0.05


def test_von_neumann_eta_smooth_series_small():
    from light_curve_spark.kernels.features import von_neumann_eta

    t = np.linspace(0, 1, 1000)
    eta = von_neumann_eta(np.sin(2 * np.pi * t))  # smooth -> eta << 2
    assert eta < 0.01


def test_linear_trend_exact_line():
    from light_curve_spark.kernels.features import linear_trend

    t = np.array([0.0, 1.0, 2.0, 5.0])
    assert linear_trend(t, 3.0 * t + 7.0) == pytest.approx(3.0, abs=1e-12)
    assert linear_trend(t, np.full(4, 2.0)) == pytest.approx(0.0, abs=1e-12)


def test_dmdt_counts_hand_checked():
    from light_curve_spark.kernels.features import dmdt_counts

    # t=[0,1,3], v=[0,10,-5]: pairs (dt,dm) = (1,10),(3,-5),(2,-15)
    grid = dmdt_counts(
        np.array([0.0, 1.0, 3.0]),
        np.array([0.0, 10.0, -5.0]),
        dt_width=1.0, dm_width=10.0, n_dt=4, n_dm=4, dm_offset=20.0,
    )
    # (1,10): dt_bin=1, dm_bin=3; (3,-5): dt_bin=3, dm_bin=1;
    # (2,-15): dt_bin=2, dm_bin=0
    assert grid[1, 3] == 1 and grid[3, 1] == 1 and grid[2, 0] == 1
    assert grid.sum() == 3


def test_dmdt_counts_out_of_range_dropped():
    from light_curve_spark.kernels.features import dmdt_counts

    grid = dmdt_counts(
        np.array([0.0, 100.0]), np.array([0.0, 0.0]),
        dt_width=1.0, dm_width=1.0, n_dt=4, n_dm=4, dm_offset=2.0,
    )
    assert grid.sum() == 0  # dt=100 beyond the grid


def test_periodogram_finds_injected_frequency():
    # pure sinusoid at f=0.05 on an irregular grid -> peak at 0.05
    rng = np.random.default_rng(2)
    t = np.sort(rng.uniform(0, 500, size=400))
    m = np.sin(2 * np.pi * 0.05 * t)
    freqs = linspace(0.01, 0.1, 91)  # grid step 0.001
    mom = periodogram_moments(t, m, freqs)
    assert mom["pg_peak_freq"] == pytest.approx(0.05, abs=0.002)


def test_periodogram_power_matches_direct_sums():
    t = np.array([0.0, 1.0, 2.5, 3.0])
    m = np.array([1.0, 3.0, 2.0, 4.0])
    freqs = np.array([0.1, 0.25])
    md = m - m.mean()
    expected = []
    for f in freqs:
        c = sum(md[i] * np.cos(2 * np.pi * f * t[i]) for i in range(4))
        s = sum(md[i] * np.sin(2 * np.pi * f * t[i]) for i in range(4))
        expected.append(c * c + s * s)
    got = periodogram_power(t, m, freqs)
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_periodogram_constant_series_nan_moments():
    t = np.arange(10, dtype=np.float64)
    mom = periodogram_moments(t, np.full(10, 5.0), linspace(0.1, 0.4, 4))
    assert np.isnan(mom["pg_mean"])
