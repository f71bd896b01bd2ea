"""Kernel parity tests — every vector copied verbatim from the reference
test suite (FIXTURES.md §2; file:line cites into /root/reference)."""

import numpy as np
import pytest

from light_curve_spark.kernels import (
    all_close,
    cosort,
    interpolate,
    linspace,
)


# --- linspace (light-curve-common/src/linspace.rs) -------------------------

def test_linspace_doc_example():
    # linspace.rs:11-15
    all_close(linspace(0.0, 1.0, 3), [0.0, 0.5, 1.0], 1e-12)


def test_linspace_two_points():
    # linspace.rs:34-39 (f32, tol 1e-6)
    all_close(linspace(0.0, 1.0, 2), [0.0, 1.0], 1e-6)


def test_linspace_three_points():
    # linspace.rs:41-46 (f64, tol 1e-12)
    all_close(linspace(-1.0, 1.0, 3), [-1.0, 0.0, 1.0], 1e-12)


def test_linspace_many_points():
    # linspace.rs:48-53
    all_close(linspace(0.0, 100.0, 101), np.arange(101, dtype=np.float64), 1e-6)


def test_linspace_accumulation_formula_exact():
    # bit-parity: element i must be exactly start + step*i (linspace.rs:23-25)
    start, end, size = 58194.5, 58482.5, 145
    step = (end - start) / (size - 1)
    got = linspace(start, end, size)
    expected = np.array([start + step * i for i in range(size)])
    assert (got == expected).all()


def test_linspace_size_guard():
    with pytest.raises(ValueError):
        linspace(0.0, 1.0, 1)


# --- cosort (light-curve-common/src/sort_multiple.rs) ----------------------

def test_cosort_doc_example():
    # sort_multiple.rs:10-18
    a, b = cosort(np.array([1, 2, 3, 0, 4]), np.array([3, 2, 1, 4, 0]))
    assert a.tolist() == [0, 1, 2, 3, 4]
    assert b.tolist() == [4, 3, 2, 1, 0]


def test_cosort_three_slices():
    # sort_multiple.rs:67-81: only the FIRST slice drives the order
    a, b, c = cosort(
        np.array([5, 4, 3, 2, 1, 0]),
        np.array([5, 4, 3, 2, 1, 0]),
        np.array([0, 1, 2, 3, 4, 5]),
    )
    assert a.tolist() == [0, 1, 2, 3, 4, 5]
    assert b.tolist() == [0, 1, 2, 3, 4, 5]
    assert c.tolist() == [5, 4, 3, 2, 1, 0]


def test_cosort_random_vs_zip_sort_oracle():
    # sort_multiple.rs:49-65, seeded instead of thread_rng
    rng = np.random.default_rng(42)
    a = rng.random(100)
    b = rng.random(100)
    pairs = sorted(zip(a.tolist(), b.tolist()), key=lambda p: p[0])
    sa, sb = cosort(a, b)
    assert sa.tolist() == [p[0] for p in pairs]
    assert sb.tolist() == [p[1] for p in pairs]


def test_cosort_length_mismatch():
    with pytest.raises(ValueError):
        cosort(np.array([1, 2]), np.array([1]))


def test_cosort_nan_rejected():
    # engine policy: ValueError instead of the reference's panic (SURVEY §2.7)
    with pytest.raises(ValueError):
        cosort(np.array([1.0, np.nan]), np.array([1.0, 2.0]))


# --- interpolate (light-curve-interpol/src/lib.rs) --------------------------

def test_interp_empty_target():
    # lib.rs:79-91
    out = interpolate([0.0, 1.0], [0.0, 1.0], [], 0.0, 0.0)
    assert out.shape == (0,)


def test_interp_zero_points_raises():
    # lib.rs:93-105 (reference panics)
    with pytest.raises(ValueError):
        interpolate([], [], [1.0, 2.0, 3.0], 0.0, 0.0)


def test_interp_length_mismatch_raises():
    # lib.rs:33
    with pytest.raises(ValueError):
        interpolate([0.0, 1.0], [0.0], [0.5], 0.0, 0.0)


def test_interp_one_point():
    # lib.rs:107-122
    out = interpolate([0.0], [1.0], [-2.0, -1.0, 0.0, 1.0, 2.0], -3.0, -8.0)
    all_close(out, [-3.0, -3.0, 1.0, -8.0, -8.0], 1e-6)


def test_interp_two_points():
    # lib.rs:124-139
    out = interpolate(
        [0.0, 1.0], [1.0, 2.0],
        [-1.25, -0.75, -0.25, 0.25, 0.75, 1.25, 1.75], -3.0, -8.0,
    )
    all_close(out, [-3.0, -3.0, -3.0, 1.25, 1.75, -8.0, -8.0], 1e-6)


def test_interp_equal_time_duplicate_semantics():
    # lib.rs:141-154: after a duplicate x the LAST knot at that x is used
    out = interpolate([0.0, 1.0, 1.0, 2.0], [1.0, 2.0, 3.0, 4.0], [0.5, 1.5], -1.0, -1.0)
    all_close(out, [1.5, 3.5], 1e-6)


def test_interp_exact_hit_first_knot_wins():
    # lib.rs:55: target == knot x returns that knot's y; FIRST duplicate wins
    out = interpolate([0.0, 1.0, 1.0, 2.0], [1.0, 2.0, 3.0, 4.0], [1.0], -1.0, -1.0)
    all_close(out, [2.0], 1e-12)


def test_interp_broken_line():
    # lib.rs:156-197 (7 knots, 13 targets)
    x = [-7 / 3, -4 / 3, -1.0, -1 / 3, 1.0, 4 / 3, 7 / 3]
    y = [2.5, 2.0, 0.5, 1.0, 0.5, 1.5, 3.0]
    tx = [-2.0, -5 / 3, -4 / 3, -1.0, -2 / 3, -1 / 3, 0.0, 1 / 3, 2 / 3, 1.0, 4 / 3, 5 / 3, 2.0]
    expected = [7 / 3, 13 / 6, 2.0, 0.5, 0.75, 1.0, 0.875, 0.75, 0.625, 0.5, 1.5, 2.0, 2.5]
    all_close(interpolate(x, y, tx, -1.0, -1.0), expected, 1e-6)


# --- all_close itself (light-curve-common/src/allclose.rs) ------------------

def test_all_close_doc_example():
    # allclose.rs:9-14
    all_close([0.0, 1.0], [0.0001, 0.9998], 1e-2)


def test_all_close_strict_less_than():
    # strict '<', not '<=' (allclose.rs:35)
    with pytest.raises(AssertionError):
        all_close([0.0], [1e-2], 1e-2)


def test_all_close_length_mismatch():
    # allclose.rs:16-25 (should_panic examples)
    with pytest.raises(AssertionError):
        all_close([0.0, 1.0], [0.0], 1e-2)
