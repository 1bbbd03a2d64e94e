"""Kernel tests: PELT l2 dynamic program + Savitzky–Golay filter.

The PELT fixture follows FIXTURES.md §7 guidance: a piecewise-constant
signal with programmed steps plus small noise — detected breakpoints must
land on (or within 1 index of) the programmed steps."""

from __future__ import annotations

import numpy as np
import pytest

from datamine_v2_0_spark.functions.signal import pelt_l2, savgol_filter


def _step_signal(seed=42, seg=50, levels=(0.0, 10.0, -5.0, 20.0), noise=0.1):
    rng = np.random.default_rng(seed)
    parts = [rng.normal(lvl, noise, seg) for lvl in levels]
    return np.concatenate(parts), [seg * (i + 1) for i in range(len(levels) - 1)]


def test_pelt_detects_programmed_steps():
    sig, true_bkps = _step_signal()
    got = pelt_l2(sig, penalty=5.0, min_size=10, jump=1)
    assert len(got) == len(true_bkps)
    for g, t in zip(got, true_bkps):
        assert abs(g - t) <= 1, (got, true_bkps)


def test_pelt_constant_signal_no_breaks():
    sig = np.full(200, 7.5)
    assert pelt_l2(sig, penalty=0.05, min_size=10) == []


def test_pelt_short_signal_empty():
    assert pelt_l2(np.arange(15, dtype=float), penalty=0.05, min_size=10) == []


def test_pelt_huge_penalty_no_breaks():
    sig, _ = _step_signal()
    assert pelt_l2(sig, penalty=1e9, min_size=10) == []


def test_pelt_jump_respects_grid():
    sig, true_bkps = _step_signal(seg=60)
    got = pelt_l2(sig, penalty=5.0, min_size=10, jump=5)
    assert all(b % 5 == 0 for b in got)
    # programmed steps are multiples of 60 -> on the jump grid
    assert got == true_bkps


def test_pelt_matches_bruteforce_objective():
    """On a tiny signal, PELT must find the globally optimal segmentation
    (exhaustive search over breakpoint subsets)."""
    from itertools import combinations

    rng = np.random.default_rng(7)
    sig = np.concatenate([rng.normal(0, 0.2, 12), rng.normal(5, 0.2, 12)])
    n, min_size, pen = len(sig), 4, 1.0

    def seg_cost(a, b):
        x = sig[a:b]
        return float(((x - x.mean()) ** 2).sum())

    def total(bkps):
        pts = [0] + list(bkps) + [n]
        if any(pts[i + 1] - pts[i] < min_size for i in range(len(pts) - 1)):
            return float("inf")
        return sum(seg_cost(pts[i], pts[i + 1]) for i in range(len(pts) - 1)) + pen * len(bkps)

    candidates = range(min_size, n - min_size + 1)
    best = min(
        (tuple(c) for k in range(3) for c in combinations(candidates, k)),
        key=total,
    )
    got = tuple(pelt_l2(sig, penalty=pen, min_size=min_size))
    assert total(got) == pytest.approx(total(best))


def test_savgol_recovers_polynomial_exactly():
    x = np.arange(50, dtype=float)
    y = 3.0 + 0.5 * x - 0.02 * x**2   # degree 2 <= polyorder 3
    out = savgol_filter(y, window=11, polyorder=3)
    np.testing.assert_allclose(out, y, atol=1e-8)


def test_savgol_window_clamped_to_series():
    y = np.array([1.0, 2.0, 3.0])
    out = savgol_filter(y, window=15, polyorder=3)
    assert out.shape == y.shape
    np.testing.assert_allclose(out, y, atol=1e-8)


def test_savgol_smooths_noise():
    rng = np.random.default_rng(3)
    base = np.sin(np.linspace(0, 4 * np.pi, 400))
    noisy = base + rng.normal(0, 0.3, 400)
    out = savgol_filter(noisy, window=15, polyorder=3)
    assert np.abs(out - base).mean() < np.abs(noisy - base).mean()
