"""Pallas spline kernels vs the XLA reference path and the scipy oracle.

On the CPU test backend the kernels run in interpreter mode (same program,
same numerics contract); on TPU the driver's bench exercises the compiled
path.
"""
import numpy as np
import pytest
from scipy.interpolate import BSpline

from kontiki_tpu.ops import r3_evaluate_pallas
from kontiki_tpu.trajectories import spline_eval as ev


@pytest.mark.parametrize("n_knots,n_times", [(12, 50), (700, 1000), (40, 1)])
def test_r3_pallas_matches_xla(n_knots, n_times):
    rng = np.random.default_rng(n_knots)
    knots = rng.normal(size=(n_knots, 3))
    t0, dt = -0.8, 0.31
    tmax = t0 + (n_knots - 3) * dt
    ts = rng.uniform(t0, tmax - 1e-6, n_times)

    p1, v1, a1 = ev.r3_evaluate(knots, t0, dt, ts)
    p2, v2, a2 = r3_evaluate_pallas(knots, t0, dt, ts)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=1e-9)


def test_r3_pallas_matches_scipy():
    rng = np.random.default_rng(7)
    n, dt, t0 = 25, 0.5, 1.25
    knots = rng.normal(size=(n, 3))
    k = 3
    tvec = dt * (np.arange(n + k + 1) - k) + t0
    spl = BSpline(tvec, knots, k)
    ts = rng.uniform(t0, t0 + (n - 3) * dt - 1e-9, 300)
    p, v, a = r3_evaluate_pallas(knots, t0, dt, ts)
    np.testing.assert_allclose(np.asarray(p), spl(ts), atol=1e-9)
    np.testing.assert_allclose(np.asarray(v), spl.derivative(1)(ts), atol=1e-8)
    np.testing.assert_allclose(np.asarray(a), spl.derivative(2)(ts), atol=1e-7)


def test_r3_pallas_unsorted_input_order_restored():
    rng = np.random.default_rng(3)
    knots = rng.normal(size=(30, 3))
    ts = rng.uniform(0.0, 26.0, 500)  # deliberately unsorted
    p_ref, _, _ = ev.r3_evaluate(knots, 0.0, 1.0, ts)
    p, _, _ = r3_evaluate_pallas(knots, 0.0, 1.0, ts)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-10)


def test_r3_pallas_wide_span_fallback():
    """A single chunk spanning more knots than the KB slice must still be
    correct (falls back to the XLA path)."""
    rng = np.random.default_rng(11)
    n = 2000
    knots = rng.normal(size=(n, 3))
    # 256 times spread over the whole spline -> span >> KB
    ts = np.linspace(0.0, (n - 3) - 1e-6, 256)
    p_ref, _, _ = ev.r3_evaluate(knots, 0.0, 1.0, ts)
    p, _, _ = r3_evaluate_pallas(knots, 0.0, 1.0, ts)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-10)
