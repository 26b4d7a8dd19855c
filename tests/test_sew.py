"""SEW property tests (the reference ships no sew tests; these validate the
published semantics: band-limited signals admit knot spacings bounded by
their bandwidth, higher quality demands denser knots, and the predicted
variance tracks the actual spline-fit residual)."""
import numpy as np
import pytest

from kontiki_tpu import sew
from kontiki_tpu.estimator import TrajectoryEstimator
from kontiki_tpu.measurements import PositionMeasurement
from kontiki_tpu.trajectories import UniformR3SplineTrajectory


def _signal(freq_hz, rate=200.0, duration=10.0, axes=3, seed=0):
    rng = np.random.default_rng(seed)
    times = np.arange(0, duration, 1.0 / rate)
    phases = rng.uniform(0, 2 * np.pi, axes)
    sig = np.stack([np.sin(2 * np.pi * freq_hz * times + ph) for ph in phases])
    return sig, times


def test_response_is_lowpass():
    freqs = np.linspace(0.0, 50.0, 200)
    H = sew.spline_interpolation_response(freqs, 0.1)
    assert H[0] == pytest.approx(1.0)
    # Monotone decreasing within the main lobe (up to 1/dt Hz); tiny
    # sidelobe ripples beyond that are expected (sinc^4 structure).
    main = freqs <= 1.0 / 0.1
    assert np.all(np.diff(H[main]) <= 1e-12)
    assert np.all(H[freqs > 1.0 / 0.1] < 0.01)


def test_low_frequency_signal_gets_larger_dt():
    slow, times = _signal(0.5)
    fast, _ = _signal(5.0)
    dt_slow = sew.find_uniform_knot_spacing(slow, times, 0.99)
    dt_fast = sew.find_uniform_knot_spacing(fast, times, 0.99)
    assert dt_slow > 2 * dt_fast


def test_higher_quality_needs_denser_knots():
    sig, times = _signal(2.0)
    dt_lo = sew.find_uniform_knot_spacing(sig, times, 0.90)
    dt_hi = sew.find_uniform_knot_spacing(sig, times, 0.999)
    assert dt_hi < dt_lo


def test_quality_is_achieved_at_found_dt():
    sig, times = _signal(2.0, seed=3)
    q = 0.99
    Xhat = sew.make_reference_spectrum(sig)
    dt = sew.find_uniform_knot_spacing_spectrum(Xhat, times, q)
    rate = 1.0 / np.mean(np.diff(times))
    freqs = np.fft.fftfreq(len(times), d=1.0 / rate)
    H = sew.spline_interpolation_response(freqs, dt)
    removed = sew.signal_energy((1.0 - H) * Xhat)
    total = sew.signal_energy(Xhat)
    assert removed <= (1 - q) * total * (1 + 1e-6)


def test_variance_predicts_actual_fit_error():
    # Fit an R3 spline at the SEW dt to a 1-D band-limited signal; the
    # RMS residual should be within a small factor of sqrt(predicted var).
    rng = np.random.default_rng(7)
    rate, duration = 100.0, 8.0
    times = np.arange(0, duration, 1.0 / rate)
    sig = np.zeros((3, len(times)))
    for f, amp in [(0.7, 1.0), (1.3, 0.5), (2.1, 0.25)]:
        sig += amp * np.sin(
            2 * np.pi * f * times[None, :] + rng.uniform(0, 2 * np.pi, (3, 1))
        )

    dt, var = sew.knot_spacing_and_variance(sig, times, 0.97)
    traj = UniformR3SplineTrajectory(dt, times[0] - 2 * dt)
    for _ in range(4):
        traj.append_knot(np.zeros(3))
    while traj.max_time <= times[-1] + dt:
        traj.append_knot(np.zeros(3))
    est = TrajectoryEstimator(traj)
    for t, p in zip(times, sig.T):
        est.add_measurement(PositionMeasurement(t, p))
    est.solve(max_iterations=30, progress=False)
    resid = np.asarray(traj.position(times)) - sig.T
    actual_var = np.mean(resid**2)
    assert actual_var < 10 * var
    assert actual_var > var / 50
