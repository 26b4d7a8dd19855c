"""Synthetic generator self-consistency: generated measurements must have
(near-)zero error at the ground-truth state, mirroring the reference's
fixture invariant (its brentq-generated observations reproject exactly,
test_measurements.py:16-32)."""
import numpy as np
import pytest

from kontiki_tpu.synthetic import (
    make_gyro_problem,
    make_imu_problem,
    make_rsvi_problem,
)


def test_gyro_problem_consistent():
    prob = make_gyro_problem(duration=2.0, rate=50.0)
    errs = [m.error(prob["true_trajectory"]) for m in prob["measurements"][:20]]
    np.testing.assert_allclose(np.abs(errs).max(), 0.0, atol=1e-10)


def test_imu_problem_consistent():
    prob = make_imu_problem(duration=2.0, rate=50.0)
    errs = [
        np.abs(m.error(prob["true_trajectory"])).max()
        for m in prob["measurements"][:40]
    ]
    assert max(errs) < 1e-10


@pytest.mark.parametrize("rs", ["static", "newton", "lifting"])
def test_rsvi_problem_consistent(rs):
    prob = make_rsvi_problem(nviews=6, nlandmarks=10, rs=rs, seed=5)
    cam_ms = [m for m in prob["measurements"] if hasattr(m, "observation")]
    assert len(cam_ms) >= 10
    tol = 0.51 if rs == "newton" else 1e-6  # newton: within half a row
    for m in cam_ms[:25]:
        err = np.abs(m.error(prob["true_trajectory"])).max()
        assert err < tol, (rs, err)


def test_rsvi_with_imu_has_both():
    prob = make_rsvi_problem(nviews=5, nlandmarks=8, imu_rate=40.0, seed=6)
    kinds = {type(m).__name__ for m in prob["measurements"]}
    assert "GyroscopeMeasurement" in kinds and "AccelerometerMeasurement" in kinds
    assert "StaticRsCameraMeasurement" in kinds
