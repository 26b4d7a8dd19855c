"""Native C++ host runtime: equivalence with the numpy fallback, and the
batch (SoA) measurement fast path against the per-object path."""
import numpy as np
import pytest

from kontiki_tpu import native
from kontiki_tpu.measurements import (
    AccelerometerMeasurements,
    GyroscopeMeasurement,
    GyroscopeMeasurements,
)
from kontiki_tpu.solver.problem import Problem
from kontiki_tpu.synthetic import make_imu_measurements, make_so3_trajectory, make_split_trajectory


def test_native_library_builds():
    # g++ is part of this image; the C++ path must actually be exercised.
    assert native.available()


def _numpy_fallback(fn, *args, **kwargs):
    """Run a native entry point with the library disabled."""
    lib = native._LIB
    tried = native._TRIED
    native._LIB, native._TRIED = None, True
    try:
        return fn(*args, **kwargs)
    finally:
        native._LIB, native._TRIED = lib, tried


def test_activate_spans_matches_fallback():
    rng = np.random.default_rng(0)
    t1 = np.sort(rng.uniform(0.0, 9.0, 50))
    t2 = t1 + rng.uniform(0.0, 0.7, 50)
    a_native = native.activate_spans(t1, t2, t0=-0.3, dt=0.25, nknots=60)
    a_np = _numpy_fallback(
        native.activate_spans, t1, t2, t0=-0.3, dt=0.25, nknots=60
    )
    np.testing.assert_array_equal(a_native, a_np)
    assert a_native.any()


def test_check_spans_errors():
    native.check_spans([0.1, 0.2], [0.15, 0.3], 0.0, 1.0)
    with pytest.raises(ValueError, match="out of range"):
        native.check_spans([-0.1], [0.5], 0.0, 1.0)
    with pytest.raises(ValueError, match="begins before it ends"):
        native.check_spans([0.5], [0.4], 0.0, 1.0)
    with pytest.raises(ValueError, match="not ordered"):
        native.check_spans([0.5, 0.2], [0.6, 0.3], 0.0, 1.0)


def test_activate_points_matches_spans():
    t = np.sort(np.random.default_rng(1).uniform(0.5, 4.5, 200))
    a = native.activate_points(t, 0.01, 0.0, 5.0, t0=0.0, dt=0.5, nknots=14)
    b = native.activate_spans(t - 0.01, t + 0.01, t0=0.0, dt=0.5, nknots=14)
    np.testing.assert_array_equal(a, b)


def test_window_bases():
    t = np.array([0.0, 0.49, 0.51, 3.99, 5.0])
    out = native.window_bases(t, t0=0.0, dt=0.5, nknots=10, W=4)
    np.testing.assert_array_equal(out, [0, 0, 1, 6, 6])
    np.testing.assert_array_equal(
        out, _numpy_fallback(native.window_bases, t, 0.0, 0.5, 10, 4)
    )


def test_coalesce():
    active = np.array([0, 1, 1, 0, 0, 1, 0, 1, 1, 1], dtype=np.uint8)
    segs = native.coalesce(active)
    assert segs == [(1, 3), (5, 6), (7, 10)]
    assert segs == _numpy_fallback(native.coalesce, active)


def test_argsort_times():
    t = np.array([3.0, 1.0, 2.0, 1.0])
    np.testing.assert_array_equal(native.argsort_times(t), [1, 3, 2, 0])


def test_batch_gyro_problem_matches_per_object():
    traj = make_so3_trajectory(6.0, dt=0.4, seed=3)
    from kontiki_tpu.sensors import BasicImu

    imu = BasicImu()
    ms = make_imu_measurements(traj, imu, 0.5, 5.0, rate=40.0, accel=False)
    t = np.array([m.t for m in ms])
    w = np.stack([m.w for m in ms])

    p_obj = Problem(traj, ms)
    p_batch = Problem(traj, [GyroscopeMeasurements(imu, t, w)])

    assert p_batch.num_residuals == p_obj.num_residuals
    assert p_batch.num_residual_blocks == p_obj.num_residual_blocks
    assert p_batch.num_parameters == p_obj.num_parameters
    assert p_batch.num_residuals_reduced == p_obj.num_residuals_reduced

    bo = p_obj.buckets["gyro"].data
    bb = p_batch.buckets["gyro"].data
    for k in bo:
        np.testing.assert_allclose(np.asarray(bo[k]), np.asarray(bb[k]))

    from kontiki_tpu.solver.kernels import make_functions

    cost_o, _ = make_functions(p_obj)
    cost_b, _ = make_functions(p_batch)
    np.testing.assert_allclose(
        float(cost_o(p_obj.state0)), float(cost_b(p_batch.state0)), rtol=1e-12
    )


def test_batch_accel_and_solve():
    traj = make_split_trajectory(6.0, dt=0.4, seed=4)
    from kontiki_tpu.estimator import TrajectoryEstimator
    from kontiki_tpu.sensors import BasicImu
    from kontiki_tpu.synthetic import perturb_trajectory

    imu = BasicImu()
    ms = make_imu_measurements(traj, imu, 0.5, 5.0, rate=60.0)
    gy = [m for m in ms if isinstance(m, GyroscopeMeasurement)]
    ac = [m for m in ms if m not in gy]
    batches = [
        GyroscopeMeasurements(
            imu, [m.t for m in gy], np.stack([m.w for m in gy])
        ),
        AccelerometerMeasurements(
            imu, [m.t for m in ac], np.stack([m.a for m in ac])
        ),
    ]
    noisy = perturb_trajectory(traj, sigma_p=0.05, sigma_q=0.02, seed=5)
    est = TrajectoryEstimator(noisy)
    for b in batches:
        est.add_measurement(b)
    summary = est.solve(max_iterations=10, progress=False)
    assert summary.final_cost < summary.initial_cost * 1e-2
