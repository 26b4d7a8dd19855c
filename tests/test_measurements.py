"""Measurement oracles (mirrors /root/reference/python/tests/test_measurements.py):
brentq-exact synthetic RS reprojection, closed-form IMU oracles, time-offset
equivariance, weight scaling."""
import numpy as np
import pytest

from kontiki_tpu.measurements import (
    AccelerometerMeasurement,
    GyroscopeMeasurement,
    LiftingRsCameraMeasurement,
    NewtonRsCameraMeasurement,
    PositionMeasurement,
    StaticRsCameraMeasurement,
)
from kontiki_tpu.rotations import quat_to_rotation_matrix
from kontiki_tpu.sfm import Landmark, View
from kontiki_tpu.trajectories import UniformSE3SplineTrajectory
from kontiki_tpu.utils import safe_time, safe_time_span

projection_types = [
    StaticRsCameraMeasurement,
    LiftingRsCameraMeasurement,
    NewtonRsCameraMeasurement,
]
imu_measurement_types = [AccelerometerMeasurement, GyroscopeMeasurement]


@pytest.mark.parametrize("cls", projection_types)
def test_rscamera_measurements(cls, small_sfm):
    views, trajectory, camera = small_sfm
    landmarks = {obs.landmark for v in views for obs in v.observations}
    for lm in landmarks:
        assert len(lm.observations) >= 2
        for obs in lm.observations[1:]:
            m = cls(camera, obs)
            yhat = m.project(trajectory)
            np.testing.assert_almost_equal(yhat, obs.uv)


def test_newton_rscamera_measurements_with_noise(small_sfm):
    views, trajectory, camera = small_sfm
    landmarks = {obs.landmark for v in views for obs in v.observations}
    for lm in landmarks:
        assert len(lm.observations) >= 2
        for obs in lm.observations[1:]:
            uv_org = obs.uv
            obs.uv = obs.uv + np.random.normal(0, 2.0, size=2)
            m = NewtonRsCameraMeasurement(camera, obs)
            yhat = m.project(trajectory)
            assert np.abs(yhat[1] - uv_org[1]) <= 0.5


@pytest.mark.parametrize("cls", projection_types)
def test_rscamera_measurements_attribute_access(cls, camera):
    lm = Landmark()
    views = [View(i, i / 30) for i in range(2)]

    def random_point():
        return np.array(
            [np.random.uniform(0, camera.cols), np.random.uniform(0, camera.rows)]
        )

    ref, obs = [v.create_observation(lm, random_point()) for v in views]
    lm.reference = ref
    m = cls(camera, obs)
    assert m.camera is camera
    assert m.observation is obs


@pytest.mark.parametrize("cls", projection_types)
def test_rscamera_measurements_weights(cls, small_sfm):
    views, trajectory, camera = small_sfm
    lm = np.random.choice(
        list({obs.landmark for v in views for obs in v.observations})
    )
    obs = np.random.choice(lm.observations[1:])
    assert not obs.is_reference

    huber_c = 2.0
    m0 = cls(camera, obs, huber_c)
    assert m0.weight == 1.0
    e0 = m0.error(trajectory)
    for w in [1, 2, 0.43]:
        m = cls(camera, obs, huber_c, w)
        np.testing.assert_allclose(m.error(trajectory), e0 * w, rtol=1e-12)


def test_camera_errors_size(trajectory, camera_measurements):
    for m in camera_measurements:
        e = m.error(trajectory)
        if isinstance(m, LiftingRsCameraMeasurement):
            assert e.size == 3
        else:
            assert e.size == 2


def test_position_measurements(trajectory):
    for t in np.linspace(*safe_time_span(trajectory, 3.0), num=5, endpoint=False):
        x = trajectory.position(t)
        m = PositionMeasurement(t, x)
        np.testing.assert_almost_equal(m.measure(trajectory), x)
        np.testing.assert_almost_equal(m.error(trajectory), np.zeros(3))


def test_gyroscope_measurements(trajectory, imu):
    times = np.linspace(*safe_time_span(trajectory, 3.0), num=10, endpoint=False)
    for t in times:
        q = trajectory.orientation(t)
        w = quat_to_rotation_matrix(q).T @ trajectory.angular_velocity(t)
        m = GyroscopeMeasurement(imu, t, w)
        w_hat = m.measure(trajectory)
        if hasattr(imu, "gyroscope_bias"):
            w_hat = w_hat - imu.gyroscope_bias
        np.testing.assert_almost_equal(w_hat, w)


def test_accelerometer_measurements(trajectory, imu):
    if type(trajectory) == UniformSE3SplineTrajectory:
        pytest.xfail(
            "SE3 fails because second order derivative is not the same as body acceleration"
        )
    times = np.linspace(*safe_time_span(trajectory, 3.0), num=10, endpoint=False)
    for t in times:
        q = trajectory.orientation(t)
        R = quat_to_rotation_matrix(q)
        acc = R.T @ (trajectory.acceleration(t) - np.array([0, 0, 9.80665]))
        m = AccelerometerMeasurement(imu, t, acc)
        acc_hat = m.measure(trajectory)
        if hasattr(imu, "accelerometer_bias"):
            acc_hat = acc_hat - imu.accelerometer_bias
        np.testing.assert_almost_equal(acc_hat, acc)


@pytest.mark.parametrize("mcls", imu_measurement_types)
def test_imu_measurement_same_imu(mcls, imu):
    m = mcls(imu, 1.0, np.random.uniform(-1, 1, size=3))
    assert m.imu is imu


@pytest.mark.parametrize("mcls", imu_measurement_types)
def test_imu_measurement_time_offset(mcls, imu, split_trajectory):
    t = safe_time(split_trajectory)
    d = np.random.uniform(-imu.max_time_offset, imu.max_time_offset)
    v = np.random.uniform(-1, 1, size=3)
    y1 = mcls(imu, t, v).measure(split_trajectory)
    imu.time_offset = d
    y2 = mcls(imu, t - d, v).measure(split_trajectory)
    np.testing.assert_equal(y1, y2)


@pytest.mark.parametrize("mcls", projection_types)
def test_camera_measurement_time_offset(mcls, camera, split_trajectory):
    t1, t2 = safe_time_span(split_trajectory, 1)
    t1 += camera.max_time_offset

    d = np.random.uniform(-camera.max_time_offset, camera.max_time_offset)

    lm = Landmark()
    lm.inverse_depth = np.random.uniform(0.01, 1)
    views = [View(i, t) for i, t in enumerate([t1, t1 + 0.23])]
    ref, obs = [
        v.create_observation(lm, np.random.uniform(100, 900, size=2)) for v in views
    ]
    lm.reference = ref

    y1 = mcls(camera, obs).measure(split_trajectory)

    new_lm = Landmark()
    new_lm.inverse_depth = lm.inverse_depth
    new_views = [View(v.frame_nr, v.t0 - d) for v in views]
    new_ref, new_obs = [
        v.create_observation(new_lm, o.uv) for v, o in zip(new_views, [ref, obs])
    ]
    new_lm.reference = new_ref

    camera.time_offset = d
    y2 = mcls(camera, new_obs).measure(split_trajectory)
    np.testing.assert_almost_equal(y1, y2)
