"""IMU + bias-lock semantics (mirrors /root/reference/python/tests/test_imu.py)."""
import numpy as np

from kontiki_tpu import TrajectoryEstimator
from kontiki_tpu.measurements import AccelerometerMeasurement, GyroscopeMeasurement
from kontiki_tpu.sensors import ConstantBiasImu
from kontiki_tpu.utils import safe_time


def test_has_acceleration(imu, trajectory):
    imu.accelerometer(trajectory, safe_time(trajectory))


def test_has_gyroscope(imu, trajectory):
    imu.gyroscope(trajectory, safe_time(trajectory))


def random_bias():
    return np.random.uniform(-1, 1, size=3)


def test_constructor_empty():
    imu = ConstantBiasImu()
    np.testing.assert_equal(imu.accelerometer_bias, 0)
    np.testing.assert_equal(imu.gyroscope_bias, 0)


def test_constructor_full():
    abias, gbias = random_bias(), random_bias()
    imu = ConstantBiasImu(abias, gbias)
    np.testing.assert_equal(imu.accelerometer_bias, abias)
    np.testing.assert_equal(imu.gyroscope_bias, gbias)


def test_change_bias():
    imu = ConstantBiasImu()
    abias, gbias = random_bias(), random_bias()
    imu.accelerometer_bias = abias
    imu.gyroscope_bias = gbias
    np.testing.assert_equal(imu.accelerometer_bias, abias)
    np.testing.assert_equal(imu.gyroscope_bias, gbias)


def test_set_bias_locks():
    imu = ConstantBiasImu()
    assert imu.gyroscope_bias_locked
    assert imu.accelerometer_bias_locked
    imu.gyroscope_bias_locked = False
    assert not imu.gyroscope_bias_locked
    imu.accelerometer_bias_locked = False
    assert not imu.accelerometer_bias_locked


def test_locks_effective(trajectory):
    imu = ConstantBiasImu()
    t = safe_time(trajectory)
    ma = AccelerometerMeasurement(imu, t, np.array([5.0, 6, 2]))
    mg = GyroscopeMeasurement(imu, t, np.array([1.0, 2, 3]))

    est_locked = TrajectoryEstimator(trajectory)
    est_locked.add_measurement(ma)
    est_locked.add_measurement(mg)
    summary_locked = est_locked.solve(max_iterations=2, progress=False)

    imu.accelerometer_bias_locked = False
    imu.gyroscope_bias_locked = False
    est_unlocked = TrajectoryEstimator(trajectory)
    est_unlocked.add_measurement(ma)
    est_unlocked.add_measurement(mg)
    summary_unlocked = est_unlocked.solve(progress=False)

    assert (
        summary_unlocked.num_parameters_reduced
        == summary_locked.num_parameters_reduced + 2 * 3
    )
