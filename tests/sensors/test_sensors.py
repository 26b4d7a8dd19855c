"""Sensor base semantics (mirrors /root/reference/python/tests/sensors/test_sensors.py)."""
import numpy as np
import pytest
from numpy.testing import assert_almost_equal, assert_equal

from kontiki_tpu.rotations import quat_to_rotation_matrix, random_quaternion
from kontiki_tpu.sensors import BasicImu, ConstantBiasImu

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
from fixtures.camera_fixtures import *  # noqa: F401,F403


def relative_pose():
    return random_quaternion(), np.random.uniform(-1, 1, size=3)


@pytest.fixture(params=["pinhole", "atan", "basic_imu", "bias_imu"])
def sensor(request, pinhole_camera, atan_camera):
    return {
        "pinhole": pinhole_camera,
        "atan": atan_camera,
        "basic_imu": BasicImu(),
        "bias_imu": ConstantBiasImu(),
    }[request.param]


def test_relative_pose_init(sensor):
    q_ct, p_ct = sensor.relative_pose
    assert_equal(p_ct, np.zeros(3))
    assert_equal(q_ct, [1, 0, 0, 0])
    assert sensor.time_offset == 0.0


@pytest.mark.parametrize(
    "what", ["relative_orientation", "relative_position", "time_offset"]
)
def test_locks_set(what, sensor):
    assert getattr(sensor, f"{what}_locked")
    setattr(sensor, f"{what}_locked", False)
    assert not getattr(sensor, f"{what}_locked")


def test_relative_pose_set_get(sensor):
    q_ct, p_ct = relative_pose()
    sensor.relative_pose = q_ct, p_ct
    qhat, phat = sensor.relative_pose
    assert_equal(qhat, q_ct)
    assert_equal(phat, p_ct)


def test_relative_pose_argument_order(sensor):
    q_ct, p_ct = relative_pose()
    sensor.relative_pose = q_ct, p_ct
    with pytest.raises(TypeError):
        sensor.relative_pose = p_ct, q_ct


def test_from_trajectory(sensor):
    sensor.relative_pose = relative_pose()
    q_ct, p_ct = sensor.relative_pose
    R_ct = quat_to_rotation_matrix(q_ct)
    X_t = np.random.uniform(-3, 3, size=3)
    assert_almost_equal(sensor.from_trajectory(X_t), R_ct @ X_t + p_ct)


def test_to_trajectory(sensor):
    sensor.relative_pose = relative_pose()
    q_ct, p_ct = sensor.relative_pose
    R_ct = quat_to_rotation_matrix(q_ct)
    X_c = np.random.uniform(-3, 3, size=3)
    assert_almost_equal(sensor.to_trajectory(X_c), R_ct.T @ (X_c - p_ct))


def test_time_offset_set_get(sensor):
    assert sensor.time_offset == 0
    sensor.time_offset = 0.05
    assert sensor.time_offset == 0.05


def test_time_offset_out_of_bounds(sensor):
    sensor.max_time_offset = 0.1
    sensor.time_offset = 0.05
    with pytest.raises(ValueError):
        sensor.time_offset = 0.2


def test_imu_bias_properties():
    abias = np.random.uniform(-0.1, 0.1, size=3)
    gbias = np.random.uniform(-0.1, 0.1, size=3)
    imu = ConstantBiasImu(abias, gbias)
    assert_equal(imu.accelerometer_bias, abias)
    assert_equal(imu.gyroscope_bias, gbias)
    assert imu.accelerometer_bias_locked
    assert imu.gyroscope_bias_locked
    imu.gyroscope_bias = np.zeros(3)
    assert_equal(imu.gyroscope_bias, np.zeros(3))
