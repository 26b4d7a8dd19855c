"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the driver benches on real TPU):
multi-chip sharding code paths (pjit/collectives) are identical on the CPU
backend, per JAX's xla_force_host_platform_device_count mechanism. x64 is
required to hit the reference's ~1e-7 oracles (Ceres is double-only).

This environment pre-imports jax and registers a high-latency remote-TPU
("axon") backend via sitecustomize before conftest runs, so plain env vars
are too late — we must retarget the already-initialized runtime to CPU with
``jax.config.update`` + ``clear_backends``.
"""
import os

import jax

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
jax.config.update("jax_platforms", "cpu")
import jax.extend.backend as _jeb  # noqa: E402

_jeb.clear_backends()
assert jax.devices()[0].platform == "cpu"

# Persistent compilation cache: the estimator tests compile O(24) distinct
# solver programs (trajectory x camera x measurement-type cross product);
# caching makes reruns fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/kontiki_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import kontiki_tpu  # noqa: F401,E402  (enables x64)

import sys  # noqa: E402
from pathlib import Path  # noqa: E402

sys.path.insert(0, str(Path(__file__).parent))

from fixtures.camera_fixtures import *  # noqa: F401,F403,E402
from fixtures.sfm_fixtures import *  # noqa: F401,F403,E402

from kontiki_tpu.measurements import (  # noqa: E402
    AccelerometerMeasurement,
    GyroscopeMeasurement,
    LiftingRsCameraMeasurement,
    NewtonRsCameraMeasurement,
    PositionMeasurement,
    StaticRsCameraMeasurement,
)
from kontiki_tpu.rotations import quat_to_rotation_matrix, random_quaternion  # noqa: E402
from kontiki_tpu.sensors import BasicImu, ConstantBiasImu  # noqa: E402
from kontiki_tpu.trajectories import (  # noqa: E402
    SplitTrajectory,
    UniformR3SplineTrajectory,
    UniformSE3SplineTrajectory,
    UniformSO3SplineTrajectory,
)
from kontiki_tpu.utils import safe_time_span  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)


trajectory_classes = [
    UniformR3SplineTrajectory,
    UniformSO3SplineTrajectory,
    UniformSE3SplineTrajectory,
    SplitTrajectory,
]


def _make_trajectory(cls):
    """Handcrafted 'simple' trajectory, >= 5 seconds long (mirrors the
    reference conftest.py:27-115)."""
    if cls is UniformR3SplineTrajectory:
        instance = cls(2.3, 1.22)
        for cp in [
            [1, 1, 2],
            [1, 2, 1.4],
            [1, 4, 0],
            [-2, 2, 2],
            [-3, -2, 1],
            [-4, -2, 0],
            [-1, 2, 0],
            [-2, -1.5, 1.2],
        ]:
            instance.append_knot(np.array(cp, dtype=float))
        return instance
    if cls is UniformSO3SplineTrajectory:
        dt, t0 = 0.6, 1.22
        N = int(np.ceil(5.0 / dt)) + 3
        times = t0 + np.arange(-3, N - 3) * dt
        w, axis = np.deg2rad(10), np.array([1.0, 0, 1])
        axis /= np.linalg.norm(axis)
        instance = cls(dt, t0)
        for t in times:
            theta = w * t
            q = np.empty(4)
            q[0] = np.cos(theta / 2)
            q[1:] = np.sin(theta / 2) * axis
            instance.append_knot(q)
        return instance
    if cls is UniformSE3SplineTrajectory:
        instance = cls(2.3, 1.22)
        for q, p in [
            ([1, 0, 2, 3], [1, 4, 6]),
            ([3, 1, 2, 3], [-1, 2, 3]),
            ([1, 0, 1, 3], [2, 3, 2]),
            ([2, 1, 4, 1], [1, 4, 7]),
            ([1, 0, 2, 3], [1, 4, 6]),
            ([1, 1, 3, 1], [2, -1, 2]),
        ]:
            q = np.array(q, dtype=float)
            q /= np.linalg.norm(q)
            T = np.eye(4)
            T[:3, :3] = quat_to_rotation_matrix(q)
            T[:3, 3] = p
            instance.append_knot(T)
        return instance
    if cls is SplitTrajectory:
        return SplitTrajectory(
            _make_trajectory(UniformR3SplineTrajectory),
            _make_trajectory(UniformSO3SplineTrajectory),
        )
    raise ValueError(cls)


@pytest.fixture(params=trajectory_classes)
def trajectory(request):
    return _make_trajectory(request.param)


@pytest.fixture
def split_trajectory():
    traj = SplitTrajectory(0.5, 0.5)
    for _ in range(10):
        traj.R3_spline.append_knot(np.random.uniform(-2, 2, size=3))
        traj.SO3_spline.append_knot(random_quaternion())
    return traj


imu_classes = [BasicImu, ConstantBiasImu]


@pytest.fixture(params=imu_classes)
def imu(request):
    cls = request.param
    if cls is BasicImu:
        return cls()
    return cls(
        np.random.uniform(-0.1, 0.1, size=3), np.random.uniform(-0.1, 0.1, size=3)
    )


@pytest.fixture(
    params=[StaticRsCameraMeasurement, LiftingRsCameraMeasurement, NewtonRsCameraMeasurement]
)
def camera_measurements(request, small_sfm):
    views, trajectory, camera = small_sfm
    MeasurementClass = request.param
    landmarks = {obs.landmark for v in views for obs in v.observations}
    measurements = []
    for lm in landmarks:
        for obs in lm.observations:
            if obs is not lm.reference:
                measurements.append(MeasurementClass(camera, obs))
    return measurements


@pytest.fixture(params=[AccelerometerMeasurement, GyroscopeMeasurement])
def imu_measurements(request, imu, trajectory):
    cls = request.param
    length = 5.0
    n = int(length * 3)
    t1, t2 = safe_time_span(trajectory, length)
    t1 = max(t1, trajectory.min_time + imu.max_time_offset)
    t2 = min(t2, trajectory.max_time - imu.max_time_offset)
    times = np.linspace(t1, t2, endpoint=False, num=n)
    return [cls(imu, t, np.random.uniform(-1, 1, size=3)) for t in times]


@pytest.fixture(params=[PositionMeasurement])
def simple_measurements(request, trajectory):
    length = 5.0
    n = int(length * 3)
    times = np.linspace(*safe_time_span(trajectory, length), num=n)
    cls = request.param
    return [cls(t, np.random.uniform(-1, 1, size=3)) for t in times]
