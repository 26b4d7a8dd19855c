"""Estimator behavior (mirrors /root/reference/python/tests/test_estimator.py):
solve-no-crash, lock accounting, callback return types, state-update
semantics."""
import numpy as np
import pytest

from kontiki_tpu import TrajectoryEstimator
from kontiki_tpu._ceres import CallbackReturnType, TerminationType
from kontiki_tpu.measurements import PositionMeasurement


@pytest.fixture
def estimator(trajectory):
    return TrajectoryEstimator(trajectory)


def test_same_trajectory(trajectory):
    estimator = TrajectoryEstimator(trajectory)
    assert estimator.trajectory is trajectory


def test_solve_empty(estimator):
    summary = estimator.solve(progress=False)
    print(summary.FullReport())
    assert summary.num_parameters == 0


def _add_all(estimator, measurements):
    for m in measurements:
        estimator.add_measurement(m)


def test_add_camera_measurement(estimator, camera_measurements):
    _add_all(estimator, camera_measurements)


def test_add_simple_measurements(estimator, simple_measurements):
    _add_all(estimator, simple_measurements)


def test_add_imu_measurements(estimator, imu_measurements):
    _add_all(estimator, imu_measurements)


def test_solve_simple_nocrash(estimator, simple_measurements):
    _add_all(estimator, simple_measurements)
    summary = estimator.solve(progress=False)
    print(summary.FullReport())
    assert summary.num_parameters > 0


def test_solve_camera_nocrash(estimator, camera_measurements):
    _add_all(estimator, camera_measurements)
    summary = estimator.solve(progress=False, max_iterations=5)
    print(summary.FullReport())
    assert summary.num_parameters > 0


def test_solve_imu_nocrash(estimator, imu_measurements):
    _add_all(estimator, imu_measurements)
    summary = estimator.solve(progress=False, max_iterations=5)
    assert summary.num_parameters > 0


def test_trajectory_lock(trajectory, simple_measurements):
    estimator_unlocked = TrajectoryEstimator(trajectory)
    _add_all(estimator_unlocked, simple_measurements)
    summary_unlocked = estimator_unlocked.solve(progress=False)
    assert summary_unlocked.num_parameters > 0

    estimator_locked = TrajectoryEstimator(trajectory)
    trajectory.locked = True
    _add_all(estimator_locked, simple_measurements)
    summary_locked = estimator_locked.solve(progress=False)
    assert summary_locked.num_parameters_reduced == 0, "Not locked"


@pytest.mark.parametrize(
    "what", ["relative_orientation", "relative_position", "time_offset"]
)
def test_imu_locks(trajectory, imu_measurements, what):
    estimator_locked = TrajectoryEstimator(trajectory)
    imus = {m.imu for m in imu_measurements}
    assert len(imus) == 1
    imu = next(iter(imus))
    assert getattr(imu, f"{what}_locked")

    _add_all(estimator_locked, imu_measurements)
    summary_locked = estimator_locked.solve(progress=False, max_iterations=2)

    estimator_unlocked = TrajectoryEstimator(trajectory)
    setattr(imu, f"{what}_locked", False)
    _add_all(estimator_unlocked, imu_measurements)
    summary_unlocked = estimator_unlocked.solve(progress=False, max_iterations=2)

    assert (
        summary_unlocked.num_parameter_blocks_reduced
        == summary_locked.num_parameter_blocks_reduced + 1
    )


@pytest.fixture
def callback_estimator():
    from conftest import _make_trajectory
    from kontiki_tpu.trajectories import SplitTrajectory

    trajectory = _make_trajectory(SplitTrajectory)
    estimator = TrajectoryEstimator(trajectory)
    for t in np.linspace(*trajectory.valid_time, endpoint=False, num=20):
        estimator.add_measurement(
            PositionMeasurement(t, np.random.uniform(-2, 3, size=3))
        )
    return estimator


def test_estimator_callback_returntype_none(callback_estimator):
    data = []

    def my_callback(iter_summary):
        data.append("Foo")

    callback_estimator.add_callback(my_callback)
    summary = callback_estimator.solve(max_iterations=10, progress=False)
    assert summary.termination_type == TerminationType.Convergence
    assert len(data) > 0


def test_estimator_callback_abort(callback_estimator):
    def abort_immediately(iter_summary):
        return CallbackReturnType.Abort

    callback_estimator.add_callback(abort_immediately)
    summary = callback_estimator.solve(max_iterations=4, progress=False)
    assert summary.termination_type == TerminationType.UserFailure


def test_estimator_callback_success(callback_estimator):
    def success_immediately(iter_summary):
        return CallbackReturnType.TerminateSuccessfully

    callback_estimator.add_callback(success_immediately)
    summary = callback_estimator.solve(max_iterations=4, progress=False)
    assert summary.termination_type == TerminationType.UserSuccess


def test_estimator_callback_multiple(callback_estimator):
    from collections import Counter

    class Foo:
        returned = []

        def __init__(self, x):
            self.x = x

        def callback(self, iter_summary):
            Foo.returned.append(self.x)

    foos = [Foo(i) for i in range(10)]
    for foo in foos:
        callback_estimator.add_callback(foo.callback)
    callback_estimator.solve(max_iterations=5, progress=False)
    counter = Counter(Foo.returned)
    for i in range(1, 10):
        assert counter[i] > 1 and counter[i] == counter[0]


@pytest.mark.parametrize("update", [True, False])
def test_estimator_callback_state_update(callback_estimator, update):
    def get_knots():
        return np.vstack(
            [knot for knot in callback_estimator.trajectory.R3_spline]
        )

    knots0 = get_knots()
    all_knots = []

    def callback(isum):
        all_knots.append(get_knots())

    callback_estimator.add_callback(callback, update_state=update)
    callback_estimator.solve(max_iterations=5, progress=False)

    if update:
        changed = [
            not np.allclose(k1, k2) for k1, k2 in zip(all_knots, all_knots[1:])
        ]
        assert any(changed)
    else:
        for knots in all_knots:
            np.testing.assert_equal(knots0, knots)
