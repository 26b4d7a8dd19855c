"""Spline trajectory oracles.

Mirrors the reference test strategy
(/root/reference/python/tests/trajectories/test_spline_trajectories.py and
test_general.py): R3 against scipy.interpolate.BSpline with knot vector
``t = dt*(arange(n+k+1)-k)+t0``; derivatives against numerical
differentiation; SO3 angular velocity against a constant-angular-velocity
construction; container semantics incl. negative indexing and validation."""
import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_almost_equal
from scipy.interpolate import BSpline

from kontiki_tpu import (
    SplitTrajectory,
    UniformR3SplineTrajectory,
    UniformSE3SplineTrajectory,
    UniformSO3SplineTrajectory,
)
from kontiki_tpu.rotations import quat_to_rotation_matrix


def make_r3(dt=2.3, t0=1.22, n=8):
    traj = UniformR3SplineTrajectory(dt, t0)
    cps = np.random.uniform(-3, 3, size=(n, 3))
    for cp in cps:
        traj.append_knot(cp)
    return traj, cps


def make_so3_const_omega(dt=0.6, t0=1.22, length=5.0):
    """Constant angular velocity construction (reference conftest.py:52-67)."""
    n = int(np.ceil(length / dt)) + 3
    times = t0 + np.arange(-3, n - 3) * dt
    w, axis = np.deg2rad(10), np.array([1.0, 0.0, 1.0])
    axis /= np.linalg.norm(axis)
    traj = UniformSO3SplineTrajectory(dt, t0)
    for t in times:
        theta = w * t
        q = np.empty(4)
        q[0] = np.cos(theta / 2)
        q[1:] = np.sin(theta / 2) * axis
        traj.append_knot(q)
    return traj, w * axis


def make_se3(dt=2.3, t0=1.22):
    traj = UniformSE3SplineTrajectory(dt, t0)
    control_points = [
        ([1, 0, 2, 3], [1, 4, 6]),
        ([3, 1, 2, 3], [-1, 2, 3]),
        ([1, 0, 1, 3], [2, 3, 2]),
        ([2, 1, 4, 1], [1, 4, 7]),
        ([1, 0, 2, 3], [1, 4, 6]),
        ([1, 1, 3, 1], [2, -1, 2]),
    ]
    for q, p in control_points:
        q = np.array(q, dtype=float)
        q /= np.linalg.norm(q)
        T = np.eye(4)
        T[:3, :3] = quat_to_rotation_matrix(q)
        T[:3, 3] = p
        traj.append_knot(T)
    return traj


def scipy_bspline(cps, dt, t0, k=3):
    n = len(cps)
    t = dt * (np.arange(n + k + 1) - k) + t0
    return BSpline(t, np.asarray(cps), k, extrapolate=False)


def numdiff(f, t, h=1e-6):
    return (np.asarray(f(t + h)) - np.asarray(f(t - h))) / (2 * h)


# ---------------------------------------------------------------------------
# R3 vs scipy BSpline (the reference's exactness oracle)
# ---------------------------------------------------------------------------

def test_r3_position_matches_scipy():
    traj, cps = make_r3()
    bs = scipy_bspline(cps, traj.dt, traj.t0)
    ts = np.linspace(traj.min_time, traj.max_time - 1e-9, 50)
    assert_almost_equal(traj.position(ts), bs(ts), decimal=7)


def test_r3_velocity_acceleration_match_scipy_derivative():
    traj, cps = make_r3()
    bs = scipy_bspline(cps, traj.dt, traj.t0)
    ts = np.linspace(traj.min_time, traj.max_time - 1e-9, 50)
    assert_almost_equal(traj.velocity(ts), bs.derivative(1)(ts), decimal=7)
    assert_almost_equal(traj.acceleration(ts), bs.derivative(2)(ts), decimal=7)


def test_r3_orientation_identity():
    traj, _ = make_r3()
    t = 0.5 * (traj.min_time + traj.max_time)
    assert_allclose(traj.orientation(t), [1, 0, 0, 0])
    assert_allclose(traj.angular_velocity(t), np.zeros(3))


# ---------------------------------------------------------------------------
# Numerical-derivative oracles (reference test_general.py:155-189)
# ---------------------------------------------------------------------------

def test_r3_derivatives_numerical():
    traj, _ = make_r3()
    for t in np.linspace(traj.min_time + 0.1, traj.max_time - 0.1, 7):
        assert_almost_equal(traj.velocity(t), numdiff(traj.position, t), decimal=4)
        assert_almost_equal(traj.acceleration(t), numdiff(traj.velocity, t), decimal=4)


def test_so3_constant_angular_velocity():
    traj, w_expected = make_so3_const_omega()
    for t in np.linspace(traj.min_time + 0.05, traj.max_time - 0.05, 7):
        assert_almost_equal(traj.angular_velocity(t), w_expected, decimal=4)


def test_so3_angular_velocity_numerical():
    """omega = 2*(dq/dt * q^-1).vec via numerical quaternion derivative."""
    traj, _ = make_so3_const_omega()
    from kontiki_tpu.rotations import quat_conj, quat_mult

    for t in np.linspace(traj.min_time + 0.05, traj.max_time - 0.05, 5):
        q = traj.orientation(t)
        dq = numdiff(traj.orientation, t)
        w_num = 2 * quat_mult(dq, quat_conj(q))[1:]
        assert_almost_equal(traj.angular_velocity(t), w_num, decimal=4)


def test_so3_unit_norm_output():
    traj, _ = make_so3_const_omega()
    ts = np.linspace(traj.min_time, traj.max_time - 1e-9, 20)
    q = traj.orientation(ts)
    assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-9)


def test_se3_derivatives_numerical():
    traj = make_se3()
    from kontiki_tpu.rotations import quat_conj, quat_mult

    for t in np.linspace(traj.min_time + 0.1, traj.max_time - 0.1, 7):
        assert_almost_equal(traj.velocity(t), numdiff(traj.position, t), decimal=4)
        # SE3 acceleration is NOT d/dt velocity (reference xfails this)
        q = traj.orientation(t)
        dq = numdiff(traj.orientation, t)
        w_num = 2 * quat_mult(dq, quat_conj(q))[1:]
        assert_almost_equal(traj.angular_velocity(t), w_num, decimal=4)


def test_se3_evaluate_full():
    traj = make_se3()
    t = 0.5 * (traj.min_time + traj.max_time)
    P, P1, P2 = traj.evaluate(t)
    assert_allclose(P[:3, 3], traj.position(t), atol=1e-12)
    assert_allclose(P1[:3, 3], traj.velocity(t), atol=1e-12)
    assert_allclose(P[:3, :3] @ P[:3, :3].T, np.eye(3), atol=1e-9)
    assert_allclose(P[3], [0, 0, 0, 1], atol=1e-15)


# ---------------------------------------------------------------------------
# Container / validation semantics
# ---------------------------------------------------------------------------

def test_container_protocol():
    traj, cps = make_r3()
    assert len(traj) == len(cps)
    assert_allclose(traj[0], cps[0])
    assert_allclose(traj[-1], cps[-1])
    assert_allclose(traj[-len(cps)], cps[0])
    with pytest.raises(IndexError):
        traj[len(cps)]
    with pytest.raises(IndexError):
        traj[-len(cps) - 1]
    new_cp = np.array([9.0, 9.0, 9.0])
    traj[2] = new_cp
    assert_allclose(traj[2], new_cp)


def test_too_few_knots():
    traj = UniformR3SplineTrajectory(1.0)
    for _ in range(3):
        traj.append_knot(np.zeros(3))
    with pytest.raises(ValueError):
        traj.min_time
    with pytest.raises(ValueError):
        traj.position(0.0)


def test_out_of_range_times():
    traj, _ = make_r3()
    with pytest.raises(ValueError):
        traj.position(traj.min_time - 0.01)
    with pytest.raises(ValueError):
        traj.position(traj.max_time)  # max_time is excluded
    # just inside is fine
    traj.position(traj.min_time)
    traj.position(traj.max_time - 1e-9)


def test_min_max_time():
    dt, t0, n = 2.3, 1.22, 8
    traj, _ = make_r3(dt, t0, n)
    assert traj.min_time == t0
    assert_allclose(traj.max_time, t0 + (n - 3) * dt)


def test_so3_rejects_non_unit():
    traj = UniformSO3SplineTrajectory(1.0)
    with pytest.raises(ValueError):
        traj.append_knot(np.array([1.0, 1.0, 0.0, 0.0]))


def test_se3_rejects_invalid():
    traj = UniformSE3SplineTrajectory(1.0)
    bad = np.eye(4)
    bad[:3, :3] *= 2.0
    with pytest.raises(ValueError):
        traj.append_knot(bad)
    bad2 = np.eye(4)
    bad2[3, 0] = 0.5
    with pytest.raises(ValueError):
        traj.append_knot(bad2)


def test_se3_knot_roundtrip():
    traj = make_se3()
    q = np.array([1.0, 2.0, 0.5, -0.3])
    q /= np.linalg.norm(q)
    T = np.eye(4)
    T[:3, :3] = quat_to_rotation_matrix(q)
    T[:3, 3] = [1.0, -2.0, 3.0]
    traj[1] = T
    assert_allclose(traj[1], T, atol=1e-9)


def test_extend_to():
    traj = UniformR3SplineTrajectory(1.0, 0.0)
    traj.extend_to(5.0, np.zeros(3))
    assert traj.max_time >= 5.0
    assert len(traj) >= 4


def test_clone_isolation():
    traj, _ = make_r3()
    c = traj.clone()
    t = 0.5 * (traj.min_time + traj.max_time)
    p0 = traj.position(t)
    c[0] = np.array([100.0, 100.0, 100.0])
    assert_allclose(traj.position(t), p0)


def test_locked_roundtrip():
    traj, _ = make_r3()
    assert not traj.locked
    traj.locked = True
    assert traj.locked


# ---------------------------------------------------------------------------
# Split trajectory
# ---------------------------------------------------------------------------

def test_split_routing():
    r3, _ = make_r3()
    so3, w = make_so3_const_omega()
    split = SplitTrajectory(r3, so3)
    t = 0.5 * (split.min_time + split.max_time)
    assert_allclose(split.position(t), r3.position(t))
    assert_allclose(split.orientation(t), so3.orientation(t))
    assert_allclose(split.angular_velocity(t), so3.angular_velocity(t))


def test_split_valid_time():
    r3, _ = make_r3()
    so3, _ = make_so3_const_omega()
    split = SplitTrajectory(r3, so3)
    assert split.min_time == max(r3.min_time, so3.min_time)
    assert split.max_time == min(r3.max_time, so3.max_time)


def test_split_lock_disagreement():
    split = SplitTrajectory(0.5, 0.5)
    for i in range(5):
        split.R3_spline.append_knot(np.zeros(3))
        split.SO3_spline.append_knot(np.array([1.0, 0, 0, 0]))
    split.R3_spline.locked = True
    with pytest.raises(RuntimeError):
        split.locked
    split.locked = False
    assert not split.locked


def test_split_constructor_dts():
    split = SplitTrajectory(0.5, 0.25)
    assert split.R3_spline.dt == 0.5
    assert split.SO3_spline.dt == 0.25
