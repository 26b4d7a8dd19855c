"""User-facing trajectory classes.

These mirror the reference's Python API surface (bindings in
/root/reference/python/src/kontiki/trajectories/: ``position/velocity/
acceleration/orientation/angular_velocity/from_world/to_world``, ``min_time/
max_time/valid_time/locked/clone``, spline container protocol ``__len__/
__getitem__/__setitem__/append_knot/extend_to/dt/t0`` with negative indexing —
trajectory_helper.h:12-34, spline_helpers.h:25-48) while storing state as
arrays and evaluating through the batched jittable kernels in
``spline_eval``. Unlike the reference, every query method accepts a scalar
*or* an array of times (TPU-native batching).

Knot storage is a NumPy array that grows amortized-doubling; the valid
prefix is handed to jitted kernels, so JIT retraces only when the knot count
changes between evaluations.
"""
import numbers

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_dtype
from ..math import quaternion as quat
from ..math import se3 as se3m
from . import spline_eval as ev

__all__ = [
    "UniformR3SplineTrajectory",
    "UniformSO3SplineTrajectory",
    "UniformSE3SplineTrajectory",
    "SplitTrajectory",
]


_r3_eval = jax.jit(ev.r3_evaluate)
_so3_eval = jax.jit(ev.so3_evaluate)
_se3_eval = jax.jit(ev.se3_evaluate)


@jax.jit
def _se3_eval_matrices(knots, t0, dt, ts):
    """SE3 ``evaluate``: full (P, P', P'') 4x4 matrices per time."""
    i0, u = ev.index_and_u(ts, t0, dt, knots.shape[0])
    windows = ev.gather_windows(knots, i0)

    def one(window, u_):
        B, dB, d2B = ev.basis_vectors(u_, dt, cumulative=True)
        q_k, t_k = se3m.se3_unpack(window)
        Pq, Pt = q_k[0], t_k[0]
        A, A_prim, A_bis = [], [], []
        for j in (1, 2, 3):
            qi, ti = se3m.se3_inv(q_k[j - 1], t_k[j - 1])
            q_rel, t_rel = se3m.se3_mul(qi, ti, q_k[j], t_k[j])
            omega6 = se3m.se3_log(q_rel, t_rel)
            omega_hat = se3m.se3_hat(omega6)
            Aq, At = se3m.se3_exp(B[j] * omega6)
            Pq, Pt = se3m.se3_mul(Pq, Pt, Aq, At)
            Amat = se3m.se3_matrix(Aq, At)
            Aj_prim = Amat @ omega_hat * dB[j]
            A.append(Amat)
            A_prim.append(Aj_prim)
            A_bis.append(Aj_prim @ omega_hat * dB[j] + Amat @ omega_hat * d2B[j])
        P0 = se3m.se3_matrix(q_k[0], t_k[0])
        P = se3m.se3_matrix(Pq, Pt)
        M1 = (
            A_prim[0] @ A[1] @ A[2]
            + A[0] @ A_prim[1] @ A[2]
            + A[0] @ A[1] @ A_prim[2]
        )
        M2 = (
            A_bis[0] @ A[1] @ A[2]
            + A[0] @ A_bis[1] @ A[2]
            + A[0] @ A[1] @ A_bis[2]
            + 2.0 * A_prim[0] @ A_prim[1] @ A[2]
            + 2.0 * A_prim[0] @ A[1] @ A_prim[2]
            + 2.0 * A[0] @ A_prim[1] @ A_prim[2]
        )
        return P, P0 @ M1, P0 @ M2

    return jax.vmap(one)(windows, u)


class _TrajectoryBase:
    """Shared query interface: evaluation + world-frame transforms."""

    def _eval(self, ts):
        """Return dict with position/velocity/acceleration [B,3],
        orientation [B,4] wxyz, angular_velocity [B,3] for times ts [B]."""
        raise NotImplementedError

    @property
    def min_time(self):
        raise NotImplementedError

    @property
    def max_time(self):
        raise NotImplementedError

    @property
    def valid_time(self):
        return (self.min_time, self.max_time)

    def _times(self, t):
        scalar = isinstance(t, numbers.Number) or np.ndim(t) == 0
        ts = np.atleast_1d(np.asarray(t, dtype=default_dtype))
        tmin, tmax = self.valid_time
        # Match reference range semantics: valid on [min_time, max_time).
        bad = (ts < tmin) | (ts >= tmax)
        if np.any(bad):
            raise ValueError(
                f"t={ts[bad][0]} is out of range [{tmin}, {tmax}) for this trajectory"
            )
        return ts, scalar

    def _query(self, t, key):
        ts, scalar = self._times(t)
        out = np.asarray(self._eval(ts)[key])
        return out[0] if scalar else out

    def position(self, t):
        "Position in the world coordinate frame"
        return self._query(t, "position")

    def velocity(self, t):
        "Velocity in the world coordinate frame"
        return self._query(t, "velocity")

    def acceleration(self, t):
        "Acceleration in the world coordinate frame"
        return self._query(t, "acceleration")

    def orientation(self, t):
        "Orientation as wxyz unit quaternion (trajectory -> world rotation)"
        return self._query(t, "orientation")

    def angular_velocity(self, t):
        "Angular velocity in the world coordinate frame"
        return self._query(t, "angular_velocity")

    def from_world(self, Xw, t):
        "Move point from the world to the trajectory coordinate frame"
        ts, scalar = self._times(t)
        res = self._eval(ts)
        q = np.asarray(res["orientation"])
        p = np.asarray(res["position"])
        Xw = np.asarray(Xw, dtype=default_dtype)
        out = np.asarray(quat.qrotate(jnp.asarray(quat.qconj(jnp.asarray(q))), jnp.asarray(Xw - p)))
        return out[0] if scalar else out

    def to_world(self, Xt, t):
        "Move point from the trajectory to the world coordinate frame"
        ts, scalar = self._times(t)
        res = self._eval(ts)
        q = np.asarray(res["orientation"])
        p = np.asarray(res["position"])
        Xt = np.asarray(Xt, dtype=default_dtype)
        out = np.asarray(quat.qrotate(jnp.asarray(q), jnp.asarray(np.broadcast_to(Xt, p.shape)))) + p
        return out[0] if scalar else out


class _UniformSplineTrajectory(_TrajectoryBase):
    """Uniform cubic B-spline knot container.

    Semantics match reference spline_base.h: ``n >= 4`` knots required for
    evaluation; valid time span ``[t0, t0 + (n-3) dt)``; negative indexing in
    the container protocol; ``extend_to`` appends fill knots until
    ``max_time > t`` (spline_base.h:351-359).
    """

    #: per-knot storage width
    _KNOT_DIM = None

    def __init__(self, dt=1.0, t0=0.0):
        self._dt = float(dt)
        self._t0 = float(t0)
        self._n = 0
        self._knots = np.zeros((8, self._KNOT_DIM), dtype=default_dtype)
        self._locked = False

    # -- container protocol -------------------------------------------------
    @property
    def dt(self):
        return self._dt

    @property
    def t0(self):
        return self._t0

    def __len__(self):
        return self._n

    def _index(self, i):
        if i < 0:
            i += self._n
        if not (0 <= i < self._n):
            raise IndexError("Invalid sequence index")
        return i

    def _validate_and_convert(self, cp):
        """Subclass hook: user control point -> storage row [KNOT_DIM]."""
        raise NotImplementedError

    def _convert_out(self, row):
        """Subclass hook: storage row -> user control point."""
        raise NotImplementedError

    def __getitem__(self, i):
        return self._convert_out(self._knots[self._index(i)])

    def __setitem__(self, i, cp):
        self._knots[self._index(i)] = self._validate_and_convert(cp)

    def append_knot(self, cp):
        row = self._validate_and_convert(cp)
        if self._n == self._knots.shape[0]:
            self._knots = np.concatenate([self._knots, np.zeros_like(self._knots)])
        self._knots[self._n] = row
        self._n += 1

    def extend_to(self, t, fill_value):
        while self._n < 4 or self.max_time < t:
            self.append_knot(fill_value)

    # -- validity -----------------------------------------------------------
    def _validate_size(self):
        if self._n < 4:
            raise ValueError("Spline had too few control points")

    @property
    def min_time(self):
        self._validate_size()
        return self._t0

    @property
    def max_time(self):
        self._validate_size()
        return self._t0 + (self._n - 3) * self._dt

    @property
    def locked(self):
        return self._locked

    @locked.setter
    def locked(self, flag):
        self._locked = bool(flag)

    def clone(self):
        import copy

        return copy.deepcopy(self)

    # -- solver interface ---------------------------------------------------
    @property
    def knots(self):
        """The valid knot rows as a writable [n, D] view (solver interface)."""
        return self._knots[: self._n]

    def set_knots(self, values):
        """Overwrite all knot rows from an [n, D] array (solver interface)."""
        values = np.asarray(values, dtype=default_dtype)
        assert values.shape == (self._n, self._KNOT_DIM)
        self._knots[: self._n] = values


class UniformR3SplineTrajectory(_UniformSplineTrajectory):
    """Position spline with control points in R^3.

    Reference: uniform_r3_spline_trajectory.h. Orientation queries return
    identity; angular velocity returns zero.
    """

    _KNOT_DIM = 3

    def _validate_and_convert(self, cp):
        cp = np.asarray(cp, dtype=default_dtype)
        if cp.shape != (3,):
            raise ValueError("R3 control point must be a 3-vector")
        return cp

    def _convert_out(self, row):
        return row.copy()

    def _eval(self, ts):
        self._validate_size()
        p, v, a = _r3_eval(self.knots, self._t0, self._dt, ts)
        B = ts.shape[0]
        identity = np.zeros((B, 4), dtype=default_dtype)
        identity[:, 0] = 1.0
        return {
            "position": p,
            "velocity": v,
            "acceleration": a,
            "orientation": identity,
            "angular_velocity": np.zeros((B, 3), dtype=default_dtype),
        }


class UniformSO3SplineTrajectory(_UniformSplineTrajectory):
    """Cumulative orientation spline with unit-quaternion control points (wxyz).

    Reference: uniform_so3_spline_trajectory.h. Position/velocity/acceleration
    queries return zero. Control points are validated unit-norm (tol 1e-5).
    """

    _KNOT_DIM = 4

    def _validate_and_convert(self, cp):
        cp = np.asarray(cp, dtype=default_dtype)
        if cp.shape != (4,):
            raise ValueError("SO3 control point must be a wxyz 4-vector")
        if abs(np.linalg.norm(cp) - 1.0) >= quat.EPS_UNIT_CHECK:
            raise ValueError("Control point must be unit quaternion!")
        return cp

    def _convert_out(self, row):
        return row.copy()

    def _eval(self, ts):
        self._validate_size()
        q, w = _so3_eval(self.knots, self._t0, self._dt, ts)
        B = ts.shape[0]
        zeros = np.zeros((B, 3), dtype=default_dtype)
        return {
            "position": zeros,
            "velocity": zeros,
            "acceleration": zeros,
            "orientation": q,
            "angular_velocity": w,
        }


class UniformSE3SplineTrajectory(_UniformSplineTrajectory):
    """Cumulative SE(3) spline; control points are 4x4 rigid transforms.

    Reference: uniform_se3_spline_trajectory.h. Note: the translational part
    of P'' is not body acceleration (reference tests xfail SE3 acceleration).
    Storage is packed (q wxyz, t) rows; the container API converts to/from
    validated 4x4 matrices (py_uniform_se3_spline_trajectory.cc:17-39).
    """

    _KNOT_DIM = 7

    def _validate_and_convert(self, cp):
        cp = np.asarray(cp, dtype=default_dtype)
        if cp.shape != (4, 4):
            raise ValueError("SE3 control point must be a 4x4 matrix")
        R = cp[:3, :3]
        # Validation tolerance tracks the working precision (the reference
        # is double-only; in f32 mode the same 1e-10 bound is unreachable).
        eps = 1e-10 if default_dtype == np.float64 else 1e-5
        if abs(np.linalg.det(R) - 1.0) >= eps:
            raise ValueError("Rotation matrix determinant is not 1!")
        if np.sum((cp[3] - np.array([0.0, 0.0, 0.0, 1.0])) ** 2) >= eps:
            raise ValueError("Final row must be [0, 0, 0, 1]")
        q = np.asarray(quat.matrix_to_quat(jnp.asarray(R)))
        return np.concatenate([q, cp[:3, 3]])

    def _convert_out(self, row):
        T = np.eye(4, dtype=default_dtype)
        T[:3, :3] = np.asarray(quat.quat_to_matrix(jnp.asarray(row[:4])))
        T[:3, 3] = row[4:]
        return T

    def _eval(self, ts):
        self._validate_size()
        p, v, a, q, w = _se3_eval(self.knots, self._t0, self._dt, ts)
        return {
            "position": p,
            "velocity": v,
            "acceleration": a,
            "orientation": q,
            "angular_velocity": w,
        }

    def evaluate(self, t):
        """Full spline evaluation: (P, P', P'') 4x4 matrices.

        Mirrors the reference's extra SE3 binding
        (py_uniform_se3_spline_trajectory.cc ``evaluate``).
        """
        ts, scalar = self._times(t)
        P, P1, P2 = _se3_eval_matrices(self.knots, self._t0, self._dt, ts)
        out = (np.asarray(P), np.asarray(P1), np.asarray(P2))
        if scalar:
            return tuple(o[0] for o in out)
        return out


class SplitTrajectory(_TrajectoryBase):
    """Composite trajectory: independent R3 and SO3 splines.

    Reference: split_trajectory.h. Linear queries route to the R3 spline,
    rotational queries to the SO3 spline. ``min_time`` is the max of both
    splines' minima; ``max_time`` the min of both maxima. Lock status must
    agree across both splines.
    """

    def __init__(self, r3_arg=1.0, so3_arg=1.0, r3_t0=0.0, so3_t0=0.0):
        if isinstance(r3_arg, UniformR3SplineTrajectory):
            self._r3 = r3_arg
            self._so3 = so3_arg
            if not isinstance(so3_arg, UniformSO3SplineTrajectory):
                raise TypeError("Expected UniformSO3SplineTrajectory")
        else:
            self._r3 = UniformR3SplineTrajectory(float(r3_arg), float(r3_t0))
            self._so3 = UniformSO3SplineTrajectory(float(so3_arg), float(so3_t0))

    @property
    def R3_spline(self):
        return self._r3

    @property
    def SO3_spline(self):
        return self._so3

    @property
    def min_time(self):
        return max(self._r3.min_time, self._so3.min_time)

    @property
    def max_time(self):
        return min(self._r3.max_time, self._so3.max_time)

    @property
    def locked(self):
        r3_locked = self._r3.locked
        so3_locked = self._so3.locked
        if r3_locked != so3_locked:
            raise RuntimeError("R3 and SO3 trajectories have different lock status!")
        return r3_locked

    @locked.setter
    def locked(self, flag):
        self._r3.locked = flag
        self._so3.locked = flag

    def clone(self):
        import copy

        return copy.deepcopy(self)

    def _eval(self, ts):
        r3 = self._r3._eval(ts)
        so3 = self._so3._eval(ts)
        return {
            "position": r3["position"],
            "velocity": r3["velocity"],
            "acceleration": r3["acceleration"],
            "orientation": so3["orientation"],
            "angular_velocity": so3["angular_velocity"],
        }
