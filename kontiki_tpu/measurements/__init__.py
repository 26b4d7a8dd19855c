"""Measurement (residual) definitions.

Reference: /root/reference/cpplib/include/kontiki/measurements/. Each class
carries its data and sensors and exposes ``measure(trajectory)`` /
``error(trajectory)`` exactly like the reference bindings
(measurement_helper.h:13-27) — these run the same math the solver's batched
kernels use, through the object APIs (the reference's ``T=double`` path).
The solver-side struct-of-arrays compilation lives in
``kontiki_tpu.solver.problem``.

Residual conventions replicated:

- PositionMeasurement: ``p - p_hat(t)`` (3,), unit weight
  (position_measurement.h:17-82).
- OrientationMeasurement: angular distance ``angle(q, q_hat(t))`` (1,)
  (orientation_measurement.h:119-137).
- Gyroscope/Accelerometer: ``w * (meas - imu.f(traj, t))`` (3,)
  (gyroscope_measurement.h / accelerometer_measurement.h).
- Camera RS measurements: ``w * (uv - reproject(...))`` (+ Huber c=5,
  weight 1 defaults; static_rscamera_measurement.h:65-69). Row time is
  ``view.t0 + time_offset + v * readout / rows``.
"""
import numpy as np

from ..config import default_dtype
from ..rotations import quat_conj, quat_mult, quat_to_rotation_matrix

__all__ = [
    "PositionMeasurement",
    "OrientationMeasurement",
    "GyroscopeMeasurement",
    "AccelerometerMeasurement",
    "StaticRsCameraMeasurement",
    "NewtonRsCameraMeasurement",
    "LiftingRsCameraMeasurement",
]


class PositionMeasurement:
    """World-position measurement at time t (reference position_measurement.h)."""

    def __init__(self, t, p):
        self.t = float(t)
        self.p = np.asarray(p, dtype=default_dtype).reshape(3)

    def measure(self, trajectory):
        return trajectory.position(self.t)

    def error(self, trajectory):
        return self.p - self.measure(trajectory)


class OrientationMeasurement:
    """Orientation measurement; scalar angular-distance residual
    (reference orientation_measurement.h)."""

    def __init__(self, t, q):
        self.t = float(t)
        self.q = np.asarray(q, dtype=default_dtype).reshape(4)

    def measure(self, trajectory):
        return trajectory.orientation(self.t)

    def error(self, trajectory):
        qhat = self.measure(trajectory)
        # Eigen angularDistance: 2*atan2(|vec(d)|, |w(d)|), d = q^-1 * qhat
        d = quat_mult(quat_conj(self.q), qhat)
        return 2.0 * np.arctan2(np.linalg.norm(d[1:]), abs(d[0]))


class GyroscopeMeasurement:
    """Body-frame angular rate (reference gyroscope_measurement.h)."""

    def __init__(self, imu, t, w, weight=1.0):
        self.imu = imu
        self.t = float(t)
        self.w = np.asarray(w, dtype=default_dtype).reshape(3)
        self.weight = float(weight)

    def measure(self, trajectory):
        return self.imu.gyroscope(trajectory, self.t)

    def error(self, trajectory):
        return self.weight * (self.w - self.measure(trajectory))


class AccelerometerMeasurement:
    """Body-frame specific force incl. gravity (reference
    accelerometer_measurement.h)."""

    def __init__(self, imu, t, a, weight=1.0):
        self.imu = imu
        self.t = float(t)
        self.a = np.asarray(a, dtype=default_dtype).reshape(3)
        self.weight = float(weight)

    def measure(self, trajectory):
        return self.imu.accelerometer(trajectory, self.t)

    def error(self, trajectory):
        return self.weight * (self.a - self.measure(trajectory))


def _qrot(q, v):
    return quat_to_rotation_matrix(q) @ v


def _reproject_static(ref, obs, rho, trajectory, camera, t_obs=None):
    """Inverse-depth two-view reprojection (reference
    static_rscamera_measurement.h:21-55). If t_obs is given it overrides the
    observation row time (used by the lifting variant)."""
    d = camera.time_offset
    row_delta = camera.readout / camera.rows
    t_ref = ref.view.t0 + d + ref.v * row_delta
    if t_obs is None:
        t_obs = obs.view.t0 + d + obs.v * row_delta

    q_ct, p_ct = camera.relative_pose
    q_ct_conj = quat_conj(q_ct)

    yh = camera.unproject(ref.uv)
    X_ref = _qrot(q_ct_conj, yh - rho * p_ct)
    q_ref = trajectory.orientation(t_ref)
    p_ref = trajectory.position(t_ref)
    X = _qrot(q_ref, X_ref) + rho * p_ref
    q_obs = trajectory.orientation(t_obs)
    p_obs = trajectory.position(t_obs)
    X_obs = _qrot(quat_conj(q_obs), X - rho * p_obs)
    X_camera = _qrot(q_ct, X_obs) + rho * p_ct
    return camera.project(X_camera)


class StaticRsCameraMeasurement:
    """Rolling-shutter reprojection using the *observed* row time
    (reference static_rscamera_measurement.h)."""

    def __init__(self, camera, obs, huber_loss=5.0, weight=1.0):
        self.camera = camera
        self.observation = obs
        self.huber_loss = float(huber_loss)
        self.weight = float(weight)

    def project(self, trajectory):
        lm = self.observation.landmark
        return _reproject_static(
            lm.reference, self.observation, lm.inverse_depth, trajectory, self.camera
        )

    def measure(self, trajectory):
        return self.project(trajectory)

    def error(self, trajectory):
        return self.weight * (self.observation.uv - self.project(trajectory))


class NewtonRsCameraMeasurement:
    """Rolling-shutter reprojection solving the row-time constraint with a
    bounded Newton iteration inside the residual (reference
    newton_rscamera_measurement.h:23-120)."""

    def __init__(self, camera, obs, huber_loss=5.0, weight=1.0):
        self.camera = camera
        self.observation = obs
        self.huber_loss = float(huber_loss)
        self.weight = float(weight)
        self.max_iterations = 5

    def project(self, trajectory):
        cam = self.camera
        obs = self.observation
        lm = obs.landmark
        ref = lm.reference
        rho = lm.inverse_depth

        d = cam.time_offset
        row_delta = cam.readout / cam.rows
        t0_obs = obs.view.t0 + d
        t_ref = ref.view.t0 + d + ref.v * row_delta
        t_obs = t0_obs + obs.v * row_delta

        q_ct, p_ct = cam.relative_pose
        yh = cam.unproject(ref.uv)
        X_ref = _qrot(quat_conj(q_ct), yh - rho * p_ct)
        q_ref = trajectory.orientation(t_ref)
        p_ref = trajectory.position(t_ref)
        X = _qrot(q_ref, X_ref) + rho * p_ref

        max_dt = 0.5 * cam.readout / cam.rows
        min_bound, max_bound = t0_obs, t0_obs + cam.readout
        R_ct = quat_to_rotation_matrix(q_ct)

        y_out = None
        for _ in range(self.max_iterations):
            p = trajectory.position(t_obs)
            dp = trajectory.velocity(t_obs)
            q = trajectory.orientation(t_obs)
            w = trajectory.angular_velocity(t_obs)
            dq = 0.5 * quat_mult(np.concatenate([[0.0], w]), q)

            s = X - rho * p
            ds = -rho * dp
            X_obs = quat_to_rotation_matrix(q).T @ s
            X_obs_cam = R_ct @ X_obs + rho * p_ct

            def sandwich(qa, x, qb):
                return quat_mult(qa, quat_mult(np.concatenate([[0.0], x]), qb))[1:]

            dX_obs = (
                sandwich(quat_conj(dq), s, q)
                + sandwich(quat_conj(q), ds, q)
                + sandwich(quat_conj(q), s, dq)
            )
            dX_obs_cam = R_ct @ dX_obs + rho * p_ct

            y_out, dy = cam.evaluate_projection(X_obs_cam, dX_obs_cam, True)

            v, dv = y_out[1], dy[1]
            f = v - cam.rows * (t_obs - t0_obs) / cam.readout
            df = dv - cam.rows / cam.readout
            dt = f / df
            t_obs = t_obs - dt
            if dt * dt < max_dt * max_dt:
                break
            t_obs = np.clip(t_obs, min_bound, max_bound)
        return y_out

    def measure(self, trajectory):
        return self.project(trajectory)

    def error(self, trajectory):
        return self.weight * (self.observation.uv - self.project(trajectory))


class LiftingRsCameraMeasurement:
    """Rolling-shutter reprojection with the normalized row time lifted to an
    optimization parameter vt in [0, 1]; residual is 2D reprojection plus a
    row-timing term (reference lifting_rscamera_measurement.h:98-113)."""

    def __init__(self, camera, obs, huber_loss=5.0, weight=1.0):
        self.camera = camera
        self.observation = obs
        self.huber_loss = float(huber_loss)
        self.weight = float(weight)
        self.vt_orig = obs.v / camera.rows
        self.vt = self.vt_orig

    def project(self, trajectory):
        lm = self.observation.landmark
        t_obs = (
            self.observation.view.t0
            + self.camera.time_offset
            + self.vt * self.camera.readout
        )
        return _reproject_static(
            lm.reference,
            self.observation,
            lm.inverse_depth,
            trajectory,
            self.camera,
            t_obs=t_obs,
        )

    def measure(self, trajectory):
        return self.project(trajectory)

    def error(self, trajectory):
        e = np.empty(3, dtype=default_dtype)
        e[:2] = self.observation.uv - self.project(trajectory)
        e[2] = self.camera.rows * (self.vt - self.vt_orig)
        return self.weight * e


# ---------------------------------------------------------------------------
# Batch (struct-of-arrays) measurement containers — the large-problem fast
# path. The reference adds measurements one Python object at a time
# (py_trajectory_estimator.cc:77-78); at the 10^5-measurement scale of
# BASELINE.json config 5 that per-object loop dominates problem compilation,
# so these containers carry dense arrays end-to-end: the problem compiler
# bulk-activates knot windows through the native C++ layer
# (kontiki_tpu.native) and splices the arrays straight into bucket SoA form.
# ---------------------------------------------------------------------------


class _ImuMeasurements:
    """Base batch IMU container: times [M] (sorted), values [M, 3],
    scalar or [M] weights."""

    _value_field = "y"

    def __init__(self, imu, t, y, weight=1.0):
        self.imu = imu
        self.t = np.ascontiguousarray(t, dtype=default_dtype)
        y = np.ascontiguousarray(y, dtype=default_dtype)
        if y.shape != (len(self.t), 3):
            raise ValueError(f"values must be [{len(self.t)}, 3], got {y.shape}")
        if len(self.t) > 1 and np.any(np.diff(self.t) < 0):
            raise ValueError("batch measurement times must be sorted")
        setattr(self, self._value_field, y)
        self.weight = np.broadcast_to(
            np.asarray(weight, dtype=default_dtype), (len(self.t),)
        ).copy()

    def __len__(self):
        return len(self.t)

    def error(self, trajectory):
        return self.weight[:, None] * (
            getattr(self, self._value_field) - self.measure(trajectory)
        )


class GyroscopeMeasurements(_ImuMeasurements):
    """Batch of body-frame angular-rate measurements (SoA form of
    GyroscopeMeasurement; same residual semantics,
    gyroscope_measurement.h:26-105)."""

    _value_field = "w"

    def measure(self, trajectory):
        return np.stack([self.imu.gyroscope(trajectory, t) for t in self.t])


class AccelerometerMeasurements(_ImuMeasurements):
    """Batch of body-frame specific-force measurements (SoA form of
    AccelerometerMeasurement, accelerometer_measurement.h:17-114)."""

    _value_field = "a"

    def measure(self, trajectory):
        return np.stack([self.imu.accelerometer(trajectory, t) for t in self.t])


__all__ += ["GyroscopeMeasurements", "AccelerometerMeasurements"]
