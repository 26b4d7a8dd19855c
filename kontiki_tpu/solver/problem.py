"""Problem compilation: object graph -> static arrays, masks, and bookkeeping.

This replaces the reference's dynamic problem assembly
(``AddToEstimator``/``AddToProblem``, trajectory_estimator.h:66-122,
spline_base.h:361-404) with a one-shot compilation into struct-of-arrays
per measurement type — the form the jitted solver kernels consume:

- **State** is a pytree of arrays: spline knots per kind, stacked sensor
  parameters, landmark inverse depths, lifted row times.
- **Locks -> masks** over the global tangent vector reproduce
  ``SetParameterBlockConstant``.
- **Active-knot masks** reproduce the reference's sparsity mechanism: only
  knots inside some measurement's time span become parameters
  (spline_base.h:361-404); everything else is frozen.
- **Bookkeeping** mirrors Ceres's program reduction counts
  (num_parameter[_blocks][_reduced]) so Summary parity tests hold.

Time-span semantics per measurement type follow the reference exactly,
including the camera margin of 1e-3 and widening by max_time_offset when the
offset is unlocked (static_rscamera_measurement.h:137-174,
gyroscope_measurement.h:84-92)."""
import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import default_dtype
from .. import native
from ..measurements import (
    AccelerometerMeasurement,
    AccelerometerMeasurements,
    GyroscopeMeasurement,
    GyroscopeMeasurements,
    LiftingRsCameraMeasurement,
    NewtonRsCameraMeasurement,
    OrientationMeasurement,
    PositionMeasurement,
    StaticRsCameraMeasurement,
)
from ..sensors import AtanCamera, BasicImu, Camera, ConstantBiasImu, PinholeCamera
from ..trajectories.splines import (
    SplitTrajectory,
    UniformR3SplineTrajectory,
    UniformSE3SplineTrajectory,
    UniformSO3SplineTrajectory,
    _UniformSplineTrajectory,
)

#: (knot_dim, tangent_dim) per spline kind
SPLINE_SPECS = {"r3": (3, 3), "so3": (4, 3), "se3": (7, 6)}

#: sensor tangent slot layout: q_ct(3), p_ct(3), d(1), abias(3), gbias(3)
SENSOR_TANGENT_DIM = 13
SLOT_Q = slice(0, 3)
SLOT_P = slice(3, 6)
SLOT_D = slice(6, 7)
SLOT_AB = slice(7, 10)
SLOT_GB = slice(10, 13)


@dataclass
class SplineInfo:
    kind: str
    obj: _UniformSplineTrajectory
    tangent_offset: int = 0
    active: Optional[np.ndarray] = None  # bool [n]

    @property
    def dt(self):
        return self.obj.dt

    @property
    def t0(self):
        return self.obj.t0

    @property
    def n(self):
        return len(self.obj)

    @property
    def knot_dim(self):
        return SPLINE_SPECS[self.kind][0]

    @property
    def tangent_dim(self):
        return SPLINE_SPECS[self.kind][1]


@dataclass
class Bucket:
    """One measurement type bucket: measurements + SoA data arrays."""

    kind: str
    measurements: list = field(default_factory=list)
    #: batch (SoA) containers appended after the per-object rows;
    #: list of (container, sensor_id)
    batches: list = field(default_factory=list)
    data: Dict[str, np.ndarray] = field(default_factory=dict)
    #: static per-bucket window width per spline kind
    window: Dict[str, int] = field(default_factory=dict)
    camera_cls: Optional[type] = None
    rdim: int = 3


def _decompose_trajectory(trajectory) -> List[SplineInfo]:
    if isinstance(trajectory, UniformR3SplineTrajectory):
        return [SplineInfo("r3", trajectory)]
    if isinstance(trajectory, UniformSO3SplineTrajectory):
        return [SplineInfo("so3", trajectory)]
    if isinstance(trajectory, UniformSE3SplineTrajectory):
        return [SplineInfo("se3", trajectory)]
    if isinstance(trajectory, SplitTrajectory):
        return [SplineInfo("r3", trajectory.R3_spline), SplineInfo("so3", trajectory.SO3_spline)]
    raise TypeError(f"Unknown trajectory type {type(trajectory)}")


class Problem:
    """Compiled estimation problem (see module docstring)."""

    def __init__(self, trajectory, measurements):
        self.trajectory = trajectory
        self.measurements = list(measurements)
        self.splines = _decompose_trajectory(trajectory)
        self.sensors: list = []
        self._sensor_index: dict = {}
        self.landmarks: list = []
        self._landmark_index: dict = {}
        self.buckets: Dict[str, Bucket] = {}
        self._lifting: list = []

        for sp in self.splines:
            sp.active = np.zeros(max(sp.n, 0), dtype=np.uint8)

        for m in self.measurements:
            self._add(m)

        self._layout()
        self._finalize_buckets()
        self._bookkeeping()

    # ------------------------------------------------------------------
    # registration
    # ------------------------------------------------------------------
    def _sensor_id(self, sensor):
        if id(sensor) not in self._sensor_index:
            self._sensor_index[id(sensor)] = len(self.sensors)
            self.sensors.append(sensor)
        return self._sensor_index[id(sensor)]

    def _landmark_id(self, lm):
        if id(lm) not in self._landmark_index:
            self._landmark_index[id(lm)] = len(self.landmarks)
            self.landmarks.append(lm)
        return self._landmark_index[id(lm)]

    def _check_spans(self, spans):
        """Reference CheckTimeSpans (trajectory_estimator.h:97-122); native
        C++ when available (kontiki_tpu.native)."""
        t1 = np.fromiter((a for a, _ in spans), dtype=np.float64)
        t2 = np.fromiter((b for _, b in spans), dtype=np.float64)
        native.check_spans(t1, t2, self.trajectory.min_time, self.trajectory.max_time)

    def _activate(self, spans):
        """Mark active knots for every spline (spline_base.h:361-404)."""
        self._check_spans(spans)
        t1 = np.fromiter((a for a, _ in spans), dtype=np.float64)
        t2 = np.fromiter((b for _, b in spans), dtype=np.float64)
        for sp in self.splines:
            native.activate_spans(t1, t2, sp.t0, sp.dt, sp.n, active=sp.active)

    def _activate_points(self, t, slack):
        """Fused check+activate for a sorted batch of point measurements at
        times ``t`` with symmetric ``slack`` (the IMU fast path)."""
        tmin = self.trajectory.min_time
        tmax = self.trajectory.max_time
        for sp in self.splines:
            native.activate_points(t, slack, tmin, tmax, sp.t0, sp.dt, sp.n,
                                   active=sp.active)

    def _bucket(self, key, rdim, camera_cls=None):
        if key not in self.buckets:
            self.buckets[key] = Bucket(kind=key, rdim=rdim, camera_cls=camera_cls)
        return self.buckets[key]

    def _camera_spans(self, m):
        """Spans for RS camera measurements
        (static_rscamera_measurement.h:137-174)."""
        cam = m.camera
        lm = m.observation.landmark
        t0_ref = lm.reference.view.t0
        t0_obs = m.observation.view.t0
        t1, t2 = (t0_ref, t0_obs) if t0_ref <= t0_obs else (t0_obs, t0_ref)
        if not cam.time_offset_locked:
            t1 -= cam.max_time_offset
            t2 += cam.max_time_offset
        margin = 1e-3
        return [
            (t1 - margin, t1 + cam.readout + margin),
            (t2 - margin, t2 + cam.readout + margin),
        ]

    def _add(self, m):
        if isinstance(m, (GyroscopeMeasurements, AccelerometerMeasurements)):
            # Batch fast path: one native activation pass for the whole
            # container, arrays spliced into the bucket at finalize time.
            imu = m.imu
            s = self._sensor_id(imu)
            slack = 0.0 if imu.time_offset_locked else imu.max_time_offset
            self._activate_points(m.t, slack)
            key = "gyro" if isinstance(m, GyroscopeMeasurements) else "accel"
            self._bucket(key, 3).batches.append((m, s))
        elif isinstance(m, PositionMeasurement):
            self._activate([(m.t, m.t)])
            self._bucket("position", 3).measurements.append(m)
        elif isinstance(m, OrientationMeasurement):
            self._activate([(m.t, m.t)])
            self._bucket("orientation", 1).measurements.append(m)
        elif isinstance(m, (GyroscopeMeasurement, AccelerometerMeasurement)):
            imu = m.imu
            s = self._sensor_id(imu)
            if imu.time_offset_locked:
                spans = [(m.t, m.t)]
            else:
                spans = [(m.t - imu.max_time_offset, m.t + imu.max_time_offset)]
            self._activate(spans)
            key = "gyro" if isinstance(m, GyroscopeMeasurement) else "accel"
            self._bucket(key, 3).measurements.append((m, s))
        elif isinstance(
            m,
            (StaticRsCameraMeasurement, NewtonRsCameraMeasurement, LiftingRsCameraMeasurement),
        ):
            s = self._sensor_id(m.camera)
            lm = m.observation.landmark
            li = self._landmark_id(lm)
            self._activate(self._camera_spans(m))
            if isinstance(m, StaticRsCameraMeasurement):
                key, rdim = "rs_static", 2
            elif isinstance(m, NewtonRsCameraMeasurement):
                key, rdim = "rs_newton", 2
            else:
                key, rdim = "rs_lifting", 3
                self._lifting.append(m)
            cam_cls = PinholeCamera if not isinstance(m.camera, AtanCamera) else AtanCamera
            bucket = self._bucket(f"{key}:{cam_cls.__name__}", rdim, camera_cls=cam_cls)
            bucket.measurements.append((m, s, li))
        else:
            raise TypeError(f"Unknown measurement type {type(m)}")

    # ------------------------------------------------------------------
    # tangent layout + state
    # ------------------------------------------------------------------
    def _layout(self):
        offset = 0
        for sp in self.splines:
            sp.tangent_offset = offset
            offset += sp.n * sp.tangent_dim
        self.sensor_offset = offset
        offset += len(self.sensors) * SENSOR_TANGENT_DIM
        self.landmark_offset = offset
        offset += len(self.landmarks)
        self.vt_offset = offset
        offset += len(self._lifting)
        self.num_tangent = offset

        # ---- state pytree -------------------------------------------------
        state = {}
        for sp in self.splines:
            state[sp.kind] = jnp.asarray(
                np.array(sp.obj.knots, dtype=default_dtype)
            )
        S = len(self.sensors)
        q_ct = np.tile(np.array([1.0, 0, 0, 0]), (max(S, 1), 1))
        p_ct = np.zeros((max(S, 1), 3))
        d = np.zeros(max(S, 1))
        ab = np.zeros((max(S, 1), 3))
        gb = np.zeros((max(S, 1), 3))
        for i, sensor in enumerate(self.sensors):
            q_ct[i], p_ct[i] = sensor.relative_pose
            d[i] = sensor.time_offset
            if isinstance(sensor, ConstantBiasImu):
                ab[i] = sensor.accelerometer_bias
                gb[i] = sensor.gyroscope_bias
        state["q_ct"] = jnp.asarray(q_ct.astype(default_dtype))
        state["p_ct"] = jnp.asarray(p_ct.astype(default_dtype))
        state["d"] = jnp.asarray(d.astype(default_dtype))
        state["abias"] = jnp.asarray(ab.astype(default_dtype))
        state["gbias"] = jnp.asarray(gb.astype(default_dtype))
        state["rho"] = jnp.asarray(
            np.array([lm.inverse_depth for lm in self.landmarks], dtype=default_dtype)
        )
        state["vt"] = jnp.asarray(
            np.array([m.vt for m in self._lifting], dtype=default_dtype)
        )
        self.state0 = state

        # ---- bound constants (for projection after retraction) -----------
        self.d_max = jnp.asarray(
            np.array(
                [sensor.max_time_offset for sensor in self.sensors] or [0.0],
                dtype=default_dtype,
            )
        )

        # ---- global tangent mask -----------------------------------------
        mask = np.zeros(self.num_tangent, dtype=default_dtype)
        locked_traj = self.trajectory.locked if self.splines else True
        for sp in self.splines:
            if not locked_traj and sp.n:
                knot_mask = sp.active.astype(default_dtype)
                mask[
                    sp.tangent_offset : sp.tangent_offset + sp.n * sp.tangent_dim
                ] = np.repeat(knot_mask, sp.tangent_dim)
        for i, sensor in enumerate(self.sensors):
            base = self.sensor_offset + i * SENSOR_TANGENT_DIM
            sm = np.zeros(SENSOR_TANGENT_DIM)
            if not sensor.relative_orientation_locked:
                sm[SLOT_Q] = 1.0
            if not sensor.relative_position_locked:
                sm[SLOT_P] = 1.0
            if not sensor.time_offset_locked:
                sm[SLOT_D] = 1.0
            if isinstance(sensor, ConstantBiasImu):
                if not sensor.accelerometer_bias_locked:
                    sm[SLOT_AB] = 1.0
                if not sensor.gyroscope_bias_locked:
                    sm[SLOT_GB] = 1.0
            mask[base : base + SENSOR_TANGENT_DIM] = sm
        for li, lm in enumerate(self.landmarks):
            mask[self.landmark_offset + li] = 0.0 if lm.locked else 1.0
        mask[self.vt_offset : self.vt_offset + len(self._lifting)] = 1.0
        self.mask = jnp.asarray(mask)

    # ------------------------------------------------------------------
    # bucket data arrays
    # ------------------------------------------------------------------
    def _window_width(self, sp: SplineInfo, readout=0.0, slack=0.0):
        extra = int(math.ceil((readout + 2.0 * slack) / sp.dt)) + (
            1 if (readout or slack) else 0
        )
        return min(4 + extra, sp.n) if sp.n >= 4 else 4

    def _finalize_buckets(self):
        dd = default_dtype
        for key, b in self.buckets.items():
            kind = key.split(":")[0]
            if kind in ("position", "orientation"):
                ms = b.measurements
                b.data["t"] = np.array([m.t for m in ms], dtype=dd)
                if kind == "position":
                    b.data["y"] = np.stack([m.p for m in ms]).astype(dd)
                else:
                    b.data["y"] = np.stack([m.q for m in ms]).astype(dd)
                for sp in self.splines:
                    b.window[sp.kind] = self._window_width(sp)
            elif kind in ("gyro", "accel"):
                ms = [m for m, _ in b.measurements]
                val = "w" if kind == "gyro" else "a"
                ts = [np.array([m.t for m in ms], dtype=dd)]
                ys = [
                    np.stack([getattr(m, val) for m in ms]).astype(dd)
                    if ms
                    else np.zeros((0, 3), dtype=dd)
                ]
                weights = [np.array([m.weight for m in ms], dtype=dd)]
                sids = [np.array([s for _, s in b.measurements], dtype=np.int32)]
                for batch, s in b.batches:
                    ts.append(batch.t.astype(dd))
                    ys.append(getattr(batch, val).astype(dd))
                    weights.append(batch.weight.astype(dd))
                    sids.append(np.full(len(batch), s, dtype=np.int32))
                b.data["t"] = np.concatenate(ts)
                b.data["y"] = np.concatenate(ys)
                b.data["weight"] = np.concatenate(weights)
                b.data["sid"] = np.concatenate(sids)
                # Windows are re-centered at the current time offset every
                # linearization, so no slack is needed for IMU buckets.
                for sp in self.splines:
                    b.window[sp.kind] = self._window_width(sp)
            else:  # camera buckets
                ms = [m for m, _, _ in b.measurements]
                sids = np.array([s for _, s, _ in b.measurements], dtype=np.int32)
                lids = np.array([l for _, _, l in b.measurements], dtype=np.int32)
                cams = [m.camera for m in ms]
                b.data["sid"] = sids
                b.data["lid"] = lids
                b.data["uv_obs"] = np.stack([m.observation.uv for m in ms]).astype(dd)
                b.data["v_obs"] = np.array(
                    [m.observation.v for m in ms], dtype=dd
                )
                b.data["t0_obs"] = np.array(
                    [m.observation.view.t0 for m in ms], dtype=dd
                )
                refs = [m.observation.landmark.reference for m in ms]
                b.data["t0_ref"] = np.array([r.view.t0 for r in refs], dtype=dd)
                b.data["v_ref"] = np.array([r.v for r in refs], dtype=dd)
                # Precompute the reference unprojection (intrinsics are static)
                b.data["yh_ref"] = np.stack(
                    [c.unproject(r.uv) for c, r in zip(cams, refs)]
                ).astype(dd)
                b.data["readout"] = np.array([c.readout for c in cams], dtype=dd)
                b.data["rows"] = np.array([c.rows for c in cams], dtype=dd)
                b.data["K"] = np.stack([c.camera_matrix for c in cams]).astype(dd)
                if b.camera_cls is AtanCamera:
                    b.data["wc"] = np.stack([c.wc for c in cams]).astype(dd)
                    b.data["gamma"] = np.array([c.gamma for c in cams], dtype=dd)
                b.data["weight"] = np.array([m.weight for m in ms], dtype=dd)
                b.data["huber_c"] = np.array([m.huber_loss for m in ms], dtype=dd)
                if kind == "rs_lifting":
                    lift_index = {id(lm): i for i, lm in enumerate(self._lifting)}
                    b.data["vt_idx"] = np.array(
                        [lift_index[id(m)] for m in ms], dtype=np.int32
                    )
                    b.data["vt_orig"] = np.array([m.vt_orig for m in ms], dtype=dd)
                readout = max((c.readout for c in cams), default=0.0)
                for sp in self.splines:
                    b.window[sp.kind] = self._window_width(sp, readout=readout)
            # freeze into jnp
            b.data = {k: jnp.asarray(v) for k, v in b.data.items()}

    # ------------------------------------------------------------------
    # Ceres-style program counts
    # ------------------------------------------------------------------
    def _bookkeeping(self):
        locked_traj = self.trajectory.locked if self.splines else True
        blocks = []  # (ambient_size, constant)
        for sp in self.splines:
            for i in range(sp.n):
                if sp.active[i]:
                    blocks.append((sp.knot_dim, locked_traj))
        for sensor in self.sensors:
            blocks.append((4, sensor.relative_orientation_locked))
            blocks.append((3, sensor.relative_position_locked))
            blocks.append((1, sensor.time_offset_locked))
            if isinstance(sensor, ConstantBiasImu):
                blocks.append((3, sensor.accelerometer_bias_locked))
                blocks.append((3, sensor.gyroscope_bias_locked))
        for lm in self.landmarks:
            blocks.append((1, lm.locked))
        for _ in self._lifting:
            blocks.append((1, False))

        self.num_parameters = sum(s for s, _ in blocks)
        self.num_parameter_blocks = len(blocks)
        self.num_parameters_reduced = sum(s for s, const in blocks if not const)
        self.num_parameter_blocks_reduced = sum(1 for _, const in blocks if not const)

        self.num_residual_blocks = sum(
            len(b.measurements) + sum(len(m) for m, _ in b.batches)
            for b in self.buckets.values()
        )
        self.num_residuals = sum(
            b.rdim * (len(b.measurements) + sum(len(m) for m, _ in b.batches))
            for b in self.buckets.values()
        )
        # A residual block survives reduction iff >=1 of its params is free.
        # Trajectory knots dominate every residual here, so the test that
        # matters (locked trajectory + simple measurements -> 0) reduces to:
        any_free_traj = not locked_traj and any(sp.active.any() for sp in self.splines)
        self.num_residual_blocks_reduced = 0
        self.num_residuals_reduced = 0
        for b in self.buckets.values():
            kind = b.kind.split(":")[0]
            for batch, s in b.batches:
                sensor = self.sensors[s]
                free = any_free_traj or not (
                    sensor.relative_orientation_locked
                    and sensor.relative_position_locked
                    and sensor.time_offset_locked
                )
                if isinstance(sensor, ConstantBiasImu):
                    free = free or not (
                        sensor.accelerometer_bias_locked
                        and sensor.gyroscope_bias_locked
                    )
                if free:
                    self.num_residual_blocks_reduced += len(batch)
                    self.num_residuals_reduced += b.rdim * len(batch)
            for entry in b.measurements:
                m = entry[0] if isinstance(entry, tuple) else entry
                free = any_free_traj
                if isinstance(entry, tuple) and len(entry) >= 2:
                    sensor = self.sensors[entry[1]]
                    free = free or not (
                        sensor.relative_orientation_locked
                        and sensor.relative_position_locked
                        and sensor.time_offset_locked
                    )
                    if isinstance(sensor, ConstantBiasImu):
                        free = free or not (
                            sensor.accelerometer_bias_locked
                            and sensor.gyroscope_bias_locked
                        )
                if isinstance(entry, tuple) and len(entry) == 3:
                    lm = self.landmarks[entry[2]]
                    free = free or not lm.locked
                if kind == "rs_lifting":
                    free = True  # vt is always a free parameter
                if free:
                    self.num_residual_blocks_reduced += 1
                    self.num_residuals_reduced += b.rdim

    # ------------------------------------------------------------------
    # write-back
    # ------------------------------------------------------------------
    def write_back(self, state):
        from ..math import quaternion as quatm

        for sp in self.splines:
            arr = np.asarray(state[sp.kind])
            if sp.kind == "so3":
                arr = arr / np.linalg.norm(arr, axis=-1, keepdims=True)
            elif sp.kind == "se3":
                q = arr[:, :4]
                arr = np.concatenate(
                    [q / np.linalg.norm(q, axis=-1, keepdims=True), arr[:, 4:]], axis=1
                )
            sp.obj.set_knots(arr)
        for i, sensor in enumerate(self.sensors):
            q = np.asarray(state["q_ct"][i])
            sensor.relative_pose = (q / np.linalg.norm(q), np.asarray(state["p_ct"][i]))
            sensor.time_offset = float(
                np.clip(state["d"][i], -sensor.max_time_offset, sensor.max_time_offset)
            )
            if isinstance(sensor, ConstantBiasImu):
                sensor.accelerometer_bias = np.asarray(state["abias"][i])
                sensor.gyroscope_bias = np.asarray(state["gbias"][i])
        for li, lm in enumerate(self.landmarks):
            lm.inverse_depth = float(state["rho"][li])
        for mi, m in enumerate(self._lifting):
            m.vt = float(state["vt"][mi])


# ---------------------------------------------------------------------------
# Raw (array-level) problems — for scales where building one Python object
# per observation is itself the bottleneck
# ---------------------------------------------------------------------------

@dataclass
class RawSplineInfo:
    """Array-backed stand-in for SplineInfo (no trajectory object)."""

    kind: str
    n: int
    t0: float
    dt: float
    tangent_offset: int = 0

    @property
    def knot_dim(self):
        return SPLINE_SPECS[self.kind][0]

    @property
    def tangent_dim(self):
        return SPLINE_SPECS[self.kind][1]


@dataclass
class RawBucket:
    """Array-backed stand-in for Bucket: data arrays only, no objects."""

    kind: str
    M: int
    rdim: int
    data: Dict[str, "jnp.ndarray"] = field(default_factory=dict)
    window: Dict[str, int] = field(default_factory=dict)
    camera_cls: Optional[type] = None


class RawProblem:
    """A compiled problem built directly from arrays.

    The object-graph :class:`Problem` replaces the reference's
    ``AddToEstimator`` path one measurement at a time; at the BASELINE
    config-5 scale (10k+ keyframes, 100k+ landmarks, ~10^6 observations) the
    per-object Python loop is itself the bottleneck. RawProblem takes the
    final struct-of-arrays directly and exposes the same attributes the
    solver layers consume (``problem_spec``/``problem_runtime``/``parallel``).

    Parameters
    ----------
    splines : list of (kind, knots [n, D], t0, dt)
    buckets : dict key -> RawBucket (data arrays complete, windows set)
    sensors : dict state arrays {q_ct [S,4], p_ct [S,3], d [S], abias, gbias}
        plus ``mask [S, 13]`` tangent mask rows and ``d_max [S]``.
    rho : [L] initial inverse depths; landmark_mask : [L].
    """

    def __init__(self, splines, buckets, sensors, rho, landmark_mask=None,
                 vt=None):
        self.splines = []
        state = {}
        offset = 0
        for kind, knots, t0, dt in splines:
            knots = np.asarray(knots, dtype=default_dtype)
            info = RawSplineInfo(kind, knots.shape[0], float(t0), float(dt), offset)
            offset += info.n * info.tangent_dim
            self.splines.append(info)
            state[kind] = jnp.asarray(knots)
        self.sensor_offset = offset
        S = int(np.asarray(sensors["q_ct"]).shape[0])
        offset += S * SENSOR_TANGENT_DIM
        self.landmark_offset = offset
        L = int(np.asarray(rho).shape[0])
        offset += L
        self.vt_offset = offset
        V = 0 if vt is None else int(np.asarray(vt).shape[0])
        offset += V
        self.num_tangent = offset

        for k in ("q_ct", "p_ct", "d", "abias", "gbias"):
            arr = np.asarray(
                sensors.get(k, np.zeros((S, 3) if k != "d" else S)),
                dtype=default_dtype,
            )
            state[k] = jnp.asarray(arr)
        state["rho"] = jnp.asarray(np.asarray(rho, dtype=default_dtype))
        state["vt"] = jnp.asarray(
            np.zeros(0, dtype=default_dtype) if vt is None
            else np.asarray(vt, dtype=default_dtype)
        )
        self.state0 = state
        self.d_max = jnp.asarray(
            np.asarray(sensors.get("d_max", np.zeros(max(S, 1))), dtype=default_dtype)
        )

        mask = np.zeros(self.num_tangent, dtype=default_dtype)
        for sp in self.splines:
            mask[sp.tangent_offset : sp.tangent_offset + sp.n * sp.tangent_dim] = 1.0
        smask = np.asarray(
            sensors.get("mask", np.zeros((S, SENSOR_TANGENT_DIM))),
            dtype=default_dtype,
        )
        mask[self.sensor_offset : self.sensor_offset + S * SENSOR_TANGENT_DIM] = (
            smask.reshape(-1)
        )
        lmask = (
            np.ones(L) if landmark_mask is None else np.asarray(landmark_mask)
        ).astype(default_dtype)
        mask[self.landmark_offset : self.landmark_offset + L] = lmask
        mask[self.vt_offset : self.vt_offset + V] = 1.0
        self.mask = jnp.asarray(mask)

        self.buckets = dict(buckets)
        # len()-able stand-ins for the object lists
        self.sensors = list(range(S))
        self.landmarks = list(range(L))
        self._lifting = list(range(V))

        self.num_residual_blocks = sum(b.M for b in self.buckets.values())
        self.num_residuals = sum(b.M * b.rdim for b in self.buckets.values())
        self.num_residual_blocks_reduced = self.num_residual_blocks
        self.num_residuals_reduced = self.num_residuals
        self.num_parameters = self.num_tangent
        self.num_parameter_blocks = (
            sum(sp.n for sp in self.splines) + 3 * S + L + V
        )
        self.num_parameters_reduced = int(np.sum(np.asarray(self.mask) > 0))
        self.num_parameter_blocks_reduced = self.num_parameter_blocks
