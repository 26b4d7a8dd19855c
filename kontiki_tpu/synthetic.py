"""Vectorized synthetic problem generators.

These build the five BASELINE.json benchmark configurations (and the graft
entry's flagship model) without the per-observation Python/scipy loop the
reference's test fixtures use (fixtures/sfm_fixtures.py:12-84): ground-truth
trajectories are smooth random splines, IMU measurements come from one
batched trajectory evaluation, and rolling-shutter observations solve the
row-time constraint ``t = t0 + v(t) * readout / rows`` for *all*
(landmark, view) pairs at once by vectorized fixed-point iteration — the
batched analogue of the reference's per-observation ``brentq`` root solve.

Everything returned is built from the public object API (trajectories,
sensors, sfm, measurements), so the generated problems flow through the same
problem compiler as user code.
"""
import functools
from contextlib import contextmanager

import numpy as np

from .config import default_dtype
from .measurements import (
    AccelerometerMeasurement,
    GyroscopeMeasurement,
    LiftingRsCameraMeasurement,
    NewtonRsCameraMeasurement,
    StaticRsCameraMeasurement,
)
from .rotations import axis_angle_to_quat, quat_conj, quat_mult
from .sensors import AtanCamera, BasicImu, ConstantBiasImu, PinholeCamera
from .sfm import Landmark, View
from .trajectories import SplitTrajectory, UniformSO3SplineTrajectory
from .constants import GRAVITY


@contextmanager
def _on_host_cpu():
    """Run generation math on the host CPU device.

    Problem generation is many small batched evaluations; on a remote-TPU
    backend each would pay dispatch latency and compile time for no benefit.
    The *solver* still runs wherever the caller put the problem arrays."""
    import jax

    try:
        # local_devices, not devices: in a multi-process job devices()[0]
        # can belong to another process (non-addressable outputs).
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        yield
        return
    with jax.default_device(cpu):
        yield


def _host_generation(fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with _on_host_cpu():
            return fn(*args, **kwargs)

    return wrapper


def _smooth_noise(rng, n, dim, scale, smooth=4):
    """Low-pass-filtered white noise [n, dim] — a gentle random signal."""
    x = rng.normal(size=(n + 2 * smooth, dim))
    kernel = np.hanning(2 * smooth + 1)
    kernel /= kernel.sum()
    out = np.stack([np.convolve(x[:, d], kernel, mode="same") for d in range(dim)])
    return scale * out.T[smooth : smooth + n]


def _so3_knots(rng, n, dt, wmag):
    """Unit-quaternion knot sequence integrating a smooth angular velocity."""
    w = _smooth_noise(rng, n, 3, wmag)
    qs = np.empty((n, 4), dtype=default_dtype)
    qs[0] = np.array([1.0, 0, 0, 0])
    for i in range(1, n):
        angle = np.linalg.norm(w[i] * dt)
        axis = w[i] / max(np.linalg.norm(w[i]), 1e-12)
        qs[i] = quat_mult(axis_angle_to_quat(axis, angle), qs[i - 1])
        qs[i] /= np.linalg.norm(qs[i])
    return qs


def make_split_trajectory(duration, dt=0.1, t0=0.0, seed=0, speed=0.5, wmag=0.4):
    """Smooth random SplitTrajectory valid on [t0, t0 + duration)."""
    rng = np.random.default_rng(seed)
    n = int(np.ceil(duration / dt)) + 4
    traj = SplitTrajectory(dt, dt, t0, t0)
    vel = _smooth_noise(rng, n, 3, speed)
    pos = np.cumsum(vel * dt, axis=0)
    for p in pos:
        traj.R3_spline.append_knot(p)
    for q in _so3_knots(rng, n, dt, wmag):
        traj.SO3_spline.append_knot(q)
    return traj


def make_so3_trajectory(duration, dt=0.1, t0=0.0, seed=0, wmag=0.4):
    rng = np.random.default_rng(seed)
    n = int(np.ceil(duration / dt)) + 4
    traj = UniformSO3SplineTrajectory(dt, t0)
    for q in _so3_knots(rng, n, dt, wmag):
        traj.append_knot(q)
    return traj


def make_se3_trajectory(duration, dt=0.1, t0=0.0, seed=0, speed=0.5, wmag=0.4):
    """Smooth random SE3 cumulative spline valid on [t0, t0 + duration)."""
    from .rotations import quat_to_rotation_matrix
    from .trajectories import UniformSE3SplineTrajectory

    rng = np.random.default_rng(seed)
    n = int(np.ceil(duration / dt)) + 4
    vel = _smooth_noise(rng, n, 3, speed)
    pos = np.cumsum(vel * dt, axis=0)
    qs = _so3_knots(rng, n, dt, wmag)
    traj = UniformSE3SplineTrajectory(dt, t0)
    for q, p in zip(qs, pos):
        # Build the rotation in f64 regardless of the global dtype: the
        # container validates det(R) to 1e-10, which f32 quats cannot hit.
        q = np.asarray(q, dtype=np.float64)
        q /= np.linalg.norm(q)
        T = np.eye(4)
        T[:3, :3] = quat_to_rotation_matrix(q)
        T[:3, 3] = p
        traj.append_knot(T)
    return traj


def perturb_trajectory(traj, sigma_p=0.05, sigma_q=0.02, seed=1):
    """Clone with perturbed knots — a realistic optimizer starting point."""
    rng = np.random.default_rng(seed)
    out = traj.clone()
    if isinstance(out, SplitTrajectory):
        splines = [out.R3_spline, out.SO3_spline]
    else:
        splines = [out]
    for sp in splines:
        knots = sp.knots.copy()
        if knots.shape[1] == 3:
            knots = knots + rng.normal(scale=sigma_p, size=knots.shape)
        elif knots.shape[1] == 4:
            for i in range(knots.shape[0]):
                axis = rng.normal(size=3)
                axis /= np.linalg.norm(axis)
                dq = axis_angle_to_quat(axis, rng.normal(scale=sigma_q))
                knots[i] = quat_mult(dq, knots[i])
                knots[i] /= np.linalg.norm(knots[i])
        elif knots.shape[1] == 7:  # packed SE3 (q wxyz, t)
            for i in range(knots.shape[0]):
                axis = rng.normal(size=3)
                axis /= np.linalg.norm(axis)
                dq = axis_angle_to_quat(axis, rng.normal(scale=sigma_q))
                knots[i, :4] = quat_mult(dq, knots[i, :4])
                knots[i, :4] /= np.linalg.norm(knots[i, :4])
            knots[:, 4:] += rng.normal(scale=sigma_p, size=(knots.shape[0], 3))
        sp.set_knots(knots)
    return out


def _body_imu(traj, ts):
    """Batched ideal body-frame gyro/accel samples at times ts."""
    import jax.numpy as jnp

    from .math import quaternion as quat

    res = traj._eval(np.asarray(ts, dtype=default_dtype))
    q = jnp.asarray(res["orientation"])
    w = jnp.asarray(res["angular_velocity"])
    a = jnp.asarray(res["acceleration"])
    g = jnp.asarray(np.asarray(GRAVITY, dtype=default_dtype))
    w_body = quat.qrotate(quat.qconj(q), w)
    a_body = quat.qrotate(quat.qconj(q), a + g)
    return np.asarray(w_body), np.asarray(a_body)


@_host_generation
def make_imu_measurements(traj, imu, t1, t2, rate, noise=0.0, seed=0, gyro=True, accel=True):
    rng = np.random.default_rng(seed)
    ts = np.arange(t1, t2, 1.0 / rate)
    w, a = _body_imu(traj, ts)
    gb = getattr(imu, "gyroscope_bias", np.zeros(3))
    ab = getattr(imu, "accelerometer_bias", np.zeros(3))
    if noise:
        w = w + rng.normal(scale=noise, size=w.shape)
        a = a + rng.normal(scale=noise, size=a.shape)
    ms = []
    if gyro:
        ms += [GyroscopeMeasurement(imu, t, wi + gb) for t, wi in zip(ts, w)]
    if accel:
        ms += [AccelerometerMeasurement(imu, t, ai + ab) for t, ai in zip(ts, a)]
    return ms


@_host_generation
def make_gyro_problem(duration=5.0, rate=200.0, knot_dt=0.1, seed=0, noise=0.0,
                      sigma_q=0.05):
    """BASELINE config 1: gyro-only SO3 spline fit."""
    true_traj = make_so3_trajectory(duration + 1.0, dt=knot_dt, seed=seed)
    imu = BasicImu()
    ms = make_imu_measurements(
        true_traj, imu, 0.5, 0.5 + duration, rate, noise=noise, seed=seed, accel=False
    )
    traj = perturb_trajectory(true_traj, sigma_q=sigma_q, seed=seed + 1)
    return dict(trajectory=traj, true_trajectory=true_traj, imu=imu, measurements=ms)


@_host_generation
def make_imu_problem(duration=5.0, rate=200.0, knot_dt=0.1, seed=0, noise=0.0,
                     bias=True, sigma_p=0.05, sigma_q=0.02, position_rate=0.0):
    """BASELINE config 2: full IMU fusion on a split trajectory.

    ``position_rate > 0`` adds sparse PositionMeasurements: pure
    gyro+accel fusion leaves global position and constant velocity
    unobservable (double integration), so ATE-against-truth tests need an
    anchor — the classic pose-aided-IMU setup."""
    true_traj = make_split_trajectory(duration + 1.0, dt=knot_dt, seed=seed)
    rng = np.random.default_rng(seed + 7)
    if bias:
        imu = ConstantBiasImu(rng.normal(scale=0.05, size=3), rng.normal(scale=0.01, size=3))
        imu.accelerometer_bias_locked = False
        imu.gyroscope_bias_locked = False
    else:
        imu = BasicImu()
    ms = make_imu_measurements(
        true_traj, imu, 0.5, 0.5 + duration, rate, noise=noise, seed=seed
    )
    if position_rate:
        from .measurements import PositionMeasurement

        ts = np.arange(0.5, 0.5 + duration, 1.0 / position_rate)
        ps = np.asarray(true_traj._eval(ts)["position"])
        ms += [PositionMeasurement(t, p) for t, p in zip(ts, ps)]
    traj = perturb_trajectory(true_traj, sigma_p=sigma_p, sigma_q=sigma_q, seed=seed + 1)
    return dict(trajectory=traj, true_trajectory=true_traj, imu=imu, measurements=ms)


_DEFAULT_K = np.array([[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]])


def make_camera(kind="pinhole", readout=0.025, rows=480, cols=640):
    if kind == "atan":
        return AtanCamera(
            rows, cols, readout, _DEFAULT_K.copy(),
            wc=np.array([0.5 * cols, 0.5 * rows]) @ np.linalg.inv(_DEFAULT_K[:2, :2]).T,
            gamma=0.9,
        )
    return PinholeCamera(rows, cols, readout, _DEFAULT_K.copy())


def _rs_fixed_point(traj, camera, X_world, t0s, iters=25):
    """Solve t = t0 + v(t)*readout/rows for all (landmark, view) pairs.

    Returns (uv [L,V,2], z [L,V], converged [L,V])."""
    import jax.numpy as jnp

    from .math import quaternion as quat

    L, V = X_world.shape[0], t0s.shape[0]
    K = jnp.asarray(camera.camera_matrix)
    q_ct, p_ct = camera.relative_pose
    q_ct = jnp.asarray(q_ct)
    p_ct = jnp.asarray(p_ct)
    X = jnp.asarray(X_world)[:, None, :]  # [L,1,3]
    t0 = jnp.asarray(t0s)[None, :]  # [1,V]
    ro = camera.readout
    rows = camera.rows

    v = jnp.full((L, V), 0.5 * rows)
    z = jnp.ones((L, V))
    uv = jnp.zeros((L, V, 2))
    for _ in range(iters):
        t = t0 + v * ro / rows
        res = traj._eval(np.asarray(t).ravel())
        q = jnp.asarray(res["orientation"]).reshape(L, V, 4)
        p = jnp.asarray(res["position"]).reshape(L, V, 3)
        X_traj = quat.qrotate(quat.qconj(q), X - p)
        X_cam = quat.qrotate(q_ct, X_traj) + p_ct
        h = X_cam @ K.T
        z = h[..., 2]
        uv = h[..., :2] / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)[..., None]
        v_new = jnp.clip(uv[..., 1], 0.0, rows - 1e-6)
        v = v_new
    t = t0 + v * ro / rows
    converged = (jnp.abs(uv[..., 1] - v) < 1e-9) & (z > 0.2)
    inside = (
        (uv[..., 0] >= 0) & (uv[..., 0] < camera.cols)
        & (uv[..., 1] >= 0) & (uv[..., 1] < rows)
    )
    return np.asarray(uv), np.asarray(z), np.asarray(converged & inside)


@_host_generation
def make_rsvi_problem(
    nviews=10,
    nlandmarks=40,
    fps=30.0,
    imu_rate=0.0,
    knot_dt=0.15,
    seed=0,
    camera_kind="pinhole",
    rs="static",
    noise_px=0.0,
    sigma_p=0.02,
    sigma_q=0.01,
    perturb_rho=0.0,
    speed=0.3,
    wmag=0.25,
    trajectory="split",
):
    """BASELINE configs 3-5: (rolling-shutter) SfM, optionally with IMU.

    ``rs`` selects the camera measurement type: 'static' | 'newton' |
    'lifting'. ``imu_rate=0`` gives pure SfM (config 3). ``trajectory``
    selects the spline model: 'split' (independent R3/SO3) or 'se3'
    (cumulative SE3, the BASELINE config-4 model)."""
    rng = np.random.default_rng(seed)
    span = (nviews - 1) / fps
    duration = span + 1.5
    if trajectory == "se3":
        true_traj = make_se3_trajectory(
            duration, dt=knot_dt, seed=seed, speed=speed, wmag=wmag
        )
    else:
        true_traj = make_split_trajectory(
            duration, dt=knot_dt, seed=seed, speed=speed, wmag=wmag
        )
    camera = make_camera(camera_kind)
    t_first = 0.5
    t0s = t_first + np.arange(nviews) / fps
    views = [View(i, t) for i, t in enumerate(t0s)]

    # --- sample landmarks anchored in early views --------------------------
    ref_idx = rng.integers(0, max(1, nviews // 3), size=nlandmarks)
    uv_ref = np.stack(
        [
            rng.uniform(0.05 * camera.cols, 0.95 * camera.cols, nlandmarks),
            rng.uniform(0.05 * camera.rows, 0.95 * camera.rows, nlandmarks),
        ],
        axis=1,
    )
    z_ref = rng.uniform(2.0, 20.0, nlandmarks)

    import jax.numpy as jnp

    from .math import quaternion as quat

    t_ref = t0s[ref_idx] + uv_ref[:, 1] * camera.readout / camera.rows
    res = true_traj._eval(t_ref)
    q_t = jnp.asarray(res["orientation"])
    p_t = jnp.asarray(res["position"])
    yh = np.stack([camera.unproject(uv) for uv in uv_ref])
    X_cam = z_ref[:, None] * yh
    q_ct, p_ct = camera.relative_pose
    X_traj = quat.qrotate(quat.qconj(jnp.asarray(q_ct)), jnp.asarray(X_cam) - jnp.asarray(p_ct))
    X_world = np.asarray(quat.qrotate(q_t, X_traj) + p_t)

    uv, z, ok = _rs_fixed_point(true_traj, camera, X_world, t0s)

    landmarks = []
    measurements = []
    mcls = {
        "static": StaticRsCameraMeasurement,
        "newton": NewtonRsCameraMeasurement,
        "lifting": LiftingRsCameraMeasurement,
    }[rs]
    for li in range(nlandmarks):
        obs_views = [
            vi for vi in range(nviews) if vi != ref_idx[li] and ok[li, vi]
        ]
        if not obs_views:
            continue
        lm = Landmark()
        lm.inverse_depth = 1.0 / z_ref[li]
        ref_obs = views[ref_idx[li]].create_observation(lm, uv_ref[li])
        lm.reference = ref_obs
        for vi in obs_views:
            y = uv[li, vi]
            if noise_px:
                y = y + rng.normal(scale=noise_px, size=2)
            o = views[vi].create_observation(lm, y)
            measurements.append(mcls(camera, o))
        if perturb_rho:
            lm.inverse_depth = max(
                lm.inverse_depth * (1.0 + rng.normal(scale=perturb_rho)), 1e-4
            )
        landmarks.append(lm)

    imu = None
    if imu_rate:
        imu = BasicImu()
        measurements += make_imu_measurements(
            true_traj, imu, t_first, t_first + span + camera.readout, imu_rate, seed=seed
        )

    traj = perturb_trajectory(true_traj, sigma_p=sigma_p, sigma_q=sigma_q, seed=seed + 1)
    return dict(
        trajectory=traj,
        true_trajectory=true_traj,
        camera=camera,
        imu=imu,
        views=views,
        landmarks=landmarks,
        measurements=measurements,
    )


@_host_generation
def trajectory_ate(traj_a, traj_b, t1, t2, n=200, align=False):
    """RMS position error between two trajectories on [t1, t2).

    ``align`` removes the estimation gauge first (the standard ATE
    convention): ``"se3"``/True removes the best rotation + translation
    (visual-inertial: global translation and yaw are unobservable);
    ``"sim3"`` additionally removes scale (pure visual estimation with
    inverse-depth landmarks leaves scale free)."""
    ts = np.linspace(t1, t2, n, endpoint=False)
    pa = np.asarray(traj_a._eval(ts)["position"])
    pb = np.asarray(traj_b._eval(ts)["position"])
    if align:
        ca, cb = pa.mean(axis=0), pb.mean(axis=0)
        A, B = pa - ca, pb - cb
        U, S, Vt = np.linalg.svd(B.T @ A)
        d = np.sign(np.linalg.det(U @ Vt))
        D = np.diag([1.0, 1.0, d])
        R = U @ D @ Vt
        s = 1.0
        if align == "sim3":
            varA = np.sum(A * A)
            s = np.sum(np.diag(D) * S) / np.where(varA == 0, 1.0, varA)
        pa = s * (R @ A.T).T
        pb = B
    return float(np.sqrt(np.mean(np.sum((pa - pb) ** 2, axis=-1))))


@_host_generation
def trajectory_aoe(traj_a, traj_b, t1, t2, n=200, align=True):
    """RMS orientation error (radians) between two trajectories.

    With ``align=True`` the best-fit constant left rotation is removed
    first (quaternion averaging of q_b q_a^-1): gyro-only estimation
    determines orientation only up to a global rotation."""
    import jax.numpy as jnp

    from .math import quaternion as quat

    ts = np.linspace(t1, t2, n, endpoint=False)
    qa = jnp.asarray(np.asarray(traj_a._eval(ts)["orientation"]))
    qb = jnp.asarray(np.asarray(traj_b._eval(ts)["orientation"]))
    qe = np.asarray(quat.qmul(qb, quat.qconj(qa)))
    if align:
        # Markley quaternion average of the error rotations.
        qe_s = np.where(qe[:, :1] < 0, -qe, qe)
        M = qe_s.T @ qe_s
        w, V = np.linalg.eigh(M)
        q_off = V[:, -1]
        qe = np.asarray(
            quat.qmul(jnp.asarray(np.broadcast_to(quat_conj(q_off), qe.shape).copy()), jnp.asarray(qe))
        )
    vn = np.linalg.norm(qe[:, 1:], axis=1)
    ang = 2.0 * np.arctan2(vn, np.abs(qe[:, 0]))
    return float(np.sqrt(np.mean(ang**2)))


@_host_generation
def make_big_ba_problem(
    n_views=1000,
    n_landmarks=10_000,
    obs_per_landmark=5,
    fps=30.0,
    knot_dt=0.1,
    imu_rate=0.0,
    seed=0,
    readout=0.02,
    rows=480,
    cols=640,
    sigma_p=0.01,
    sigma_q=0.005,
    perturb_rho=0.05,
    noise_px=0.0,
):
    """BASELINE config 5 at scale: array-level rolling-shutter BA.

    Builds a :class:`~kontiki_tpu.solver.problem.RawProblem` directly from
    struct-of-arrays — no per-observation Python objects — so 10k+ keyframes
    and 100k+ landmarks compile in seconds. Observations are exactly
    self-consistent: the rolling-shutter row-time constraint is solved by
    vectorized fixed-point iteration for every (landmark, view) pair, the
    batched analogue of the reference's per-observation brentq
    (fixtures/sfm_fixtures.py:12-84).

    Returns a dict with ``problem`` (RawProblem), ``true_trajectory``,
    ``trajectory`` (perturbed initial guess, for ATE), and span times."""
    import jax.numpy as jnp

    from .math import quaternion as quat
    from .solver.problem import RawBucket, RawProblem

    rng = np.random.default_rng(seed)
    span = (n_views - 1) / fps
    duration = span + 1.5
    true_traj = make_split_trajectory(duration, dt=knot_dt, seed=seed, speed=0.3, wmag=0.2)
    t_first = 0.5
    t0s = t_first + np.arange(n_views) / fps

    K = np.array([[500.0, 0.0, 0.5 * cols], [0.0, 500.0, 0.5 * rows], [0.0, 0.0, 1.0]])
    Kinv = np.linalg.inv(K)

    L, k = n_landmarks, obs_per_landmark
    # Reference views spread over the sequence (each landmark is observed in
    # its reference view and the k following frames).
    ref_idx = (np.arange(L) * max(n_views - k - 1, 1) // max(L, 1)).astype(np.int64)
    ref_idx = np.minimum(ref_idx, n_views - k - 1)
    uv_ref = np.stack(
        [rng.uniform(0.05 * cols, 0.95 * cols, L), rng.uniform(0.05 * rows, 0.95 * rows, L)],
        axis=1,
    )
    z_ref = rng.uniform(2.0, 20.0, L)
    yh_ref = (np.concatenate([uv_ref, np.ones((L, 1))], axis=1) @ Kinv.T)

    # World points through the (identity-relative-pose) camera at the exact
    # rolling-shutter reference row time.
    t_ref = t0s[ref_idx] + uv_ref[:, 1] * readout / rows
    res = true_traj._eval(t_ref)
    q_t = jnp.asarray(res["orientation"])
    p_t = jnp.asarray(res["position"])
    X_world = np.asarray(
        quat.qrotate(q_t, jnp.asarray(z_ref[:, None] * yh_ref)) + p_t
    )

    # Observation views: the k frames after the reference.
    vids = ref_idx[:, None] + 1 + np.arange(k)[None, :]  # [L, k]
    t0_obs = t0s[vids]

    # Vectorized RS row-time fixed point over all (landmark, view) pairs.
    Kj = jnp.asarray(K)
    Xw = jnp.asarray(X_world)[:, None, :]
    v = jnp.full((L, k), 0.5 * rows)
    for _ in range(25):
        t = jnp.asarray(t0_obs) + v * readout / rows
        r = true_traj._eval(np.asarray(t).ravel())
        q = jnp.asarray(r["orientation"]).reshape(L, k, 4)
        p = jnp.asarray(r["position"]).reshape(L, k, 3)
        X_cam = quat.qrotate(quat.qconj(q), Xw - p)
        h = X_cam @ Kj.T
        z = h[..., 2]
        uv = h[..., :2] / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)[..., None]
        v = jnp.clip(uv[..., 1], 0.0, rows - 1e-6)
    ok = (jnp.abs(uv[..., 1] - v) < 1e-8) & (z > 0.2)
    ok = ok & (uv[..., 0] >= 0) & (uv[..., 0] < cols)
    uv = np.asarray(uv)
    ok = np.asarray(ok)

    dd = default_dtype
    M = L * k
    uv_obs = uv.reshape(M, 2)
    if noise_px:
        uv_obs = uv_obs + rng.normal(scale=noise_px, size=(M, 2))
    cam_data = {
        "sid": np.zeros(M, dtype=np.int32),
        "lid": np.repeat(np.arange(L, dtype=np.int32), k),
        "uv_obs": uv_obs.astype(dd),
        "v_obs": uv_obs[:, 1].astype(dd),
        "t0_obs": t0_obs.reshape(M).astype(dd),
        "t0_ref": np.repeat(t0s[ref_idx], k).astype(dd),
        "v_ref": np.repeat(uv_ref[:, 1], k).astype(dd),
        "yh_ref": np.repeat(yh_ref, k, axis=0).astype(dd),
        "readout": np.full(M, readout, dtype=dd),
        "rows": np.full(M, float(rows), dtype=dd),
        "K": np.broadcast_to(K, (M, 3, 3)).astype(dd),
        "weight": ok.reshape(M).astype(dd),
        "huber_c": np.full(M, 5.0, dtype=dd),
    }

    r3 = true_traj.R3_spline
    so3 = true_traj.SO3_spline
    W_cam = 4 + int(np.ceil(readout / knot_dt)) + 1
    buckets = {
        "rs_static:PinholeCamera": RawBucket(
            kind="rs_static:PinholeCamera",
            M=M,
            rdim=2,
            data={kk: jnp.asarray(vv) for kk, vv in cam_data.items()},
            window={"r3": W_cam, "so3": W_cam},
            camera_cls=None,
        )
    }
    from .sensors import PinholeCamera as _Pinhole

    buckets["rs_static:PinholeCamera"].camera_cls = _Pinhole

    n_sensors = 1
    if imu_rate:
        ts = np.arange(t_first, t_first + span + readout, 1.0 / imu_rate)
        w_b, a_b = _body_imu(true_traj, ts)
        for key, y in (("gyro", w_b), ("accel", a_b)):
            data = {
                "t": ts.astype(dd),
                "y": np.asarray(y, dtype=dd),
                "weight": np.ones(len(ts), dtype=dd),
                "sid": np.ones(len(ts), dtype=np.int32),
            }
            buckets[key] = RawBucket(
                kind=key,
                M=len(ts),
                rdim=3,
                data={kk: jnp.asarray(vv) for kk, vv in data.items()},
                window={"r3": 4, "so3": 4},
            )
        n_sensors = 2

    # Perturbed initial state (vectorized).
    traj = true_traj.clone()
    knots_p = np.asarray(r3.knots) + rng.normal(scale=sigma_p, size=(len(r3), 3))
    axis = rng.normal(size=(len(so3), 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    ang = rng.normal(scale=sigma_q, size=(len(so3), 1))
    dq = np.concatenate([np.cos(ang / 2), np.sin(ang / 2) * axis], axis=1)
    knots_q = np.array(quat.qmul(jnp.asarray(dq), jnp.asarray(np.asarray(so3.knots))))
    knots_q /= np.linalg.norm(knots_q, axis=1, keepdims=True)
    traj.R3_spline.set_knots(knots_p.astype(dd))
    traj.SO3_spline.set_knots(knots_q.astype(dd))

    rho0 = 1.0 / z_ref
    if perturb_rho:
        rho0 = np.maximum(rho0 * (1.0 + rng.normal(scale=perturb_rho, size=L)), 1e-4)

    S = n_sensors
    sensors = {
        "q_ct": np.tile(np.array([1.0, 0, 0, 0]), (S, 1)),
        "p_ct": np.zeros((S, 3)),
        "d": np.zeros(S),
        "abias": np.zeros((S, 3)),
        "gbias": np.zeros((S, 3)),
        "mask": np.zeros((S, 13)),
        "d_max": np.zeros(S),
    }
    problem = RawProblem(
        splines=[
            ("r3", knots_p, r3.t0, r3.dt),
            ("so3", knots_q, so3.t0, so3.dt),
        ],
        buckets=buckets,
        sensors=sensors,
        rho=rho0,
    )
    return dict(
        problem=problem,
        true_trajectory=true_traj,
        trajectory=traj,
        t1=float(t0s[0]),
        t2=float(t0s[-1]),
        n_obs=M,
    )
