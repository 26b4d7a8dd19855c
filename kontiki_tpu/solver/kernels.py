"""Batched residual / Jacobian / normal-equation kernels.

This is the TPU replacement for the three hot loops hidden inside Ceres in
the reference (see SURVEY.md §3.2): (1) residual+Jacobian evaluation via
``jax.jacfwd`` over per-measurement *local* functions (the role of
``ceres::Jet``), vmapped over dense struct-of-arrays; (2) spline window
evaluation; (3) Gauss-Newton normal-equation assembly by scatter-add of the
small dense local blocks into the global tangent-space system.

Compilation structure
---------------------
Solver programs are built from a hashable :class:`ProblemSpec` carrying only
*shapes* (knot counts, window widths, bucket kinds and sizes, tangent
layout); all numerical content (knots, sensor params, measurement arrays,
masks, spline t0/dt) is a traced ``runtime`` pytree. Problems with the same
structure — locked vs unlocked, different knot values, different spacings —
share one compiled XLA program (``_build_solver`` is lru_cached on the
spec). This is the jit-friendly analogue of Ceres rebuilding its program
per Problem.

Key mechanics
-------------
- Each measurement touches a *window* of ``W`` consecutive knots per spline
  (W = 4 plus slack for rolling-shutter readout). Local Jacobian blocks are
  taken wrt tangent increments of that window; windows from different
  measurements alias the same global knots, and the scatter-add accumulates
  them exactly like Ceres's shared parameter blocks.
- Manifold handling mirrors the reference's local parameterizations: SO3
  knots and sensor orientations retract by left-multiplied ``exp``
  (Ceres EigenQuaternionParameterization), SE3 knots by right-multiplied
  Sophus ``T * exp(x)`` (uniform_se3_spline_trajectory.h:17-49).
- Locks are masks over tangent columns; masked columns produce zero
  Jacobian so the corresponding parameters never move
  (= SetParameterBlockConstant).
- Robust loss: Huber applied as IRLS weights ``rho'(s)`` on the normal
  equations, cost reported as ``0.5 * sum(rho(|r|^2))`` (Ceres convention).
"""
import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: Jacobian mode: 'fwd' (default; ceres::Jet-equivalent batched JVPs — wide
#: tangent batches vectorize better on TPU than vmapped VJP transposes,
#: measured 2x faster than 'rev' on the flagship problem) or 'rev'.
JAC_MODE = os.environ.get("KONTIKI_JAC_MODE", "fwd")
#: Normal-equation assembly: 'dense' scatters each row's local Jacobian into
#: a dense per-row [rdim, P] block and forms H with one big MXU matmul;
#: 'scatter' scatter-adds [C, C] outer products into H directly (C ~ 90, so
#: this is ~40x more scattered elements — slow on TPU).
ASSEMBLY = os.environ.get("KONTIKI_ASSEMBLY", "dense")

from ..math import quaternion as quat
from ..math import se3 as se3m
from ..sensors import camera_models as cm

#: sensor tangent slot layout: q_ct(3), p_ct(3), d(1), abias(3), gbias(3)
SENSOR_TANGENT_DIM = 13

_KNOT_DIMS = {"r3": 3, "so3": 4, "se3": 7}
_TANGENT_DIMS = {"r3": 3, "so3": 3, "se3": 6}


class SplineSpec(NamedTuple):
    kind: str  # 'r3' | 'so3' | 'se3'
    n: int
    tangent_offset: int


class BucketSpec(NamedTuple):
    kind: str  # 'position'|'orientation'|'gyro'|'accel'|'rs_static'|'rs_newton'|'rs_lifting'
    camera: str  # '' | 'PinholeCamera' | 'AtanCamera'
    M: int
    rdim: int
    windows: Tuple[int, ...]  # W per spline, aligned with ProblemSpec.splines
    #: staged (bottlenecked) camera Jacobian — snapshotted at spec build time
    #: from KONTIKI_JAC_STAGED so every cache keyed on the spec (solver
    #: builds, jit traces, bucket layouts) stays consistent with the emitted
    #: Jacobian width even if the module flag is toggled later.
    staged: bool = False


class ProblemSpec(NamedTuple):
    splines: Tuple[SplineSpec, ...]
    buckets: Tuple[BucketSpec, ...]
    num_tangent: int
    sensor_offset: int
    landmark_offset: int
    vt_offset: int
    num_sensors: int
    num_landmarks: int
    num_vt: int


# ---------------------------------------------------------------------------
# spline window evaluation (shared with trajectories.spline_eval math)
# ---------------------------------------------------------------------------

from ..trajectories import spline_eval as ev  # noqa: E402


def retract_window(kind, win, delta):
    """Apply tangent increments [W, td] to a knot window [W, D]."""
    if kind == "r3":
        return win + delta
    if kind == "so3":
        return quat.qmul(se3m.so3_exp_quat(delta), win)
    if kind == "se3":
        q, t = se3m.se3_unpack(win)
        dq, dt = se3m.se3_exp(delta)
        return se3m.se3_pack(quat.qmul(q, dq), t + quat.qrotate(q, dt))
    raise ValueError(kind)


def _spline_n_eval(runtime, si, sp):
    """Clip bound for window-base/interpolation indices.

    Equals the spline's knot count, EXCEPT inside knot-segment-sharded
    programs where the local array is [halo + seg + halo + pad] long:
    there the bound must still be the GLOBAL knot count (in local
    coordinates, set per shard by the sharding layer's _local_runtime) so
    out-of-range times extrapolate from the same terminal window as the
    single-chip path instead of sliding into pad knots."""
    ne = runtime.get("spline_n_eval")
    return ne[si] if ne is not None else sp.n


def _window_eval(kind, knots, delta, i_base, t, t0, dt, W, n_eval=None):
    """Evaluate one spline at time t using the W-knot window at i_base with
    tangent increment delta applied."""
    D = knots.shape[1]
    n = knots.shape[0] if n_eval is None else n_eval
    win = jax.lax.dynamic_slice(knots, (i_base, jnp.zeros_like(i_base)), (W, D))
    win = retract_window(kind, win, delta)
    s = (t - t0) / dt
    i0 = jnp.floor(jax.lax.stop_gradient(s)).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, n - 4)
    j = jnp.clip(i0 - i_base, 0, W - 4)
    u = s - (i_base + j).astype(s.dtype)
    sub = jax.lax.dynamic_slice(win, (j, jnp.zeros_like(j)), (4, D))
    if kind == "r3":
        p, v, a = ev.r3_window(sub, u, dt)
        return {"p": p, "v": v, "a": a}
    if kind == "so3":
        q, w = ev.so3_window(sub, u, dt)
        return {"q": q, "w": w}
    p, v, a, q, w = ev.se3_window(sub, u, dt)
    return {"p": p, "v": v, "a": a, "q": q, "w": w}


def _make_traj_eval(spec: ProblemSpec, bspec: BucketSpec, tag):
    """eval(runtime, state, deltas, t, t_base) -> (p, v, a, q, w)."""

    def eval_at(runtime, state, deltas, t, t_base):
        dtype = jnp.result_type(t)
        p = jnp.zeros(3, dtype)
        v = jnp.zeros(3, dtype)
        a = jnp.zeros(3, dtype)
        q = jnp.array([1.0, 0.0, 0.0, 0.0], dtype)
        w = jnp.zeros(3, dtype)
        for si, sp in enumerate(spec.splines):
            W = bspec.windows[si]
            t0, dt = runtime["spline_t0"][si], runtime["spline_dt"][si]
            ne = _spline_n_eval(runtime, si, sp)
            i_base = jnp.clip(
                jnp.floor((jax.lax.stop_gradient(t_base) - t0) / dt).astype(jnp.int32),
                0,
                ne - W,
            )
            out = _window_eval(
                sp.kind, state[sp.kind], deltas[tag + sp.kind], i_base, t,
                t0, dt, W, n_eval=ne,
            )
            if sp.kind == "r3":
                p, v, a = out["p"], out["v"], out["a"]
            elif sp.kind == "so3":
                q, w = out["q"], out["w"]
            else:
                p, v, a, q, w = out["p"], out["v"], out["a"], out["q"], out["w"]
        return p, v, a, q, w

    return eval_at


def _i_bases(spec, bspec, runtime, t_base):
    out = []
    for si, sp in enumerate(spec.splines):
        W = bspec.windows[si]
        t0, dt = runtime["spline_t0"][si], runtime["spline_dt"][si]
        ne = _spline_n_eval(runtime, si, sp)
        out.append(
            jnp.clip(jnp.floor((t_base - t0) / dt).astype(jnp.int32), 0, ne - W)
        )
    return out


def _sensor_at(state, delta, s):
    q_ct = quat.qmul(se3m.so3_exp_quat(delta[0:3]), state["q_ct"][s])
    p_ct = state["p_ct"][s] + delta[3:6]
    d = state["d"][s] + delta[6]
    ab = state["abias"][s] + delta[7:10]
    gb = state["gbias"][s] + delta[10:13]
    return q_ct, p_ct, d, ab, gb


def _zero_deltas(spec, bspec, tags, sensor, rho, vt, dtype):
    z = {}
    for tag in tags:
        for si, sp in enumerate(spec.splines):
            z[tag + sp.kind] = jnp.zeros((bspec.windows[si], _TANGENT_DIMS[sp.kind]), dtype)
    if sensor:
        z["sensor"] = jnp.zeros(SENSOR_TANGENT_DIM, dtype)
    if rho:
        z["rho"] = jnp.zeros((), dtype)
    if vt:
        z["vt"] = jnp.zeros((), dtype)
    return z


def _flatten_blocks(
    spec, bspec, tags, J_tree, i_bases_by_tag, sensor_cols, rho_col, vt_col,
    split_rho=False,
):
    """Flatten per-delta Jacobian blocks into (J [r, C], cols [C]).

    With ``split_rho=True`` the landmark inverse-depth column is returned
    separately as ``J_rho [r]`` (or None) instead of being concatenated —
    the form the Schur-elimination assembly consumes."""
    Js, cols = [], []
    for tag in tags:
        ib = i_bases_by_tag[tag]
        for si, sp in enumerate(spec.splines):
            W = bspec.windows[si]
            td = _TANGENT_DIMS[sp.kind]
            Jblk = J_tree[tag + sp.kind]
            Js.append(Jblk.reshape(Jblk.shape[0], W * td))
            base = sp.tangent_offset + ib[si] * td
            cols.append(base + jnp.arange(W * td, dtype=jnp.int32))
    if sensor_cols is not None:
        Js.append(J_tree["sensor"].reshape(-1, SENSOR_TANGENT_DIM))
        cols.append(sensor_cols)
    J_rho = None
    if rho_col is not None:
        if split_rho:
            J_rho = J_tree["rho"].reshape(-1)
        else:
            Js.append(J_tree["rho"].reshape(-1, 1))
            cols.append(rho_col[None])
    if vt_col is not None:
        Js.append(J_tree["vt"].reshape(-1, 1))
        cols.append(vt_col[None])
    J = jnp.concatenate(Js, axis=1)
    cols = jnp.concatenate(cols)
    if split_rho:
        return J, cols, J_rho
    return J, cols


# ---------------------------------------------------------------------------
# residual closures per bucket kind
# ---------------------------------------------------------------------------

def _angular_distance(q_meas, q_hat):
    d = quat.qmul(quat.qconj(q_meas), q_hat)
    v2 = jnp.sum(d[1:] * d[1:])
    vn = jnp.sqrt(jnp.where(v2 < 1e-300, 1e-300, v2))
    return 2.0 * jnp.arctan2(vn, jnp.abs(d[0]))


def _project_fns(camera_name):
    if camera_name == "AtanCamera":
        def project(row, X):
            return cm.atan_project(row["K"], row["wc"], row["gamma"], X)

        def evaluate(row, X, dX):
            return cm.atan_evaluate(row["K"], row["wc"], row["gamma"], X, dX)
    else:
        def project(row, X):
            return cm.pinhole_project(row["K"], X)

        def evaluate(row, X, dX):
            return cm.pinhole_evaluate(row["K"], X, dX)
    return project, evaluate


def _world_point(p_ref, q_ref, yh_ref, rho, q_ct, p_ct):
    """Landmark world point in inverse-depth homogeneous form
    (static_rscamera_measurement.h:48-51)."""
    X_ref = quat.qrotate(quat.qconj(q_ct), yh_ref - rho * p_ct)
    return quat.qrotate(q_ref, X_ref) + rho * p_ref


def _make_residual(spec: ProblemSpec, bspec: BucketSpec):
    """Build residual(runtime, state, deltas, row) plus static block flags."""
    kind = bspec.kind
    from ..constants import GRAVITY

    if kind in ("position", "orientation"):
        eval_at = _make_traj_eval(spec, bspec, "a_")

        def residual(runtime, state, deltas, row):
            p, v, a, q, w = eval_at(runtime, state, deltas, row["t"], row["t_base"])
            if kind == "position":
                return row["y"] - p
            return jnp.atleast_1d(_angular_distance(row["y"], q))

        return residual, dict(tags=("a_",), sensor=False, rho=False, vt=False, loss=False)

    if kind in ("gyro", "accel"):
        eval_at = _make_traj_eval(spec, bspec, "a_")

        def residual(runtime, state, deltas, row):
            q_ct, p_ct, d, ab, gb = _sensor_at(state, deltas["sensor"], row["sid"])
            te = row["t"] + d
            p, v, a, q, w = eval_at(runtime, state, deltas, te, row["t_base"])
            if kind == "gyro":
                body = quat.qrotate(quat.qconj(q), w) + gb
            else:
                body = quat.qrotate(quat.qconj(q), a + jnp.asarray(GRAVITY, a.dtype)) + ab
            return row["weight"] * (row["y"] - body)

        return residual, dict(tags=("a_",), sensor=True, rho=False, vt=False, loss=False)

    eval_ref = _make_traj_eval(spec, bspec, "ref_")
    eval_obs = _make_traj_eval(spec, bspec, "obs_")
    project, evaluate = _project_fns(bspec.camera)

    if kind in ("rs_static", "rs_lifting"):
        lifting = kind == "rs_lifting"

        def residual(runtime, state, deltas, row):
            q_ct, p_ct, d, _, _ = _sensor_at(state, deltas["sensor"], row["sid"])
            rho = state["rho"][row["lid"]] + deltas["rho"]
            row_delta = row["readout"] / row["rows"]
            t_ref = row["t0_ref"] + d + row["v_ref"] * row_delta
            if lifting:
                vt = state["vt"][row["vt_idx"]] + deltas["vt"]
                t_obs = row["t0_obs"] + d + vt * row["readout"]
            else:
                t_obs = row["t0_obs"] + d + row["v_obs"] * row_delta

            pr, _, _, qr, _ = eval_ref(runtime, state, deltas, t_ref, row["t_base_ref"])
            po, _, _, qo, _ = eval_obs(runtime, state, deltas, t_obs, row["t_base_obs"])

            X = _world_point(pr, qr, row["yh_ref"], rho, q_ct, p_ct)
            X_obs = quat.qrotate(quat.qconj(qo), X - rho * po)
            X_cam = quat.qrotate(q_ct, X_obs) + rho * p_ct
            y_hat = project(row, X_cam)
            r2 = row["weight"] * (row["uv_obs"] - y_hat)
            if not lifting:
                return r2
            r_time = row["weight"] * row["rows"] * (vt - row["vt_orig"])
            return jnp.concatenate([r2, jnp.atleast_1d(r_time)])

        return residual, dict(
            tags=("ref_", "obs_"), sensor=True, rho=True, vt=lifting, loss=True
        )

    # rs_newton: bounded Newton iteration inside the residual
    def residual(runtime, state, deltas, row):
        q_ct, p_ct, d, _, _ = _sensor_at(state, deltas["sensor"], row["sid"])
        rho = state["rho"][row["lid"]] + deltas["rho"]
        row_delta = row["readout"] / row["rows"]
        t_ref = row["t0_ref"] + d + row["v_ref"] * row_delta
        t0_obs = row["t0_obs"] + d

        pr, _, _, qr, _ = eval_ref(runtime, state, deltas, t_ref, row["t_base_ref"])
        X = _world_point(pr, qr, row["yh_ref"], rho, q_ct, p_ct)

        max_dt2 = (0.5 * row_delta) ** 2

        def body(carry, _):
            t_obs, y_out, done = carry
            p, vel, _, q, w = eval_obs(runtime, state, deltas, t_obs, row["t_base_obs"])
            dq = 0.5 * quat.qmul(quat.embed_vector(w), q)
            s_vec = X - rho * p
            ds = -rho * vel
            X_obs = quat.qrotate(quat.qconj(q), s_vec)
            X_cam = quat.qrotate(q_ct, X_obs) + rho * p_ct
            dX_obs = (
                quat.vector_sandwich(quat.qconj(dq), s_vec, q)
                + quat.vector_sandwich(quat.qconj(q), ds, q)
                + quat.vector_sandwich(quat.qconj(q), s_vec, dq)
            )
            # NOTE: the `+ rho*p_ct` replicates the reference
            # (newton_rscamera_measurement.h:91): the constant offset appears
            # in the time-derivative. It only perturbs the Newton path, not
            # the fixed point; replicated for behavioral parity.
            dX_cam = quat.qrotate(q_ct, dX_obs) + rho * p_ct
            y, dy = evaluate(row, X_cam, dX_cam)
            f = y[1] - row["rows"] * (t_obs - t0_obs) / row["readout"]
            df = dy[1] - row["rows"] / row["readout"]
            dt = f / df
            new_t = t_obs - dt
            now_done = dt * dt < max_dt2
            new_t = jnp.where(
                now_done, new_t, jnp.clip(new_t, t0_obs, t0_obs + row["readout"])
            )
            t_next = jnp.where(done, t_obs, new_t)
            y_next = jnp.where(done, y_out, y)
            return (t_next, y_next, done | now_done), None

        t_obs0 = t0_obs + row["v_obs"] * row_delta
        (tf, yf, _), _ = jax.lax.scan(
            body, (t_obs0, jnp.zeros(2, X.dtype), jnp.asarray(False)), None, length=5
        )
        return row["weight"] * (row["uv_obs"] - yf)

    return residual, dict(tags=("ref_", "obs_"), sensor=True, rho=True, vt=False, loss=True)


#: Staged camera Jacobians: differentiate the spline evaluation and the
#: projection separately and chain through the (position, orientation)
#: bottleneck, instead of pushing ~88 forward-mode seeds through the whole
#: residual. The time-offset/vt columns chain analytically through
#: (velocity, 0.5*embed(omega) q). Applies to rs_static/rs_lifting
#: (rs_newton's inner solve does not factor); set KONTIKI_JAC_STAGED=0 for
#: the monolithic jacfwd.
JAC_STAGED = os.environ.get("KONTIKI_JAC_STAGED", "1") != "0"


def _make_camera_staged(spec: ProblemSpec, bspec: BucketSpec):
    """row_terms(runtime, state, row, split_rho) for rs_static/rs_lifting.

    Exact chain-rule factorization of the monolithic jacfwd (pinned by
    tests/test_staged_jacobian.py):

        r = G(u_ref, u_obs, s, rho, vt),  u_tag = (p, q)(window_tag, t_tag)

        J_window = dG/du_tag @ du_tag/dwindow   (<= 24 spline-eval seeds)
        J_d      = dG/ds[6] + sum_tag dG/du_tag @ du_tag/dt   (analytic)
        J_vt     = dG/dvt + dG/du_obs @ du_obs/dt * readout   (lifting)

    Each trajectory evaluation differentiates only its *active 4-knot
    window* (the exact sparsity of the reference, spline_base.h:391) and
    emits that window's column ids directly — W-knot readout-slack windows
    (kept for the cost/Newton paths) would waste (W-4)*td forward seeds on
    identically-zero columns and widen every downstream Gauss-Newton row.
    R3 blocks skip autodiff entirely: the spline is linear in its knots, so
    dp/dknots = kron(B, I3)."""
    kind = bspec.kind
    lifting = kind == "rs_lifting"
    project, _ = _project_fns(bspec.camera)

    def stage_eval(runtime, state, t, dtype):
        """(u7, Jw [7, C_KNOT], dudt [7], cols [C_KNOT]) at time t."""
        p = jnp.zeros(3, dtype)
        v = jnp.zeros(3, dtype)
        q = jnp.array([1.0, 0.0, 0.0, 0.0], dtype)
        w = jnp.zeros(3, dtype)
        J_parts, col_parts = [], []
        for si, sp in enumerate(spec.splines):
            knots = state[sp.kind]
            t0, dt = runtime["spline_t0"][si], runtime["spline_dt"][si]
            td = _TANGENT_DIMS[sp.kind]
            s = (t - t0) / dt
            i0 = jnp.clip(
                jnp.floor(jax.lax.stop_gradient(s)).astype(jnp.int32),
                0,
                _spline_n_eval(runtime, si, sp) - 4,
            )
            u = s - i0.astype(s.dtype)
            sub = jax.lax.dynamic_slice(
                knots, (i0, jnp.zeros_like(i0)), (4, knots.shape[1])
            )
            if sp.kind == "r3":
                B, dB, _ = ev.basis_vectors(u, dt, cumulative=False)
                p = B @ sub
                v = dB @ sub
                Jblk = jnp.concatenate(
                    [jnp.kron(B[None, :], jnp.eye(3, dtype=dtype)).reshape(3, 12),
                     jnp.zeros((4, 12), dtype)],
                    axis=0,
                )
            elif sp.kind == "so3":
                def h_so3(delta):
                    win = retract_window("so3", sub, delta)
                    q_, w_ = ev.so3_window(win, u, dt)
                    return q_, (q_, w_)

                Jq, (q, w) = jax.jacfwd(h_so3, has_aux=True)(
                    jnp.zeros((4, 3), dtype)
                )
                Jblk = jnp.concatenate(
                    [jnp.zeros((3, 12), dtype), Jq.reshape(4, 12)], axis=0
                )
            else:  # se3
                def h_se3(delta):
                    win = retract_window("se3", sub, delta)
                    p_, v_, _, q_, w_ = ev.se3_window(win, u, dt)
                    u7_ = jnp.concatenate([p_, q_])
                    return u7_, (u7_, v_, q_, w_)

                Jblk, (u7, v, q, w) = jax.jacfwd(h_se3, has_aux=True)(
                    jnp.zeros((4, 6), dtype)
                )
                p = u7[:3]
                Jblk = Jblk.reshape(7, 24)
            J_parts.append(Jblk)
            col_parts.append(
                sp.tangent_offset + i0 * td + jnp.arange(4 * td, dtype=jnp.int32)
            )
        u7 = jnp.concatenate([p, q])
        Jw = jnp.concatenate(J_parts, axis=1)
        dudt = jnp.concatenate([v, 0.5 * quat.qmul(quat.embed_vector(w), q)])
        return u7, Jw, dudt, jnp.concatenate(col_parts)

    def row_terms(runtime, state, row, split_rho):
        dtype = runtime["mask"].dtype
        d = state["d"][row["sid"]]
        row_delta = row["readout"] / row["rows"]
        t_ref = row["t0_ref"] + d + row["v_ref"] * row_delta
        if lifting:
            vt0 = state["vt"][row["vt_idx"]]
            t_obs = row["t0_obs"] + d + vt0 * row["readout"]
        else:
            t_obs = row["t0_obs"] + d + row["v_obs"] * row_delta

        u_ref, Jw_ref, dudt_ref, cols_ref = stage_eval(runtime, state, t_ref, dtype)
        u_obs, Jw_obs, dudt_obs, cols_obs = stage_eval(runtime, state, t_obs, dtype)

        def G(ur, uo, s_delta, drho, dvt):
            p_ref, q_ref = ur[:3], ur[3:7]
            p_obs, q_obs = uo[:3], uo[3:7]
            q_ct, p_ct, _, _, _ = _sensor_at(state, s_delta, row["sid"])
            rho = state["rho"][row["lid"]] + drho
            X = _world_point(p_ref, q_ref, row["yh_ref"], rho, q_ct, p_ct)
            X_o = quat.qrotate(quat.qconj(q_obs), X - rho * p_obs)
            X_cam = quat.qrotate(q_ct, X_o) + rho * p_ct
            y_hat = project(row, X_cam)
            r2 = row["weight"] * (row["uv_obs"] - y_hat)
            if not lifting:
                return r2
            vt = vt0 + dvt
            r_time = row["weight"] * row["rows"] * (vt - row["vt_orig"])
            return jnp.concatenate([r2, jnp.atleast_1d(r_time)])

        z13 = jnp.zeros(SENSOR_TANGENT_DIM, dtype)
        z = jnp.zeros((), dtype)
        r = G(u_ref, u_obs, z13, z, z)
        Ju_ref, Ju_obs, Js, Jrho, Jvt = jax.jacfwd(
            G, argnums=(0, 1, 2, 3, 4)
        )(u_ref, u_obs, z13, z, z)

        J_ref = Ju_ref @ Jw_ref
        J_obs = Ju_obs @ Jw_obs
        # time-offset column: both trajectory times shift with d
        Js = Js.at[:, 6].add(Ju_ref @ dudt_ref + Ju_obs @ dudt_obs)
        if lifting:
            Jvt = Jvt + (Ju_obs @ dudt_obs) * row["readout"]

        if "valid" in row:
            v_ = row["valid"]
            r = r * v_
            J_ref = J_ref * v_
            J_obs = J_obs * v_
            Js = Js * v_
            Jrho = Jrho * v_
            Jvt = Jvt * v_

        # columns in _flatten_blocks order: tags x splines, sensor, rho, vt
        cols = [cols_ref, cols_obs]
        Js_parts = [J_ref, J_obs, Js]
        cols.append(
            spec.sensor_offset
            + row["sid"] * SENSOR_TANGENT_DIM
            + jnp.arange(SENSOR_TANGENT_DIM, dtype=jnp.int32)
        )
        J_rho_out = Jrho.reshape(-1)
        if not split_rho:
            Js_parts.append(Jrho.reshape(-1, 1))
            cols.append(
                (spec.landmark_offset + row["lid"]).astype(jnp.int32)[None]
            )
        if lifting:
            Js_parts.append(Jvt.reshape(-1, 1))
            cols.append((spec.vt_offset + row["vt_idx"]).astype(jnp.int32)[None])
        J = jnp.concatenate(Js_parts, axis=1)
        cols = jnp.concatenate(cols)
        if split_rho:
            return r, J, cols, J_rho_out
        return r, J, cols

    return row_terms


def _fused_linearize_enabled(spec, bspec):
    """Whether the fused Pallas/XLA linearization kernel covers this bucket
    (ops/linearize_kernels.py): staged rs_static/rs_lifting rows over an SE3
    or split R3+SO3 spline set."""
    from ..ops import linearize_kernels as lk

    if lk.LINEARIZE == "off" or not bspec.staged:
        return False
    kinds = tuple(sp.kind for sp in spec.splines)
    if kinds != ("se3",) and sorted(kinds) != ["r3", "so3"]:
        return False
    if lk.LINEARIZE in ("pallas", "xla"):
        return True
    return jax.default_backend() == "tpu"


def _fused_camera_inputs(spec, bspec, runtime, state, data):
    """Shared gather/transpose stage for the fused camera kernels.

    Returns (ins, cfg, i0s, vt0) — the transposed [k, M] input dict, the
    static kernel config, per-spline window base indices (for column ids),
    and the lifting row times."""
    lifting = bspec.kind == "rs_lifting"
    dtype = runtime["mask"].dtype
    M = data["t0_ref"].shape[0]
    d = state["d"][data["sid"]]
    row_delta = data["readout"] / data["rows"]
    t_ref = data["t0_ref"] + d + data["v_ref"] * row_delta
    if lifting:
        vt0 = state["vt"][data["vt_idx"]]
        t_obs = data["t0_obs"] + d + vt0 * data["readout"]
    else:
        t_obs = data["t0_obs"] + d + data["v_obs"] * row_delta

    kinds = tuple(sp.kind for sp in spec.splines)
    se3 = kinds == ("se3",)
    ins = {}
    i0s = {"ref": [], "obs": []}
    for si, sp in enumerate(spec.splines):
        t0, dt = runtime["spline_t0"][si], runtime["spline_dt"][si]
        D = state[sp.kind].shape[1]
        for tag, t in (("ref", t_ref), ("obs", t_obs)):
            s = (t - t0) / dt
            i0 = jnp.clip(
                jnp.floor(jax.lax.stop_gradient(s)).astype(jnp.int32),
                0, _spline_n_eval(runtime, si, sp) - 4,
            )
            u = s - i0.astype(s.dtype)
            win = ev.gather_windows(state[sp.kind], i0)  # [M, 4, D]
            i0s[tag].append(i0)
            if se3:
                ins[f"win_{tag}"] = win.reshape(M, 4 * D).T
                ins[f"u_{tag}"] = u[None, :]
            else:
                suffix = "_so3" if sp.kind == "so3" else "_r3"
                ins[f"win_{tag}{suffix}"] = win.reshape(M, 4 * D).T
                key = f"u_{tag}" + ("_so3" if sp.kind == "so3" else "")
                ins[key] = u[None, :]
    if se3:
        ins["dts"] = jnp.broadcast_to(
            jnp.asarray(runtime["spline_dt"][0], dtype), (1, M)
        )
    else:
        r3_i = kinds.index("r3")
        so3_i = kinds.index("so3")
        ins["dts"] = jnp.stack(
            [
                jnp.broadcast_to(jnp.asarray(runtime["spline_dt"][r3_i], dtype), (M,)),
                jnp.broadcast_to(jnp.asarray(runtime["spline_dt"][so3_i], dtype), (M,)),
            ]
        )

    ins["q_ct"] = state["q_ct"][data["sid"]].T
    ins["p_ct"] = state["p_ct"][data["sid"]].T
    ins["rho"] = state["rho"][data["lid"]][None, :]
    ins["yh_ref"] = data["yh_ref"].T
    ins["uv_obs"] = data["uv_obs"].T
    ins["weight"] = data["weight"][None, :]
    ins["K"] = data["K"].reshape(M, 9).T
    if bspec.camera == "AtanCamera":
        ins["wc"] = data["wc"].T
        ins["gamma"] = data["gamma"][None, :]
    if lifting:
        ins["vt0"] = vt0[None, :]
        ins["vt_orig"] = data["vt_orig"][None, :]
        ins["rows"] = data["rows"][None, :]
        ins["readout"] = data["readout"][None, :]
    if "valid" in data:
        ins["valid"] = data["valid"][None, :]

    C = 61 + (1 if lifting else 0)
    cfg = dict(
        kind="se3" if se3 else "split",
        r3_first=bool(not se3 and kinds[0] == "r3"),
        camera=bspec.camera,
        lifting=lifting,
        rdim=bspec.rdim,
        C=C,
    )
    return ins, cfg, i0s, (vt0 if lifting else None)


def _camera_rows_cost_fused(spec, bspec, runtime, state, data):
    """Residuals only, through the fused kernel's primal path — the
    re-cost phase of the LM step at camera scale (same math, no seeds)."""
    from ..ops import linearize_kernels as lk

    ins, cfg, _, _ = _fused_camera_inputs(spec, bspec, runtime, state, data)
    backend = "xla" if lk.LINEARIZE == "xla" else "auto"
    return lk.cost_rows(cfg, ins, backend=backend)


def _camera_rows_fused(spec, bspec, runtime, state, data, split_rho):
    """Gather + transpose row inputs, run the fused linearization kernel,
    and emit (r, J, cols[, J_rho]) exactly like the vmapped staged path."""
    from ..ops import linearize_kernels as lk

    lifting = bspec.kind == "rs_lifting"
    ins, cfg, i0s, vt0 = _fused_camera_inputs(
        spec, bspec, runtime, state, data
    )
    backend = "xla" if lk.LINEARIZE == "xla" else "auto"
    r, J, J_rho = lk.linearize_rows(cfg, ins, backend=backend)

    # column ids, in the staged order: ref windows, obs windows, sensor,
    # (rho when not split), (vt)
    cols = []
    for tag in ("ref", "obs"):
        for si, sp in enumerate(spec.splines):
            td = _TANGENT_DIMS[sp.kind]
            cols.append(
                sp.tangent_offset
                + i0s[tag][si][:, None] * td
                + jnp.arange(4 * td, dtype=jnp.int32)[None, :]
            )
    cols.append(
        spec.sensor_offset
        + data["sid"][:, None] * SENSOR_TANGENT_DIM
        + jnp.arange(SENSOR_TANGENT_DIM, dtype=jnp.int32)[None, :]
    )
    if not split_rho:
        # insert the landmark column between sensor and vt
        J = jnp.concatenate(
            [J[..., :61], J_rho[..., None], J[..., 61:]], axis=-1
        )
        cols.append(
            (spec.landmark_offset + data["lid"]).astype(jnp.int32)[:, None]
        )
    if lifting:
        cols.append(
            (spec.vt_offset + data["vt_idx"]).astype(jnp.int32)[:, None]
        )
    cols = jnp.concatenate(cols, axis=1)
    if split_rho:
        return r, J, cols, J_rho
    return r, J, cols


def _fused_newton_enabled(spec, bspec):
    """Whether the fused Newton kernel covers this bucket: rs_newton rows
    over SE3 or split splines (ops/linearize_kernels.py Newton section)."""
    from ..ops import linearize_kernels as lk

    if lk.LINEARIZE == "off" or bspec.kind != "rs_newton":
        return False
    kinds = tuple(sp.kind for sp in spec.splines)
    if kinds != ("se3",) and sorted(kinds) != ["r3", "so3"]:
        return False
    if lk.LINEARIZE in ("pallas", "xla"):
        return True
    return jax.default_backend() == "tpu"


def _fused_newton_inputs(spec, bspec, runtime, state, data):
    """Gather/transpose stage for the fused Newton kernel: W-knot
    readout-slack windows per tag (the Newton time moves within the
    readout), obs u relative to the FRAME START (the kernel adds the
    per-iteration row time)."""
    dtype = runtime["mask"].dtype
    M = data["t0_ref"].shape[0]
    d = state["d"][data["sid"]]
    row_delta = data["readout"] / data["rows"]
    t_ref = data["t0_ref"] + d + data["v_ref"] * row_delta
    t_base_ref = data["t0_ref"] + d
    t_base_obs = data["t0_obs"] + d

    kinds = tuple(sp.kind for sp in spec.splines)
    se3 = kinds == ("se3",)
    ins = {}
    i0s = {"ref": [], "obs": []}
    Ct = 0
    for si, sp in enumerate(spec.splines):
        W = bspec.windows[si]
        Ct += W * _TANGENT_DIMS[sp.kind]
        t0, dt = runtime["spline_t0"][si], runtime["spline_dt"][si]
        D = state[sp.kind].shape[1]
        for tag, t_row, t_base in (
            ("ref", t_ref, t_base_ref), ("obs", t_base_obs, t_base_obs)
        ):
            i0 = jnp.clip(
                jnp.floor(
                    jax.lax.stop_gradient((t_base - t0) / dt)
                ).astype(jnp.int32),
                0, _spline_n_eval(runtime, si, sp) - W,
            )
            u = (t_row - t0) / dt - i0.astype(dtype)
            idx = i0[:, None] + jnp.arange(W, dtype=i0.dtype)
            win = jnp.take(state[sp.kind], idx, axis=0, mode="clip")
            i0s[tag].append(i0)
            if se3:
                ins[f"win_{tag}"] = win.reshape(M, W * D).T
                ins[f"u_{tag}"] = u[None, :]
            else:
                suffix = "_so3" if sp.kind == "so3" else "_r3"
                ins[f"win_{tag}{suffix}"] = win.reshape(M, W * D).T
                key = f"u_{tag}" + ("_so3" if sp.kind == "so3" else "")
                ins[key] = u[None, :]
    if se3:
        ins["dts"] = jnp.broadcast_to(
            jnp.asarray(runtime["spline_dt"][0], dtype), (1, M)
        )
    else:
        r3_i = kinds.index("r3")
        so3_i = kinds.index("so3")
        ins["dts"] = jnp.stack(
            [
                jnp.broadcast_to(jnp.asarray(runtime["spline_dt"][r3_i], dtype), (M,)),
                jnp.broadcast_to(jnp.asarray(runtime["spline_dt"][so3_i], dtype), (M,)),
            ]
        )

    ins["q_ct"] = state["q_ct"][data["sid"]].T
    ins["p_ct"] = state["p_ct"][data["sid"]].T
    ins["rho"] = state["rho"][data["lid"]][None, :]
    ins["yh_ref"] = data["yh_ref"].T
    ins["uv_obs"] = data["uv_obs"].T
    ins["weight"] = data["weight"][None, :]
    ins["K"] = data["K"].reshape(M, 9).T
    if bspec.camera == "AtanCamera":
        ins["wc"] = data["wc"].T
        ins["gamma"] = data["gamma"][None, :]
    ins["v_obs"] = data["v_obs"][None, :]
    ins["rows"] = data["rows"][None, :]
    ins["readout"] = data["readout"][None, :]
    if "valid" in data:
        ins["valid"] = data["valid"][None, :]

    cfg = dict(
        kind="se3" if se3 else "split",
        r3_first=bool(not se3 and kinds[0] == "r3"),
        camera=bspec.camera,
        rdim=bspec.rdim,
        Ct=Ct,
        C=2 * Ct + SENSOR_TANGENT_DIM,
        Ws=tuple(bspec.windows),
    )
    return ins, cfg, i0s


def _newton_rows_fused(spec, bspec, runtime, state, data, split_rho,
                       cost_only=False):
    """Fused Newton rows -> (r, J, cols[, J_rho]) matching the vmapped
    jacfwd path's layout (_flatten_blocks order: windows, sensor, rho)."""
    from ..ops import linearize_kernels as lk

    ins, cfg, i0s = _fused_newton_inputs(spec, bspec, runtime, state, data)
    backend = "xla" if lk.LINEARIZE == "xla" else "auto"
    if cost_only:
        return lk.newton_rows(cfg, ins, cost_only=True, backend=backend)
    r, J, J_rho = lk.newton_rows(cfg, ins, backend=backend)

    cols = []
    for tag in ("ref", "obs"):
        for si, sp in enumerate(spec.splines):
            td = _TANGENT_DIMS[sp.kind]
            W = bspec.windows[si]
            cols.append(
                sp.tangent_offset
                + i0s[tag][si][:, None] * td
                + jnp.arange(W * td, dtype=jnp.int32)[None, :]
            )
    cols.append(
        spec.sensor_offset
        + data["sid"][:, None] * SENSOR_TANGENT_DIM
        + jnp.arange(SENSOR_TANGENT_DIM, dtype=jnp.int32)[None, :]
    )
    if not split_rho:
        J = jnp.concatenate([J, J_rho[..., None]], axis=-1)
        cols.append(
            (spec.landmark_offset + data["lid"]).astype(jnp.int32)[:, None]
        )
    cols = jnp.concatenate(cols, axis=1)
    if split_rho:
        return r, J, cols, J_rho
    return r, J, cols


def _fused_imu_enabled(spec, bspec):
    """Whether the fused IMU kernel covers this bucket: gyro/accel rows
    over ('so3',) or split ('r3','so3') splines with plain 4-knot windows."""
    from ..ops import linearize_kernels as lk

    if lk.LINEARIZE == "off":
        return False
    if bspec.kind not in ("gyro", "accel"):
        return False
    kinds = tuple(sp.kind for sp in spec.splines)
    if kinds != ("so3",) and sorted(kinds) != ["r3", "so3"]:
        return False
    if any(w != 4 for w in bspec.windows):
        return False
    if lk.LINEARIZE in ("pallas", "xla"):
        return True
    return jax.default_backend() == "tpu"


def _imu_rows_fused(spec, bspec, runtime, state, data, cost_only):
    """Gather + transpose IMU row inputs and run the fused kernel; emits
    (r, J, cols) / r exactly like the vmapped jacfwd path."""
    from ..ops import linearize_kernels as lk

    dtype = runtime["mask"].dtype
    M = data["t"].shape[0]
    te = data["t"] + state["d"][data["sid"]]
    kinds = tuple(sp.kind for sp in spec.splines)
    so3_only = kinds == ("so3",)
    ins = {}
    i0s = []
    for si, sp in enumerate(spec.splines):
        t0, dt = runtime["spline_t0"][si], runtime["spline_dt"][si]
        s = (te - t0) / dt
        i0 = jnp.clip(
            jnp.floor(jax.lax.stop_gradient(s)).astype(jnp.int32),
            0, _spline_n_eval(runtime, si, sp) - 4,
        )
        u = s - i0.astype(s.dtype)
        win = ev.gather_windows(state[sp.kind], i0)
        i0s.append(i0)
        sfx = "_" + sp.kind if not so3_only else "_so3"
        D = win.shape[2]
        ins[f"win{sfx}"] = win.reshape(M, 4 * D).T
        ins[f"u{sfx}"] = u[None, :]
        ins[f"dts{sfx}"] = jnp.broadcast_to(jnp.asarray(dt, dtype), (1, M))
    ins["y"] = data["y"].T
    ins["weight"] = data["weight"][None, :]
    bias_key = "gbias" if bspec.kind == "gyro" else "abias"
    ins["bias"] = state[bias_key][data["sid"]].T
    if "valid" in data:
        ins["valid"] = data["valid"][None, :]

    cfg = dict(
        kind=bspec.kind,
        so3_only=bool(so3_only),
        r3_first=bool(not so3_only and kinds[0] == "r3"),
    )
    backend = "xla" if lk.LINEARIZE == "xla" else "auto"
    if cost_only:
        return lk.imu_rows(cfg, ins, backend=backend, cost_only=True)
    r, J = lk.imu_rows(cfg, ins, backend=backend)
    cols = []
    for si, sp in enumerate(spec.splines):
        td = _TANGENT_DIMS[sp.kind]
        cols.append(
            sp.tangent_offset
            + i0s[si][:, None] * td
            + jnp.arange(4 * td, dtype=jnp.int32)[None, :]
        )
    cols.append(
        spec.sensor_offset
        + data["sid"][:, None] * SENSOR_TANGENT_DIM
        + jnp.arange(SENSOR_TANGENT_DIM, dtype=jnp.int32)[None, :]
    )
    return r, J, jnp.concatenate(cols, axis=1)


def _with_base_times(bspec, state, row):
    """Window base times from the current state's time offsets; windows are
    re-centered every linearization."""
    kind = bspec.kind
    row = dict(row)
    if kind in ("position", "orientation"):
        row["t_base"] = row["t"]
    elif kind in ("gyro", "accel"):
        row["t_base"] = row["t"] + state["d"][row["sid"]]
    else:
        d = state["d"][row["sid"]]
        row["t_base_ref"] = row["t0_ref"] + d
        row["t_base_obs"] = row["t0_obs"] + d
    return row


# ---------------------------------------------------------------------------
# robust loss (Huber, Ceres semantics)
# ---------------------------------------------------------------------------
#
# Ceres applies robust losses through the Triggs corrector (corrector.cc):
# with s = |r|^2, when rho''(s) > 0 the residual and Jacobian get the full
# second-order correction (alpha = 1 - sqrt(1 + 2 s rho''/rho')); when
# rho''(s) <= 0 Ceres *explicitly falls back* to alpha = 0, i.e. scaling
# both r and J by sqrt(rho'). For Huber, rho'' = 0 in the inlier region and
# rho'' = -c/(2 s^{3/2}) < 0 in the outlier region, so the corrector is
# sqrt(rho') scaling *everywhere* — exactly the whitening applied below.
# The IRLS weights here therefore reproduce Ceres's Gauss-Newton system for
# HuberLoss bit-for-bit (the only loss the reference uses,
# static_rscamera_measurement.h:65-69); tests/test_lm_semantics.py pins this.

def _huber(s, c):
    b = c * c
    return jnp.where(s <= b, s, 2.0 * c * jnp.sqrt(jnp.maximum(s, b)) - b)


def _huber_prime(s, c):
    b = c * c
    return jnp.where(s <= b, 1.0, c / jnp.sqrt(jnp.maximum(s, b)))


def _huber_second(s, c):
    """rho''(s) — never positive for Huber, so Ceres's Triggs corrector
    reduces to sqrt(rho') scaling (see block comment above)."""
    b = c * c
    return jnp.where(
        s <= b, 0.0, -0.5 * c / jnp.sqrt(jnp.maximum(s, b)) ** 3
    )


# ---------------------------------------------------------------------------
# assembled program, cached on ProblemSpec
# ---------------------------------------------------------------------------

def _bucket_terms(spec, bspec, residual, flags, runtime, state, data, with_jac,
                  split_rho=False):
    """Residuals (and optionally local Jacobians + column indices) for one
    bucket. ``split_rho`` separates the landmark column (Schur path)."""
    tags = flags["tags"]
    dtype = runtime["mask"].dtype

    if bspec.staged and _fused_linearize_enabled(spec, bspec):
        if with_jac:
            return _camera_rows_fused(
                spec, bspec, runtime, state, data, split_rho
            )
        return _camera_rows_cost_fused(spec, bspec, runtime, state, data)
    if _fused_newton_enabled(spec, bspec):
        return _newton_rows_fused(
            spec, bspec, runtime, state, data, split_rho,
            cost_only=not with_jac,
        )
    if _fused_imu_enabled(spec, bspec):
        return _imu_rows_fused(
            spec, bspec, runtime, state, data, cost_only=not with_jac
        )
    if with_jac and bspec.staged:
        staged = _make_camera_staged(spec, bspec)
        return jax.vmap(
            lambda row: staged(runtime, state, row, split_rho)
        )(data)

    def row_fn(row):
        zero = _zero_deltas(
            spec, bspec, tags, flags["sensor"], flags["rho"], flags["vt"], dtype
        )
        row = _with_base_times(bspec, state, row)
        i_bases_by_tag = {}
        for tag in tags:
            key = {"a_": "t_base", "ref_": "t_base_ref", "obs_": "t_base_obs"}[tag]
            i_bases_by_tag[tag] = _i_bases(spec, bspec, runtime, row[key])

        def f(deltas):
            r = residual(runtime, state, deltas, row)
            # Padded rows (multi-chip sharding pads buckets to a multiple of
            # the mesh size) carry valid=0 and contribute nothing.
            if "valid" in row:
                r = r * row["valid"]
            return r

        r = f(zero)
        if not with_jac:
            return r
        jac = jax.jacrev if JAC_MODE == "rev" else jax.jacfwd
        J_tree = jac(f)(zero)
        sensor_cols = (
            spec.sensor_offset
            + row["sid"] * SENSOR_TANGENT_DIM
            + jnp.arange(SENSOR_TANGENT_DIM, dtype=jnp.int32)
            if flags["sensor"]
            else None
        )
        rho_col = (
            (spec.landmark_offset + row["lid"]).astype(jnp.int32)
            if flags["rho"]
            else None
        )
        vt_col = (
            (spec.vt_offset + row["vt_idx"]).astype(jnp.int32) if flags["vt"] else None
        )
        out = _flatten_blocks(
            spec, bspec, tags, J_tree, i_bases_by_tag, sensor_cols, rho_col, vt_col,
            split_rho=split_rho,
        )
        return (r,) + tuple(out)

    return jax.vmap(row_fn)(data)


@functools.lru_cache(maxsize=None)
def build_parts(spec: ProblemSpec, x64: bool):
    """Raw (unjitted) solver functions for a problem structure.

    Returns a dict with ``total_cost(runtime, state)``,
    ``linearize(runtime, state) -> (cost, H, g)``,
    ``retract(runtime, state, delta)`` and
    ``step(runtime, state, lam)``. The multi-chip layer
    (:mod:`kontiki_tpu.parallel`) wraps ``linearize``/``total_cost`` in
    ``shard_map`` + ``psum`` over the measurement axis; the single-chip
    path jits them directly (see :func:`_build_solver`)."""
    residuals = [_make_residual(spec, b) for b in spec.buckets]

    def total_cost(runtime, state):
        cost = jnp.zeros((), runtime["mask"].dtype)
        for bspec, (res, flags), data in zip(spec.buckets, residuals, runtime["data"]):
            r = _bucket_terms(spec, bspec, res, flags, runtime, state, data, False)
            s = jnp.sum(r * r, axis=-1)
            if flags["loss"]:
                cost = cost + 0.5 * jnp.sum(_huber(s, data["huber_c"]))
            else:
                cost = cost + 0.5 * jnp.sum(s)
        return cost

    def linearize(runtime, state):
        P = spec.num_tangent
        dtype = runtime["mask"].dtype
        H = jnp.zeros((P, P), dtype)
        g = jnp.zeros((P,), dtype)
        cost = jnp.zeros((), dtype)
        for bspec, (res, flags), data in zip(spec.buckets, residuals, runtime["data"]):
            r, J, cols = _bucket_terms(
                spec, bspec, res, flags, runtime, state, data, True
            )
            s = jnp.sum(r * r, axis=-1)
            if flags["loss"]:
                c = data["huber_c"]
                rho_p = _huber_prime(s, c)
                cost = cost + 0.5 * jnp.sum(_huber(s, c))
            else:
                rho_p = jnp.ones_like(s)
                cost = cost + 0.5 * jnp.sum(s)
            if ASSEMBLY == "dense":
                # Scatter each row's local block into a dense [rdim, P] row
                # Jacobian (unique-per-row small scatter), then assemble H/g
                # with one large MXU matmul. Duplicate column ids within a
                # row (overlapping ref/obs knot windows) accumulate via add.
                sq = jnp.sqrt(rho_p)
                Jw = J * sq[:, None, None]
                rw = r * sq[:, None]
                rdim = r.shape[1]

                def to_dense(Jm, cm):
                    return jnp.zeros((rdim, P), Jm.dtype).at[:, cm].add(Jm)

                Jd = jax.vmap(to_dense)(Jw, cols).reshape(-1, P)
                H = H + Jd.T @ Jd
                g = g + Jd.T @ rw.reshape(-1)
            else:
                JTJ = jnp.einsum("mri,mrj->mij", J, J)
                JTr = jnp.einsum("mri,mr->mi", J, r)
                H = H.at[cols[:, :, None], cols[:, None, :]].add(
                    rho_p[:, None, None] * JTJ
                )
                g = g.at[cols].add(rho_p[:, None] * JTr)
        # Lock masking post-assembly (O(P^2) elementwise) instead of the
        # per-row [M, C] gather mask[cols] — identical for 0/1 masks
        # ((J diag(m))^T (J diag(m)) = m m^T ∘ J^T J) and removes the
        # dominant gather from the dense-assembly step (see schur.py).
        mask = runtime["mask"]
        H = H * (mask[:, None] * mask[None, :])
        g = g * mask
        return cost, H, g

    def retract(runtime, state, delta):
        return _retract_state(spec, runtime, state, delta)

    def _solve_from_lin(runtime, state, H, g, lam):
        mask = runtime["mask"]
        L = spec.num_landmarks
        if L:
            # bound active set: freeze rho=0 landmarks with outward
            # gradient (zero their H row/col like a locked parameter)
            lo = spec.landmark_offset
            g_l = jax.lax.dynamic_slice(g, (lo,), (L,))
            free = landmark_free_mask(state["rho"], g_l, jnp.ones_like(g_l))
            f_full = jax.lax.dynamic_update_slice(
                jnp.ones_like(g), free, (lo,)
            )
            H = H * f_full[:, None] * f_full[None, :]
            g = g * f_full
            mask = mask * f_full
        delta = damped_solve(mask, H, g, lam)
        delta = project_delta(spec, runtime, state, delta)
        pred = -(g @ delta + 0.5 * delta @ (H @ delta))
        grad_max = jnp.max(jnp.abs(g)) if g.shape[0] else jnp.zeros(())
        return delta, pred, grad_max

    def step(runtime, state, lam):
        cost, H, g = linearize(runtime, state)
        delta, pred, grad_max = _solve_from_lin(runtime, state, H, g, lam)
        new_state = retract(runtime, state, delta)
        new_cost = total_cost(runtime, new_state)
        return cost, new_state, new_cost, pred, delta, grad_max

    def step_spec(runtime, state, lin, lam):
        # Speculative-linearization step: the carried ``lin`` is the
        # linearization AT ``state``; the candidate is linearized in full
        # (its cost term doubles as the re-cost, its H/g become the next
        # iteration's linearization on accept) so each LM iteration streams
        # the measurement data ONCE instead of twice (linearize + re-cost).
        cost, H, g = lin
        delta, pred, _ = _solve_from_lin(runtime, state, H, g, lam)
        new_state = retract(runtime, state, delta)
        new_lin = linearize(runtime, new_state)
        return new_state, new_lin, pred

    return dict(
        total_cost=total_cost, linearize=linearize, retract=retract,
        step=step, step_spec=step_spec,
    )


def damped_solve(mask, H, g, lam):
    """LM-damped masked normal-equation solve (Ceres diagonal clamping)."""
    D = jnp.clip(jnp.diag(H), 1e-6, 1e32)
    A = H + lam * jnp.diag(D) + jnp.diag(1.0 - mask)
    return -jnp.linalg.solve(A, g) * mask


def project_delta(spec, runtime, state, delta):
    """Clip bound-constrained tangent components (rho >= 0,
    |d| <= max_time_offset, vt in [0, 1]) to the increment the retraction
    will actually apply.

    LM's predicted reduction must be computed from this *projected* step:
    with a landmark at the rho = 0 bound and its gradient pointing
    outward, the raw step predicts a decrease the projection never
    realizes — the step-quality ratio then stays ~0 and the trust region
    collapses even though the feasible part of the step is good. (Ceres
    handles the same rho bound, static_rscamera_measurement.h:180, inside
    its bounds-aware trust-region step.) Retraction is idempotent under
    this projection, so applying the projected delta is unchanged."""
    S, L, V = spec.num_sensors, spec.num_landmarks, spec.num_vt
    if S:
        off = spec.sensor_offset
        sens = jax.lax.dynamic_slice(
            delta, (off,), (S * SENSOR_TANGENT_DIM,)
        ).reshape(S, SENSOR_TANGENT_DIM)
        d_new = jnp.clip(
            state["d"] + sens[:, 6], -runtime["d_max"], runtime["d_max"]
        )
        sens = sens.at[:, 6].set(d_new - state["d"])
        delta = jax.lax.dynamic_update_slice(delta, sens.reshape(-1), (off,))
    if L:
        dl = jax.lax.dynamic_slice(delta, (spec.landmark_offset,), (L,))
        dl = jnp.maximum(state["rho"] + dl, 0.0) - state["rho"]
        delta = jax.lax.dynamic_update_slice(
            delta, dl, (spec.landmark_offset,)
        )
    if V:
        dv = jax.lax.dynamic_slice(delta, (spec.vt_offset,), (V,))
        dv = jnp.clip(state["vt"] + dv, 0.0, 1.0) - state["vt"]
        delta = jax.lax.dynamic_update_slice(delta, dv, (spec.vt_offset,))
    return delta


def project_dl(state_rho, dl):
    """Landmark-only projection (split Schur paths carry dl separately)."""
    return jnp.maximum(state_rho + dl, 0.0) - state_rho


def landmark_free_mask(state_rho, g_l, mask_l):
    """Bound active set: freeze landmarks sitting at the rho = 0 bound
    whose gradient pushes outward (the unconstrained step would
    immediately be clamped back).

    Without this the LM step keeps spending its quadratic model on the
    clamped direction: the step-quality ratio stays mediocre and the
    solver zigzags along the bound with O(1e-7) cost decreases per
    iteration. Freezing the active landmark for the iteration (exactly
    like a locked parameter) lets the remaining variables take the full
    Newton step — the projected-gradient active-set treatment Ceres
    applies to the same rho bound (static_rscamera_measurement.h:180)."""
    at_bound = state_rho <= 0.0
    outward = g_l > 0.0  # descent direction -g_l points negative
    return mask_l * (1.0 - (at_bound & outward).astype(mask_l.dtype))


@functools.lru_cache(maxsize=None)
def _build_solver(spec: ProblemSpec, x64: bool):
    """Jitted cost / linearize / step / retract for a problem structure."""
    parts = build_parts(spec, x64)
    return (
        jax.jit(parts["total_cost"]),
        jax.jit(parts["linearize"]),
        jax.jit(parts["step"]),
        jax.jit(parts["retract"]),
    )


def _retract_state(spec: ProblemSpec, runtime, state, delta):
    """Apply a masked global tangent step to the state pytree.

    Bound handling mirrors the reference: rho >= 0
    (static_rscamera_measurement.h:180), |d| <= max_time_offset
    (sensors.h:158-160), vt in [0, 1] (lifting_rscamera_measurement.h:199-204)
    — enforced by projection."""
    delta = delta * runtime["mask"]
    new = dict(state)
    for sp in spec.splines:
        td = _TANGENT_DIMS[sp.kind]
        blk = jax.lax.dynamic_slice(delta, (sp.tangent_offset,), (sp.n * td,))
        new[sp.kind] = retract_window(sp.kind, state[sp.kind], blk.reshape(sp.n, td))
    S = spec.num_sensors
    if S:
        sens = jax.lax.dynamic_slice(
            delta, (spec.sensor_offset,), (S * SENSOR_TANGENT_DIM,)
        ).reshape(S, SENSOR_TANGENT_DIM)
        new["q_ct"] = quat.qmul(se3m.so3_exp_quat(sens[:, 0:3]), state["q_ct"])
        new["p_ct"] = state["p_ct"] + sens[:, 3:6]
        new["d"] = jnp.clip(
            state["d"] + sens[:, 6], -runtime["d_max"], runtime["d_max"]
        )
        new["abias"] = state["abias"] + sens[:, 7:10]
        new["gbias"] = state["gbias"] + sens[:, 10:13]
    L = spec.num_landmarks
    if L:
        new["rho"] = jnp.maximum(
            state["rho"] + jax.lax.dynamic_slice(delta, (spec.landmark_offset,), (L,)),
            0.0,
        )
    V = spec.num_vt
    if V:
        new["vt"] = jnp.clip(
            state["vt"] + jax.lax.dynamic_slice(delta, (spec.vt_offset,), (V,)),
            0.0,
            1.0,
        )
    return new


# ---------------------------------------------------------------------------
# public entry points, used by lm.py and benches
# ---------------------------------------------------------------------------

def problem_spec(problem) -> ProblemSpec:
    splines = tuple(
        SplineSpec(sp.kind, sp.n, sp.tangent_offset) for sp in problem.splines
    )
    buckets = []
    for key, b in problem.buckets.items():
        kind = key.split(":")[0]
        windows = tuple(b.window[sp.kind] for sp in problem.splines)
        camera = b.camera_cls.__name__ if b.camera_cls is not None else ""
        M = getattr(b, "M", None)
        if M is None:
            M = len(b.measurements) + sum(len(m) for m, _ in b.batches)
        staged = JAC_STAGED and kind in ("rs_static", "rs_lifting")
        buckets.append(BucketSpec(kind, camera, M, b.rdim, windows, staged))
    return ProblemSpec(
        splines=splines,
        buckets=tuple(buckets),
        num_tangent=problem.num_tangent,
        sensor_offset=problem.sensor_offset,
        landmark_offset=problem.landmark_offset,
        vt_offset=problem.vt_offset,
        num_sensors=len(problem.sensors),
        num_landmarks=len(problem.landmarks),
        num_vt=len(problem._lifting),
    )


def problem_runtime(problem):
    """The traced pytree: everything numerical about the problem."""
    return {
        "mask": problem.mask,
        "d_max": problem.d_max,
        "spline_t0": [jnp.asarray(sp.t0, problem.mask.dtype) for sp in problem.splines],
        "spline_dt": [jnp.asarray(sp.dt, problem.mask.dtype) for sp in problem.splines],
        "data": [dict(b.data) for b in problem.buckets.values()],
    }


def bucket_residuals(problem, state=None):
    """Per-bucket residual vectors through the solver's batched kernels.

    Returns ``{bucket_key: r [M, rdim]}`` (weights applied, robust loss
    NOT applied — the raw residual the object API's ``measurement.error``
    is the oracle for, measurement_helper.h:13-27). Debug/parity surface:
    lets tests pin ``initial_cost == 0.5 * sum huber(|r|^2)`` per bucket
    against object-level evaluation."""
    spec = problem_spec(problem)
    runtime = problem_runtime(problem)
    if state is None:
        state = problem.state0
    out = {}
    for key, bspec, data in zip(
        problem.buckets.keys(), spec.buckets, runtime["data"]
    ):
        res, flags = _make_residual(spec, bspec)
        r = _bucket_terms(spec, bspec, res, flags, runtime, state, data, False)
        out[key] = np.asarray(r)
    return out


def make_functions(problem):
    """(cost_fn(state), linearize_fn(state)) closing over the runtime."""
    import jax as _jax

    spec = problem_spec(problem)
    cost_j, lin_j, _, _ = _build_solver(spec, _jax.config.jax_enable_x64)
    runtime = problem_runtime(problem)
    return (
        lambda state: cost_j(runtime, state),
        lambda state: lin_j(runtime, state),
    )


def make_step(problem):
    """step(state, lam) -> (cost, new_state, new_cost, pred, delta, grad_max),
    compiled once per problem *structure* (cached across Problems)."""
    import jax as _jax

    spec = problem_spec(problem)
    cost_j, _, step_j, _ = _build_solver(spec, _jax.config.jax_enable_x64)
    runtime = problem_runtime(problem)
    return (
        lambda state, lam: step_j(runtime, state, lam),
        lambda state: cost_j(runtime, state),
    )


def retract_state(problem, state, delta):
    """Standalone retraction (used by tests and the fused solver)."""
    spec = problem_spec(problem)
    return _retract_state(spec, problem_runtime(problem), state, delta)
