"""Composed knot-segment x landmark-block sharding: distributed BA.

BASELINE config 5 as specified: "knot-segment + landmark-block sharded
distributed BA" at 10k+ keyframes / 100k+ landmarks. This module composes
the two state-sharding axes that previously existed separately
(`parallel/segments.py` trajectory-only, `parallel/schur.py` landmark-only):

- **Knot axis sharded** in contiguous time segments (sequence parallelism).
  Each device stores only its ``seg`` knots; windows straddling segment
  boundaries read a two-sided halo (left + right) fetched with one
  ``ppermute`` each, and boundary-straddling Gauss-Newton contributions are
  returned to their owner by the reverse permutes. This replaces the
  reference's active-window sparsity (spline_base.h:361-404) at pod scale.
- **Landmark axis sharded by ownership.** Every observation row of a
  landmark shares the landmark's *reference* view (inverse-depth
  parameterization, static_rscamera_measurement.h:21-55), so rows are
  assigned to the device owning the reference window's base knot — which
  automatically co-locates each landmark with *all* of its rows. The
  landmark blocks ``D/g_l`` and the elimination products therefore need no
  cross-device reduction at all.
- **Matrix-free PCG on the reduced system** (Ceres ITERATIVE_SCHUR
  analogue, trajectory_estimator.h:40): the damped Schur complement matvec
  runs on the per-device compressed row Jacobians; the only communication
  per matvec is the two knot-halo permutes, their reverses, and one psum of
  the small sensor border + CG scalars. Per-device memory is
  O(seg knots + L/n landmarks + rows/n) — nothing global but [ns] and
  scalars.

Preconditioner: damped per-knot [td, td] + per-sensor [13, 13] block-Jacobi
(identical structure to ``solver.iterative``), assembled locally with a
halo reduce.

Scope: rs_static camera buckets plus single-window trajectory/IMU buckets,
locked time offsets (static row ownership), all splines on one knot grid.
rs_newton / rs_lifting fall back to the measurement-sharded iterative path.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..solver.iterative import _bucket_layout, duplicate_cross_diag
from ..solver.kernels import (
    SENSOR_TANGENT_DIM,
    _TANGENT_DIMS,
    _bucket_terms,
    _huber,
    _huber_prime,
    _make_residual,
    retract_window,
    problem_runtime,
    problem_spec,
)
from ..math import quaternion as quat
from ..math import se3 as se3m
from . import MEASUREMENT_AXIS

__all__ = ["make_segment_ba_step", "make_segment_ba_solver", "segment_ba_layout"]

_SINGLE_WINDOW = ("position", "orientation", "gyro", "accel")


def segment_ba_layout(problem, n_shards):
    """Static layout for the composed sharding.

    Returns (spec, spec_local, runtime_sharded, lay) where ``runtime_sharded``
    has every bucket's rows reordered by owning shard (padded per shard) and
    landmark ids rewritten to per-shard local slots."""
    spec = problem_spec(problem)
    runtime = problem_runtime(problem)
    kinds = [b.kind.split(":")[0] for b in spec.buckets]
    for k in kinds:
        if k not in _SINGLE_WINDOW + ("rs_static",):
            raise ValueError(
                f"segment BA sharding supports rs_static + trajectory/IMU "
                f"buckets; got {k}"
            )
    mask = np.asarray(problem.mask)
    d0 = np.array([s.time_offset if hasattr(s, "time_offset") else 0.0
                   for s in problem.sensors])
    for i in range(len(problem.sensors)):
        if mask[problem.sensor_offset + i * SENSOR_TANGENT_DIM + 6] != 0.0:
            raise ValueError("segment BA sharding requires locked time offsets")
    grids = {(sp.n, round(float(problem.splines[i].t0), 12),
              round(float(problem.splines[i].dt), 12))
             for i, sp in enumerate(spec.splines)}
    if len(grids) != 1:
        raise ValueError("segment BA sharding requires all splines on one grid")
    nk = spec.splines[0].n
    t0 = float(problem.splines[0].t0)
    dt = float(problem.splines[0].dt)
    W_max = max(max(b.windows) for b in spec.buckets)
    n = n_shards

    # --- row ownership + halo sizing (host-side, offsets locked) ---------
    i_refs = []
    max_dpos = 0  # obs window right of ref window (knots)
    max_dneg = 0
    for bspec, data in zip(spec.buckets, runtime["data"]):
        d = {k: np.asarray(v) for k, v in data.items()}
        if bspec.kind.startswith("rs_"):
            dd = d0[d["sid"]]
            t_ref = d["t0_ref"] + dd + d["v_ref"] * d["readout"] / d["rows"]
            t_obs = d["t0_obs"] + dd + d["v_obs"] * d["readout"] / d["rows"]
            i_ref = np.clip(((t_ref - t0) / dt).astype(np.int64), 0, nk - 4)
            i_obs = np.clip(((t_obs - t0) / dt).astype(np.int64), 0, nk - 4)
            delta = i_obs - i_ref
            if len(delta):
                max_dpos = max(max_dpos, int(delta.max()))
                max_dneg = max(max_dneg, int(-delta.min()))
        else:
            t = d["t"] + (d0[d["sid"]] if "sid" in d else 0.0)
            i_ref = np.clip(((t - t0) / dt).astype(np.int64), 0, nk - 4)
        i_refs.append(i_ref)

    if n == 1:
        Hl = Hr = 0
        seg = nk
    else:
        Hl = max_dneg + W_max
        Hr = max_dpos + W_max
        # the halos are fetched with ONE ppermute hop, so each must fit
        # inside the neighbor's segment
        seg = max(int(math.ceil(nk / n)), W_max, Hl, Hr)
    nk_pad = seg * n
    owners = [np.minimum(i_ref // seg, n - 1) for i_ref in i_refs]

    # --- landmark blocks: owner = owner of the landmark's rows ----------
    L = spec.num_landmarks
    lm_owner = np.zeros(L, dtype=np.int64)
    seen = np.zeros(L, dtype=bool)
    for bspec, data, owner in zip(spec.buckets, runtime["data"], owners):
        if not bspec.kind.startswith("rs_"):
            continue
        lid = np.asarray(data["lid"])
        first = ~seen[lid]
        lm_owner[lid] = np.where(seen[lid], lm_owner[lid], owner)
        seen[lid] = True
        if np.any(lm_owner[lid] != owner):
            raise ValueError("landmark observed from rows on multiple shards")
    lm_owner[~seen] = 0
    counts_l = np.bincount(lm_owner, minlength=n)
    Lb = max(int(counts_l.max()), 1)
    # global landmark id -> (owner, slot); slot assignment in id order
    slot = np.zeros(L, dtype=np.int64)
    for s in range(n):
        ids = np.nonzero(lm_owner == s)[0]
        slot[ids] = np.arange(len(ids))
    lid_to_padded = lm_owner * Lb + slot  # [L] -> index into [n*Lb]

    # --- reindex rows per shard ------------------------------------------
    new_data = []
    new_buckets = []
    for bspec, data, owner in zip(spec.buckets, runtime["data"], owners):
        d = {k: np.asarray(v) for k, v in data.items()}
        counts = np.bincount(owner, minlength=n)
        M_per = max(int(counts.max()), 1)
        idx = np.zeros(n * M_per, dtype=np.int64)
        valid = np.zeros(n * M_per)
        for s in range(n):
            rows = np.nonzero(owner == s)[0]
            idx[s * M_per: s * M_per + len(rows)] = rows
            valid[s * M_per: s * M_per + len(rows)] = 1.0
        d = {k: v[idx] for k, v in d.items()}
        seg_start_t = t0 + (np.arange(n * M_per) // M_per) * seg * dt
        pin_t = seg_start_t + min(W_max + 1, max(seg - 4, 1)) * dt
        if bspec.kind.startswith("rs_"):
            d["t0_ref"] = np.where(valid > 0, d["t0_ref"], pin_t)
            d["t0_obs"] = np.where(valid > 0, d["t0_obs"], pin_t)
            d["v_ref"] = np.where(valid > 0, d["v_ref"], 0.0)
            d["v_obs"] = np.where(valid > 0, d["v_obs"], 0.0)
            d["lid_slot"] = np.where(
                valid > 0, slot[d["lid"]], 0
            ).astype(np.int32)
            # local slot ids replace globals inside the shard program
            d["lid"] = d["lid_slot"]
            del d["lid_slot"]
        else:
            d["t"] = np.where(valid > 0, d["t"], pin_t)
        d["valid"] = valid.astype(mask.dtype)
        new_data.append({k: jnp.asarray(v) for k, v in d.items()})
        new_buckets.append(bspec._replace(M=n * M_per))

    # local spec: per-device knot arrays are [Hl + seg + Hr] long, landmark
    # table is the local block [Lb]
    nloc = Hl + seg + Hr
    loc_splines = []
    off = 0
    for sp in spec.splines:
        loc_splines.append(sp._replace(n=nloc, tangent_offset=off))
        off += nloc * _TANGENT_DIMS[sp.kind]
    Pk_loc = off
    spec_local = spec._replace(
        splines=tuple(loc_splines),
        buckets=tuple(new_buckets),
        num_landmarks=Lb,
    )
    runtime["data"] = new_data

    # landmark mask, permuted into padded slots
    mask_l = np.zeros(n * Lb, dtype=mask.dtype)
    if L:
        mask_l[lid_to_padded] = mask[
            spec.landmark_offset: spec.landmark_offset + L
        ]
    # knot tangent mask, padded to nk_pad (pad knots are locked)
    kmask = []
    for sp in spec.splines:
        td = _TANGENT_DIMS[sp.kind]
        m = mask[sp.tangent_offset: sp.tangent_offset + nk * td]
        kmask.append(
            np.concatenate([m, np.zeros((nk_pad - nk) * td, mask.dtype)])
            .reshape(nk_pad, td)
        )
    ns = len(problem.sensors) * SENSOR_TANGENT_DIM
    mask_sen = mask[spec.sensor_offset: spec.sensor_offset + ns]

    lay = dict(
        nk=nk, nk_pad=nk_pad, seg=seg, Hl=Hl, Hr=Hr, n=n, Lb=Lb, L=L,
        t0=t0, dt=dt, Pk_loc=Pk_loc, ns=ns, nloc=nloc,
        lid_to_padded=lid_to_padded,
        mask_l=jnp.asarray(mask_l), mask_sen=jnp.asarray(mask_sen),
        kmask=[jnp.asarray(m) for m in kmask],
        W_max=W_max,
    )
    return spec, spec_local, runtime, lay


def _build_segment_ba(problem, mesh, cg_tol, cg_maxiter):
    n = mesh.devices.size
    spec, spec_local, runtime, lay = segment_ba_layout(problem, n)
    residuals = [_make_residual(spec_local, b) for b in spec_local.buckets]
    layouts = [
        _bucket_layout(spec_local, b, r[1])
        for b, r in zip(spec_local.buckets, residuals)
    ]
    seg, Hl, Hr, nloc = lay["seg"], lay["Hl"], lay["Hr"], lay["nloc"]
    Lb, Pk_loc, ns = lay["Lb"], lay["Pk_loc"], lay["ns"]
    tds = [_TANGENT_DIMS[sp.kind] for sp in spec.splines]
    Pown = seg * sum(tds)
    dtype = np.asarray(problem.mask).dtype
    S = len(problem.sensors)

    # owned-vector layout: per-spline [seg*td] slices then nothing else
    own_off = np.concatenate([[0], np.cumsum([seg * td for td in tds])])
    loc_off = np.concatenate([[0], np.cumsum([nloc * td for td in tds])])

    to_left = [(i, (i - 1) % n) for i in range(n)]   # send to left neighbor
    to_right = [(i, (i + 1) % n) for i in range(n)]  # send to right neighbor

    def _halo_fill(x_own):
        """[Pown] owned knot tangents -> [Pk_loc] with halos filled."""
        parts = []
        for si, td in enumerate(tds):
            xo = x_own[own_off[si]: own_off[si + 1]]
            if Hl or Hr:
                left = jax.lax.ppermute(
                    xo[(seg - Hl) * td:], MEASUREMENT_AXIS, to_right
                ) if Hl else xo[:0]
                right = jax.lax.ppermute(
                    xo[: Hr * td], MEASUREMENT_AXIS, to_left
                ) if Hr else xo[:0]
                parts.append(jnp.concatenate([left, xo, right]))
            else:
                parts.append(xo)
        return jnp.concatenate(parts)

    def _halo_reduce(y_loc):
        """[Pk_loc] local scatter result -> [Pown] with halo contributions
        returned to their owners."""
        parts = []
        for si, td in enumerate(tds):
            yl = y_loc[loc_off[si]: loc_off[si + 1]]
            core = yl[Hl * td: (Hl + seg) * td]
            if Hl:
                from_right = jax.lax.ppermute(
                    yl[: Hl * td], MEASUREMENT_AXIS, to_left
                )
                core = core.at[(seg - Hl) * td:].add(from_right)
            if Hr:
                from_left = jax.lax.ppermute(
                    yl[(Hl + seg) * td:], MEASUREMENT_AXIS, to_right
                )
                core = core.at[: Hr * td].add(from_left)
            parts.append(core)
        return jnp.concatenate(parts)

    def _halo_state(state):
        """Extend sharded knot arrays with both halos (ppermute per spline)."""
        out = dict(state)
        for sp in spec.splines:
            local = state[sp.kind]  # [seg, D] inside shard_map
            pieces = []
            if Hl:
                pieces.append(jax.lax.ppermute(
                    local[seg - Hl:], MEASUREMENT_AXIS, to_right))
            pieces.append(local)
            if Hr:
                pieces.append(jax.lax.ppermute(
                    local[:Hr], MEASUREMENT_AXIS, to_left))
            out[sp.kind] = jnp.concatenate(pieces, axis=0) if len(pieces) > 1 else local
        return out

    def _local_runtime(rt):
        s = jax.lax.axis_index(MEASUREMENT_AXIS)
        rt = dict(rt)
        shift = (s * seg - Hl).astype(dtype)
        rt["spline_t0"] = [
            t0_ + shift * dt_ for t0_, dt_ in zip(rt["spline_t0"], rt["spline_dt"])
        ]
        return rt

    def _own_mask():
        s = jax.lax.axis_index(MEASUREMENT_AXIS)
        parts = []
        for si, sp in enumerate(spec.splines):
            km = jax.lax.dynamic_slice(
                lay["kmask"][si],
                ((s * seg).astype(jnp.int32), jnp.zeros((), jnp.int32)),
                (seg, tds[si]),
            )
            parts.append(km.reshape(-1))
        return jnp.concatenate(parts)

    def _own_mask_l():
        s = jax.lax.axis_index(MEASUREMENT_AXIS)
        return jax.lax.dynamic_slice(
            lay["mask_l"], ((s * Lb).astype(jnp.int32),), (Lb,)
        )

    # column remap: window positions index the local knot tangent space
    # as-is; sensor positions move to [Pk_loc, Pk_loc + ns)
    col_shift = []
    for layout in layouts:
        shift = np.zeros(layout.C, np.int32)
        if layout.sensor_off >= 0:
            shift[layout.sensor_off: layout.sensor_off + SENSOR_TANGENT_DIM] = (
                Pk_loc - spec_local.sensor_offset
            )
        if layout.C > (layout.sensor_off + SENSOR_TANGENT_DIM
                       if layout.sensor_off >= 0 else 0):
            pass  # vt columns never appear (rs_lifting unsupported here)
        col_shift.append(jnp.asarray(shift))

    def _linearize_local(rt, state):
        """Per-device compressed linearization.

        Returns (cost, blocks, g_own, g_sen, diag_own, diag_sen, D, g_l,
        kblocks, sblocks)."""
        rt_l = _local_runtime(rt)
        st = _halo_state(state)
        mask_own = _own_mask()
        mask_loc = _halo_fill(mask_own)
        mask_cat = jnp.concatenate([mask_loc, lay["mask_sen"]])
        mask_l = _own_mask_l()

        cost = jnp.zeros((), dtype)
        blocks = []
        for bi, (bspec, (res, flags), data) in enumerate(
            zip(spec_local.buckets, residuals, rt_l["data"])
        ):
            out = _bucket_terms(
                spec_local, bspec, res, flags, rt_l, st, data, True,
                split_rho=flags["rho"],
            )
            if flags["rho"]:
                r, J, cols, J_rho = out
            else:
                r, J, cols = out
                J_rho = None
            s2 = jnp.sum(r * r, axis=-1)
            if flags["loss"]:
                c = data["huber_c"]
                rho_p = _huber_prime(s2, c)
                cost = cost + 0.5 * jnp.sum(_huber(s2, c))
            else:
                rho_p = jnp.ones_like(s2)
                cost = cost + 0.5 * jnp.sum(s2)
            cols_m = cols + col_shift[bi][None, :]
            sq = jnp.sqrt(rho_p)
            Jw = J * mask_cat[cols_m][:, None, :] * sq[:, None, None]
            rw = r * sq[:, None]
            blk = {"rw": rw, "Jw": Jw, "cols": cols_m}
            if J_rho is not None:
                blk["J_rho"] = J_rho * sq[:, None] * mask_l[data["lid"]][:, None]
                blk["lid"] = data["lid"]
            blocks.append(blk)
        cost = jax.lax.psum(cost, MEASUREMENT_AXIS)

        # gradient + duplicate-aware diagonal over [Pk_loc + ns]
        g_cat = jnp.zeros((Pk_loc + ns,), dtype)
        diag_cat = jnp.zeros((Pk_loc + ns,), dtype)
        D = jnp.zeros((Lb,), dtype)
        g_l = jnp.zeros((Lb,), dtype)
        for blk, layout in zip(blocks, layouts):
            g_cat = g_cat.at[blk["cols"]].add(
                jnp.einsum("mrc,mr->mc", blk["Jw"], blk["rw"])
            )
            diag_cat = diag_cat.at[blk["cols"]].add(
                jnp.sum(blk["Jw"] ** 2, axis=1)
                + duplicate_cross_diag(blk, layout, dtype)
            )
            if "J_rho" in blk:
                D = D.at[blk["lid"]].add(jnp.sum(blk["J_rho"] ** 2, axis=1))
                g_l = g_l.at[blk["lid"]].add(
                    jnp.sum(blk["J_rho"] * blk["rw"], axis=1)
                )
        g_own = _halo_reduce(g_cat[:Pk_loc])
        diag_own = _halo_reduce(diag_cat[:Pk_loc])
        g_sen = jax.lax.psum(g_cat[Pk_loc:], MEASUREMENT_AXIS)
        diag_sen = jax.lax.psum(diag_cat[Pk_loc:], MEASUREMENT_AXIS)

        # block-Jacobi preconditioner blocks (per local knot, halo-reduced)
        kblocks = []
        for si, sp in enumerate(spec.splines):
            td = tds[si]
            kb = jnp.zeros((nloc, td, td), dtype)
            for blk, layout in zip(blocks, layouts):
                Jw, cols = blk["Jw"], blk["cols"]
                for off, sj, W, tdj in layout.windows:
                    if sj != si:
                        continue
                    Jwin = Jw[:, :, off:off + W * tdj].reshape(
                        Jw.shape[0], Jw.shape[1], W, tdj
                    )
                    contrib = jnp.einsum("mrwd,mrwe->mwde", Jwin, Jwin)
                    kidx = (cols[:, off] - loc_off[si]) // tdj
                    kidx = kidx[:, None] + jnp.arange(W)[None, :]
                    kb = kb.at[kidx].add(contrib)
            flat = _halo_reduce_blocks(kb.reshape(nloc, td * td), si)
            kblocks.append(flat.reshape(seg, td, td))
        sblocks = jnp.zeros((max(S, 1), SENSOR_TANGENT_DIM, SENSOR_TANGENT_DIM), dtype)
        for blk, layout in zip(blocks, layouts):
            if layout.sensor_off < 0:
                continue
            so = layout.sensor_off
            Js = blk["Jw"][:, :, so:so + SENSOR_TANGENT_DIM]
            contrib = jnp.einsum("mrd,mre->mde", Js, Js)
            sid = (blk["cols"][:, so] - Pk_loc) // SENSOR_TANGENT_DIM
            sblocks = sblocks.at[sid].add(contrib)
        sblocks = jax.lax.psum(sblocks, MEASUREMENT_AXIS)
        return (cost, blocks, g_own, g_sen, diag_own, diag_sen, D, g_l,
                kblocks, sblocks)

    def _halo_reduce_blocks(flat, si):
        """[nloc, k] per-knot quantities -> [seg, k] with halo rows returned."""
        td_k = flat.shape[1]
        core = flat[Hl: Hl + seg]
        if Hl:
            from_right = jax.lax.ppermute(flat[:Hl], MEASUREMENT_AXIS, to_left)
            core = core.at[seg - Hl:].add(from_right)
        if Hr:
            from_left = jax.lax.ppermute(
                flat[Hl + seg:], MEASUREMENT_AXIS, to_right
            )
            core = core.at[:Hr].add(from_left)
        return core

    # ---- matvecs ---------------------------------------------------------

    def _rows_matvec(blocks, x_own, x_sen, w_l=None, D_d=None):
        """y = A_cc x  (minus E^T D^-1 E x when D_d given): the Schur-
        complement matvec on compressed rows with halo exchange."""
        x_loc = _halo_fill(x_own)
        x_cat = jnp.concatenate([x_loc, x_sen])
        y_cat = jnp.zeros_like(x_cat)
        Ex = jnp.zeros((Lb,), dtype)
        ts = []
        for blk in blocks:
            t = jnp.einsum("mrc,mc->mr", blk["Jw"], x_cat[blk["cols"]])
            ts.append(t)
            if D_d is not None and "J_rho" in blk:
                Ex = Ex.at[blk["lid"]].add(jnp.sum(blk["J_rho"] * t, axis=1))
        if D_d is not None:
            w = Ex / D_d
        for blk, t in zip(blocks, ts):
            if D_d is not None and "J_rho" in blk:
                t = t - blk["J_rho"] * w[blk["lid"]][:, None]
            y_cat = y_cat.at[blk["cols"]].add(
                jnp.einsum("mrc,mr->mc", blk["Jw"], t)
            )
        y_own = _halo_reduce(y_cat[:Pk_loc])
        y_sen = jax.lax.psum(y_cat[Pk_loc:], MEASUREMENT_AXIS)
        return y_own, y_sen

    def _e_matvec(blocks, x_own, x_sen):
        """E x -> [Lb] (local: all of a landmark's rows live here)."""
        x_cat = jnp.concatenate([_halo_fill(x_own), x_sen])
        Ex = jnp.zeros((Lb,), dtype)
        for blk in blocks:
            if "J_rho" not in blk:
                continue
            t = jnp.einsum("mrc,mc->mr", blk["Jw"], x_cat[blk["cols"]])
            Ex = Ex.at[blk["lid"]].add(jnp.sum(blk["J_rho"] * t, axis=1))
        return Ex

    def _et_matvec(blocks, w_l):
        """E^T w -> owned + sensor."""
        y_cat = jnp.zeros((Pk_loc + ns,), dtype)
        for blk in blocks:
            if "J_rho" not in blk:
                continue
            coeff = blk["J_rho"] * w_l[blk["lid"]][:, None]
            y_cat = y_cat.at[blk["cols"]].add(
                jnp.einsum("mr,mrc->mc", coeff, blk["Jw"])
            )
        return _halo_reduce(y_cat[:Pk_loc]), jax.lax.psum(
            y_cat[Pk_loc:], MEASUREMENT_AXIS
        )

    def _pdot(a, b):
        """Distributed dot over (owned knots, sensor) vector pairs."""
        a_own, a_sen = a
        b_own, b_sen = b
        local = jnp.dot(a_own, b_own)
        total = jax.lax.psum(local, MEASUREMENT_AXIS)
        return total + jnp.dot(a_sen, b_sen)

    def _precond_apply(kblocks, sblocks, diag_dk, diag_ds, r_own, r_sen):
        out_parts = []
        for si, td in enumerate(tds):
            rk = r_own[own_off[si]: own_off[si + 1]].reshape(seg, td)
            dk = diag_dk[own_off[si]: own_off[si + 1]].reshape(seg, td)
            B = kblocks[si] + jax.vmap(jnp.diag)(dk)
            sol = jnp.linalg.solve(B, rk[..., None])[..., 0]
            out_parts.append(sol.reshape(-1))
        out_own = jnp.concatenate(out_parts)
        if S:
            rk = r_sen.reshape(S, SENSOR_TANGENT_DIM)
            dk = diag_ds.reshape(S, SENSOR_TANGENT_DIM)
            B = sblocks[:S] + jax.vmap(jnp.diag)(dk)
            out_sen = jnp.linalg.solve(B, rk[..., None])[..., 0].reshape(-1)
        else:
            out_sen = r_sen
        return out_own, out_sen

    # ---- damped PCG solve + LM step --------------------------------------

    def _solve(blocks, lin, lam):
        (cost, _, g_own, g_sen, diag_own, diag_sen, D, g_l,
         kblocks, sblocks) = lin
        mask_own = _own_mask()
        mask_l = _own_mask_l()
        diag_dk = lam * jnp.clip(diag_own, 1e-6, 1e32) + (1.0 - mask_own)
        diag_ds = lam * jnp.clip(diag_sen, 1e-6, 1e32) + (1.0 - lay["mask_sen"])
        D_d = D + lam * jnp.clip(D, 1e-6, 1e32) + (1.0 - mask_l)

        rhs_own, rhs_sen = _et_matvec(blocks, g_l / D_d)
        rhs = (rhs_own - g_own, rhs_sen - g_sen)

        def matvec(x):
            x_own, x_sen = x
            y_own, y_sen = _rows_matvec(blocks, x_own, x_sen, D_d=D_d)
            return (y_own + diag_dk * x_own, y_sen + diag_ds * x_sen)

        def precond(r):
            return _precond_apply(kblocks, sblocks, diag_dk, diag_ds, *r)

        x0 = (jnp.zeros_like(rhs[0]), jnp.zeros_like(rhs[1]))
        r0 = rhs
        z0 = precond(r0)
        bnorm2 = _pdot(rhs, rhs)
        thresh2 = (cg_tol * cg_tol) * bnorm2

        def cond(carry):
            x, r, z, p, rz, k = carry
            return (k < cg_maxiter) & (_pdot(r, r) > thresh2)

        def body(carry):
            x, r, z, p, rz, k = carry
            Ap = matvec(p)
            pAp = _pdot(p, Ap)
            alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
            x = jax.tree_util.tree_map(lambda a, b: a + alpha * b, x, p)
            r = jax.tree_util.tree_map(lambda a, b: a - alpha * b, r, Ap)
            z = precond(r)
            rz_new = _pdot(r, z)
            beta = rz_new / jnp.where(rz == 0, 1.0, rz)
            p = jax.tree_util.tree_map(lambda a, b: a + beta * b, z, p)
            return (x, r, z, p, rz_new, k + 1)

        carry = (x0, r0, z0, z0, _pdot(r0, z0), jnp.asarray(0))
        (dc, _, _, _, _, k) = jax.lax.while_loop(cond, body, carry)
        dc = (dc[0] * mask_own, dc[1] * lay["mask_sen"])
        dl = -(g_l + _e_matvec(blocks, *dc)) / D_d * mask_l

        # pred + grad_max (landmark dots are over local blocks -> psum)
        lm_dot = jax.lax.psum(jnp.dot(g_l, dl), MEASUREMENT_AXIS)
        gTd = _pdot((g_own, g_sen), dc) + lm_dot
        H_own, H_sen = _rows_matvec(blocks, dc[0], dc[1])
        dHd = _pdot(dc, (H_own, H_sen))
        Edc = _e_matvec(blocks, *dc)
        dHd = dHd + jax.lax.psum(
            2.0 * jnp.dot(dl, Edc) + jnp.dot(dl, D * dl), MEASUREMENT_AXIS
        )
        pred = -(gTd + 0.5 * dHd)
        gmax_own = jax.lax.pmax(
            jnp.max(jnp.abs(g_own)) if Pown else jnp.zeros((), dtype),
            MEASUREMENT_AXIS,
        )
        gmax_l = jax.lax.pmax(
            jnp.max(jnp.abs(g_l)) if Lb else jnp.zeros((), dtype),
            MEASUREMENT_AXIS,
        )
        gmax = jnp.maximum(jnp.maximum(gmax_own, gmax_l),
                           jnp.max(jnp.abs(g_sen)) if ns else 0.0)
        return dc, dl, pred, gmax

    def _retract_local(state, dc, dl):
        dc_own, dc_sen = dc
        new = dict(state)
        for si, sp in enumerate(spec.splines):
            td = tds[si]
            blk = dc_own[own_off[si]: own_off[si + 1]].reshape(seg, td)
            new[sp.kind] = retract_window(sp.kind, state[sp.kind], blk)
        if S:
            sens = dc_sen.reshape(S, SENSOR_TANGENT_DIM)
            new["q_ct"] = quat.qmul(se3m.so3_exp_quat(sens[:, 0:3]), state["q_ct"])
            new["p_ct"] = state["p_ct"] + sens[:, 3:6]
            new["d"] = jnp.clip(
                state["d"] + sens[:, 6], -lay_dmax, lay_dmax
            )
            new["abias"] = state["abias"] + sens[:, 7:10]
            new["gbias"] = state["gbias"] + sens[:, 10:13]
        new["rho"] = jnp.maximum(state["rho"] + dl, 0.0)
        return new

    lay_dmax = jnp.asarray(np.asarray(problem.d_max), dtype)

    def _cost_local(rt, state):
        rt_l = _local_runtime(rt)
        st = _halo_state(state)
        cost = jnp.zeros((), dtype)
        for bspec, (res, flags), data in zip(
            spec_local.buckets, residuals, rt_l["data"]
        ):
            r = _bucket_terms(spec_local, bspec, res, flags, rt_l, st, data, False)
            s2 = jnp.sum(r * r, axis=-1)
            if flags["loss"]:
                cost = cost + 0.5 * jnp.sum(_huber(s2, data["huber_c"]))
            else:
                cost = cost + 0.5 * jnp.sum(s2)
        return jax.lax.psum(cost, MEASUREMENT_AXIS)

    def _step_local(rt, state, lam):
        lin = _linearize_local(rt, state)
        cost, blocks = lin[0], lin[1]
        dc, dl, pred, gmax = _solve(blocks, lin, lam)
        new_state = _retract_local(state, dc, dl)
        new_cost = _cost_local(rt, new_state)
        return cost, new_state, new_cost, pred, (dc, dl), gmax

    # ---- sharding setup ---------------------------------------------------
    rt_specs = jax.tree_util.tree_map(lambda _: P(), runtime)
    rt_specs["data"] = [
        {k: P(MEASUREMENT_AXIS) for k in d} for d in runtime["data"]
    ]
    runtime_p = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), runtime, rt_specs
    )

    st_specs = {k: P() for k in problem.state0}
    for sp in spec.splines:
        st_specs[sp.kind] = P(MEASUREMENT_AXIS)
    st_specs["rho"] = P(MEASUREMENT_AXIS)

    nk, nk_pad, L = lay["nk"], lay["nk_pad"], lay["L"]
    lid_to_padded = jnp.asarray(lay["lid_to_padded"])

    def _to_sharded(state):
        st = dict(state)
        for sp in spec.splines:
            arr = state[sp.kind]
            pad = nk_pad - arr.shape[0]
            if pad:
                st[sp.kind] = jnp.concatenate(
                    [arr, jnp.repeat(arr[-1:], pad, axis=0)], axis=0
                )
        rho_p = jnp.zeros((n * Lb,), state["rho"].dtype)
        if L:
            rho_p = rho_p.at[lid_to_padded].set(state["rho"])
        st["rho"] = rho_p
        return {
            k: jax.lax.with_sharding_constraint(v, NamedSharding(mesh, st_specs[k]))
            for k, v in st.items()
        }

    def _to_global(st):
        out = dict(st)
        for sp in spec.splines:
            out[sp.kind] = st[sp.kind][:nk]
        out["rho"] = st["rho"][lid_to_padded] if L else st["rho"][:0]
        return out

    return dict(
        spec=spec, lay=lay, runtime=runtime_p, rt_specs=rt_specs,
        st_specs=st_specs, step_local=_step_local, cost_local=_cost_local,
        to_sharded=_to_sharded, to_global=_to_global, mesh=mesh,
    )


def make_segment_ba_step(problem, mesh, cg_tol=1e-10, cg_maxiter=500):
    """step(state, lam) with knot-segment x landmark-block sharding.

    Contract matches ``kernels.make_step`` minus the dense delta (the delta
    slot returns the (sharded knots, sensor) tangent pair and landmark
    increments are applied in-place): returns (cost, new_state(global),
    new_cost, pred, grad_max)."""
    b = _build_segment_ba(problem, mesh, cg_tol, cg_maxiter)
    out_state_specs = dict(b["st_specs"])

    step_sm = jax.shard_map(
        lambda rt, st, lam: _drop_delta(b["step_local"](rt, st, lam)),
        mesh=b["mesh"],
        in_specs=(b["rt_specs"], b["st_specs"], P()),
        out_specs=(P(), out_state_specs, P(), P(), P()),
        check_vma=False,
    )
    cost_sm = jax.shard_map(
        b["cost_local"], mesh=b["mesh"],
        in_specs=(b["rt_specs"], b["st_specs"]), out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def step(state, lam):
        st = b["to_sharded"](state)
        cost, new_st, new_cost, pred, gmax = step_sm(b["runtime"], st, lam)
        return cost, b["to_global"](new_st), new_cost, pred, gmax

    @jax.jit
    def total_cost(state):
        return cost_sm(b["runtime"], b["to_sharded"](state))

    return step, total_cost


def _drop_delta(out):
    cost, new_state, new_cost, pred, delta, gmax = out
    return cost, new_state, new_cost, pred, gmax


def make_segment_ba_solver(problem, mesh, max_iterations=50,
                           function_tolerance=1e-6, cg_tol=1e-6,
                           cg_maxiter=200):
    """Fully on-device LM with the composed segment x landmark sharding:
    the entire trust-region loop runs inside one shard_map program; state
    stays sharded across iterations (knots by segment, landmarks by block).
    Returns state -> (state, final_cost, iterations)."""
    from ..solver.lm import trust_region_loop

    b = _build_segment_ba(problem, mesh, cg_tol, cg_maxiter)

    def lm_loop(rt, state):
        def one_step(st, lam):
            cost, new_st, new_cost, pred, delta, gmax = b["step_local"](
                rt, st, lam
            )
            return cost, new_st, new_cost, pred

        cost0 = b["cost_local"](rt, state)
        return trust_region_loop(
            one_step, cost0, state,
            max_iterations=max_iterations,
            function_tolerance=function_tolerance,
            dtype=cost0.dtype,
        )

    solve_sm = jax.shard_map(
        lm_loop, mesh=b["mesh"],
        in_specs=(b["rt_specs"], b["st_specs"]),
        out_specs=(b["st_specs"], P(), P()),
        check_vma=False,
    )

    @jax.jit
    def solve_fn(state):
        st = b["to_sharded"](state)
        st, cost, it = solve_sm(b["runtime"], st)
        return b["to_global"](st), cost, it

    return solve_fn
