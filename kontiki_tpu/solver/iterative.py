"""Iterative Schur: matrix-free PCG on the reduced camera/trajectory system.

The exact Schur path (:mod:`.schur`) still materializes the dense reduced
Hessian ``H_cc [Pc, Pc]`` and the landmark coupling ``E [L, Pc]``. At the
BASELINE config-5 scale (10k+ keyframes, 100k+ landmarks, thousands of
knots) neither fits anywhere. This module is the Ceres ITERATIVE_SCHUR
analogue: the damped reduced system

    S dc = rhs,   S = A_cc - E^T D^-1 E,   rhs = E^T D^-1 g_l - g_c

is solved by preconditioned conjugate gradients with *matrix-free* matvecs.
Linearization keeps each measurement's local Jacobian in compressed form —
``Jw [M, rdim, C]`` over its ``C`` touched tangent columns plus the column
index map ``cols [M, C]`` and the landmark column ``J_rho [M, rdim]`` —
exactly the block structure Ceres stores in its BlockSparseMatrix. One
matvec is then two batched einsums and a scatter-add per bucket:

    A_cc x = sum_rows Jw^T (Jw x[cols])           (gather, MXU, scatter)
    E x    = segment_sum(J_rho . (Jw x[cols]))    ([L] vector)
    E^T w  = sum_rows Jw^T (J_rho * w[lid])

The only global objects are [Pc] and [L] *vectors* — memory is
O(sum_M rdim * C) for the compressed Jacobian, nothing quadratic.

Preconditioner: block-Jacobi over per-knot [td, td] and per-sensor [13, 13]
diagonal blocks of the damped A_cc (Ceres's JACOBI preconditioner for
ITERATIVE_SCHUR), assembled by the same scatter-add at linearize time.

Multi-chip: with ``axis_name`` set, every global reduction (cost, g_c,
diag, D, g_l, matvec scatter results, CG dot products' operands) is
psum-reduced over the measurement mesh axis; rows may live on any device
(no landmark grouping needed — per-landmark sums ride the same psum).
Reference: trajectory_estimator.h:38-50 (always-Schur solver choice);
SURVEY §2.10.3, §7 hard-parts list (banded/iterative reduced system).
"""
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .kernels import (
    SENSOR_TANGENT_DIM,
    landmark_free_mask,
    project_dl,
    _TANGENT_DIMS,
    _bucket_terms,
    _huber,
    _huber_prime,
    _make_residual,
    _retract_state,
    problem_runtime,
    problem_spec,
)


class _BucketLayout(NamedTuple):
    """Static C-axis layout of one bucket's flattened local Jacobian:
    for each (tag, spline) window a (col_offset, spline_index, W, td) entry,
    then the sensor slot offset (or -1)."""
    windows: Tuple[Tuple[int, int, int, int], ...]
    sensor_off: int
    C: int


def _bucket_layout(spec, bspec, flags) -> _BucketLayout:
    # The staged camera path differentiates (and emits columns for) only
    # the active 4-knot window; all other paths use the bucket's full
    # readout-slack window width. ``staged`` is snapshotted on the spec so
    # this layout can never desync from the Jacobian width _bucket_terms
    # emits (both are keyed on the same hashed BucketSpec).
    staged = bspec.staged
    off = 0
    wins = []
    for tag in flags["tags"]:
        for si, sp in enumerate(spec.splines):
            W = 4 if staged else bspec.windows[si]
            td = _TANGENT_DIMS[sp.kind]
            wins.append((off, si, W, td))
            off += W * td
    sensor_off = -1
    if flags["sensor"]:
        sensor_off = off
        off += SENSOR_TANGENT_DIM
    if flags["vt"]:
        off += 1
    return _BucketLayout(tuple(wins), sensor_off, off)


def duplicate_cross_diag(blk, layout, dtype):
    """Extra diagonal mass from duplicate column ids within a row.

    ``diag(H)[c]`` must square the *sum* of a row's entries that share a
    column id. Duplicates only arise between the ref- and obs-window blocks
    of camera buckets (the two knot windows can alias); within one window,
    and for sensor/vt columns, ids are unique. Each window is a contiguous
    id range, so the aliasing is a per-row *shift*: obs col ``j`` matches
    ref col ``j + (base_obs - base_ref)``. Returns [M, C] additive
    contributions aligned with ``blk['cols']`` (the 2ab cross terms placed
    at the obs columns) — O(M*C) instead of the naive [M, C, C] mask."""
    Jw, cols = blk["Jw"], blk["cols"]
    M, rdim, C = Jw.shape
    out = jnp.zeros((M, C), dtype)
    by_si = {}
    for w in layout.windows:
        by_si.setdefault(w[1], []).append(w)
    for si, ws in by_si.items():
        if len(ws) != 2:
            continue
        (off_r, _, Wr, td), (off_o, _, Wo, _) = ws
        nr, no = Wr * td, Wo * td
        shift = cols[:, off_o] - cols[:, off_r]  # [M] id offset
        idx = jnp.arange(no, dtype=shift.dtype)[None, :] + shift[:, None]
        ok = (idx >= 0) & (idx < nr)
        idxc = jnp.clip(idx, 0, nr - 1)
        Jr = jnp.take_along_axis(
            Jw[:, :, off_r:off_r + nr], idxc[:, None, :], axis=2
        )
        Jo = Jw[:, :, off_o:off_o + no]
        cross = 2.0 * jnp.sum(Jr * Jo, axis=1) * ok.astype(dtype)
        out = out.at[:, off_o:off_o + no].add(cross)
    return out


@functools.lru_cache(maxsize=None)
def build_iterative_parts(spec, x64: bool, axis_name: Optional[str] = None):
    """Raw solver functions for the matrix-free iterative-Schur path.

    Contract mirrors ``kernels.build_parts``/``schur.build_schur_parts``:
    ``total_cost``, ``linearize`` (returns the compressed block pytree),
    ``retract``, and ``step(runtime, state, lam, cg_tol, cg_maxiter)``."""
    residuals = [_make_residual(spec, b) for b in spec.buckets]
    layouts = [
        _bucket_layout(spec, b, r[1]) for b, r in zip(spec.buckets, residuals)
    ]
    L = spec.num_landmarks
    P = spec.num_tangent
    Pc = P - L
    lo = spec.landmark_offset

    def _psum(x):
        if axis_name is None:
            return x
        return jax.lax.psum(x, axis_name)

    def split_mask(mask):
        return jnp.concatenate([mask[:lo], mask[lo + L:]]), mask[lo:lo + L]

    def total_cost(runtime, state):
        cost = jnp.zeros((), runtime["mask"].dtype)
        for bspec, (res, flags), data in zip(spec.buckets, residuals, runtime["data"]):
            r = _bucket_terms(spec, bspec, res, flags, runtime, state, data, False)
            s = jnp.sum(r * r, axis=-1)
            if flags["loss"]:
                cost = cost + 0.5 * jnp.sum(_huber(s, data["huber_c"]))
            else:
                cost = cost + 0.5 * jnp.sum(s)
        return _psum(cost)

    def linearize(runtime, state):
        """Compressed linearization.

        Returns (cost, blocks) where blocks is a list of per-bucket dicts
        {rw, Jw, cols, J_rho?, lid?} — whitened, masked, cols remapped to
        the landmark-free c-space."""
        mask_c, mask_l = split_mask(runtime["mask"])
        cost = jnp.zeros((), runtime["mask"].dtype)
        blocks = []
        for bspec, (res, flags), data in zip(spec.buckets, residuals, runtime["data"]):
            out = _bucket_terms(
                spec, bspec, res, flags, runtime, state, data, True, split_rho=True
            )
            r, J, cols = out[0], out[1], out[2]
            J_rho = out[3] if flags["rho"] else None
            s = jnp.sum(r * r, axis=-1)
            if flags["loss"]:
                c = data["huber_c"]
                rho_p = _huber_prime(s, c)
                cost = cost + 0.5 * jnp.sum(_huber(s, c))
            else:
                rho_p = jnp.ones_like(s)
                cost = cost + 0.5 * jnp.sum(s)
            cols_c = jnp.where(cols >= lo, cols - L, cols)
            sq = jnp.sqrt(rho_p)
            Jw = J * mask_c[cols_c][:, None, :] * sq[:, None, None]
            rw = r * sq[:, None]
            blk = {"rw": rw, "Jw": Jw, "cols": cols_c}
            if J_rho is not None:
                blk["J_rho"] = J_rho * sq[:, None] * mask_l[data["lid"]][:, None]
                blk["lid"] = data["lid"]
            blocks.append(blk)
        return _psum(cost), blocks

    # -- global vectors assembled from the compressed blocks ---------------

    def grad_and_diag(blocks, dtype):
        g_c = jnp.zeros((Pc,), dtype)
        diag = jnp.zeros((Pc,), dtype)
        D = jnp.zeros((max(L, 1),), dtype)
        g_l = jnp.zeros((max(L, 1),), dtype)
        for blk, layout in zip(blocks, layouts):
            g_c = g_c.at[blk["cols"]].add(
                jnp.einsum("mrc,mr->mc", blk["Jw"], blk["rw"])
            )
            # diag(H_cc) must account for duplicate column ids within a row
            # (overlapping ref/obs knot windows alias the same knot): the
            # true entry is (sum of duplicates)^2, which the LM damping is
            # proportional to — and along gauge directions the damping alone
            # determines the step, so this must match the dense path exactly.
            diag = diag.at[blk["cols"]].add(
                jnp.sum(blk["Jw"] ** 2, axis=1)
                + duplicate_cross_diag(blk, layout, dtype)
            )
            if "J_rho" in blk:
                D = D.at[blk["lid"]].add(jnp.sum(blk["J_rho"] ** 2, axis=1))
                g_l = g_l.at[blk["lid"]].add(
                    jnp.sum(blk["J_rho"] * blk["rw"], axis=1)
                )
        return _psum((g_c, diag, D[:L], g_l[:L]))

    def hcc_matvec(blocks, x):
        """Undamped A_cc @ x (Gauss-Newton, landmark columns excluded)."""
        y = jnp.zeros_like(x)
        for blk in blocks:
            t = jnp.einsum(
                "mrc,mc->mr", blk["Jw"], x[blk["cols"]]
            )
            y = y.at[blk["cols"]].add(jnp.einsum("mrc,mr->mc", blk["Jw"], t))
        return _psum(y)

    def e_matvec(blocks, x, dtype):
        """E @ x -> [L]."""
        Ex = jnp.zeros((max(L, 1),), dtype)
        for blk in blocks:
            if "J_rho" not in blk:
                continue
            t = jnp.einsum("mrc,mc->mr", blk["Jw"], x[blk["cols"]])
            Ex = Ex.at[blk["lid"]].add(jnp.sum(blk["J_rho"] * t, axis=1))
        return _psum(Ex[:L])

    def et_matvec(blocks, w, dtype):
        """E^T @ w -> [Pc]."""
        y = jnp.zeros((Pc,), dtype)
        for blk in blocks:
            if "J_rho" not in blk:
                continue
            coeff = blk["J_rho"] * w[blk["lid"]][:, None]
            y = y.at[blk["cols"]].add(jnp.einsum("mr,mrc->mc", coeff, blk["Jw"]))
        return _psum(y)

    # -- block-Jacobi preconditioner ----------------------------------------

    def precond_blocks(blocks, dtype):
        """Per-knot [td, td] and per-sensor [13, 13] diagonal blocks of the
        undamped A_cc, scatter-assembled from the compressed Jacobians."""
        knot_blocks = [
            jnp.zeros((sp.n, _TANGENT_DIMS[sp.kind], _TANGENT_DIMS[sp.kind]), dtype)
            for sp in spec.splines
        ]
        S = spec.num_sensors
        sensor_blocks = jnp.zeros((max(S, 1), SENSOR_TANGENT_DIM, SENSOR_TANGENT_DIM), dtype)
        for blk, layout in zip(blocks, layouts):
            Jw, cols = blk["Jw"], blk["cols"]
            for off, si, W, td in layout.windows:
                sp = spec.splines[si]
                Jwin = Jw[:, :, off:off + W * td].reshape(
                    Jw.shape[0], Jw.shape[1], W, td
                )
                contrib = jnp.einsum("mrwd,mrwe->mwde", Jwin, Jwin)
                kidx = (cols[:, off] - sp.tangent_offset) // td
                kidx = kidx[:, None] + jnp.arange(W)[None, :]
                knot_blocks[si] = knot_blocks[si].at[kidx].add(contrib)
            if layout.sensor_off >= 0:
                so = layout.sensor_off
                Js = Jw[:, :, so:so + SENSOR_TANGENT_DIM]
                contrib = jnp.einsum("mrd,mre->mde", Js, Js)
                sid = (cols[:, so] - spec.sensor_offset) // SENSOR_TANGENT_DIM
                sensor_blocks = sensor_blocks.at[sid].add(contrib)
        return _psum((knot_blocks, sensor_blocks))

    def precond_apply(kblocks, sblocks, diag, diag_d, r):
        """Apply the inverse of the damped block-Jacobi preconditioner.

        ``kblocks/sblocks`` hold the Gauss-Newton diagonal blocks of A_cc
        (already lock-masked via Jw); ``diag_d`` is the damping diagonal
        ``lam * clip(diag) + (1 - mask)``, which also makes locked rows
        invertible. Entries not covered by a block (lifted vt) use the
        point-Jacobi fallback ``diag + diag_d``."""
        out = r / (diag + diag_d)
        for si, sp in enumerate(spec.splines):
            td = _TANGENT_DIMS[sp.kind]
            o = sp.tangent_offset
            n = sp.n
            rk = jax.lax.dynamic_slice(r, (o,), (n * td,)).reshape(n, td)
            dk = jax.lax.dynamic_slice(diag_d, (o,), (n * td,)).reshape(n, td)
            B = kblocks[si] + jax.vmap(jnp.diag)(dk)
            sol = jnp.linalg.solve(B, rk[..., None])[..., 0]
            out = jax.lax.dynamic_update_slice(out, sol.reshape(-1), (o,))
        S = spec.num_sensors
        if S:
            o = spec.sensor_offset
            sd = SENSOR_TANGENT_DIM
            rk = jax.lax.dynamic_slice(r, (o,), (S * sd,)).reshape(S, sd)
            dk = jax.lax.dynamic_slice(diag_d, (o,), (S * sd,)).reshape(S, sd)
            B = sblocks[:S] + jax.vmap(jnp.diag)(dk)
            sol = jnp.linalg.solve(B, rk[..., None])[..., 0]
            out = jax.lax.dynamic_update_slice(out, sol.reshape(-1), (o,))
        return out

    # -- PCG -----------------------------------------------------------------

    def pcg(matvec, precond, b, tol, maxiter):
        x0 = jnp.zeros_like(b)
        r0 = b
        z0 = precond(r0)
        bnorm2 = jnp.dot(b, b)
        thresh2 = (tol * tol) * bnorm2

        def cond(carry):
            x, r, z, p, rz, k = carry
            return (k < maxiter) & (jnp.dot(r, r) > thresh2)

        def body(carry):
            x, r, z, p, rz, k = carry
            Ap = matvec(p)
            pAp = jnp.dot(p, Ap)
            alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz_new = jnp.dot(r, z)
            beta = rz_new / jnp.where(rz == 0, 1.0, rz)
            p = z + beta * p
            return (x, r, z, p, rz_new, k + 1)

        carry = (x0, r0, z0, z0, jnp.dot(r0, z0), jnp.asarray(0))
        x, r, z, p, rz, k = jax.lax.while_loop(cond, body, carry)
        return x, k

    # -- the LM step ----------------------------------------------------------

    def schur_solve(runtime, blocks, lam, cg_tol, cg_maxiter, state=None):
        """Damped iterative Schur solve; returns (delta [P], cg_iters,
        aux) with aux = (g_c, g_l, D, dc-space pieces) for pred/grad.

        With ``state``, landmarks at the rho = 0 bound with outward
        gradient are frozen for this step (kernels.landmark_free_mask);
        the masked elimination E^T diag(free/D_d) E stays symmetric."""
        dtype = runtime["mask"].dtype
        mask_c, mask_l = split_mask(runtime["mask"])
        g_c, diag, D, g_l = grad_and_diag(blocks, dtype)
        if state is not None and L:
            mask_l = landmark_free_mask(state["rho"], g_l, mask_l)
        diag_cl = jnp.clip(diag, 1e-6, 1e32)
        diag_d = lam * diag_cl + (1.0 - mask_c)  # damping part of S diag
        kblocks, sblocks = precond_blocks(blocks, dtype)

        if L:
            D_d = D + lam * jnp.clip(D, 1e-6, 1e32) + (1.0 - mask_l)
            rhs = et_matvec(blocks, mask_l * g_l / D_d, dtype) - g_c

            def matvec(x):
                y = hcc_matvec(blocks, x) + diag_d * x
                Ex = e_matvec(blocks, x, dtype) * mask_l
                return y - et_matvec(blocks, Ex / D_d, dtype)
        else:
            D_d = jnp.ones((0,), dtype)
            rhs = -g_c

            def matvec(x):
                return hcc_matvec(blocks, x) + diag_d * x

        precond = functools.partial(precond_apply, kblocks, sblocks, diag, diag_d)
        dc, k = pcg(matvec, precond, rhs, cg_tol, cg_maxiter)
        dc = dc * mask_c
        if L:
            dl = -(g_l + e_matvec(blocks, dc, dtype)) / D_d * mask_l
        else:
            dl = jnp.zeros((0,), dtype)
        delta = jnp.concatenate([dc[:lo], dl, dc[lo:]])
        return delta, k, (g_c, g_l, D, dc, dl)

    def retract(runtime, state, delta):
        return _retract_state(spec, runtime, state, delta)

    def solve_with_pred(runtime, blocks, lam, cg_tol, cg_maxiter, state=None):
        """Damped PCG solve plus the LM bookkeeping (pred, grad_max).

        With ``state`` given, the landmark step is projected to the
        increment the bounded retraction (rho >= 0) actually applies
        before computing pred (see kernels.project_delta)."""
        delta, cg_iters, aux = schur_solve(
            runtime, blocks, lam, cg_tol, cg_maxiter, state=state
        )
        g_c, g_l, D, dc, dl = aux
        if state is not None and L:
            dl = project_dl(state["rho"], dl)
            delta = jax.lax.dynamic_update_slice(
                delta, dl, (spec.landmark_offset,)
            )
        dtype = runtime["mask"].dtype
        gTd = g_c @ dc + (g_l @ dl if L else 0.0)
        Hdc = hcc_matvec(blocks, dc)
        dHd = dc @ Hdc
        if L:
            Edc = e_matvec(blocks, dc, dtype)
            dHd = dHd + 2.0 * (dl @ Edc) + dl @ (D * dl)
        pred = -(gTd + 0.5 * dHd)
        grad_max = jnp.max(jnp.abs(g_c))
        if L:
            grad_max = jnp.maximum(grad_max, jnp.max(jnp.abs(g_l)))
        return delta, pred, grad_max

    def step(runtime, state, lam, cg_tol=1e-10, cg_maxiter=500):
        cost, blocks = linearize(runtime, state)
        delta, pred, grad_max = solve_with_pred(
            runtime, blocks, lam, cg_tol, cg_maxiter, state=state
        )
        new_state = retract(runtime, state, delta)
        new_cost = total_cost(runtime, new_state)
        return cost, new_state, new_cost, pred, delta, grad_max

    def step_spec(runtime, state, lin, lam, cg_tol=1e-10, cg_maxiter=500):
        # Speculative linearization (see kernels.step_spec): one full
        # linearize per LM iteration instead of linearize + re-cost.
        cost, blocks = lin
        delta, pred, _ = solve_with_pred(
            runtime, blocks, lam, cg_tol, cg_maxiter, state=state
        )
        new_state = retract(runtime, state, delta)
        new_lin = linearize(runtime, new_state)
        return new_state, new_lin, pred

    return dict(
        total_cost=total_cost,
        linearize=linearize,
        retract=retract,
        step=step,
        step_spec=step_spec,
        schur_solve=schur_solve,
        solve_with_pred=solve_with_pred,
        hcc_matvec=hcc_matvec,
        e_matvec=e_matvec,
        et_matvec=et_matvec,
        grad_and_diag=grad_and_diag,
    )


def make_iterative_step(problem, cg_tol=1e-10, cg_maxiter=500):
    """step(state, lam) using matrix-free PCG; same contract as
    ``kernels.make_step``."""
    spec = problem_spec(problem)
    parts = build_iterative_parts(spec, jax.config.jax_enable_x64)
    runtime = problem_runtime(problem)
    step_j = jax.jit(
        lambda rt, st, lam: parts["step"](rt, st, lam, cg_tol, cg_maxiter)
    )
    cost_j = jax.jit(parts["total_cost"])
    return (
        lambda state, lam: step_j(runtime, state, lam),
        lambda state: cost_j(runtime, state),
    )
