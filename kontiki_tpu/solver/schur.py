"""Schur elimination of landmarks — the TPU-native SPARSE_SCHUR.

The reference relies on Ceres's SPARSE_SCHUR linear solver
(trajectory_estimator.h:38-50): each landmark's scalar inverse depth is
eliminated from the normal equations, leaving the reduced
camera/trajectory system. Landmarks couple to the rest of the state only
through their own observations, so the landmark block of the Hessian is
*diagonal* (one scalar per landmark) and elimination is embarrassingly
parallel — here a ``segment_sum`` over landmark ids plus one MXU matmul.

Block system (c = knots + sensors + lifted row times, l = landmarks):

    [H_cc  E^T] [dc]   [-g_c]          E[l] = sum_{rows of landmark l}
    [E     D  ] [dl] = [-g_l],                rho' * J_rho * J_c

    S  = H_cc - E^T D^-1 E              (reduced system, solved densely)
    dc = S^-1 (E^T D^-1 g_l - g_c)
    dl = -(g_l + E dc) / D

LM damping is applied to the diagonals of both blocks *before* elimination,
so the step equals the dense damped solve exactly (block elimination is
algebraically exact) — verified against the dense path in tests.

Memory never materializes the [P, P] Hessian over landmarks: the largest
objects are H_cc [Pc, Pc] and E [L, Pc]. This is what lets camera problems
scale to 10^5 landmarks on-chip.
"""
import functools
import os

import jax
import jax.numpy as jnp

from .kernels import (
    _build_solver,
    landmark_free_mask,
    project_delta,
    _bucket_terms,
    _huber,
    _huber_prime,
    _make_residual,
    _retract_state,
    problem_runtime,
    problem_spec,
)

#: Gauss-Newton assembly backend: 'auto' uses the Pallas tiled-MXU kernel
#: on TPU whenever the accumulators fit VMEM (measured ~2x linearize win on
#: the flagship problem vs the scatter path), otherwise the XLA scatter;
#: 'pallas' forces the kernel (interpret-mode off-TPU), 'dense' forces the
#: scatter path.
_ASSEMBLY_ENV = os.environ.get("KONTIKI_ASSEMBLY", "auto")


def _use_pallas_assembly(P, L, rdim, C):
    if _ASSEMBLY_ENV == "pallas":
        return True
    if _ASSEMBLY_ENV not in ("auto", "dense"):
        return False
    if _ASSEMBLY_ENV == "dense":
        return False
    from ..ops.assembly_kernels import assembly_supported

    return assembly_supported(P, L, rdim, C)


@functools.lru_cache(maxsize=None)
def build_schur_parts(spec, x64: bool, local_L: int = 0):
    """Raw solver functions with per-landmark Schur elimination.

    Same contract as ``kernels.build_parts`` (total_cost / linearize /
    retract / step), but ``linearize`` returns the split blocks
    ``(cost, H_cc, g_c, E, D, g_l)`` and ``step`` performs the damped
    Schur solve.

    With ``local_L > 0`` the landmark blocks ``E/D/g_l`` have leading
    dimension ``local_L`` and rows are scattered by ``data["lid_local"]``,
    with the landmark lock mask read from ``runtime["mask_l"]`` — the form
    the multi-chip layer uses inside ``shard_map``, where each device owns a
    contiguous block of landmarks (landmark-block sharding, SURVEY §2.10.3)
    and only ``cost/H_cc/g_c`` are psum-reduced. The full-matrix landmark
    columns of the Hessian are never materialized on any device."""
    residuals = [_make_residual(spec, b) for b in spec.buckets]
    L = spec.num_landmarks
    P = spec.num_tangent
    Pc = P - L
    lo = spec.landmark_offset

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
        return cost

    def linearize(runtime, state):
        dtype = runtime["mask"].dtype
        mask_c, mask_l = split_mask(runtime["mask"])
        E_rows = local_L or L
        if local_L:
            mask_l = runtime["mask_l"]
        H_cc = jnp.zeros((Pc, Pc), dtype)
        g_c = jnp.zeros((Pc,), dtype)
        E = jnp.zeros((E_rows, Pc), dtype)
        D = jnp.zeros((E_rows,), dtype)
        g_l = jnp.zeros((E_rows,), dtype)
        cost = jnp.zeros((), dtype)
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

            # Remap columns past the landmark slice (lifted row times).
            cols_c = jnp.where(cols >= lo, cols - L, cols)
            sq = jnp.sqrt(rho_p)
            Jw = J * sq[:, None, None]
            rw = r * sq[:, None]
            rdim = r.shape[1]
            lid = None
            Jw_rho = None
            if J_rho is not None:
                lid = data["lid_local"] if local_L else data["lid"]
                Jw_rho = J_rho * sq[:, None] * mask_l[lid][:, None]

            if _use_pallas_assembly(Pc, E_rows, rdim, Jw.shape[2]):
                from ..ops.assembly_kernels import assemble_schur_blocks

                zr = jnp.zeros((Jw.shape[0], rdim), Jw.dtype)
                zi = jnp.zeros((Jw.shape[0],), jnp.int32)
                Hb, gb, Eb, Db, glb = assemble_schur_blocks(
                    Jw, cols_c, rw,
                    Jw_rho if Jw_rho is not None else zr,
                    lid.astype(jnp.int32) if lid is not None else zi,
                    P=Pc, L=E_rows, with_rho=J_rho is not None,
                    interpret=jax.default_backend() != "tpu",
                )
                H_cc = H_cc + Hb
                g_c = g_c + gb
                if J_rho is not None:
                    E = E + Eb
                    D = D + Db
                    g_l = g_l + glb
            else:
                def to_dense(Jm, cm):
                    return jnp.zeros((rdim, Pc), Jm.dtype).at[:, cm].add(Jm)

                Jd = jax.vmap(to_dense)(Jw, cols_c)
                Jd2 = Jd.reshape(-1, Pc)
                H_cc = H_cc + Jd2.T @ Jd2
                g_c = g_c + Jd2.T @ rw.reshape(-1)
                if J_rho is not None:
                    E = E.at[lid].add(jnp.einsum("mr,mrp->mp", Jw_rho, Jd))
                    D = D.at[lid].add(jnp.sum(Jw_rho * Jw_rho, axis=1))
                    g_l = g_l.at[lid].add(jnp.sum(Jw_rho * rw, axis=1))
        # Lock masking is applied POST-assembly in the block space
        # (O(Pc^2 + L*Pc) elementwise) rather than per-row on J
        # (mask_c[cols_c], an [M, C] gather that measured 6.2 ms — half the
        # flagship config-4 step — on v5e; same optimization as the banded
        # path's pair-block masking). With 0/1 masks the two are
        # algebraically identical: (J diag(m))^T (J diag(m)) = m m^T ∘ J^T J.
        # The landmark mask stays per-row (mask_l[lid], an [M] gather) so
        # D/g_l/E rows of locked landmarks are zeroed exactly as before.
        H_cc = H_cc * (mask_c[:, None] * mask_c[None, :])
        g_c = g_c * mask_c
        if L:
            E = E * mask_c[None, :]
        return cost, H_cc, g_c, E, D, g_l

    def retract(runtime, state, delta):
        return _retract_state(spec, runtime, state, delta)

    def schur_solve(runtime, H_cc, g_c, E, D, g_l, lam, state=None):
        """Damped block solve; returns the full tangent delta [P].

        With ``state`` given, landmarks at the rho = 0 bound whose
        gradient points outward are frozen for this step (active set;
        see kernels.landmark_free_mask)."""
        mask_c, mask_l = split_mask(runtime["mask"])
        if state is not None and L:
            mask_l = landmark_free_mask(state["rho"], g_l, mask_l)
            E = E * mask_l[:, None]
        diag_c = jnp.clip(jnp.diag(H_cc), 1e-6, 1e32)
        A_cc = H_cc + lam * jnp.diag(diag_c) + jnp.diag(1.0 - mask_c)
        D_d = D + lam * jnp.clip(D, 1e-6, 1e32) + (1.0 - mask_l)
        if L:
            Ew = E / D_d[:, None]
            S = A_cc - E.T @ Ew
            rhs = E.T @ (g_l / D_d) - g_c
            dc = jnp.linalg.solve(S, rhs) * mask_c
            dl = -(g_l + E @ dc) / D_d * mask_l
        else:
            dc = jnp.linalg.solve(A_cc, -g_c) * mask_c
            dl = jnp.zeros((0,), dc.dtype)
        return jnp.concatenate([dc[:lo], dl, dc[lo:]])

    def _solve_from_lin(runtime, state, H_cc, g_c, E, D, g_l, lam):
        delta = schur_solve(runtime, H_cc, g_c, E, D, g_l, lam, state=state)
        delta = project_delta(spec, runtime, state, delta)
        dc = jnp.concatenate([delta[:lo], delta[lo + L:]])
        dl = delta[lo:lo + L]
        gTd = g_c @ dc + g_l @ dl
        dHd = dc @ (H_cc @ dc) + 2.0 * dl @ (E @ dc) + dl @ (D * dl)
        pred = -(gTd + 0.5 * dHd)
        grad_max = jnp.maximum(
            jnp.max(jnp.abs(g_c)) if Pc else 0.0,
            jnp.max(jnp.abs(g_l)) if L else 0.0,
        )
        return delta, pred, grad_max

    def step(runtime, state, lam):
        cost, H_cc, g_c, E, D, g_l = linearize(runtime, state)
        delta, pred, grad_max = _solve_from_lin(
            runtime, state, H_cc, g_c, E, D, g_l, lam
        )
        new_state = retract(runtime, state, delta)
        new_cost = total_cost(runtime, new_state)
        return cost, new_state, new_cost, pred, delta, grad_max

    def step_spec(runtime, state, lin, lam):
        # Speculative linearization (see kernels.step_spec): one full
        # linearize per LM iteration — the candidate's cost term is the
        # re-cost, its blocks are the next accepted linearization.
        cost, H_cc, g_c, E, D, g_l = lin
        delta, pred, _ = _solve_from_lin(
            runtime, state, H_cc, g_c, E, D, g_l, lam
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
    )


@functools.lru_cache(maxsize=None)
def _build_schur_solver(spec, x64: bool):
    parts = build_schur_parts(spec, x64)
    return (
        jax.jit(parts["total_cost"]),
        jax.jit(parts["linearize"]),
        jax.jit(parts["step"]),
        jax.jit(parts["retract"]),
    )


def make_schur_step(problem):
    """step(state, lam) with Schur elimination; same contract as
    ``kernels.make_step``."""
    spec = problem_spec(problem)
    cost_j, _, step_j, _ = _build_schur_solver(spec, jax.config.jax_enable_x64)
    runtime = problem_runtime(problem)
    return (
        lambda state, lam: step_j(runtime, state, lam),
        lambda state: cost_j(runtime, state),
    )
