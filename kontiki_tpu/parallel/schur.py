"""Multi-chip Schur elimination: landmark-block sharding.

The reference's linear solver is always SPARSE_SCHUR
(trajectory_estimator.h:40): landmarks are eliminated from the normal
equations, leaving the reduced camera/trajectory system. Elimination is
per-landmark independent, so the TPU-native scale-out shards the *landmark
axis* across the mesh (SURVEY §2.10.3, the EP-style axis):

- Each device owns a contiguous block of ``Lb = ceil(L / n)`` landmarks.
- Camera-measurement rows are reordered so every row lives on the device
  that owns its landmark; each device's row count is padded to the max
  block size with inert ``valid=0`` rows.
- Inside ``shard_map`` each device linearizes its rows into local blocks:
  the reduced-system contributions ``cost / H_cc / g_c`` are psum-reduced
  over ICI, while ``E [Lb, Pc] / D [Lb] / g_l [Lb]`` stay resident on the
  owning device — the landmark columns of the Hessian are never
  materialized anywhere.
- The damped Schur solve computes the correction ``E^T D^-1 E`` as a
  per-device partial matmul that XLA all-reduces ([Pc, Pc] only), solves
  the reduced system replicated, and back-substitutes ``dl`` locally.

Per-device memory is O(Pc^2 + Lb * Pc + rows/n), vs the replicated dense
path's O((Pc + L)^2): a 100k-landmark problem costs ~10^10 entries dense
but only ~Lb*Pc sharded. For problems where Pc itself outgrows one chip,
see :mod:`kontiki_tpu.solver.iterative`.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..solver.kernels import problem_runtime, problem_spec
from ..solver.schur import build_schur_parts
from . import MEASUREMENT_AXIS, _pad_rows

__all__ = [
    "make_sharded_schur_functions",
    "make_sharded_schur_step",
    "make_sharded_schur_solver",
]


def _schur_padded_layout(problem, n_shards):
    """Pad the landmark axis to a multiple of ``n_shards`` and regroup
    camera rows by owning shard.

    Returns (spec, runtime, state0, layout) where layout carries the
    padded-landmark bookkeeping needed to map states/deltas back."""
    spec = problem_spec(problem)
    runtime = problem_runtime(problem)
    L = spec.num_landmarks
    if L == 0:
        raise ValueError("sharded Schur requires landmarks; use the dense path")
    n = n_shards
    Lb = max(1, math.ceil(L / n))
    L_pad = Lb * n
    pad_L = L_pad - L
    lo = spec.landmark_offset

    new_buckets = []
    new_data = []
    for bspec, data in zip(spec.buckets, runtime["data"]):
        data = {k: np.asarray(v) for k, v in data.items()}
        M = bspec.M
        if "lid" in data:
            # Landmark-owned rows: group by owner shard, equal rows per shard.
            owner = data["lid"] // Lb
            counts = np.bincount(owner, minlength=n)
            M_per = max(int(counts.max()), 1)
            M_pad = n * M_per
            idx = np.zeros(M_pad, dtype=np.int64)
            valid = np.zeros(M_pad)
            for s in range(n):
                rows = np.nonzero(owner == s)[0]
                idx[s * M_per : s * M_per + len(rows)] = rows
                valid[s * M_per : s * M_per + len(rows)] = 1.0
            d = {k: v[idx] for k, v in data.items()}
            # Inert pad rows: any in-range index works (contributions are
            # zeroed through valid), but it must be in range both globally
            # (rho gather) and locally (E scatter).
            d["lid"] = np.where(valid > 0, d["lid"], 0).astype(np.int32)
            d["lid_local"] = np.where(
                valid > 0, d["lid"] - owner[idx] * Lb, 0
            ).astype(np.int32)
            d["valid"] = valid
        else:
            M_pad = max(((M + n - 1) // n) * n, n)
            d = {k: _pad_rows(v, M_pad) for k, v in data.items()}
            valid = np.ones(M_pad)
            valid[M:] = 0.0
            d["valid"] = valid
        d["valid"] = d["valid"].astype(np.asarray(runtime["mask"]).dtype)
        d = {k: jnp.asarray(v) for k, v in d.items()}
        new_data.append(d)
        new_buckets.append(bspec._replace(M=M_pad))

    mask = np.asarray(runtime["mask"])
    mask_pad = np.concatenate([mask[: lo + L], np.zeros(pad_L, mask.dtype), mask[lo + L :]])
    spec = spec._replace(
        buckets=tuple(new_buckets),
        num_landmarks=L_pad,
        vt_offset=spec.vt_offset + pad_L,
        num_tangent=spec.num_tangent + pad_L,
    )
    runtime["data"] = new_data
    runtime["mask"] = jnp.asarray(mask_pad)
    runtime["mask_l"] = jnp.asarray(mask_pad[lo : lo + L_pad])

    state0 = dict(problem.state0)
    rho = np.asarray(state0["rho"])
    state0["rho"] = jnp.asarray(
        np.concatenate([rho, np.ones(pad_L, rho.dtype)])
    )
    layout = dict(L=L, L_pad=L_pad, Lb=Lb, pad_L=pad_L, lo=lo, n=n)
    return spec, runtime, state0, layout


def _pad_state(state, layout):
    if layout["pad_L"] == 0:
        return dict(state)
    s = dict(state)
    rho = s["rho"]
    s["rho"] = jnp.concatenate(
        [rho, jnp.ones((layout["pad_L"],), rho.dtype)]
    )
    return s


def _unpad_state(state, layout):
    if layout["pad_L"] == 0:
        return dict(state)
    s = dict(state)
    s["rho"] = s["rho"][: layout["L"]]
    return s


def _unpad_delta(delta, layout):
    if layout["pad_L"] == 0:
        return delta
    lo, L, L_pad = layout["lo"], layout["L"], layout["L_pad"]
    return jnp.concatenate([delta[: lo + L], delta[lo + L_pad :]])


def _runtime_pspecs(runtime):
    specs = jax.tree_util.tree_map(lambda _: P(), runtime)
    specs["data"] = [{k: P(MEASUREMENT_AXIS) for k in d} for d in runtime["data"]]
    specs["mask_l"] = P(MEASUREMENT_AXIS)
    return specs


def make_sharded_schur_functions(problem, mesh):
    """Sharded-Schur building blocks closing over the placed runtime.

    Returns (cost_fn, linearize_fn, schur_solve_fn, retract_fn, layout):
    ``linearize_fn(state_pad) -> (cost, H_cc, g_c, E, D, g_l)`` with E/D/g_l
    sharded over the landmark axis; all state arguments are *padded*."""
    n = mesh.devices.size
    spec, runtime, state0_pad, layout = _schur_padded_layout(problem, n)
    x64 = jax.config.jax_enable_x64
    parts_local = build_schur_parts(spec, x64, local_L=layout["Lb"])
    parts_global = build_schur_parts(spec, x64)

    rt_specs = _runtime_pspecs(runtime)
    runtime = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), runtime, rt_specs
    )

    def _cost_local(rt, st):
        return jax.lax.psum(parts_local["total_cost"](rt, st), MEASUREMENT_AXIS)

    def _lin_local(rt, st):
        cost, H_cc, g_c, E, D, g_l = parts_local["linearize"](rt, st)
        cost, H_cc, g_c = jax.lax.psum((cost, H_cc, g_c), MEASUREMENT_AXIS)
        return cost, H_cc, g_c, E, D, g_l

    cost_sm = jax.shard_map(
        _cost_local, mesh=mesh, in_specs=(rt_specs, P()), out_specs=P(),
        check_vma=False,
    )
    lin_sm = jax.shard_map(
        _lin_local,
        mesh=mesh,
        in_specs=(rt_specs, P()),
        out_specs=(
            P(), P(), P(),
            P(MEASUREMENT_AXIS), P(MEASUREMENT_AXIS), P(MEASUREMENT_AXIS),
        ),
        check_vma=False,
    )

    cost_fn = jax.jit(lambda st: cost_sm(runtime, st))
    lin_fn = jax.jit(lambda st: lin_sm(runtime, st))
    # The Schur solve and retraction run under plain jit: E/D/g_l arrive as
    # landmark-sharded global arrays and GSPMD turns E^T(E/D) into
    # per-device partials + an all-reduce of the [Pc, Pc] correction.
    solve_fn = jax.jit(
        lambda H_cc, g_c, E, D, g_l, lam, st=None: parts_global["schur_solve"](
            runtime, H_cc, g_c, E, D, g_l, lam, state=st
        )
    )
    retract_fn = jax.jit(lambda st, delta: parts_global["retract"](runtime, st, delta))
    return cost_fn, lin_fn, solve_fn, retract_fn, layout, runtime, parts_global


def make_sharded_schur_step(problem, mesh):
    """step(state, lam) with landmark-sharded Schur elimination.

    Same contract as ``solver.schur.make_schur_step`` — unpadded states and
    deltas in and out — but the linearization is measurement-sharded and the
    landmark blocks stay distributed."""
    (cost_fn, lin_fn, solve_fn, retract_fn, layout, runtime, parts
     ) = make_sharded_schur_functions(problem, mesh)
    lo, L_pad = layout["lo"], layout["L_pad"]

    @jax.jit
    def step(state, lam):
        st = _pad_state(state, layout)
        cost, H_cc, g_c, E, D, g_l = lin_fn(st)
        delta = solve_fn(H_cc, g_c, E, D, g_l, lam, st)
        # project the landmark step to the bounded retraction's increment
        # before pred (rho >= 0; see kernels.project_delta)
        dl = jnp.maximum(st["rho"] + delta[lo:lo + L_pad], 0.0) - st["rho"]
        delta = delta.at[lo:lo + L_pad].set(dl)
        new_state = retract_fn(st, delta)
        new_cost = cost_fn(new_state)
        dc = jnp.concatenate([delta[:lo], delta[lo + L_pad:]])
        gTd = g_c @ dc + g_l @ dl
        dHd = dc @ (H_cc @ dc) + 2.0 * dl @ (E @ dc) + dl @ (D * dl)
        pred = -(gTd + 0.5 * dHd)
        grad_max = jnp.maximum(jnp.max(jnp.abs(g_c)), jnp.max(jnp.abs(g_l)))
        return (
            cost,
            _unpad_state(new_state, layout),
            new_cost,
            pred,
            _unpad_delta(delta, layout),
            grad_max,
        )

    @jax.jit
    def total_cost(state):
        return cost_fn(_pad_state(state, layout))

    return step, total_cost


def make_sharded_schur_solver(problem, mesh, max_iterations=50,
                              function_tolerance=1e-6):
    """Fully on-device multi-chip Schur LM via ``lax.while_loop``.

    Mirrors ``solver.lm.make_fused_solver`` with the landmark-sharded
    elimination; returns state -> (state, final_cost, iterations)."""
    (cost_fn, lin_fn, solve_fn, retract_fn, layout, runtime, parts
     ) = make_sharded_schur_functions(problem, mesh)

    from ..solver.lm import trust_region_loop

    def one_step(state, lam):
        cost, H_cc, g_c, E, D, g_l = lin_fn(state)
        delta = solve_fn(H_cc, g_c, E, D, g_l, lam, state)
        lo, L_pad = layout["lo"], layout["L_pad"]
        dl = jnp.maximum(
            state["rho"] + delta[lo:lo + L_pad], 0.0
        ) - state["rho"]
        delta = delta.at[lo:lo + L_pad].set(dl)
        new_state = retract_fn(state, delta)
        new_cost = cost_fn(new_state)
        dc = jnp.concatenate([delta[:lo], delta[lo + L_pad:]])
        pred = -(
            g_c @ dc + g_l @ dl
            + 0.5 * (dc @ (H_cc @ dc) + 2.0 * dl @ (E @ dc) + dl @ (D * dl))
        )
        return cost, new_state, new_cost, pred

    @jax.jit
    def solve_fn_full(state):
        st = _pad_state(state, layout)
        cost0 = cost_fn(st)
        st, cost, it = trust_region_loop(
            one_step, cost0, st,
            max_iterations=max_iterations,
            function_tolerance=function_tolerance,
            dtype=st["rho"].dtype,
        )
        return _unpad_state(st, layout), cost, it

    return solve_fn_full
