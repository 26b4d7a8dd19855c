"""Multi-chip iterative Schur: the config-5 scale path.

Combines measurement sharding with the matrix-free PCG reduced solve
(:mod:`kontiki_tpu.solver.iterative`). Rows of every bucket are sharded
over the mesh ``m`` axis (no landmark grouping needed: per-landmark sums
are [L]-vector psums); inside one ``shard_map`` program each device keeps
its shard's compressed Jacobian blocks resident and every global reduction
— cost, g_c, the damping diagonal, D, g_l, each CG matvec's scatter
result, and the block-Jacobi preconditioner blocks — is a single psum over
ICI. Nothing quadratic in parameters or landmarks is ever materialized on
any device: per-device memory is O(rows/n_devices * rdim * C) for the
Jacobian shard plus O(Pc + L) vectors.

This is the TPU-native realization of the reference's SPARSE_SCHUR at a
scale the reference cannot reach (BASELINE config 5: 10k+ keyframes, 100k+
landmarks; SURVEY §2.10.3).
"""
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..solver.iterative import build_iterative_parts
from . import MEASUREMENT_AXIS, _runtime_pspecs, padded_spec_and_runtime

__all__ = [
    "make_sharded_iterative_step",
    "make_sharded_iterative_solver",
]


def _build(problem, mesh, cg_tol, cg_maxiter):
    n = mesh.devices.size
    spec, runtime = padded_spec_and_runtime(problem, n)
    parts = build_iterative_parts(
        spec, jax.config.jax_enable_x64, axis_name=MEASUREMENT_AXIS
    )
    rt_specs = _runtime_pspecs(runtime)
    runtime = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), runtime, rt_specs
    )
    return spec, runtime, rt_specs, parts


def make_sharded_iterative_step(problem, mesh, cg_tol=1e-10, cg_maxiter=500):
    """step(state, lam) with measurement-sharded compressed linearization
    and psum-reduced matrix-free PCG. Contract matches ``make_step``."""
    spec, runtime, rt_specs, parts = _build(problem, mesh, cg_tol, cg_maxiter)

    step_sm = jax.shard_map(
        lambda rt, st, lam: parts["step"](rt, st, lam, cg_tol, cg_maxiter),
        mesh=mesh,
        in_specs=(rt_specs, P(), P()),
        out_specs=(P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    cost_sm = jax.shard_map(
        parts["total_cost"],
        mesh=mesh,
        in_specs=(rt_specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    return (
        jax.jit(lambda state, lam: step_sm(runtime, state, lam)),
        jax.jit(lambda state: cost_sm(runtime, state)),
    )


def make_sharded_iterative_solver(problem, mesh, max_iterations=50,
                                  function_tolerance=1e-6, cg_tol=1e-6,
                                  cg_maxiter=200):
    """Fully on-device multi-chip LM with matrix-free PCG linear solves.

    The entire trust-region loop runs inside one ``shard_map`` program (all
    scalars replicated, all reductions psum over ICI): state ->
    (state, final_cost, iterations)."""
    spec, runtime, rt_specs, parts = _build(problem, mesh, cg_tol, cg_maxiter)

    from ..solver.lm import trust_region_loop

    def lm_loop(rt, state):
        def one_step(state, lam):
            return parts["step"](rt, state, lam, cg_tol, cg_maxiter)

        cost0 = parts["total_cost"](rt, state)
        return trust_region_loop(
            one_step, cost0, state,
            max_iterations=max_iterations,
            function_tolerance=function_tolerance,
            dtype=rt["mask"].dtype,
        )

    solve_sm = jax.shard_map(
        lm_loop,
        mesh=mesh,
        in_specs=(rt_specs, P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(lambda state: solve_sm(runtime, state))
