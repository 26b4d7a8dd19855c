"""Multi-chip execution: sharded linearization over TPU device meshes.

The reference has no distributed code at all — its only concurrency is
Ceres's thread pool (trajectory_estimator.h:43-48). This module provides the
TPU-native scale-out described in SURVEY.md §2.10: the problem-structured
analogues of the classic parallelism axes are

- **measurement parallelism (≈ data parallelism)** — residual blocks are
  independent given their parameter blocks. Each bucket's struct-of-arrays is
  sharded over the mesh's ``m`` axis; every device linearizes its shard into
  local Gauss-Newton contributions ``(cost, H, g)`` which are combined with a
  single ``psum`` over ICI. This is implemented here and is exact: the
  scatter-add assembly commutes with the reduction.
- **knot-segment sharding (≈ sequence parallelism)** and **landmark-block
  sharding (≈ expert parallelism)** shard the *state* axis; they matter once
  the reduced system itself outgrows one chip and ride on the Schur
  elimination layer (:mod:`kontiki_tpu.solver.schur`).

Buckets are padded to a multiple of the mesh size with ``valid=0`` rows
(weight-0 analogue of Ceres simply not adding the residual block); padded
rows reuse row 0's data so all gathers stay in range.

The replicated state + psum(H, g) design is the right one for this problem
class: states are small (knots + sensors + landmarks) while measurements are
huge (kHz IMU, hundreds of thousands of observations), exactly the regime
where data parallelism is optimal.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver.kernels import (
    build_parts,
    damped_solve,
    problem_runtime,
    problem_spec,
)

__all__ = [
    "default_mesh",
    "make_sharded_functions",
    "make_sharded_step",
    "make_sharded_solver",
    "make_sharded_schur_functions",
    "make_sharded_schur_step",
    "make_sharded_schur_solver",
]

MEASUREMENT_AXIS = "m"


def default_mesh(n_devices=None, devices=None):
    """1-D mesh over the measurement axis using all (or n) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (MEASUREMENT_AXIS,))


def _pad_rows(arr, target):
    """Pad leading axis to ``target`` rows by repeating row 0 (keeps indices,
    times, and camera intrinsics in padded rows well-formed)."""
    arr = np.asarray(arr)
    pad = target - arr.shape[0]
    if pad <= 0:
        return arr
    return np.concatenate([arr, np.repeat(arr[:1], pad, axis=0)], axis=0)


def padded_spec_and_runtime(problem, n_shards):
    """ProblemSpec + runtime pytree with every bucket padded to a multiple of
    ``n_shards`` and a ``valid`` column added."""
    spec = problem_spec(problem)
    runtime = problem_runtime(problem)
    new_buckets = []
    new_data = []
    for bspec, data in zip(spec.buckets, runtime["data"]):
        M = bspec.M
        M_pad = max(((M + n_shards - 1) // n_shards) * n_shards, n_shards)
        d = {k: jnp.asarray(_pad_rows(v, M_pad)) for k, v in data.items()}
        valid = np.ones(M_pad)
        valid[M:] = 0.0
        d["valid"] = jnp.asarray(valid.astype(problem.mask.dtype))
        new_data.append(d)
        new_buckets.append(bspec._replace(M=M_pad))
    spec = spec._replace(buckets=tuple(new_buckets))
    runtime["data"] = new_data
    return spec, runtime


def _runtime_pspecs(runtime):
    """PartitionSpec pytree for the runtime: bucket data sharded over the
    measurement axis, everything else replicated."""
    specs = jax.tree_util.tree_map(lambda _: P(), runtime)
    specs["data"] = [
        {k: P(MEASUREMENT_AXIS) for k in d} for d in runtime["data"]
    ]
    return specs


def _place(runtime, mesh):
    """device_put the runtime: sharded bucket data, replicated small arrays."""
    specs = _runtime_pspecs(runtime)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), runtime, specs
    )


def _sharded_pieces(problem, mesh):
    """Raw shard_map'd (cost_sm, lin_sm)(rt, state) + placed runtime.

    The sharded runtime is always passed as an *argument* into jit, never
    closed over: in a multi-process job, closing over an array that spans
    non-addressable devices is an error (single-process it is merely
    equivalent)."""
    n = mesh.devices.size
    spec, runtime = padded_spec_and_runtime(problem, n)
    parts = build_parts(spec, jax.config.jax_enable_x64)
    runtime = _place(runtime, mesh)
    rt_specs = _runtime_pspecs(runtime)

    cost_sm = jax.shard_map(
        lambda rt, st: jax.lax.psum(parts["total_cost"](rt, st), MEASUREMENT_AXIS),
        mesh=mesh,
        in_specs=(rt_specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    lin_sm = jax.shard_map(
        lambda rt, st: jax.lax.psum(parts["linearize"](rt, st), MEASUREMENT_AXIS),
        mesh=mesh,
        in_specs=(rt_specs, P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return cost_sm, lin_sm, parts, runtime


def make_sharded_functions(problem, mesh):
    """(cost_fn(state), linearize_fn(state) -> (cost, H, g)) with bucket data
    sharded over ``mesh`` and results psum-reduced (replicated)."""
    cost_sm, lin_sm, parts, runtime = _sharded_pieces(problem, mesh)
    cost_j = jax.jit(cost_sm)
    lin_j = jax.jit(lin_sm)
    return (
        lambda state: cost_j(runtime, state),
        lambda state: lin_j(runtime, state),
        parts,
        runtime,
    )


def make_sharded_step(problem, mesh):
    """Jitted LM step with measurement-sharded linearization.

    step(state, lam) -> (cost, new_state, new_cost, pred, delta, grad_max),
    same contract as the single-chip ``make_step``."""
    cost_sm, lin_sm, parts, runtime = _sharded_pieces(problem, mesh)

    def step(rt, state, lam):
        cost, H, g = lin_sm(rt, state)
        delta = damped_solve(rt["mask"], H, g, lam)
        new_state = parts["retract"](rt, state, delta)
        new_cost = cost_sm(rt, new_state)
        pred = -(g @ delta + 0.5 * delta @ (H @ delta))
        grad_max = jnp.max(jnp.abs(g)) if g.shape[0] else jnp.zeros(())
        return cost, new_state, new_cost, pred, delta, grad_max

    step_j = jax.jit(step)
    cost_j = jax.jit(cost_sm)
    return (
        lambda state, lam: step_j(runtime, state, lam),
        lambda state: cost_j(runtime, state),
    )


def make_sharded_solver(problem, mesh, max_iterations=50, function_tolerance=1e-6):
    """Fully on-device multi-chip LM via lax.while_loop (no host round trips).

    Mirrors ``solver.lm.make_fused_solver`` but with the linearization
    sharded over the mesh. Returns state -> (state, final_cost, iterations)."""
    cost_sm, lin_sm, parts, runtime = _sharded_pieces(problem, mesh)

    from ..solver.lm import trust_region_loop

    def solve_fn(rt, state):
        def one_step(state, lam):
            cost, H, g = lin_sm(rt, state)
            delta = damped_solve(rt["mask"], H, g, lam)
            new_state = parts["retract"](rt, state, delta)
            new_cost = cost_sm(rt, new_state)
            pred = -(g @ delta + 0.5 * delta @ (H @ delta))
            return cost, new_state, new_cost, pred

        cost0 = cost_sm(rt, state)
        return trust_region_loop(
            one_step, cost0, state,
            max_iterations=max_iterations,
            function_tolerance=function_tolerance,
            dtype=problem.mask.dtype,
        )

    solve_j = jax.jit(solve_fn)
    return lambda state: solve_j(runtime, state)


# Landmark-block-sharded Schur elimination (imported last: schur.py uses the
# helpers above).
from .schur import (  # noqa: E402
    make_sharded_schur_functions,
    make_sharded_schur_step,
    make_sharded_schur_solver,
)
from .iterative import (  # noqa: E402
    make_sharded_iterative_step,
    make_sharded_iterative_solver,
)

__all__ += ["make_sharded_iterative_step", "make_sharded_iterative_solver"]
from . import distributed as distributed  # noqa: E402

__all__ += ["distributed"]
from .segments import (  # noqa: E402
    make_segment_sharded_solver,
    make_segment_sharded_step,
)

__all__ += ["make_segment_sharded_step", "make_segment_sharded_solver"]
