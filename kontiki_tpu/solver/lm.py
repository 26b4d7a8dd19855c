"""Levenberg-Marquardt trust-region loop.

Replaces the reference's ``ceres::Solve`` with SPARSE_SCHUR + LM
(trajectory_estimator.h:38-64). The trust-region policy follows Ceres's
LevenbergMarquardtStrategy: radius ``mu`` with damping ``1/mu * diag(JtJ)``
(diagonal clamped to [1e-6, 1e32]), accept when the relative decrease
exceeds 1e-3, radius update ``mu / max(1/3, 1 - (2*rho - 1)^3)`` on success
and halving with an escalating decrease factor on failure.

The per-iteration work (linearize -> damped solve -> retract -> re-cost) is
one fused jitted step; the accept/reject policy runs on host so iteration
callbacks (Ceres parity) can fire. ``solve_fused`` — the allocation-free
``lax.while_loop`` variant used for benchmarking — lives alongside.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from .._ceres import (
    CallbackReturnType,
    IterationSummary,
    Summary,
    TerminationType,
)
from .kernels import make_step
from .problem import Problem


def _resolve_auto(problem):
    """'auto' strategy choice (Ceres SPARSE_SCHUR analogue,
    trajectory_estimator.h:40): eliminate landmarks whenever there are any.
    On TPU, camera problems whose reduced system outgrows the Pallas
    assembly kernel's VMEM gate (Pc beyond ~1024) would fall back to the
    serialized XLA scatter; the matrix-free iterative-Schur path is the
    right backend there (nothing dense is ever assembled)."""
    import jax as _jax

    if not len(problem.landmarks):
        return "dense"
    if _jax.default_backend() == "tpu":
        from ..ops.assembly_kernels import assembly_supported

        Pc = problem.num_tangent - len(problem.landmarks)
        if not assembly_supported(Pc, len(problem.landmarks), 3, 88):
            return "iterative_schur"
    return "schur"


def _make_step(problem, strategy):
    """Pick the linear-solver strategy (Ceres SPARSE_SCHUR analogue)."""
    if strategy == "auto":
        strategy = _resolve_auto(problem)
    if strategy == "schur":
        from .schur import make_schur_step

        return make_schur_step(problem)
    if strategy == "iterative_schur":
        from .iterative import make_iterative_step

        return make_iterative_step(problem)
    if strategy == "banded":
        from .banded import make_banded_step

        return make_banded_step(problem)
    return make_step(problem)


def _make_phases(problem, strategy, cg_tol=1e-10, cg_maxiter=500):
    """Per-phase solver functions for honest Summary timing parity.

    Splits the LM iteration into the three phases Ceres reports
    (py_ceres.cc:29-43): ``linearize(state) -> (cost, lin_out)`` [jacobian
    evaluation], ``solve(lin_out, lam) -> (delta, pred, grad_max)`` [linear
    solver], and ``retract``/``cost`` [residual evaluation]."""

    from .kernels import (build_parts, landmark_free_mask, problem_runtime,
                          problem_spec, project_delta)

    if strategy == "auto":
        strategy = _resolve_auto(problem)
    spec = problem_spec(problem)
    runtime = problem_runtime(problem)
    x64 = jax.config.jax_enable_x64

    if strategy == "schur":
        from .schur import build_schur_parts

        parts = build_schur_parts(spec, x64)
        L = spec.num_landmarks
        lo = spec.landmark_offset
        lin_j = jax.jit(parts["linearize"])

        def _solve(rt, H_cc, g_c, E, D, g_l, lam, state):
            delta = parts["schur_solve"](rt, H_cc, g_c, E, D, g_l, lam,
                                         state=state)
            delta = project_delta(spec, rt, state, delta)
            dc = jnp.concatenate([delta[:lo], delta[lo + L:]])
            dl = delta[lo:lo + L]
            gTd = g_c @ dc + g_l @ dl
            dHd = dc @ (H_cc @ dc) + 2.0 * dl @ (E @ dc) + dl @ (D * dl)
            pred = -(gTd + 0.5 * dHd)
            grad_max = jnp.maximum(
                jnp.max(jnp.abs(g_c)), jnp.max(jnp.abs(g_l)) if L else 0.0
            )
            return delta, pred, grad_max

        solve_j = jax.jit(_solve)

        def linearize(state):
            out = lin_j(runtime, state)
            return out[0], out[1:]

        def solve_phase(lin_out, lam, state):
            return solve_j(runtime, *lin_out, lam, state)

    elif strategy == "iterative_schur":
        from .iterative import build_iterative_parts

        parts = build_iterative_parts(spec, x64)
        lin_j = jax.jit(parts["linearize"])
        solve_j = jax.jit(
            lambda rt, blocks, lam, state: parts["solve_with_pred"](
                rt, blocks, lam, cg_tol, cg_maxiter, state=state
            )
        )

        def linearize(state):
            return lin_j(runtime, state)

        def solve_phase(blocks, lam, state):
            return solve_j(runtime, blocks, lam, state)

    elif strategy == "banded":
        from .banded import build_banded_parts

        parts = build_banded_parts(spec, x64)
        lin_j = jax.jit(parts["linearize"])
        solve_j = jax.jit(parts["solve_with_pred"])

        def linearize(state):
            return lin_j(runtime, state)

        def solve_phase(blocks, lam, state):
            return solve_j(runtime, blocks, lam, state)

    else:
        from .kernels import damped_solve

        parts = build_parts(spec, x64)
        lin_j = jax.jit(parts["linearize"])

        def _solve(rt, H, g, lam, state):
            mask = rt["mask"]
            L = spec.num_landmarks
            if L:
                lo = spec.landmark_offset
                g_l = jax.lax.dynamic_slice(g, (lo,), (L,))
                free = landmark_free_mask(
                    state["rho"], g_l, jnp.ones_like(g_l)
                )
                f_full = jax.lax.dynamic_update_slice(
                    jnp.ones_like(g), free, (lo,)
                )
                H = H * f_full[:, None] * f_full[None, :]
                g = g * f_full
                mask = mask * f_full
            delta = damped_solve(mask, H, g, lam)
            delta = project_delta(spec, rt, state, delta)
            pred = -(g @ delta + 0.5 * delta @ (H @ delta))
            grad_max = jnp.max(jnp.abs(g)) if g.shape[0] else jnp.zeros(())
            return delta, pred, grad_max

        solve_j = jax.jit(_solve)

        def linearize(state):
            cost, H, g = lin_j(runtime, state)
            return cost, (H, g)

        def solve_phase(lin_out, lam, state):
            H, g = lin_out
            return solve_j(runtime, H, g, lam, state)

    retract_j = jax.jit(parts["retract"])
    cost_j = jax.jit(parts["total_cost"])
    return dict(
        linearize=linearize,
        solve=solve_phase,
        retract=lambda state, delta: retract_j(runtime, state, delta),
        cost=lambda state: cost_j(runtime, state),
    )


def solve(
    problem: Problem,
    max_iterations=50,
    progress=False,
    callbacks=(),
    callback_needs_state=False,
    function_tolerance=1e-6,
    gradient_tolerance=1e-10,
    min_relative_decrease=1e-3,
    initial_trust_region_radius=1e4,
    max_trust_region_radius=1e16,
    min_trust_region_radius=1e-32,
    strategy="auto",
    trace_dir=None,
):
    """Run LM on a compiled problem. Returns (final_state, Summary).

    ``trace_dir`` enables a ``jax.profiler`` trace of the whole solve with
    per-phase ``TraceAnnotation`` markers (jacobian / linear_solver /
    residual), the kernel-level analogue of the Ceres per-phase timers the
    Summary already mirrors (py_ceres.cc:29-43). View with TensorBoard or
    Perfetto."""
    t_start = time.time()
    summary = Summary()
    summary.num_parameters = problem.num_parameters
    summary.num_parameter_blocks = problem.num_parameter_blocks
    summary.num_parameters_reduced = problem.num_parameters_reduced
    summary.num_parameter_blocks_reduced = problem.num_parameter_blocks_reduced
    summary.num_residuals = problem.num_residuals
    summary.num_residual_blocks = problem.num_residual_blocks
    summary.num_residuals_reduced = problem.num_residuals_reduced
    summary.num_residual_blocks_reduced = problem.num_residual_blocks_reduced

    state = problem.state0

    if problem.num_residual_blocks == 0 or problem.num_parameter_blocks_reduced == 0:
        # Nothing to optimize; mirror Ceres's trivial convergence.
        summary.termination_type = TerminationType.Convergence
        summary.message = "Problem is empty or fully constant."
        summary.total_time_in_seconds = time.time() - t_start
        return state, summary

    phases = _make_phases(problem, strategy)
    t_jacobian = t_linear = t_residual = 0.0

    import contextlib

    trace_cm = (
        jax.profiler.trace(trace_dir) if trace_dir else contextlib.nullcontext()
    )

    def _annot(name):
        return (
            jax.profiler.TraceAnnotation(name) if trace_dir
            else contextlib.nullcontext()
        )

    mu = initial_trust_region_radius
    decrease_factor = 2.0

    def run_callbacks(it_summary):
        if callback_needs_state:
            problem.write_back(state)
        for cb in callbacks:
            ret = cb(it_summary)
            if ret == CallbackReturnType.Abort:
                return TerminationType.UserFailure
            if ret == CallbackReturnType.TerminateSuccessfully:
                return TerminationType.UserSuccess
        return None

    termination = None
    message = ""
    cost = None
    t_min_start = time.time()

    trace_cm.__enter__()
    try:
        for iteration in range(max_iterations):
            it_t0 = time.time()
            lam = 1.0 / mu

            # Phase 1: residual + Jacobian evaluation (Ceres jacobian phase).
            with _annot("kontiki/jacobian"):
                cost_i, lin_out = phases["linearize"](state)
                cost_i = float(cost_i)  # blocks until the linearization is done
            t_jacobian += time.time() - it_t0

            # Phase 2: damped (Schur) linear solve.
            t1 = time.time()
            with _annot("kontiki/linear_solver"):
                delta, pred, grad_max = phases["solve"](lin_out, lam, state)
                pred_f = float(pred)
                grad_max_f = float(grad_max)
                step_norm = float(jnp.linalg.norm(delta))
            t_linear += time.time() - t1

            # Phase 3: retraction + re-cost (Ceres residual phase).
            t2 = time.time()
            with _annot("kontiki/residual"):
                new_state = phases["retract"](state, delta)
                new_cost = phases["cost"](new_state)
                new_cost_f = float(new_cost)
            t_residual += time.time() - t2
            if cost is None:
                cost = cost_i
                summary.initial_cost = cost_i
                it0 = IterationSummary(
                    iteration=0,
                    cost=cost_i,
                    cost_change=0.0,
                    gradient_max_norm=grad_max_f,
                    trust_region_radius=mu,
                    iteration_time_in_seconds=0.0,
                    cumulative_time_in_seconds=time.time() - t_start,
                )
                summary.iterations.append(it0)
                term = run_callbacks(it0)
                if term is not None:
                    termination = term
                    message = "Terminated by user callback."
                    break

            relative_decrease = (cost_i - new_cost_f) / pred_f if pred_f > 0 else -1.0
            step_successful = (
                np.isfinite(new_cost_f) and relative_decrease > min_relative_decrease
            )

            if step_successful:
                cost_change = cost_i - new_cost_f
                state = new_state
                mu = mu / max(1.0 / 3.0, 1.0 - (2.0 * relative_decrease - 1.0) ** 3)
                mu = min(mu, max_trust_region_radius)
                decrease_factor = 2.0
                summary.num_successful_steps += 1
                cost = new_cost_f
            else:
                cost_change = 0.0
                mu = mu / decrease_factor
                decrease_factor *= 2.0
                summary.num_unsuccessful_steps += 1

            it_summary = IterationSummary(
                iteration=iteration + 1,
                step_is_valid=bool(np.isfinite(new_cost_f)),
                step_is_successful=step_successful,
                cost=cost,
                cost_change=cost_change,
                gradient_max_norm=grad_max_f,
                step_norm=step_norm,
                relative_decrease=relative_decrease,
                trust_region_radius=mu,
                iteration_time_in_seconds=time.time() - it_t0,
                cumulative_time_in_seconds=time.time() - t_start,
            )
            summary.iterations.append(it_summary)

            if progress:
                print(
                    f"iter {iteration + 1:3d}  cost {cost:.6e}  "
                    f"change {cost_change:.3e}  |g| {grad_max_f:.3e}  "
                    f"tr {mu:.1e}  {'ok' if step_successful else 'reject'}"
                )

            term = run_callbacks(it_summary)
            if term is not None:
                termination = term
                message = "Terminated by user callback."
                break

            if step_successful:
                if abs(cost_change) <= function_tolerance * cost_i:
                    termination = TerminationType.Convergence
                    message = (
                        f"Function tolerance reached: |dc| = {abs(cost_change):.3e} "
                        f"<= {function_tolerance} * {cost_i:.3e}"
                    )
                    break
                if grad_max_f <= gradient_tolerance:
                    termination = TerminationType.Convergence
                    message = f"Gradient tolerance reached: {grad_max_f:.3e}"
                    break
            if mu < min_trust_region_radius:
                termination = TerminationType.Convergence
                message = "Trust region radius below minimum."
                break
    finally:
        # always finalize the profiler trace, even if a user callback or
        # compile error raises mid-solve (ADVICE r3)
        trace_cm.__exit__(None, None, None)

    if termination is None:
        termination = TerminationType.NoConvergence
        message = f"Maximum number of iterations reached ({max_iterations})."

    summary.termination_type = termination
    summary.message = message
    summary.final_cost = cost if cost is not None else 0.0
    summary.minimizer_time_in_seconds = time.time() - t_min_start
    summary.total_time_in_seconds = time.time() - t_start
    # Per-phase timing parity with Ceres (py_ceres.cc:29-43): each phase is
    # dispatched and synchronized separately, so these are honest wall times.
    summary.jacobian_evaluation_time_in_seconds = t_jacobian
    summary.linear_solver_time_in_seconds = t_linear
    summary.residual_evaluation_time_in_seconds = t_residual
    return state, summary


def trust_region_loop(one_step, cost0, state, *, max_iterations,
                      function_tolerance, dtype,
                      min_relative_decrease=1e-3,
                      max_trust_region_radius=1e16):
    """The single on-device Ceres-style trust-region accept/reject loop.

    Shared by every fused solver variant (dense, sharded, landmark-Schur,
    iterative, segment-sharded) so the policy — radius mu with damping
    1/mu, accept when relative decrease > 1e-3, Ceres radius update
    ``mu / max(1/3, 1 - (2 rho - 1)^3)`` on success, halving with an
    escalating decrease factor on failure — lives in exactly one place.

    ``one_step(state, lam)`` must return a tuple whose first four entries
    are ``(cost, new_state, new_cost, pred)`` (extra entries ignored).
    Traceable: runs as one ``lax.while_loop``, usable inside jit or
    shard_map. Returns ``(state, final_cost, iterations_run)``."""

    def cond(carry):
        state, mu, dec, cost, it, done = carry
        return (~done) & (it < max_iterations)

    def body(carry):
        state, mu, dec, cost, it, done = carry
        out = one_step(state, 1.0 / mu)
        cost_i, new_state, new_cost, pred = out[0], out[1], out[2], out[3]
        relative_decrease = jnp.where(pred > 0, (cost_i - new_cost) / pred, -1.0)
        ok = jnp.isfinite(new_cost) & (relative_decrease > min_relative_decrease)
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, b, a), state, new_state
        )
        mu_ok = mu / jnp.maximum(
            1.0 / 3.0, 1.0 - (2.0 * relative_decrease - 1.0) ** 3
        )
        mu = jnp.where(ok, jnp.minimum(mu_ok, max_trust_region_radius), mu / dec)
        dec = jnp.where(ok, 2.0, dec * 2.0)
        new_cost_sel = jnp.where(ok, new_cost, cost_i)
        done = ok & (jnp.abs(cost_i - new_cost) <= function_tolerance * cost_i)
        return (state, mu, dec, new_cost_sel, it + 1, done)

    mu0 = jnp.asarray(1e4, dtype)
    dec0 = jnp.asarray(2.0, dtype)
    carry = (state, mu0, dec0, cost0, jnp.asarray(0), jnp.asarray(False))
    state, mu, dec, cost, it, done = jax.lax.while_loop(cond, body, carry)
    return state, cost, it


def trust_region_loop_spec(step_spec, lin0, state, *, max_iterations,
                           function_tolerance, dtype,
                           min_relative_decrease=1e-3,
                           max_trust_region_radius=1e16):
    """Speculative-linearization variant of :func:`trust_region_loop`.

    Carries the linearization AT the current state in the loop; each body
    solves from the carried linearization, then linearizes the *candidate*
    in full — the candidate's cost term is the re-cost, and on accept its
    H/g blocks become the next iteration's linearization. Accepted LM
    iterations therefore stream the measurement data ONCE (linearize)
    instead of twice (linearize + residual re-cost), which matters because
    every solver config is HBM-bandwidth-bound (BENCH_NOTES roofline
    table). On reject the candidate's Jacobian work is discarded — the
    trade wins whenever rejects cost less than one residual pass per
    accepted step, which holds for the Ceres radius policy (rejects are
    rare after warmup). The iterate sequence is identical to
    ``trust_region_loop``: ``lin[0]`` is the same cost ``total_cost``
    computes (pinned by tests/test_residual_parity.py).

    ``step_spec(state, lin, lam) -> (new_state, new_lin, pred)``;
    ``lin0 = linearize(state0)`` with ``lin0[0]`` the initial cost.
    Returns ``(state, final_cost, iterations_run)``."""

    def cond(carry):
        state, lin, mu, dec, it, done = carry
        return (~done) & (it < max_iterations)

    def body(carry):
        state, lin, mu, dec, it, done = carry
        cost_i = lin[0]
        new_state, new_lin, pred = step_spec(state, lin, 1.0 / mu)
        new_cost = new_lin[0]
        relative_decrease = jnp.where(pred > 0, (cost_i - new_cost) / pred, -1.0)
        ok = jnp.isfinite(new_cost) & (relative_decrease > min_relative_decrease)
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, b, a), state, new_state
        )
        lin = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, b, a), lin, new_lin
        )
        mu_ok = mu / jnp.maximum(
            1.0 / 3.0, 1.0 - (2.0 * relative_decrease - 1.0) ** 3
        )
        mu = jnp.where(ok, jnp.minimum(mu_ok, max_trust_region_radius), mu / dec)
        dec = jnp.where(ok, 2.0, dec * 2.0)
        done = ok & (jnp.abs(cost_i - new_cost) <= function_tolerance * cost_i)
        return (state, lin, mu, dec, it + 1, done)

    mu0 = jnp.asarray(1e4, dtype)
    dec0 = jnp.asarray(2.0, dtype)
    carry = (state, lin0, mu0, dec0, jnp.asarray(0), jnp.asarray(False))
    state, lin, mu, dec, it, done = jax.lax.while_loop(cond, body, carry)
    return state, lin[0], it


def _make_spec_step(problem, strategy):
    """(linearize0, step_spec) closures for the speculative fused loop."""
    from .kernels import build_parts, problem_runtime, problem_spec

    if strategy == "auto":
        strategy = _resolve_auto(problem)
    spec = problem_spec(problem)
    runtime = problem_runtime(problem)
    x64 = jax.config.jax_enable_x64
    if strategy == "schur":
        from .schur import build_schur_parts

        parts = build_schur_parts(spec, x64)
    elif strategy == "iterative_schur":
        from .iterative import build_iterative_parts

        parts = build_iterative_parts(spec, x64)
    elif strategy == "banded":
        from .banded import build_banded_parts

        parts = build_banded_parts(spec, x64)
    else:
        parts = build_parts(spec, x64)
    lin = parts["linearize"]
    step_spec = parts["step_spec"]
    return (
        lambda state: lin(runtime, state),
        lambda state, l, lam: step_spec(runtime, state, l, lam),
    )


def make_fused_solver(problem: Problem, max_iterations=50, function_tolerance=1e-6,
                      strategy="auto"):
    """Fully on-device LM via lax.while_loop (no host round-trips).

    Used by benchmarks and the multi-chip path; no callbacks. Returns a
    jittable function state -> (state, final_cost, iterations_run).

    The Schur/iterative/banded strategies use the speculative-
    linearization loop (one measurement-data pass per accepted iteration;
    see :func:`trust_region_loop_spec`) — measured +9..13% on the camera
    configs, whose residual re-cost re-runs the full (re)projection chain.
    The dense strategy keeps the classic loop: its IMU/gyro re-cost runs a
    cheap cost-only kernel pass, so a speculative full linearize on
    rejected steps costs more than it saves (measured -1..-6%)."""
    resolved = _resolve_auto(problem) if strategy == "auto" else strategy
    if resolved not in ("schur", "iterative_schur", "banded"):
        step, total_cost = _make_step(problem, resolved)

        def solve_fn(state):
            cost0 = total_cost(state)
            return trust_region_loop(
                step, cost0, state,
                max_iterations=max_iterations,
                function_tolerance=function_tolerance,
                dtype=problem.mask.dtype,
            )

        return jax.jit(solve_fn)

    lin0_fn, step_spec = _make_spec_step(problem, resolved)

    def solve_fn(state):
        lin0 = lin0_fn(state)
        return trust_region_loop_spec(
            step_spec, lin0, state,
            max_iterations=max_iterations,
            function_tolerance=function_tolerance,
            dtype=problem.mask.dtype,
        )

    # jit at the top level: the loop builds fresh while_loop closures per
    # call, so an *eager* caller would miss the compile cache and
    # recompile the entire solve every invocation
    return jax.jit(solve_fn)
