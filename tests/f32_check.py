"""Standalone f32-tier accuracy check (run in a fresh process with
KONTIKI_TPU_X64=0 — x64 is a process-level JAX setting, so the f32 path
cannot be exercised inside the x64 test process).

This is the exact configuration that runs on TPU hardware (no native f64):
the flagship RS-VI problem must converge to an acceptable aligned ATE in
pure float32. Exit code 0 = pass; prints the achieved metrics.
"""
import os
import sys

os.environ["KONTIKI_TPU_X64"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.extend.backend as _jeb

_jeb.clear_backends()

import numpy as np  # noqa: E402

import kontiki_tpu  # noqa: E402
from kontiki_tpu.config import default_dtype  # noqa: E402
from kontiki_tpu.solver.lm import solve  # noqa: E402
from kontiki_tpu.solver.problem import Problem  # noqa: E402
from kontiki_tpu.synthetic import make_rsvi_problem, trajectory_ate  # noqa: E402

assert default_dtype == np.float32, default_dtype

prob = make_rsvi_problem(
    nviews=8, nlandmarks=24, imu_rate=100.0, seed=12, perturb_rho=0.05,
    sigma_p=0.02, sigma_q=0.01,
)
problem = Problem(prob["trajectory"], prob["measurements"])
assert problem.state0["r3"].dtype == np.float32

t1, t2 = prob["views"][0].t0, prob["views"][-1].t0
ate0 = trajectory_ate(prob["true_trajectory"], prob["trajectory"], t1, t2, align="se3")
state, summary = solve(problem, max_iterations=40)
problem.write_back(state)
ate = trajectory_ate(prob["true_trajectory"], prob["trajectory"], t1, t2, align="se3")
cost_drop = summary.final_cost / max(summary.initial_cost, 1e-30)
print(f"f32 tier: cost {summary.initial_cost:.4e} -> {summary.final_cost:.4e} "
      f"(x{cost_drop:.2e}), aligned ATE {ate0:.3e} -> {ate:.3e} m, "
      f"{summary.num_successful_steps} accepted steps")
assert ate < ate0, (ate, ate0)

# Precision policy (documented in config.py): f32 state + f32 normal
# equations must reach sub-millimeter ATE on meter-scale trajectories —
# ~1e-4 relative accuracy, comfortably inside f32's ~1e-7 epsilon budget
# after Schur elimination keeps the reduced system well-conditioned.
assert cost_drop < 1e-6, cost_drop
assert ate < 2e-3, ate
print("F32 TIER OK")
