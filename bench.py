"""Headline benchmark: LM (bundle-adjustment) iterations/sec on the flagship
rolling-shutter visual-inertial problem (BASELINE.json config 4).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

One LM iteration = batched residual+Jacobian evaluation of every measurement,
Gauss-Newton normal-equation assembly, damped solve, manifold retraction, and
re-cost — the exact per-iteration work Ceres does for the reference
(trajectory_estimator.h:38-64), fully on-device.

Baseline: the reference publishes no numbers and cannot be built in this
image (no Ceres). Per BASELINE.md the baseline is *measured*: we use this
machine's CPU as the stand-in for "CPU Ceres" by running the identical
problem through this framework's own solver on the JAX CPU backend (a strong
CPU baseline: same algorithm, XLA-vectorized, all cores). The measured CPU
number is cached in BASELINE_MEASURED.json; delete it to re-measure.
vs_baseline = TPU iterations/sec / CPU iterations/sec.
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
CACHE = HERE / "BASELINE_MEASURED.json"

# Flagship problem size: ~2s of trajectory at 30 fps, 200 landmarks,
# 200 Hz IMU -> a few thousand residual blocks, a few hundred tangent dims.
SIZE = dict(nviews=64, nlandmarks=200, imu_rate=200.0, seed=3)
N_TIMED = 20


def measure_iterations_per_sec():
    os.environ.setdefault("KONTIKI_TPU_X64", "0")
    sys.path.insert(0, str(HERE))
    import jax

    from kontiki_tpu.solver.kernels import make_step
    from kontiki_tpu.solver.problem import Problem
    from kontiki_tpu.synthetic import make_rsvi_problem

    prob = make_rsvi_problem(**SIZE)
    problem = Problem(prob["trajectory"], prob["measurements"])
    step, cost = make_step(problem)

    lam = 1e-4
    # Warmup / compile.
    out = step(problem.state0, lam)
    jax.block_until_ready(out)

    state = problem.state0
    t0 = time.perf_counter()
    for _ in range(N_TIMED):
        out = step(state, lam)
        state = out[1]
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return N_TIMED / dt, problem.num_residuals


def main():
    if os.environ.get("_KONTIKI_BENCH_CHILD"):
        ips, _ = measure_iterations_per_sec()
        print(json.dumps({"cpu_iterations_per_sec": ips}))
        return

    value, num_residuals = measure_iterations_per_sec()

    baseline = None
    if CACHE.exists():
        try:
            baseline = json.loads(CACHE.read_text()).get("cpu_iterations_per_sec")
        except Exception:
            baseline = None
    if baseline is None:
        env = dict(os.environ)
        env.update(
            _KONTIKI_BENCH_CHILD="1",
            JAX_PLATFORMS="cpu",
            KONTIKI_TPU_X64="0",
        )
        try:
            out = subprocess.run(
                [sys.executable, __file__],
                env=env,
                capture_output=True,
                text=True,
                timeout=1800,
            )
            line = out.stdout.strip().splitlines()[-1]
            baseline = json.loads(line)["cpu_iterations_per_sec"]
            CACHE.write_text(json.dumps({"cpu_iterations_per_sec": baseline}))
        except Exception:
            baseline = None

    print(
        json.dumps(
            {
                "metric": "rs_vi_ba_iterations_per_sec",
                "value": round(value, 3),
                "unit": "iterations/sec",
                "vs_baseline": round(value / baseline, 3) if baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
