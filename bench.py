"""Headline benchmark: LM (bundle-adjustment) iterations/sec on the flagship
rolling-shutter visual-inertial problem (BASELINE.json config 4).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

One LM iteration = batched residual+Jacobian evaluation of every measurement,
Gauss-Newton normal-equation assembly, damped solve, manifold retraction,
re-cost, and the trust-region accept/reject update — the exact per-iteration
work Ceres does for the reference (trajectory_estimator.h:38-64). The whole
LM loop runs as ONE on-device ``lax.while_loop`` program (no host round
trips), so the number is device throughput, not dispatch latency.

Baseline: the reference publishes no numbers and cannot be built in this
image (no Ceres). Per BASELINE.md the baseline is *measured*: we use this
machine's CPU as the stand-in for "CPU Ceres" by running the identical
problem through this framework's own solver on the JAX CPU backend (same
algorithm, XLA-vectorized, all cores). The measured CPU number is cached in
BASELINE_MEASURED.json; delete it to re-measure.
vs_baseline = device iterations/sec / CPU iterations/sec.
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
# 200 Hz IMU -> ~10k residual blocks, a few hundred tangent dims.
SIZE = dict(nviews=64, nlandmarks=200, imu_rate=200.0, seed=3)
MAX_ITERS = 25


def measure_iterations_per_sec(force_cpu=False):
    os.environ.setdefault("KONTIKI_TPU_X64", "0")
    sys.path.insert(0, str(HERE))
    import jax

    if force_cpu:
        # Env vars are not enough: this image pre-targets a remote-TPU
        # platform at import time, so retarget the runtime explicitly.
        jax.config.update("jax_platforms", "cpu")
        import jax.extend.backend as _jeb

        _jeb.clear_backends()

    from kontiki_tpu.solver.lm import make_fused_solver
    from kontiki_tpu.solver.problem import Problem
    from kontiki_tpu.synthetic import make_rsvi_problem

    prob = make_rsvi_problem(**SIZE)
    problem = Problem(prob["trajectory"], prob["measurements"])
    solver = make_fused_solver(
        problem, max_iterations=MAX_ITERS, function_tolerance=0.0
    )

    # Warmup / compile.
    out = solver(problem.state0)
    jax.block_until_ready(out)
    iters_warm = int(out[2])

    t0 = time.perf_counter()
    out = solver(problem.state0)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    iters = int(out[2])
    assert iters == iters_warm and iters > 0
    return iters / dt, jax.default_backend()


def main():
    if os.environ.get("_KONTIKI_BENCH_CHILD"):
        ips, backend = measure_iterations_per_sec(force_cpu=True)
        print(json.dumps({"cpu_iterations_per_sec": ips, "backend": backend}))
        return

    value, backend = measure_iterations_per_sec()

    baseline = None
    if CACHE.exists():
        try:
            baseline = json.loads(CACHE.read_text()).get("cpu_iterations_per_sec")
        except Exception:
            baseline = None
    if baseline is None:
        env = dict(os.environ)
        env["_KONTIKI_BENCH_CHILD"] = "1"
        env["KONTIKI_TPU_X64"] = "0"
        try:
            out = subprocess.run(
                [sys.executable, __file__],
                env=env,
                capture_output=True,
                text=True,
                timeout=1800,
            )
            line = out.stdout.strip().splitlines()[-1]
            info = json.loads(line)
            assert info["backend"] == "cpu", info
            baseline = info["cpu_iterations_per_sec"]
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
