"""Benchmark matrix: LM (bundle-adjustment) iterations/sec on all five
BASELINE.json configs, headline = config 4 (rolling-shutter visual-inertial
on the SE3 spline).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
     "configs": {...}, "sharding_efficiency_cpu8": E}

One LM iteration = batched residual+Jacobian evaluation of every measurement,
Gauss-Newton assembly (dense, exact-Schur, or matrix-free iterative-Schur
depending on config), damped solve, manifold retraction, re-cost, and the
trust-region update — the per-iteration work Ceres does for the reference
(trajectory_estimator.h:38-64). Each config's LM loop runs as ONE on-device
``lax.while_loop`` program, so numbers are device throughput, not dispatch.

Baseline: the reference publishes no numbers and cannot be built in this
image (no Ceres). Per BASELINE.md the baseline is *measured*: the identical
problems run through this framework's own solver on the JAX CPU backend
(same algorithm, XLA-vectorized, all cores) stand in for "CPU Ceres".
Baselines are cached in BASELINE_MEASURED.json; delete it to re-measure.
vs_baseline = TPU iterations/sec / CPU iterations/sec (config 4).

"sharding_efficiency_cpu8" exercises the multi-chip code path on the
8-virtual-device CPU mesh: T_1dev / T_8dev for the same total work. The
devices share the same host cores, so the ideal value is 1.0 and the
deviation measures collective + padding overhead of the sharded program
(real cross-chip scaling needs a pod; see parallel/distributed.py).
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
CACHE = HERE / "BASELINE_MEASURED.json"

MAX_ITERS = {"config1": 25, "config2": 25, "config3": 25, "config4": 25,
             "config4_newton": 25, "config5": 6}


def _build_solver(name):
    """Build (solver_fn, state0) for one BASELINE config."""
    from kontiki_tpu import parallel
    from kontiki_tpu.solver.lm import make_fused_solver
    from kontiki_tpu.solver.problem import Problem
    from kontiki_tpu.synthetic import (
        make_big_ba_problem,
        make_gyro_problem,
        make_imu_problem,
        make_rsvi_problem,
    )

    iters = MAX_ITERS[name]
    if name == "config1":  # gyro-only SO3 spline fit
        prob = make_gyro_problem(duration=5.0, rate=200.0, seed=1)
        problem = Problem(prob["trajectory"], prob["measurements"])
        return make_fused_solver(problem, iters, function_tolerance=0.0), problem.state0
    if name == "config2":  # full IMU fusion, split R3/SO3, gravity + bias
        prob = make_imu_problem(duration=5.0, rate=200.0, seed=2)
        problem = Problem(prob["trajectory"], prob["measurements"])
        return make_fused_solver(problem, iters, function_tolerance=0.0), problem.state0
    if name == "config3":  # global-shutter SfM, Schur elimination
        prob = make_rsvi_problem(nviews=32, nlandmarks=200, imu_rate=0.0, seed=3)
        problem = Problem(prob["trajectory"], prob["measurements"])
        return (
            make_fused_solver(problem, iters, function_tolerance=0.0, strategy="schur"),
            problem.state0,
        )
    if name == "config4":  # rolling-shutter VI on the SE3 spline (flagship)
        prob = make_rsvi_problem(
            nviews=64, nlandmarks=200, imu_rate=200.0, seed=4, trajectory="se3"
        )
        problem = Problem(prob["trajectory"], prob["measurements"])
        return (
            make_fused_solver(problem, iters, function_tolerance=0.0, strategy="schur"),
            problem.state0,
        )
    if name == "config4_newton":
        # flagship problem with NewtonRsCameraMeasurement rows (reference
        # newton_rscamera_measurement.h): exercises the fused Newton
        # linearization (TPU-only bench line; the CPU jacfwd fallback at
        # this scale is minutes per solve and has no cached baseline)
        prob = make_rsvi_problem(
            nviews=64, nlandmarks=200, imu_rate=200.0, seed=4,
            rs="newton", trajectory="split"
        )
        problem = Problem(prob["trajectory"], prob["measurements"])
        return (
            make_fused_solver(problem, iters, function_tolerance=0.0, strategy="schur"),
            problem.state0,
        )
    if name == "config5":
        # long-sequence BA at the BASELINE-specified scale (10k+ keyframes,
        # 100k+ landmarks): composed knot-segment x landmark-block sharding
        # with the banded-direct reduced solve (exact, scatter-free assembly)
        from kontiki_tpu.parallel.segments_ba import make_segment_ba_solver

        big = make_big_ba_problem(
            n_views=10_000, n_landmarks=100_000, obs_per_landmark=5, seed=5
        )
        problem = big["problem"]
        mesh = parallel.default_mesh(n_devices=1)
        solver = make_segment_ba_solver(
            problem, mesh, max_iterations=iters, function_tolerance=0.0,
            mode="banded",
        )
        return solver, problem.state0
    raise ValueError(name)


#: timing repetitions per config: the small configs are latency-bound on
#: the tunneled chip and historically swung +-30% run to run — medians over
#: many repeats replace single-shot numbers (VERDICT r3 weak #5)
REPEATS = {"config1": 21, "config2": 21, "config3": 7, "config4": 7,
           "config4_newton": 7, "config5": 3}


def _measure(name):
    import statistics

    import jax

    solver, state0 = _build_solver(name)
    out = solver(state0)  # warmup/compile
    jax.block_until_ready(out)
    iters_warm = int(out[2])
    samples = []
    for _ in range(REPEATS.get(name, 3)):
        t0 = time.perf_counter()
        out = solver(state0)
        jax.block_until_ready(out)
        samples.append(time.perf_counter() - t0)
    iters = int(out[2])
    assert iters == iters_warm and iters > 0, (name, iters, iters_warm)
    med = statistics.median(samples)
    spread = (max(samples) - min(samples)) / med
    return iters / med, round(spread, 3)


def measure_all(force_cpu=False):
    os.environ.setdefault("KONTIKI_TPU_X64", "0")
    sys.path.insert(0, str(HERE))
    import jax

    if force_cpu:
        # Env vars are not enough: this image pre-targets a remote-TPU
        # platform at import time, so retarget the runtime explicitly.
        jax.config.update("jax_platforms", "cpu")
        import jax.extend.backend as _jeb

        _jeb.clear_backends()

    results = {}
    spreads = {}
    for name in ("config1", "config2", "config3", "config4", "config5"):
        its, spread = _measure(name)
        results[name] = round(its, 4)
        spreads[name] = spread
    return results, spreads, jax.default_backend()


def measure_scipy_config1():
    """Second, implementation-independent CPU reference (VERDICT r3 #2):
    scipy.optimize.least_squares (TRF, grouped finite differences via
    jac_sparsity — the reference's own tests lean on scipy) on the exact
    bench config-1 problem, residuals through the object API. This
    anchors the self-referential CPU baseline: the framework's own CPU
    backend must not be slower than a generic sparse least-squares
    solver, or the TPU/CPU ratios would be inflated."""
    import numpy as np
    from scipy.optimize import least_squares
    from scipy.sparse import lil_matrix

    from kontiki_tpu.rotations import quat_to_rotation_matrix
    from kontiki_tpu.synthetic import make_gyro_problem

    prob = make_gyro_problem(duration=5.0, rate=200.0, seed=1)
    traj, ms = prob["trajectory"], prob["measurements"]
    n = len(traj)
    x0 = np.concatenate([np.asarray(traj[i]) for i in range(n)])
    t = np.array([m.t for m in ms])
    w = np.stack([m.w for m in ms])

    def fun(x):
        for i in range(n):
            q = x[4 * i: 4 * i + 4]
            traj[i] = q / np.linalg.norm(q)
        res = traj._eval(t)
        q = np.asarray(res["orientation"])
        om = np.asarray(res["angular_velocity"])
        out = np.empty_like(w)
        for i in range(len(t)):
            out[i] = w[i] - quat_to_rotation_matrix(q[i]).T @ om[i]
        return out.ravel()

    S = lil_matrix((3 * len(t), 4 * n), dtype=np.int8)
    i0 = np.clip(
        np.floor((t - traj.t0) / traj.dt).astype(int), 0, n - 4
    )
    for r, i in enumerate(i0):
        S[3 * r: 3 * r + 3, 4 * i: 4 * i + 16] = 1
    t0_ = time.perf_counter()
    res = least_squares(
        fun, x0, jac_sparsity=S.tocsr(), method="trf",
        xtol=1e-12, ftol=1e-12, gtol=1e-10,
    )
    dt_ = time.perf_counter() - t0_
    return {
        "seconds": round(dt_, 2),
        "iterations": int(res.njev),
        "it_per_sec": round(res.njev / dt_, 3),
        "cost": float(res.cost),
    }


def measure_sharding_efficiency(repeats=9):
    """T_1dev / T_8dev on the virtual CPU mesh for two sharded programs
    (ideal 1.0: the 8 virtual devices share the same host cores, so any
    deviation measures collective + padding overhead, not real scaling).
    Each timing is the median of ``repeats`` runs with the interquartile
    spread reported alongside — min-of-3 on a shared-core host swings by
    tens of percent (the r2 1.17-vs-0.81 discrepancy; VERDICT r3 weak #1)."""
    import statistics

    import jax
    from kontiki_tpu import parallel
    from kontiki_tpu.solver.problem import Problem
    from kontiki_tpu.synthetic import make_big_ba_problem, make_gyro_problem

    def _ratio(build):
        med = {}
        spread = {}
        for n in (1, 8):
            solver = build(n)
            out = solver()
            jax.block_until_ready(out)
            samples = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                out = solver()
                jax.block_until_ready(out)
                samples.append(time.perf_counter() - t0)
            samples.sort()
            med[n] = statistics.median(samples)
            q = len(samples) // 4
            spread[n] = (samples[-1 - q] - samples[q]) / med[n]
        return (
            round(med[1] / med[8], 3),
            round(max(spread[1], spread[8]), 3),
        )

    big = make_big_ba_problem(
        n_views=240, n_landmarks=4000, obs_per_landmark=4, seed=7
    )
    ba = big["problem"]

    def build_iter(n):
        solver = parallel.make_sharded_iterative_solver(
            ba, parallel.default_mesh(n_devices=n), max_iterations=6,
            function_tolerance=0.0, cg_tol=1e-4, cg_maxiter=40,
        )
        return lambda: solver(ba.state0)

    gy = make_gyro_problem(duration=20.0, rate=400.0, seed=7)
    gyp = Problem(gy["trajectory"], gy["measurements"])

    def build_seg(n):
        solver = parallel.make_segment_sharded_solver(
            gyp, parallel.default_mesh(n_devices=n), max_iterations=6,
            function_tolerance=0.0,
        )
        return lambda: solver(gyp.state0)

    it_r, it_s = _ratio(build_iter)
    seg_r, seg_s = _ratio(build_seg)
    return {
        "iterative": it_r, "iterative_spread": it_s,
        "segments": seg_r, "segments_spread": seg_s,
    }


def main():
    if os.environ.get("_KONTIKI_BENCH_CHILD") == "cpu":
        results, spreads, backend = measure_all(force_cpu=True)
        assert backend == "cpu", backend
        print(json.dumps({"cpu": results, "cpu_spreads": spreads}))
        return
    if os.environ.get("_KONTIKI_BENCH_CHILD") == "scipy":
        os.environ.setdefault("KONTIKI_TPU_X64", "0")
        sys.path.insert(0, str(HERE))
        import jax

        jax.config.update("jax_platforms", "cpu")
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
        print(json.dumps({"scipy": measure_scipy_config1()}))
        return
    if os.environ.get("_KONTIKI_BENCH_CHILD") == "mesh":
        os.environ.setdefault("KONTIKI_TPU_X64", "0")
        sys.path.insert(0, str(HERE))
        import jax

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        jax.config.update("jax_platforms", "cpu")
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
        print(json.dumps({"eff": measure_sharding_efficiency()}))
        return

    results, spreads, backend = measure_all()
    if backend == "tpu":
        try:
            its, spread = _measure("config4_newton")
            results["config4_newton"] = round(its, 4)
            spreads["config4_newton"] = spread
        except Exception:
            pass

    baselines = None
    if CACHE.exists():
        try:
            data = json.loads(CACHE.read_text())
            if "configs" in data:
                baselines = data["configs"]
        except Exception:
            baselines = None

    def _child(kind, timeout):
        env = dict(os.environ)
        env["_KONTIKI_BENCH_CHILD"] = kind
        env["KONTIKI_TPU_X64"] = "0"
        out = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True,
            text=True, timeout=timeout,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])

    scipy_ref = None
    if CACHE.exists():
        try:
            scipy_ref = json.loads(CACHE.read_text()).get("scipy_config1")
        except Exception:
            scipy_ref = None
    if baselines is None:
        try:
            baselines = _child("cpu", 3000)["cpu"]
            CACHE.write_text(json.dumps({"configs": baselines}))
        except Exception:
            baselines = None
    if scipy_ref is None:
        try:
            scipy_ref = _child("scipy", 1200)["scipy"]
            data = json.loads(CACHE.read_text()) if CACHE.exists() else {}
            data["scipy_config1"] = scipy_ref
            CACHE.write_text(json.dumps(data))
        except Exception:
            scipy_ref = None

    try:
        eff = _child("mesh", 1800)["eff"]
    except Exception:
        eff = None

    value = results["config4"]
    base4 = baselines.get("config4") if baselines else None
    print(
        json.dumps(
            {
                "metric": "rs_vi_se3_ba_iterations_per_sec",
                "value": value,
                "unit": "iterations/sec",
                "vs_baseline": round(value / base4, 3) if base4 else None,
                "configs": results,
                "config_spreads": spreads,
                "cpu_baseline_configs": baselines,
                "backend": backend,
                "scipy_cpu_config1": scipy_ref,
                "sharding_efficiency_cpu8": eff,
            }
        )
    )


if __name__ == "__main__":
    main()
