"""Block-tridiagonal exact solve: must equal the dense damped solve, and
must scale to 10k+ knots without any dense [Pc, Pc] allocation."""
import jax.numpy as jnp
import numpy as np
import pytest

from kontiki_tpu.solver.banded import block_tridiag_solve, make_banded_step
from kontiki_tpu.solver.kernels import make_step
from kontiki_tpu.solver.problem import Problem, RawBucket, RawProblem
from kontiki_tpu.synthetic import make_gyro_problem, make_imu_problem


def test_block_tridiag_solve_matches_dense():
    rng = np.random.default_rng(0)
    nb, d, R = 7, 5, 3
    D = rng.normal(size=(nb, d, d))
    D = np.einsum("kij,klj->kil", D, D) + 5.0 * np.eye(d)
    U = 0.3 * rng.normal(size=(nb, d, d))
    T = np.zeros((nb * d, nb * d))
    for k in range(nb):
        T[k * d:(k + 1) * d, k * d:(k + 1) * d] = D[k]
        if k + 1 < nb:
            T[k * d:(k + 1) * d, (k + 1) * d:(k + 2) * d] = U[k]
            T[(k + 1) * d:(k + 2) * d, k * d:(k + 1) * d] = U[k].T
    rhs = rng.normal(size=(nb, d, R))
    x = np.asarray(block_tridiag_solve(jnp.asarray(D), jnp.asarray(U), jnp.asarray(rhs)))
    x_dense = np.linalg.solve(T, rhs.reshape(-1, R))
    np.testing.assert_allclose(x.reshape(-1, R), x_dense, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("maker", [make_gyro_problem, make_imu_problem])
def test_banded_step_equals_dense_step(maker):
    prob = maker(duration=2.5, rate=60.0, seed=7)
    problem = Problem(prob["trajectory"], prob["measurements"])
    dense_step, _ = make_step(problem)
    banded_step, _ = make_banded_step(problem)
    for lam in (1e-4, 1e-1):
        cd, sd, ncd, pd, dd, gd = dense_step(problem.state0, lam)
        cb, sb, ncb, pb, db, gb = banded_step(problem.state0, lam)
        np.testing.assert_allclose(float(cb), float(cd), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(db), np.asarray(dd), rtol=1e-7, atol=1e-11)
        np.testing.assert_allclose(float(ncb), float(ncd), rtol=1e-8)
        np.testing.assert_allclose(float(pb), float(pd), rtol=1e-8)
        np.testing.assert_allclose(float(gb), float(gd), rtol=1e-12)


def test_banded_10k_knots_single_chip():
    """10k+ knots: the dense normal equations would be ~7 GB; the banded
    solve runs it exactly in O(n). (VERDICT r1 item 2.)"""
    from kontiki_tpu.synthetic import make_so3_trajectory, _body_imu

    n_knots = 10_050
    dt = 0.1
    duration = (n_knots - 4) * dt
    traj = make_so3_trajectory(duration, dt=dt, seed=3, wmag=0.3)
    ts = np.arange(0.5, duration - 0.5, 0.05)  # 20 Hz gyro
    w, _ = _body_imu(traj, ts)
    data = {
        "t": jnp.asarray(ts),
        "y": jnp.asarray(w),
        "weight": jnp.asarray(np.ones(len(ts))),
        "sid": jnp.asarray(np.zeros(len(ts), np.int32)),
    }
    bucket = RawBucket(kind="gyro", M=len(ts), rdim=3, data=data,
                       window={"so3": 4})
    knots = np.asarray(traj.knots)
    rng = np.random.default_rng(1)
    # perturb so the step has something to do
    pert = knots + rng.normal(scale=1e-3, size=knots.shape)
    pert /= np.linalg.norm(pert, axis=1, keepdims=True)
    problem = RawProblem(
        splines=[("so3", pert, traj.t0, dt)],
        buckets={"gyro": bucket},
        sensors={
            "q_ct": np.tile([1.0, 0, 0, 0], (1, 1)),
            "p_ct": np.zeros((1, 3)),
            "d": np.zeros(1),
            "abias": np.zeros((1, 3)),
            "gbias": np.zeros((1, 3)),
            "mask": np.zeros((1, 13)),
            "d_max": np.zeros(1),
        },
        rho=np.zeros(0),
    )
    assert problem.num_tangent > 30_000
    step, cost_fn = make_banded_step(problem)
    c0, new_state, nc, pred, delta, g = step(problem.state0, 1e-2)
    assert float(nc) < float(c0)
    assert np.isfinite(np.asarray(delta)).all()


def test_spike_matches_sequential_solve():
    """The distributed SPIKE solve must equal the sequential block Cholesky
    to roundoff, for several shard counts and block sizes."""
    import jax
    from jax.sharding import PartitionSpec as P

    from kontiki_tpu.parallel import default_mesh, MEASUREMENT_AXIS
    from kontiki_tpu.solver.banded import (
        block_tridiag_solve,
        spike_block_tridiag_solve,
    )

    rng = np.random.default_rng(0)
    for n, sb, B, R in ((2, 3, 5, 2), (4, 2, 7, 1), (8, 4, 6, 3)):
        nb = n * sb
        # random SPD block-tridiagonal system
        U = rng.normal(size=(nb, B, B)) * 0.3
        U[-1] = 0.0
        D = np.einsum("kij,klj->kil", U, U) * 0 + np.stack(
            [np.eye(B) * (B + 2.0) for _ in range(nb)]
        )
        D += np.stack([a @ a.T for a in rng.normal(size=(nb, B, B))]) * 0.1
        rhs = rng.normal(size=(nb, B, R))

        ref = np.asarray(block_tridiag_solve(
            jnp.asarray(D), jnp.asarray(U), jnp.asarray(rhs)))

        mesh = default_mesh(n_devices=n)
        sm = jax.jit(jax.shard_map(
            lambda d, u, r: spike_block_tridiag_solve(
                d, u, r, MEASUREMENT_AXIS, n),
            mesh=mesh,
            in_specs=(P(MEASUREMENT_AXIS), P(MEASUREMENT_AXIS),
                      P(MEASUREMENT_AXIS)),
            out_specs=P(MEASUREMENT_AXIS),
            check_vma=False,
        ))
        got = np.asarray(sm(jnp.asarray(D), jnp.asarray(U), jnp.asarray(rhs)))
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-10,
                                   err_msg=f"n={n} sb={sb}")
