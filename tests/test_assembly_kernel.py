"""Pallas Gauss-Newton assembly kernel vs the scatter reference.

Runs in interpret mode on the CPU backend; the same kernel compiles to
Mosaic on TPU where it replaces the scatter assembly in the Schur path."""
import jax.numpy as jnp
import numpy as np
import pytest

from kontiki_tpu.ops.assembly_kernels import assemble_schur_blocks


def _reference(Jw, cols, rw, J_rho, lid, P, L):
    M, rdim, C = Jw.shape
    H = np.zeros((P, P))
    g = np.zeros(P)
    E = np.zeros((L, P))
    D = np.zeros(L)
    gl = np.zeros(L)
    for m in range(M):
        Jd = np.zeros((rdim, P))
        for c in range(C):
            Jd[:, cols[m, c]] += Jw[m, :, c]
        H += Jd.T @ Jd
        g += Jd.T @ rw[m]
        e = J_rho[m] @ Jd
        E[lid[m]] += e
        D[lid[m]] += J_rho[m] @ J_rho[m]
        gl[lid[m]] += J_rho[m] @ rw[m]
    return H, g, E, D, gl


@pytest.mark.parametrize("M,rdim,C,P,L", [(37, 2, 11, 29, 5), (130, 3, 7, 150, 20)])
def test_assemble_schur_blocks_matches_reference(M, rdim, C, P, L):
    rng = np.random.default_rng(0)
    Jw = rng.normal(size=(M, rdim, C))
    cols = rng.integers(0, P, size=(M, C))
    # duplicate columns within a row must accumulate
    cols[:, 1] = cols[:, 0]
    rw = rng.normal(size=(M, rdim))
    J_rho = rng.normal(size=(M, rdim))
    lid = rng.integers(0, L, size=M)

    H, g, E, D, gl = assemble_schur_blocks(
        jnp.asarray(Jw), jnp.asarray(cols, dtype=jnp.int32), jnp.asarray(rw),
        jnp.asarray(J_rho), jnp.asarray(lid, dtype=jnp.int32),
        P=P, L=L, with_rho=True, interpret=True,
    )
    H0, g0, E0, D0, gl0 = _reference(Jw, cols, rw, J_rho, lid, P, L)
    np.testing.assert_allclose(np.asarray(H), H0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g), g0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(E), E0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(D), D0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gl), gl0, rtol=1e-10, atol=1e-12)


def test_assemble_without_rho():
    rng = np.random.default_rng(1)
    M, rdim, C, P = 40, 3, 9, 33
    Jw = rng.normal(size=(M, rdim, C))
    cols = rng.integers(0, P, size=(M, C))
    rw = rng.normal(size=(M, rdim))
    H, g, E, D, gl = assemble_schur_blocks(
        jnp.asarray(Jw), jnp.asarray(cols, dtype=jnp.int32), jnp.asarray(rw),
        jnp.zeros((M, rdim)), jnp.zeros(M, dtype=jnp.int32),
        P=P, L=1, with_rho=False, interpret=True,
    )
    H0, g0, *_ = _reference(Jw, cols, rw, np.zeros((M, rdim)), np.zeros(M, int), P, 1)
    np.testing.assert_allclose(np.asarray(H), H0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g), g0, rtol=1e-10, atol=1e-12)
    assert E is None and D is None and gl is None


def test_schur_step_with_forced_pallas_assembly(monkeypatch):
    """End-to-end: the Schur step with the Pallas assembly (interpret mode)
    equals the scatter-path step."""
    from kontiki_tpu.solver import schur as schur_mod
    from kontiki_tpu.solver.problem import Problem
    from kontiki_tpu.synthetic import make_rsvi_problem

    prob = make_rsvi_problem(nviews=5, nlandmarks=7, imu_rate=40.0, seed=23)
    problem = Problem(prob["trajectory"], prob["measurements"])
    ref_step, _ = schur_mod.make_schur_step(problem)
    out_ref = ref_step(problem.state0, 1e-3)

    monkeypatch.setattr(schur_mod, "_ASSEMBLY_ENV", "pallas")
    schur_mod.build_schur_parts.cache_clear()
    schur_mod._build_schur_solver.cache_clear()
    try:
        pl_step, _ = schur_mod.make_schur_step(problem)
        out_pl = pl_step(problem.state0, 1e-3)
    finally:
        monkeypatch.setattr(schur_mod, "_ASSEMBLY_ENV", "dense")
        schur_mod.build_schur_parts.cache_clear()
        schur_mod._build_schur_solver.cache_clear()
    np.testing.assert_allclose(float(out_pl[0]), float(out_ref[0]), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(out_pl[4]), np.asarray(out_ref[4]), rtol=1e-7, atol=1e-11
    )
