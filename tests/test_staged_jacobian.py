"""The staged (bottlenecked) camera Jacobian must equal the monolithic
jacfwd exactly — same residuals, same dense row Jacobians, same landmark
columns. The staged path emits columns for the active 4-knot window only,
so equality is checked after densifying (J, cols) into [M, rdim, P]."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kontiki_tpu.solver import kernels as K
from kontiki_tpu.solver.problem import Problem
from kontiki_tpu.synthetic import make_rsvi_problem


def _densify(r, J, cols, P):
    rdim = r.shape[1]

    def to_dense(Jm, cm):
        return jnp.zeros((rdim, P), Jm.dtype).at[:, cm].add(Jm)

    return jax.vmap(to_dense)(J, cols)


@pytest.mark.parametrize("rs", ["static", "lifting"])
def test_staged_matches_monolithic(rs):
    prob = make_rsvi_problem(
        nviews=6, nlandmarks=9, imu_rate=0.0, seed=33, rs=rs, perturb_rho=0.1
    )
    # unlock the camera so the sensor/time-offset columns are live
    cam = prob["camera"]
    cam.relative_orientation_locked = False
    cam.relative_position_locked = False
    cam.max_time_offset = 0.01
    cam.time_offset_locked = False
    problem = Problem(prob["trajectory"], prob["measurements"])
    spec = K.problem_spec(problem)
    runtime = K.problem_runtime(problem)
    state = problem.state0
    P = spec.num_tangent

    bspec = spec.buckets[0]
    assert bspec.kind.startswith("rs_")
    res, flags = K._make_residual(spec, bspec)
    data = runtime["data"][0]

    # The staged flag is snapshotted on the BucketSpec (the hash key every
    # cache is keyed on), so both variants are selected by _replace.
    bs_mono = bspec._replace(staged=False)
    out_mono = jax.jit(
        lambda rt, st: K._bucket_terms(
            spec, bs_mono, res, flags, rt, st, data, True, split_rho=True
        )
    )(runtime, state)

    bs_staged = bspec._replace(staged=True)
    out_staged = jax.jit(
        lambda rt, st: K._bucket_terms(
            spec, bs_staged, res, flags, rt, st, data, True, split_rho=True
        )
    )(runtime, state)

    r_m, J_m, c_m, Jr_m = out_mono
    r_s, J_s, c_s, Jr_s = out_staged
    # staged columns are narrower (4-knot active windows, no readout slack)
    assert J_s.shape[2] < J_m.shape[2]
    np.testing.assert_allclose(np.asarray(r_s), np.asarray(r_m), rtol=1e-12, atol=1e-14)
    Jd_m = np.asarray(_densify(r_m, J_m, c_m, P))
    Jd_s = np.asarray(_densify(r_s, J_s, c_s, P))
    np.testing.assert_allclose(Jd_s, Jd_m, rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(np.asarray(Jr_s), np.asarray(Jr_m), rtol=1e-8, atol=1e-11)
