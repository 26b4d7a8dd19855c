"""Pallas TPU kernel: Gauss-Newton assembly from compressed row Jacobians.

This is the measured hot spot of the LM step after the Jacobian evaluation
itself (reference hot loop #3, SURVEY §3.2): turning per-row compressed
Jacobians ``Jw [M, rdim, C]`` + column ids ``cols [M, C]`` into the
Gauss-Newton blocks. The XLA path scatters each row into a dense
``[rdim, P]`` row (2M+ scattered elements — scatters serialize on TPU,
~57 ms of a 131 ms linearize on the flagship problem); this kernel instead

- tiles rows into VMEM (all operands flattened to 2D blocks: Mosaic
  requires block offsets only along tiled leading dims),
- expands each tile to dense row-Jacobians with a one-hot *compare*
  against a column iota (pure VPU, entirely in VMEM),
- accumulates ``H += Jd^T Jd`` and ``g += Jd^T r`` on the MXU,
- and (camera buckets) accumulates the landmark-elimination blocks
  ``E += onehot(lid)^T (J_rho . Jd)``, ``D``, ``g_l`` as one-hot matmuls —

so nothing is ever scattered to HBM; the only HBM traffic is streaming the
compressed rows in once and writing the [P, P] result at the end.

Applicability gate: the accumulators must fit VMEM (P and L padded to 128
lanes; P_pad, L_pad <= 1024 covers the per-chip reduced systems — larger
problems use the iterative matrix-free path which has no dense assembly).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _make_kernel(rdim, C, Pp, Lp, with_rho, dtype):
    def kernel(Jw_ref, cols_ref, rw_ref, Jrho_ref, lid_ref,
               H_ref, g_ref, E_ref, D_ref, gl_ref, jd):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            H_ref[:] = jnp.zeros_like(H_ref)
            g_ref[:] = jnp.zeros_like(g_ref)
            E_ref[:] = jnp.zeros_like(E_ref)
            D_ref[:] = jnp.zeros_like(D_ref)
            gl_ref[:] = jnp.zeros_like(gl_ref)

        # dense row-Jacobian tile via one-hot compare (VPU, VMEM-resident);
        # jd rows are r-major: row r*TILE + m is measurement m's residual r.
        iota_p = jax.lax.broadcasted_iota(jnp.int32, (TILE, Pp), 1)
        acc = jnp.zeros((rdim * TILE, Pp), dtype)
        for c in range(C):
            onehot = (cols_ref[:, c][:, None] == iota_p).astype(dtype)
            parts = [
                Jw_ref[:, r * C + c][:, None] * onehot for r in range(rdim)
            ]
            acc = acc + jnp.concatenate(parts, axis=0)
        jd[:] = acc

        jdv = jd[:]
        H_ref[:] += jax.lax.dot_general(
            jdv, jdv, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=dtype,
        )
        gacc = jnp.zeros((1, Pp), dtype)
        for r in range(rdim):
            blk = jdv[r * TILE:(r + 1) * TILE, :]
            gacc += jnp.sum(
                blk * rw_ref[:, r][:, None], axis=0, keepdims=True
            )
        g_ref[:] += gacc

        if with_rho:
            # per-row landmark column e_m = sum_r Jrho[m, r] * jd[r, m, :]
            A = jnp.zeros((TILE, Pp), dtype)
            d_row = jnp.zeros((TILE,), dtype)
            gl_row = jnp.zeros((TILE,), dtype)
            for r in range(rdim):
                A += Jrho_ref[:, r][:, None] * jdv[r * TILE:(r + 1) * TILE, :]
                d_row += Jrho_ref[:, r] * Jrho_ref[:, r]
                gl_row += Jrho_ref[:, r] * rw_ref[:, r]
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (TILE, Lp), 1)
            oh_l = (lid_ref[:, 0][:, None] == iota_l).astype(dtype)
            E_ref[:] += jax.lax.dot_general(
                oh_l, A, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=dtype,
            )
            D_ref[:] += jnp.sum(oh_l * d_row[:, None], axis=0, keepdims=True)
            gl_ref[:] += jnp.sum(oh_l * gl_row[:, None], axis=0, keepdims=True)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("P", "L", "with_rho", "interpret")
)
def assemble_schur_blocks(Jw, cols, rw, J_rho, lid, *, P, L, with_rho,
                          interpret=False):
    """(H [P,P], g [P], E [L,P], D [L], g_l [L]) from one bucket's rows.

    ``Jw`` must already be lock-masked and robust-whitened; ``cols`` are
    c-space column ids. With ``with_rho=False`` the landmark outputs are
    ``None``."""
    M, rdim, C = Jw.shape
    dtype = Jw.dtype
    Pp = _round_up(max(P, 1), 128)
    Lp = _round_up(max(L, 1), 128) if with_rho else 128
    Mp = _round_up(max(M, 1), TILE)
    # 2D operands only (Mosaic block-offset constraint); r-major Jw columns.
    Jw2 = Jw.transpose(0, 1, 2).reshape(M, rdim * C)
    lid2 = lid.astype(jnp.int32).reshape(M, 1)
    cols2 = cols.astype(jnp.int32)
    if Mp != M:
        pad = Mp - M
        Jw2 = jnp.concatenate([Jw2, jnp.zeros((pad, rdim * C), dtype)], axis=0)
        cols2 = jnp.concatenate(
            [cols2, jnp.zeros((pad, C), cols2.dtype)], axis=0
        )
        rw = jnp.concatenate([rw, jnp.zeros((pad, rdim), dtype)], axis=0)
        J_rho = jnp.concatenate([J_rho, jnp.zeros((pad, rdim), dtype)], axis=0)
        lid2 = jnp.concatenate([lid2, jnp.zeros((pad, 1), lid2.dtype)], axis=0)
    n_tiles = Mp // TILE

    kernel = _make_kernel(rdim, C, Pp, Lp, with_rho, dtype)
    out_shapes = (
        jax.ShapeDtypeStruct((Pp, Pp), dtype),
        jax.ShapeDtypeStruct((1, Pp), dtype),
        jax.ShapeDtypeStruct((Lp, Pp), dtype),
        jax.ShapeDtypeStruct((1, Lp), dtype),
        jax.ShapeDtypeStruct((1, Lp), dtype),
    )
    in_specs = [
        pl.BlockSpec((TILE, rdim * C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, rdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, rdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((Pp, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Lp, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Lp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Lp), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    H, g, E, D, gl = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((rdim * TILE, Pp), dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * rdim * Pp * (Pp // 128 + C // 8 + 1),
            bytes_accessed=Mp * rdim * (C + 2) * 4 + Pp * Pp * 4,
            transcendentals=0,
        ),
    )(Jw2, cols2, rw, J_rho, lid2)
    H = H[:P, :P]
    g = g[0, :P]
    if with_rho:
        return H, g, E[:L, :P], D[0, :L], gl[0, :L]
    return H, g, None, None, None


def assembly_supported(P, L, rdim, C, backend=None):
    """Whether the Pallas assembly kernel applies (VMEM budget + backend)."""
    Pp = _round_up(max(P, 1), 128)
    Lp = _round_up(max(L, 1), 128)
    vmem = (Pp * Pp + Lp * Pp + 2 * rdim * TILE * Pp + 4 * TILE * Pp) * 4
    if backend is None:
        backend = jax.default_backend()
    return backend == "tpu" and Pp <= 1024 and Lp <= 1024 and vmem < 12 * 2**20
