"""Pallas TPU kernels for batched uniform B-spline evaluation.

TPU-native formulation: instead of the reference's per-time 4-knot gather
(spline_base.h:148-152 + a scalar loop under ceres::Jet), a chunk of query
times becomes one **banded matmul** on the MXU. For a chunk of ``TB`` sorted
times whose 4-knot windows fall inside a ``KB``-knot slice starting at
``kb``, the evaluation is

    p_chunk = W @ knots[kb : kb + KB]          # [TB, KB] @ [KB, 3]

where ``W[b, k] = B_j(u_b)`` for ``k == i0_b - kb + j`` and 0 elsewhere —
a banded basis matrix built on the VPU with iota compares (no gathers, no
scatters, fully dense MXU work). Velocity and acceleration reuse the same
band with the derivative bases, stacked into the same matmul.

Each chunk's knot slice is streamed HBM->VMEM by the Pallas pipeline via a
scalar-prefetched block index (``PrefetchScalarGridSpec``), so arbitrarily
long splines (config-5 scale, 10^4+ knots) never need to fit in VMEM. To
let block addressing stay KB-aligned while chunks start anywhere, the knot
array is laid out twice — once as-is and once shifted by KB/2 — and each
chunk picks whichever copy contains its whole band (the standard aligned
double-tiling trick).

Numerical contract: identical to :func:`kontiki_tpu.trajectories.spline_eval.
r3_evaluate` (same clamped ``i0 = floor((t-t0)/dt)``, same cubic basis) —
tested element-for-element against it and against scipy's BSpline oracle.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: time-chunk and knot-slice sizes; (8, 128)-aligned for f32 tiles.
TB = 256
KB = 512
HALF = KB // 2


def _r3_kernel(scalars_ref, kb_elem_ref, kb_block_ref, ts_ref, knots_ref, out_ref):
    """One grid step: evaluate TB times against the KB-knot slice.

    scalars_ref: SMEM [4] = (t0, dt, n_knots, n_times); kb_elem: SMEM [C]
    original-array element index of the slice start (for band-local
    indices); kb_block drives the knots BlockSpec index_map; ts [TB, 1];
    knots [KB, 3]; out [3*TB, 3].
    """
    t0 = scalars_ref[0]
    dt = scalars_ref[1]
    n = scalars_ref[2].astype(jnp.int32)
    c = pl.program_id(0)
    kb = kb_elem_ref[c]

    t = ts_ref[:, 0]
    s = (t - t0) / dt
    i0 = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, n - 4)
    u = s - i0.astype(s.dtype)

    # Cubic basis as explicit polynomials in u (columns of [1,u,u2,u3] @ M,
    # M from spline_base.h:18-22). Written out so the kernel contains only
    # scalar constants — Pallas rejects captured non-scalar arrays.
    u2 = u * u
    u3 = u2 * u
    dti = 1.0 / dt
    c6 = 1.0 / 6.0
    B = jnp.stack(
        [
            c6 * (1.0 - 3.0 * u + 3.0 * u2 - u3),
            c6 * (4.0 - 6.0 * u2 + 3.0 * u3),
            c6 * (1.0 + 3.0 * u + 3.0 * u2 - 3.0 * u3),
            c6 * u3,
        ],
        axis=-1,
    )
    dB = dti * jnp.stack(
        [
            c6 * (-3.0 + 6.0 * u - 3.0 * u2),
            c6 * (-12.0 * u + 9.0 * u2),
            c6 * (3.0 + 6.0 * u - 9.0 * u2),
            c6 * (3.0 * u2),
        ],
        axis=-1,
    )
    d2B = (dti * dti) * jnp.stack(
        [
            1.0 - u,
            c6 * (-12.0 + 18.0 * u),
            c6 * (6.0 - 18.0 * u),
            u,
        ],
        axis=-1,
    )

    # Banded basis matrix on the VPU: W[b, k] = basis[b, j] at k == l0[b]+j.
    l0 = jnp.clip(i0 - kb, 0, KB - 4)
    col = jax.lax.broadcasted_iota(jnp.int32, (TB, KB), 1)
    rel = col - l0[:, None]

    def band(basis):
        w = jnp.zeros((TB, KB), t.dtype)
        for j in range(4):
            w = w + jnp.where(rel == j, basis[:, j][:, None], 0.0)
        return w

    W = jnp.concatenate([band(B), band(dB), band(d2B)], axis=0)
    out_ref[:] = jnp.dot(W, knots_ref[:], preferred_element_type=t.dtype)


@functools.partial(jax.jit, static_argnames=("num_chunks", "interpret"))
def _r3_pallas_call(scalars, kb_elem, kb_block, ts_pad, knots_tiled,
                    num_chunks, interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # scalars, kb_elem, kb_block
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((TB, 1), lambda c, s, ke, kbk: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KB, 3), lambda c, s, ke, kbk: (kbk[c], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3 * TB, 3), lambda c, s, ke, kbk: (c, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _r3_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_chunks * 3 * TB, 3), ts_pad.dtype),
        interpret=interpret,
    )(scalars, kb_elem, kb_block, ts_pad, knots_tiled)


def _tile_knots(knots):
    """[Npad + Npad] double tiling: original (KB-aligned pad) followed by a
    HALF-shifted copy, so any HALF-aligned KB-slice is one aligned block."""
    N = knots.shape[0]
    dtype = knots.dtype
    npad = max(-(-N // KB) * KB, KB)
    base = jnp.concatenate([knots, jnp.zeros((npad - N, 3), dtype)])
    shifted = jnp.concatenate(
        [base[HALF:], jnp.zeros((HALF, 3), dtype)]
    )
    return jnp.concatenate([base, shifted], axis=0), npad


def r3_evaluate_pallas(knots, t0, dt, ts, interpret=None):
    """Batched R3 spline evaluation as banded MXU matmuls.

    Same contract as ``spline_eval.r3_evaluate``: knots [N, 3], times [B]
    -> (p, v, a) each [B, 3]. Eager entry point (like trajectory queries):
    times are sorted host-side into TB-chunks; chunks whose knot span
    exceeds the KB slice fall back to the XLA gather path.
    """
    knots = jnp.asarray(knots)
    ts = jnp.asarray(ts)
    dtype = knots.dtype
    N = knots.shape[0]
    B = int(ts.shape[0])
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if B == 0 or N < 4:
        from ..trajectories import spline_eval as ev

        return ev.r3_evaluate(knots, t0, dt, ts)

    t0f, dtf = float(t0), float(dt)
    ts_np = np.asarray(ts, dtype=np.float64)
    order = np.argsort(ts_np, kind="stable")
    ts_sorted = ts_np[order]

    num_chunks = -(-B // TB)
    Bp = num_chunks * TB
    ts_pad = np.full(Bp, ts_sorted[-1])
    ts_pad[:B] = ts_sorted

    i0 = np.clip(np.floor((ts_pad - t0f) / dtf).astype(np.int64), 0, N - 4)
    i0c = i0.reshape(num_chunks, TB)
    lo, hi = i0c.min(axis=1), i0c.max(axis=1) + 4

    # Pick a HALF-aligned base per chunk; both copies give every
    # HALF-multiple as a candidate slice start.
    base = (lo // HALF) * HALF
    fits = hi <= base + KB
    if not np.all(fits):
        from ..trajectories import spline_eval as ev

        return ev.r3_evaluate(knots, t0, dt, ts)

    knots_tiled, npad = _tile_knots(knots)
    aligned = (base % KB) == 0
    # shifted copy: element j of the copy is original element HALF + j, so
    # copy-block m covers originals [HALF + m*KB, HALF + (m+1)*KB).
    kb_block = np.where(aligned, base // KB, npad // KB + (base - HALF) // KB)
    kb_elem = base

    scalars = jnp.array([t0f, dtf, N, B], dtype=dtype)
    out = _r3_pallas_call(
        scalars,
        jnp.asarray(kb_elem, jnp.int32),
        jnp.asarray(kb_block, jnp.int32),
        jnp.asarray(ts_pad, dtype)[:, None],
        knots_tiled,
        num_chunks,
        interpret,
    )
    out = out.reshape(num_chunks, 3, TB, 3)
    inv = np.empty_like(order)
    inv[order] = np.arange(B)
    p = out[:, 0].reshape(Bp, 3)[:B][inv]
    v = out[:, 1].reshape(Bp, 3)[:B][inv]
    a = out[:, 2].reshape(Bp, 3)[:B][inv]
    return p, v, a


