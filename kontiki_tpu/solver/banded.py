"""Banded (block-tridiagonal) exact solve of the reduced normal equations.

The 4-knot support of cubic B-splines (spline_base.h:391) makes the
knot-knot block of the Gauss-Newton Hessian *banded in time*: knot i
couples only to knots within the residuals' window width W. Grouping W
consecutive knots into super-blocks (all splines interleaved per knot, so
a split trajectory's r3/so3 columns sit together) makes the matrix
block-tridiagonal, and a block Cholesky runs in O(n) time and memory —
a 10k-knot problem solves exactly without ever allocating the dense
[Pc, Pc] matrix (which would be ~29 GB at that scale).

Sensor calibration columns (and nothing else: this path requires no
landmarks/lifted parameters — camera problems use Schur/iterative Schur)
couple to every knot, forming a bordered system

    [T   B^T] [x]   [b]
    [B   C  ] [y] = [c]

solved by the block-tridiagonal factorization of T plus a small dense
Schur complement over the ns = 13*S border columns.

Assembly consumes the same compressed per-row Jacobian blocks as the
iterative path (Jw [M, rdim, C] + column metadata), scattered into band
storage ``Hband [nb, 2, G*BD, G*BD]`` (diagonal and first super-diagonal
super-blocks) — never anything quadratic in n.

Requires all splines on the same knot grid (equal n; our Split problems
always are). Strategy name: ``"banded"`` in ``lm.solve``.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .iterative import _bucket_layout, build_iterative_parts
from .kernels import (
    SENSOR_TANGENT_DIM,
    _TANGENT_DIMS,
    _make_residual,
    problem_runtime,
    problem_spec,
)


# ---------------------------------------------------------------------------
# block-tridiagonal Cholesky
# ---------------------------------------------------------------------------

def block_tridiag_solve(D, U, rhs):
    """Solve the symmetric block-tridiagonal system T x = rhs.

    D [nb, d, d]: diagonal blocks; U [nb, d, d]: super-diagonal blocks
    (U[k] = T[k, k+1]; U[nb-1] is ignored); rhs [nb, d, R].

    Block Cholesky T = L L^T with L_kk = C_k, L_{k+1,k} = B_k:
        C_0 C_0^T = D_0;  B_k = (C_k^{-1} U_k)^T;
        C_{k+1} C_{k+1}^T = D_{k+1} - B_k B_k^T.
    Forward then backward substitution, each as one lax.scan."""
    from jax.scipy.linalg import solve_triangular

    nb, d, _ = D.shape

    def fwd(carry, inp):
        C_prev, B_prev_T, z_prev, first = carry
        Dk, rk = inp
        # B_{k-1} = (C_{k-1}^{-1} U_{k-1})^T was computed last step as
        # B_prev_T = C_{k-1}^{-1} U_{k-1}  (i.e. B_{k-1}^T).
        Dk = Dk - jnp.where(first, 0.0, 1.0) * (B_prev_T.T @ B_prev_T)
        Ck = jnp.linalg.cholesky(Dk)
        zk = solve_triangular(
            Ck, rk - jnp.where(first, 0.0, 1.0) * (B_prev_T.T @ z_prev),
            lower=True,
        )
        return (Ck, Ck, zk, jnp.asarray(False)), (Ck, B_prev_T, zk)

    def fwd_wrap(carry, inp):
        C_prev, _, z_prev, first = carry
        Dk, Uk_prev, rk = inp
        B_prev_T = solve_triangular(C_prev, Uk_prev, lower=True)
        (Ck, _, zk, nf), _ = fwd((C_prev, B_prev_T, z_prev, first), (Dk, rk))
        return (Ck, B_prev_T, zk, nf), (Ck, B_prev_T, zk)

    # U shifted: step k consumes U[k-1]; supply zeros for k=0.
    U_prev = jnp.concatenate([jnp.zeros_like(U[:1]), U[:-1]], axis=0)
    R = rhs.shape[-1]
    init = (
        jnp.eye(d, dtype=D.dtype),
        jnp.zeros((d, d), D.dtype),
        jnp.zeros((d, R), D.dtype),
        jnp.asarray(True),
    )
    (_, _, _, _), (Cs, BTs, zs) = jax.lax.scan(fwd_wrap, init, (D, U_prev, rhs))

    def bwd(carry, inp):
        x_next, last = carry
        Ck, BT_next, zk = inp
        # L^T x = z: x_k = C_k^{-T} (z_k - B_k^T x_{k+1});
        # B_k^T = BT_next (= C_k^{-1} U_k), stored at step k+1.
        xk = solve_triangular(
            Ck.T,
            zk - jnp.where(last, 0.0, 1.0) * (BT_next @ x_next),
            lower=False,
        )
        return (xk, jnp.asarray(False)), xk

    BT_next = jnp.concatenate([BTs[1:], jnp.zeros_like(BTs[:1])], axis=0)
    init_b = (jnp.zeros((d, R), D.dtype), jnp.asarray(True))
    _, xs = jax.lax.scan(bwd, init_b, (Cs, BT_next, zs), reverse=True)
    return xs


# ---------------------------------------------------------------------------
# SPIKE: distributed exact block-tridiagonal solve
# ---------------------------------------------------------------------------

def spike_block_tridiag_solve(D, U, rhs, axis_name, n_shards):
    """Distributed exact solve of a symmetric block-tridiagonal system.

    For use inside ``shard_map``: each of the ``n_shards`` devices holds
    ``sb`` *consecutive* super-blocks of the global system —

    - ``D [sb, B, B]``: diagonal blocks,
    - ``U [sb, B, B]``: ``U[k]`` couples local block k to block k+1;
      ``U[sb-1]`` couples to the NEXT shard's first block (must be zero on
      the last shard),
    - ``rhs [sb, B, R]``.

    SPIKE algorithm (exact, no iteration): every shard factors its interior
    once with ``R + 2B`` right-hand sides (the rhs plus the two boundary
    "spikes"); the 2n boundary block-unknowns form a small reduced system
    solved replicated after one ``all_gather`` (size 2 n B — e.g. 672 for
    8 shards of 42-wide blocks); one local combination finishes. Replaces
    the previous gather-everything-and-recurse solve: local work is O(sb),
    communication O(n B (B + R)), and nothing O(total blocks) is ever
    replicated. Requires ``sb >= 2`` (boundary rows must be distinct).

    Returns the local solution ``x [sb, B, R]``.
    """
    sb, B, _ = D.shape
    R = rhs.shape[-1]
    dtype = D.dtype
    n = n_shards
    if n == 1:
        return block_tridiag_solve(D, U, rhs)
    if sb < 2:
        raise ValueError("spike solve requires >= 2 super-blocks per shard")
    idx = jax.lax.axis_index(axis_name)
    first = (idx == 0).astype(dtype)
    last = (idx == n - 1).astype(dtype)

    # coupling INTO block 0 from the previous shard's last block: by
    # symmetry this is U_global[s*sb - 1]^T = (previous shard's U[sb-1])^T
    U_from_left = jax.lax.ppermute(
        U[sb - 1], axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    L_bnd = (1.0 - first) * U_from_left.T         # [B, B]
    R_bnd = (1.0 - last) * U[sb - 1]              # [B, B]

    # interior factorization with spike right-hand sides
    U_loc = U.at[sb - 1].set(jnp.zeros((B, B), dtype))
    aug = jnp.zeros((sb, B, R + 2 * B), dtype)
    aug = aug.at[:, :, :R].set(rhs)
    aug = aug.at[0, :, R:R + B].set(L_bnd)
    aug = aug.at[sb - 1, :, R + B:].set(R_bnd)
    sol = block_tridiag_solve(D, U_loc, aug)
    Y = sol[:, :, :R]
    W = sol[:, :, R:R + B]       # x += -W @ x_{prev shard, last block}
    V = sol[:, :, R + B:]        # x += -V @ x_{next shard, first block}

    # reduced interface system over the 2n boundary blocks
    bound = jnp.stack([
        jnp.concatenate([W[0], V[0], Y[0]], axis=1),
        jnp.concatenate([W[sb - 1], V[sb - 1], Y[sb - 1]], axis=1),
    ])  # [2, B, 2B + R]
    allb = jax.lax.all_gather(bound, axis_name)   # [n, 2, B, 2B + R]

    A = jnp.eye(2 * n * B, dtype=dtype)
    y = jnp.zeros((2 * n * B, R), dtype)
    for s in range(n):
        for pos, row in ((0, s * 2), (1, s * 2 + 1)):
            Wp = allb[s, pos, :, :B]
            Vp = allb[s, pos, :, B:2 * B]
            Yp = allb[s, pos, :, 2 * B:]
            r0 = row * B
            y = y.at[r0:r0 + B].set(Yp)
            if s > 0:
                c = (2 * (s - 1) + 1) * B   # x_{s-1, last}
                A = A.at[r0:r0 + B, c:c + B].add(Wp)
            if s < n - 1:
                c = (2 * (s + 1)) * B       # x_{s+1, first}
                A = A.at[r0:r0 + B, c:c + B].add(Vp)
    z = jnp.linalg.solve(A, y).reshape(2 * n, B, R)

    # local combination: x = Y - W z_{s-1,last} - V z_{s+1,first}
    zero = jnp.zeros((), jnp.int32)
    z_prev = jax.lax.dynamic_slice(
        z,
        (jnp.clip(2 * (idx - 1) + 1, 0, 2 * n - 1).astype(jnp.int32), zero, zero),
        (1, B, R),
    )[0]
    z_next = jax.lax.dynamic_slice(
        z,
        (jnp.clip(2 * (idx + 1), 0, 2 * n - 1).astype(jnp.int32), zero, zero),
        (1, B, R),
    )[0]
    x = Y - jnp.einsum("kbc,cr->kbr", W, z_prev) \
          - jnp.einsum("kbc,cr->kbr", V, z_next)
    return x


# ---------------------------------------------------------------------------
# band assembly from compressed Jacobian blocks
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def build_banded_parts(spec, x64: bool):
    """Raw solver functions using the exact block-tridiagonal solve.

    Same step contract as the other backends. Requires num_landmarks == 0,
    num_vt == 0, and all splines on one knot grid."""
    if spec.num_landmarks or spec.num_vt:
        raise ValueError(
            "banded solve handles knot+sensor problems only; camera/landmark "
            "problems use strategy='schur' or 'iterative_schur'"
        )
    ns_list = [sp.n for sp in spec.splines]
    if len(set(ns_list)) != 1:
        raise ValueError("banded solve requires all splines on one knot grid")
    nk = ns_list[0]

    it = build_iterative_parts(spec, x64)
    residuals = [_make_residual(spec, b) for b in spec.buckets]
    layouts = [_bucket_layout(spec, b, r[1]) for b, r in zip(spec.buckets, residuals)]

    tds = [_TANGENT_DIMS[sp.kind] for sp in spec.splines]
    BD = sum(tds)
    sub_off = np.concatenate([[0], np.cumsum(tds)[:-1]]).astype(np.int32)
    W_max = max(max(b.windows) for b in spec.buckets)
    G = W_max
    nb = -(-nk // G)
    GBD = G * BD
    Pk = nb * GBD  # padded banded knot space
    S = spec.num_sensors
    ns = S * SENSOR_TANGENT_DIM
    Pc = spec.num_tangent  # no landmarks/vt by assertion

    # original knot tangent index -> banded index (numpy, static)
    perm = np.zeros(spec.sensor_offset, dtype=np.int32)
    for si, sp in enumerate(spec.splines):
        td = tds[si]
        for k in range(nk):
            for j in range(td):
                perm[sp.tangent_offset + k * td + j] = k * BD + sub_off[si] + j
    perm_j = jnp.asarray(perm)

    def to_banded_vec(v):
        """Scatter an original-order knot vector into padded banded order."""
        out = jnp.zeros((Pk,), v.dtype)
        return out.at[perm_j].set(v[: spec.sensor_offset])

    def from_banded_vec(vb):
        return vb[perm_j]

    def assemble(blocks, dtype):
        """Band + border Gauss-Newton blocks from compressed Jacobians."""
        Hband = jnp.zeros((nb, 2, GBD, GBD), dtype)  # d in {0, +1}
        Bsen = jnp.zeros((max(ns, 1), Pk), dtype)
        Csen = jnp.zeros((max(ns, 1), max(ns, 1)), dtype)
        for blk, layout in zip(blocks, layouts):
            Jw, cols = blk["Jw"], blk["cols"]
            M = Jw.shape[0]
            P_full = jnp.einsum("mrc,mrd->mcd", Jw, Jw)

            # banded index of every column (static structure per layout)
            bidx_parts = []
            is_knot_parts = []
            for off, si, W, td in layout.windows:
                sp = spec.splines[si]
                k0 = (cols[:, off] - sp.tangent_offset) // td  # [M]
                w = jnp.arange(W, dtype=cols.dtype)
                j = jnp.arange(td, dtype=cols.dtype)
                k = k0[:, None, None] + w[None, :, None]  # [M, W, 1]
                b = k * BD + sub_off[si] + j[None, None, :]
                bidx_parts.append(b.reshape(M, W * td))
                is_knot_parts.append(jnp.ones((M, W * td), bool))
            if layout.sensor_off >= 0:
                so = layout.sensor_off
                sidx = cols[:, so : so + SENSOR_TANGENT_DIM] - spec.sensor_offset
                bidx_parts.append(sidx)
                is_knot_parts.append(jnp.zeros_like(sidx, dtype=bool))
            bidx = jnp.concatenate(bidx_parts, axis=1)  # [M, C]
            is_knot = jnp.concatenate(is_knot_parts, axis=1)

            sblk = bidx // GBD  # super-block index (knot cols only)
            o = bidx % GBD
            shape3 = P_full.shape
            b1 = jnp.broadcast_to(bidx[:, :, None], shape3)
            b2 = jnp.broadcast_to(bidx[:, None, :], shape3)
            s1 = jnp.broadcast_to(sblk[:, :, None], shape3)
            o1 = jnp.broadcast_to(o[:, :, None], shape3)
            o2 = jnp.broadcast_to(o[:, None, :], shape3)
            d = jnp.broadcast_to(
                sblk[:, None, :] - sblk[:, :, None], shape3
            )  # s2 - s1

            kk = is_knot[:, :, None] & is_knot[:, None, :]
            keep = kk & ((d == 0) | (d == 1))  # diagonal + first super-diag
            # Out-of-band / non-knot pairs carry zero values; mode="drop"
            # guards any residual out-of-range coordinates.
            Hband = Hband.at[s1, jnp.clip(d, 0, 1), o1, o2].add(
                jnp.where(keep, P_full, 0.0), mode="drop"
            )

            if layout.sensor_off >= 0:
                sk = (~is_knot[:, :, None]) & is_knot[:, None, :]
                Bsen = Bsen.at[b1, b2].add(
                    jnp.where(sk, P_full, 0.0), mode="drop"
                )
                ss = (~is_knot[:, :, None]) & (~is_knot[:, None, :])
                Csen = Csen.at[b1, b2].add(
                    jnp.where(ss, P_full, 0.0), mode="drop"
                )
        return Hband, Bsen, Csen

    def banded_solve(runtime, blocks, g, lam):
        dtype = runtime["mask"].dtype
        mask = runtime["mask"]
        Hband, Bsen, Csen = assemble(blocks, dtype)
        # damping: lam * clip(diag) + identity on locked/padded columns
        diag_band = jax.vmap(jnp.diag)(Hband[:, 0]).reshape(Pk)
        mask_band = to_banded_vec(mask)
        damp_band = lam * jnp.clip(diag_band, 1e-6, 1e32) + (1.0 - mask_band)
        D = Hband[:, 0] + jax.vmap(jnp.diag)(damp_band.reshape(nb, GBD))
        U = Hband[:, 1]

        g_band = to_banded_vec(g)
        if ns:
            g_sen = g[spec.sensor_offset : spec.sensor_offset + ns]
            mask_sen = mask[spec.sensor_offset : spec.sensor_offset + ns]
            diag_sen = jnp.diag(Csen)[:ns]
            damp_sen = lam * jnp.clip(diag_sen, 1e-6, 1e32) + (1.0 - mask_sen)
            Cd = Csen[:ns, :ns] + jnp.diag(damp_sen)
            rhs = jnp.concatenate(
                [-g_band[:, None], Bsen[:ns].T], axis=1
            ).reshape(nb, GBD, 1 + ns)
            sol = block_tridiag_solve(D, U, rhs).reshape(Pk, 1 + ns)
            y = sol[:, 0]
            X = sol[:, 1:]
            Ssen = Cd - Bsen[:ns] @ X
            rhs_s = -g_sen - Bsen[:ns] @ y
            x_sen = jnp.linalg.solve(Ssen, rhs_s)
            x_band = y - X @ x_sen
            delta = jnp.concatenate([from_banded_vec(x_band), x_sen])
        else:
            sol = block_tridiag_solve(D, U, (-g_band).reshape(nb, GBD, 1))
            delta = from_banded_vec(sol.reshape(Pk))
        return delta * mask

    def step(runtime, state, lam):
        cost, blocks = it["linearize"](runtime, state)
        dtype = runtime["mask"].dtype
        g, _, _, _ = it["grad_and_diag"](blocks, dtype)
        delta = banded_solve(runtime, blocks, g, lam)
        new_state = it["retract"](runtime, state, delta)
        new_cost = it["total_cost"](runtime, new_state)
        Hd = it["hcc_matvec"](blocks, delta)
        pred = -(g @ delta + 0.5 * delta @ Hd)
        grad_max = jnp.max(jnp.abs(g))
        return cost, new_state, new_cost, pred, delta, grad_max

    def solve_with_pred(runtime, blocks, lam):
        dtype = runtime["mask"].dtype
        g, _, _, _ = it["grad_and_diag"](blocks, dtype)
        delta = banded_solve(runtime, blocks, g, lam)
        Hd = it["hcc_matvec"](blocks, delta)
        pred = -(g @ delta + 0.5 * delta @ Hd)
        grad_max = jnp.max(jnp.abs(g))
        return delta, pred, grad_max

    return dict(
        total_cost=it["total_cost"],
        linearize=it["linearize"],
        retract=it["retract"],
        banded_solve=banded_solve,
        solve_with_pred=solve_with_pred,
        step=step,
    )


def make_banded_step(problem):
    """step(state, lam) using the exact block-tridiagonal solve; same
    contract as ``kernels.make_step``."""
    spec = problem_spec(problem)
    parts = build_banded_parts(spec, jax.config.jax_enable_x64)
    runtime = problem_runtime(problem)
    step_j = jax.jit(parts["step"])
    cost_j = jax.jit(parts["total_cost"])
    return (
        lambda state, lam: step_j(runtime, state, lam),
        lambda state: cost_j(runtime, state),
    )
