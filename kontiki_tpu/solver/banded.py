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
import os

import jax
import jax.numpy as jnp
import numpy as np

from .iterative import _bucket_layout, build_iterative_parts
from .kernels import (
    project_delta,
    SENSOR_TANGENT_DIM,
    _TANGENT_DIMS,
    _make_residual,
    problem_runtime,
    problem_spec,
)


# ---------------------------------------------------------------------------
# block-tridiagonal Cholesky
# ---------------------------------------------------------------------------

def block_tridiag_solve(D, U, rhs, method="auto"):
    """Solve the symmetric block-tridiagonal system T x = rhs.

    D [nb, d, d]: diagonal blocks; U [nb, d, d]: super-diagonal blocks
    (U[k] = T[k, k+1]; U[nb-1] is ignored); rhs [nb, d, R].

    ``method``: "scan" = sequential block Cholesky (two lax.scans — exact
    and cheapest in flops, but nb dependent steps); "pcr" = parallel
    cyclic reduction (log2(nb) batched levels — useful where per-step
    scan latency dominates: tiny d, huge nb); "auto" resolves from the
    KONTIKI_BAND_SOLVE env var (default "scan"; set to "pcr" to opt in —
    no shape-based selection, see the measured note below).

    Block Cholesky T = L L^T with L_kk = C_k, L_{k+1,k} = B_k:
        C_0 C_0^T = D_0;  B_k = (C_k^{-1} U_k)^T;
        C_{k+1} C_{k+1}^T = D_{k+1} - B_k B_k^T.
    Forward then backward substitution, each as one lax.scan."""
    from jax.scipy.linalg import solve_triangular

    if method == "auto":
        # measured on config-5 (nb=420, d=48, TPU v5e): the scan costs
        # ~13 ms while PCR's 2x9 batched [nb, d, d] LU solves cost ~100 ms
        # — batched small-matrix factorizations lower poorly on TPU, so
        # the scan stays the default; PCR remains available for shapes
        # where per-step scan latency dominates (tiny d, huge nb)
        method = os.environ.get("KONTIKI_BAND_SOLVE", "scan")
    if method == "pcr":
        return pcr_block_tridiag_solve(D, U, rhs)

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

def _rsolve(A, B):
    """A @ inv(B) without forming the inverse."""
    return jnp.linalg.solve(B.T, A.T).T


def pcr_block_tridiag_solve(D, U, rhs):
    """In-chip parallel cyclic reduction for the symmetric block-tridiagonal
    system (same contract as :func:`block_tridiag_solve`).

    The sequential block-Cholesky scan runs ``nb`` dependent steps — each a
    tiny [d, d] factorization, so on TPU the solve is pure scan latency
    (~0.5 ms x hundreds of steps at config-5 scale). PCR instead runs
    ceil(log2(nb)) *batched* elimination levels: at level h every block row
    eliminates its +-h neighbors with two batched [nb, d, d] solves and six
    batched matmuls — ~3x the flops of the scan but fully parallel, which
    is the right trade on a machine with idle MXU lanes and per-step scan
    overhead. Stable for the LM-damped SPD bands this module produces
    (diagonally dominant after damping); equality with the Cholesky scan is
    pinned in tests/test_banded.py."""
    nb, d, _ = D.shape
    dtype = D.dtype
    # symmetric band: row k couples to k-1 via L[k] = U[k-1]^T
    L = jnp.concatenate(
        [jnp.zeros((1, d, d), dtype), jnp.transpose(U[:-1], (0, 2, 1))], axis=0
    )
    Uc = U.at[nb - 1].set(jnp.zeros((d, d), dtype))
    b = rhs
    h = 1
    zero_blk = jnp.zeros((d, d), dtype)

    def shift_down(a, h, fill):
        """a[k] <- a[k-h] (fill for k < h)."""
        return jnp.concatenate(
            [jnp.broadcast_to(fill, (h,) + a.shape[1:]), a[:-h]], axis=0
        )

    def shift_up(a, h, fill):
        return jnp.concatenate(
            [a[h:], jnp.broadcast_to(fill, (h,) + a.shape[1:])], axis=0
        )

    while h < nb:
        D_m = shift_down(D, h, jnp.eye(d, dtype=dtype))
        L_m = shift_down(L, h, zero_blk)
        U_m = shift_down(Uc, h, zero_blk)
        b_m = shift_down(b, h, jnp.zeros((d, b.shape[-1]), dtype))
        D_p = shift_up(D, h, jnp.eye(d, dtype=dtype))
        L_p = shift_up(L, h, zero_blk)
        U_p = shift_up(Uc, h, zero_blk)
        b_p = shift_up(b, h, jnp.zeros((d, b.shape[-1]), dtype))
        # alpha = L @ inv(D_m), beta = U @ inv(D_p), batched over nb
        alpha = jnp.transpose(
            jnp.linalg.solve(jnp.transpose(D_m, (0, 2, 1)),
                             jnp.transpose(L, (0, 2, 1))),
            (0, 2, 1),
        )
        beta = jnp.transpose(
            jnp.linalg.solve(jnp.transpose(D_p, (0, 2, 1)),
                             jnp.transpose(Uc, (0, 2, 1))),
            (0, 2, 1),
        )
        D = D - alpha @ U_m - beta @ L_p
        b = b - alpha @ b_m - beta @ b_p
        L = -(alpha @ L_m)
        Uc = -(beta @ U_p)
        h *= 2
    return jnp.linalg.solve(D, b)


def pcr_block_tridiag_row_solve(L, U, b, axis_name, n_shards):
    """Distributed parallel cyclic reduction: ONE K-block row per shard.

    Solves  u_s + L_s u_{s-1} + U_s u_{s+1} = b_s  (L_0 = U_{n-1} = 0)
    where shard s holds ``L, U [K, K]`` and ``b [K, R]``. Each of the
    ceil(log2(n)) levels exchanges rows at distance h with two
    ``ppermute``s and eliminates them; couplings at distance >= n vanish
    identically (rows with s < h have L = 0 by induction from L_0 = 0, so
    the cyclic wrap-around rows are multiplied by zero). Afterwards every
    shard solves its own decoupled K-system locally — nothing O(n) is
    gathered or replicated, unlike a gathered dense interface solve.

    Returns the local solution u_s [K, R]."""
    n = n_shards
    K = b.shape[0]
    D = jnp.eye(K, dtype=b.dtype)
    h = 1
    for _ in range(max(1, (n - 1).bit_length())):
        below = [(i, (i + h) % n) for i in range(n)]  # receive row s-h
        above = [(i, (i - h) % n) for i in range(n)]  # receive row s+h
        D_m, L_m, U_m, b_m = (
            jax.lax.ppermute(a, axis_name, below) for a in (D, L, U, b)
        )
        D_p, L_p, U_p, b_p = (
            jax.lax.ppermute(a, axis_name, above) for a in (D, L, U, b)
        )
        alpha = _rsolve(L, D_m)
        beta = _rsolve(U, D_p)
        D = D - alpha @ U_m - beta @ L_p
        b = b - alpha @ b_m - beta @ b_p
        L = -alpha @ L_m
        U = -beta @ U_p
        h *= 2
    return jnp.linalg.solve(D, b)


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
    "spikes"); the 2n boundary block-unknowns form a reduced interface
    system — block-tridiagonal in per-shard [2B] pairs — solved by
    *distributed parallel cyclic reduction* (log2(n) ppermute levels,
    :func:`pcr_block_tridiag_row_solve`); one local combination finishes.
    Local work is O(sb) + O(log n (2B)^3), communication O(log n B(B+R)),
    and nothing O(n) is gathered or replicated (the previous revision
    all-gathered a [2nB, 2nB] interface system and solved it densely on
    every device). Requires ``sb >= 2`` (boundary rows must be distinct).

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

    # reduced interface system: per shard the pair u_s = [x_first; x_last]
    # satisfies u_s + L_s u_{s-1} + U_s u_{s+1} = y_s with the spike
    # couplings below — block-tridiagonal with one [2B] row per shard,
    # solved by distributed parallel cyclic reduction (no gather)
    zB = jnp.zeros((B, B), dtype)
    L_row = jnp.concatenate([
        jnp.concatenate([zB, W[0]], axis=1),
        jnp.concatenate([zB, W[sb - 1]], axis=1),
    ], axis=0)                                     # couples to u_{s-1}
    U_row = jnp.concatenate([
        jnp.concatenate([V[0], zB], axis=1),
        jnp.concatenate([V[sb - 1], zB], axis=1),
    ], axis=0)                                     # couples to u_{s+1}
    y_row = jnp.concatenate([Y[0], Y[sb - 1]], axis=0)  # [2B, R]
    u = pcr_block_tridiag_row_solve(L_row, U_row, y_row, axis_name, n)

    # boundary values from the neighbors (wrap-around rows are killed by
    # W = 0 on the first shard / V = 0 on the last)
    u_prev = jax.lax.ppermute(
        u, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    u_next = jax.lax.ppermute(
        u, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    z_prev = u_prev[B:]   # x_{s-1, last}
    z_next = u_next[:B]   # x_{s+1, first}
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
        delta, pred, grad_max = solve_with_pred(runtime, blocks, lam, state)
        new_state = it["retract"](runtime, state, delta)
        new_cost = it["total_cost"](runtime, new_state)
        return cost, new_state, new_cost, pred, delta, grad_max

    def step_spec(runtime, state, lin, lam):
        # Speculative linearization (see kernels.step_spec): one full
        # linearize per LM iteration instead of linearize + re-cost.
        cost, blocks = lin
        delta, pred, _ = solve_with_pred(runtime, blocks, lam, state)
        new_state = it["retract"](runtime, state, delta)
        new_lin = it["linearize"](runtime, new_state)
        return new_state, new_lin, pred

    def solve_with_pred(runtime, blocks, lam, state=None):
        dtype = runtime["mask"].dtype
        g, _, _, _ = it["grad_and_diag"](blocks, dtype)
        delta = banded_solve(runtime, blocks, g, lam)
        if state is not None:
            delta = project_delta(spec, runtime, state, delta)
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
        step_spec=step_spec,
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
