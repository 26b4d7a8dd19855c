"""Knot-segment sharding: sequence parallelism over the time axis.

The reference's sparsity mechanism activates 4-knot windows per measurement
(spline_base.h:361-404). Its TPU-native scale-out along *time* shards the
spline knot axis in contiguous segments across the mesh (SURVEY §2.10.2):

- The knot arrays themselves are sharded (each device stores only its
  ``seg`` knots) — the state axis, not just the measurements, is
  distributed.
- Measurement rows live on the device owning their window's base knot.
- A row whose 4..W-knot support straddles the segment boundary needs up to
  ``W-1`` knots from the right neighbor: one ``ppermute`` fetches the halo
  before evaluation (the moral equivalent of a ring step), and one reverse
  ``ppermute`` returns the straddling rows' Gauss-Newton contributions to
  the halo knots' owner (halo reduce).
- Per-device band assembly produces that segment's block-tridiagonal
  super-blocks; the (small) band is all-gathered and the exact
  block-Cholesky solve runs replicated. The measurement-side work — the
  flops and memory that scale with sequence length and rate — is fully
  sequence-parallel; only the O(n) band recursion is replicated (a later
  round can cyclic-reduce it).

Scope: single-window measurement buckets (position/orientation/gyro/accel
— the trajectory-fitting configs) with locked time offsets, so row
ownership is static. Camera problems scale through the landmark/iterative
paths instead.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..solver.banded import block_tridiag_solve
from ..solver.iterative import _bucket_layout
from ..solver.kernels import (
    SENSOR_TANGENT_DIM,
    _TANGENT_DIMS,
    _bucket_terms,
    _huber,
    _make_residual,
    _retract_state,
    problem_runtime,
    problem_spec,
)
from . import MEASUREMENT_AXIS, _pad_rows

__all__ = ["make_segment_sharded_step", "make_segment_sharded_solver"]

_SINGLE_WINDOW = ("position", "orientation", "gyro", "accel")


def _segment_layout(problem, n_shards):
    """Static layout: segment size, halo, row->shard assignment."""
    spec = problem_spec(problem)
    runtime = problem_runtime(problem)
    if any(b.kind.split(":")[0] not in _SINGLE_WINDOW for b in spec.buckets):
        raise ValueError(
            "knot-segment sharding supports single-window (trajectory/IMU) "
            "buckets; camera problems shard by landmark instead"
        )
    mask = np.asarray(problem.mask)
    for i, sensor in enumerate(problem.sensors):
        d_slot = problem.sensor_offset + i * SENSOR_TANGENT_DIM + 6
        if mask[d_slot] != 0.0:
            raise ValueError(
                "knot-segment sharding requires locked time offsets "
                "(window ownership must be static)"
            )
    ns_list = [sp.n for sp in spec.splines]
    if len(set(ns_list)) != 1:
        raise ValueError("segment sharding requires all splines on one grid")
    nk = ns_list[0]
    W_max = max(max(b.windows) for b in spec.buckets)
    G = W_max
    # halo knots fetched from the right neighbor (>= W-1); a single shard
    # owns every window locally and needs none
    h = W_max if n_shards > 1 else 0
    n = n_shards
    # segment = multiple of the super-block size, >= halo
    sb_per_shard = max(1, math.ceil(nk / (n * G)))
    seg = sb_per_shard * G
    nk_pad = seg * n

    # row ownership by window base knot (host-side, static: offsets locked)
    new_buckets = []
    new_data = []
    sp0 = spec.splines[0]
    t0 = problem.splines[0].t0
    dt = problem.splines[0].dt
    for bspec, data, b in zip(spec.buckets, runtime["data"], problem.buckets.values()):
        data = {k: np.asarray(v) for k, v in data.items()}
        W = max(bspec.windows)
        t_base = data["t"]
        if "sid" in data:
            d0 = np.array([problem.sensors[s].time_offset for s in data["sid"]])
            t_base = t_base + d0
        i_base = np.clip(
            np.floor((t_base - t0) / dt).astype(np.int64), 0, nk - W
        )
        owner = np.minimum(i_base // seg, n - 1)
        counts = np.bincount(owner, minlength=n)
        M_per = max(int(counts.max()), 1)
        idx = np.zeros(n * M_per, dtype=np.int64)
        valid = np.zeros(n * M_per)
        for s in range(n):
            rows = np.nonzero(owner == s)[0]
            idx[s * M_per : s * M_per + len(rows)] = rows
            valid[s * M_per : s * M_per + len(rows)] = 1.0
        d = {k: v[idx] for k, v in data.items()}
        # Pad rows must stay inside the owning shard's segment: pin their
        # time to the segment start (valid=0 zeroes their contributions).
        seg_start_t = t0 + (np.arange(n * M_per) // M_per) * seg * dt
        d["t"] = np.where(valid > 0, d["t"], seg_start_t + 2.0 * dt)
        d["valid"] = valid.astype(mask.dtype)
        new_data.append({k: jnp.asarray(v) for k, v in d.items()})
        new_buckets.append(bspec._replace(M=n * M_per))

    spec_global = spec._replace(buckets=tuple(new_buckets))
    # local spec: each device traces with seg + halo knots per spline
    loc_splines = []
    off = 0
    for sp in spec.splines:
        td = _TANGENT_DIMS[sp.kind]
        loc_splines.append(sp._replace(n=seg + h, tangent_offset=off))
        off += (seg + h) * td
    spec_local = spec_global._replace(splines=tuple(loc_splines))
    runtime["data"] = new_data
    layout = dict(
        nk=nk, nk_pad=nk_pad, seg=seg, h=h, G=G, n=n,
        sb_per_shard=sb_per_shard, W_max=W_max,
        t0=t0, dt=dt,
    )
    return spec, spec_global, spec_local, runtime, layout


def make_segment_sharded_step(problem, mesh):
    """step(state, lam) with the knot axis sharded over the mesh.

    Contract matches ``kernels.make_step`` (replicated scalars/delta out);
    internally the spline knot arrays are sharded in contiguous segments,
    rows are evaluated on their owning device after a one-hop halo
    exchange, and band contributions straddling the boundary are returned
    to their owner by the reverse permute."""
    n = mesh.devices.size
    spec, spec_global, spec_local, runtime, lay = _segment_layout(problem, n)
    x64 = jax.config.jax_enable_x64
    residuals = [_make_residual(spec_local, b) for b in spec_local.buckets]
    layouts = [
        _bucket_layout(spec_local, b, r[1])
        for b, r in zip(spec_local.buckets, residuals)
    ]

    seg, h, G, nk, nk_pad = lay["seg"], lay["h"], lay["G"], lay["nk"], lay["nk_pad"]
    sb = lay["sb_per_shard"]
    tds = [_TANGENT_DIMS[sp.kind] for sp in spec.splines]
    BD = sum(tds)
    sub_off = np.concatenate([[0], np.cumsum(tds)[:-1]]).astype(np.int32)
    GBD = G * BD
    S = spec.num_sensors
    ns = S * SENSOR_TANGENT_DIM
    Pk = (nk_pad // G) * GBD
    dtype = np.asarray(problem.mask).dtype

    # global banded permutation (original order -> banded order), as in
    # solver.banded but over the padded knot count
    perm = np.zeros(spec.sensor_offset, dtype=np.int32)
    for si, sp in enumerate(spec.splines):
        td = tds[si]
        for k in range(sp.n):
            for j in range(td):
                perm[sp.tangent_offset + k * td + j] = k * BD + sub_off[si] + j
    perm_j = jnp.asarray(perm)

    fwd_perm = [(i, (i - 1) % n) for i in range(n)]  # shard i+1 -> shard i
    rev_perm = [(i, (i + 1) % n) for i in range(n)]  # shard i -> shard i+1

    def _local_runtime(rt):
        """Per-shard runtime: spline t0 shifted so local indices start at 0."""
        s = jax.lax.axis_index(MEASUREMENT_AXIS)
        rt = dict(rt)
        rt["spline_t0"] = [
            t0 + s.astype(t0.dtype if hasattr(t0, "dtype") else dtype) * (seg * dt_)
            for t0, dt_ in zip(rt["spline_t0"], rt["spline_dt"])
        ]
        return rt

    def _halo_state(state):
        """Extend each sharded knot block with the right neighbor's first
        h knots (one ppermute per spline)."""
        out = dict(state)
        for sp in spec.splines:
            local = state[sp.kind]  # [seg, D] inside shard_map
            halo = jax.lax.ppermute(local[:h], MEASUREMENT_AXIS, fwd_perm)
            out[sp.kind] = jnp.concatenate([local, halo], axis=0)
        return out

    def _cost_local(rt, state):
        rt = _local_runtime(rt)
        st = _halo_state(state)
        cost = jnp.zeros((), rt["mask"].dtype)
        for bspec, (res, flags), data in zip(
            spec_local.buckets, residuals, rt["data"]
        ):
            r = _bucket_terms(spec_local, bspec, res, flags, rt, st, data, False)
            s2 = jnp.sum(r * r, axis=-1)
            if flags["loss"]:
                cost = cost + 0.5 * jnp.sum(_huber(s2, data["huber_c"]))
            else:
                cost = cost + 0.5 * jnp.sum(s2)
        return jax.lax.psum(cost, MEASUREMENT_AXIS)

    def _linearize_local(rt, state):
        """Local band/border assembly with halo reduce.

        Returns (cost, Dband [sb, GBD, GBD], Uband [sb, GBD, GBD],
        g_band [sb*GBD], Bsen [ns, Pk] psum, Csen psum, g_sen psum)."""
        rt_l = _local_runtime(rt)
        st = _halo_state(state)
        mdt = rt["mask"].dtype
        # one extra (halo) super-block accumulates the straddling rows'
        # contributions to the right neighbor's first block
        Dband = jnp.zeros((sb + 1, GBD, GBD), mdt)
        Uband = jnp.zeros((sb + 1, GBD, GBD), mdt)
        gband = jnp.zeros(((sb + 1) * GBD,), mdt)
        Bsen = jnp.zeros((max(ns, 1), Pk), mdt)
        Csen = jnp.zeros((max(ns, 1), max(ns, 1)), mdt)
        gsen = jnp.zeros((max(ns, 1),), mdt)
        cost = jnp.zeros((), mdt)

        s_idx = jax.lax.axis_index(MEASUREMENT_AXIS)
        # mask for the local+halo knot columns, in banded-local order
        mask_g = rt["mask"]

        def local_col_mask():
            # banded-order global mask gathered for this shard's window
            # padded by the halo width so the last shard's slice (which
            # reaches h knots past the global end) stays aligned instead of
            # being clamped left by dynamic_slice
            mb = jnp.zeros((Pk + h * BD,), mdt).at[perm_j].set(
                mask_g[: spec.sensor_offset]
            )
            start = s_idx * seg * BD
            return jax.lax.dynamic_slice(mb, (start,), ((seg + h) * BD,))

        mask_loc = local_col_mask()
        mask_sen = (
            mask_g[spec.sensor_offset : spec.sensor_offset + ns]
            if ns else jnp.zeros((1,), mdt)
        )

        for bspec, (res, flags), data, layout in zip(
            spec_local.buckets, residuals, rt_l["data"], layouts
        ):
            out = _bucket_terms(
                spec_local, bspec, res, flags, rt_l, st, data, True
            )
            r, J, cols = out[0], out[1], out[2]
            s2 = jnp.sum(r * r, axis=-1)
            if flags["loss"]:
                from ..solver.kernels import _huber_prime

                c = data["huber_c"]
                rho_p = _huber_prime(s2, c)
                cost = cost + 0.5 * jnp.sum(_huber(s2, c))
            else:
                rho_p = jnp.ones_like(s2)
                cost = cost + 0.5 * jnp.sum(s2)
            sq = jnp.sqrt(rho_p)

            # banded-local column index per col (knot cols), sensor flags
            M = J.shape[0]
            bidx_parts, is_knot_parts = [], []
            for off, si, W, td in layout.windows:
                spl = spec_local.splines[si]
                k0 = (cols[:, off] - spl.tangent_offset) // td
                w = jnp.arange(W, dtype=cols.dtype)
                jj = jnp.arange(td, dtype=cols.dtype)
                k = k0[:, None, None] + w[None, :, None]
                b = k * BD + sub_off[si] + jj[None, None, :]
                bidx_parts.append(b.reshape(M, W * td))
                is_knot_parts.append(jnp.ones((M, W * td), bool))
            if layout.sensor_off >= 0:
                so = layout.sensor_off
                sidx = cols[:, so : so + SENSOR_TANGENT_DIM] - spec_local.sensor_offset
                bidx_parts.append(sidx)
                is_knot_parts.append(jnp.zeros_like(sidx, dtype=bool))
            bidx = jnp.concatenate(bidx_parts, axis=1)
            is_knot = jnp.concatenate(is_knot_parts, axis=1)

            # lock mask + whitening
            colmask = jnp.where(
                is_knot,
                mask_loc[jnp.clip(bidx, 0, (seg + h) * BD - 1)],
                mask_sen[jnp.clip(bidx, 0, max(ns, 1) - 1)],
            )
            Jw = J * colmask[:, None, :] * sq[:, None, None]
            rw = r * sq[:, None]
            P_full = jnp.einsum("mrc,mrd->mcd", Jw, Jw)
            gv = jnp.einsum("mrc,mr->mc", Jw, rw)

            sblk = bidx // GBD
            o = bidx % GBD
            shape3 = P_full.shape
            s1 = jnp.broadcast_to(sblk[:, :, None], shape3)
            o1 = jnp.broadcast_to(o[:, :, None], shape3)
            o2 = jnp.broadcast_to(o[:, None, :], shape3)
            d = jnp.broadcast_to(sblk[:, None, :] - sblk[:, :, None], shape3)
            kk = is_knot[:, :, None] & is_knot[:, None, :]
            Dband = Dband.at[s1, o1, o2].add(
                jnp.where(kk & (d == 0), P_full, 0.0), mode="drop"
            )
            Uband = Uband.at[s1, o1, o2].add(
                jnp.where(kk & (d == 1), P_full, 0.0), mode="drop"
            )
            gband = gband.at[jnp.where(is_knot, bidx, (sb + 1) * GBD)].add(
                jnp.where(is_knot, gv, 0.0), mode="drop"
            )

            if layout.sensor_off >= 0:
                # sensor-knot coupling uses *global* banded column ids
                gb_col = bidx + s_idx * seg * BD
                b1 = jnp.broadcast_to(bidx[:, :, None], shape3)
                g2 = jnp.broadcast_to(gb_col[:, None, :], shape3)
                sk = (~is_knot[:, :, None]) & is_knot[:, None, :]
                Bsen = Bsen.at[b1, g2].add(
                    jnp.where(sk, P_full, 0.0), mode="drop"
                )
                ss = (~is_knot[:, :, None]) & (~is_knot[:, None, :])
                b2 = jnp.broadcast_to(bidx[:, None, :], shape3)
                Csen = Csen.at[b1, b2].add(
                    jnp.where(ss, P_full, 0.0), mode="drop"
                )
                gsen = gsen.at[jnp.where(~is_knot, bidx, ns)].add(
                    jnp.where(~is_knot, gv, 0.0), mode="drop"
                )

        # halo reduce: hand the extra super-block's contributions to the
        # right neighbor (who owns it as their block 0)
        D_halo = jax.lax.ppermute(Dband[sb], MEASUREMENT_AXIS, rev_perm)
        g_halo = jax.lax.ppermute(gband[sb * GBD :], MEASUREMENT_AXIS, rev_perm)
        Dloc = Dband[:sb].at[0].add(D_halo)
        gloc = gband[: sb * GBD].at[:GBD].add(g_halo)
        # U coupling from our last block into the halo block stays ours
        # (it is block (sb-1, sb) in global numbering = our last super-diag);
        # the halo block's own U (into the block after) is the neighbor's
        # block-0 U and is handled by them. Our Uband[sb] must therefore be
        # passed right as well (rows here never produce it, but keep exact):
        U_halo = jax.lax.ppermute(Uband[sb], MEASUREMENT_AXIS, rev_perm)
        Uloc = Uband[:sb].at[0].add(U_halo)

        cost, Bsen, Csen, gsen = jax.lax.psum(
            (cost, Bsen, Csen, gsen), MEASUREMENT_AXIS
        )
        return cost, Dloc, Uloc, gloc, Bsen, Csen, gsen

    # ---- shard_map wrappers -------------------------------------------
    rt_specs = jax.tree_util.tree_map(lambda _: P(), runtime)
    rt_specs["data"] = [{k: P(MEASUREMENT_AXIS) for k in d} for d in runtime["data"]]
    runtime_p = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), runtime, rt_specs
    )

    def state_specs():
        sp_tree = {k: P() for k in problem.state0}
        for sp in spec.splines:
            sp_tree[sp.kind] = P(MEASUREMENT_AXIS)
        return sp_tree

    st_specs = state_specs()

    def _pad_knots(state):
        out = dict(state)
        for sp in spec.splines:
            arr = state[sp.kind]
            pad = nk_pad - arr.shape[0]
            if pad:
                # pin the tiny pad block replicated: otherwise the sharded
                # concat output propagates a rows-sharded spec back onto the
                # [pad, D] broadcast and SPMD involuntarily rematerializes
                pad_arr = jax.lax.with_sharding_constraint(
                    jnp.repeat(arr[-1:], pad, axis=0),
                    NamedSharding(mesh, P()),
                )
                out[sp.kind] = jnp.concatenate([arr, pad_arr], axis=0)
        return out

    def _unpad_knots(state):
        out = dict(state)
        for sp in spec.splines:
            out[sp.kind] = state[sp.kind][:nk]
        return out

    def _place_state(state):
        st = _pad_knots(state)
        return {
            k: jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, st_specs[k])
            )
            for k, v in st.items()
        }

    cost_sm = jax.shard_map(
        _cost_local, mesh=mesh, in_specs=(rt_specs, st_specs), out_specs=P(),
        check_vma=False,
    )
    lin_sm = jax.shard_map(
        _linearize_local,
        mesh=mesh,
        in_specs=(rt_specs, st_specs),
        out_specs=(
            P(), P(MEASUREMENT_AXIS), P(MEASUREMENT_AXIS), P(MEASUREMENT_AXIS),
            P(), P(), P(),
        ),
        check_vma=False,
    )

    # mask/damping in banded order (global, replicated — [Pk] vector)
    mask_np = np.asarray(problem.mask)
    mask_band = np.zeros(Pk, dtype)
    mask_band[perm] = mask_np[: spec.sensor_offset]
    mask_band_j = jnp.asarray(mask_band)
    mask_sen_j = jnp.asarray(mask_np[spec.sensor_offset : spec.sensor_offset + ns])

    nb_tot = Pk // GBD

    def _solve_local(Dband, Uband, gband, Bsen, Csen, gsen, lam):
        """Distributed band solve (inside shard_map): SPIKE factorization of
        the sharded block-tridiagonal system + replicated sensor border.
        The solve phase is O(sb) per device — nothing O(total knots) is
        factored or stored on any single device."""
        from ..solver.banded import spike_block_tridiag_solve

        s_idx = jax.lax.axis_index(MEASUREMENT_AXIS)
        start = (s_idx * sb * GBD).astype(jnp.int32)
        mask_loc = jax.lax.dynamic_slice(mask_band_j, (start,), (sb * GBD,))
        diag_band = jax.vmap(jnp.diag)(Dband).reshape(sb * GBD)
        damp = lam * jnp.clip(diag_band, 1e-6, 1e32) + (1.0 - mask_loc)
        Dd = Dband + jax.vmap(jnp.diag)(damp.reshape(sb, GBD))
        if ns:
            Bloc = jax.lax.dynamic_slice(
                Bsen[:ns], (jnp.zeros((), jnp.int32), start), (ns, sb * GBD)
            )
            rhs = jnp.concatenate(
                [-gband[:, None], Bloc.T], axis=1
            ).reshape(sb, GBD, 1 + ns)
        else:
            rhs = (-gband).reshape(sb, GBD, 1)
        sol = spike_block_tridiag_solve(Dd, Uband, rhs, MEASUREMENT_AXIS, n)
        sol = sol.reshape(sb * GBD, rhs.shape[-1])
        y = sol[:, 0]
        if ns:
            X = sol[:, 1:]
            diag_sen = jnp.diag(Csen)[:ns]
            damp_s = lam * jnp.clip(diag_sen, 1e-6, 1e32) + (1.0 - mask_sen_j)
            Cd = Csen[:ns, :ns] + jnp.diag(damp_s)
            Ssen = Cd - jax.lax.psum(Bloc @ X, MEASUREMENT_AXIS)
            rhs_s = -gsen[:ns] - jax.lax.psum(Bloc @ y, MEASUREMENT_AXIS)
            x_sen = jnp.linalg.solve(Ssen, rhs_s)
            x_band = y - X @ x_sen
        else:
            x_sen = jnp.zeros((0,), gband.dtype)
            x_band = y

        # pred / grad via one neighbor exchange: Hx needs the boundary
        # blocks of x and U from the adjacent shards
        xs = x_band.reshape(sb, GBD)
        fwd = [(i, (i - 1) % n) for i in range(n)]   # from right neighbor
        rev = [(i, (i + 1) % n) for i in range(n)]   # from left neighbor
        x_next0 = jax.lax.ppermute(xs[0], MEASUREMENT_AXIS, fwd)
        x_prevl = jax.lax.ppermute(xs[sb - 1], MEASUREMENT_AXIS, rev)
        U_prevl = jax.lax.ppermute(Uband[sb - 1], MEASUREMENT_AXIS, rev)
        lastm = (s_idx == n - 1).astype(gband.dtype)
        firstm = (s_idx == 0).astype(gband.dtype)
        Hx = jnp.einsum("kij,kj->ki", Dband, xs)
        Hx = Hx.at[:-1].add(jnp.einsum("kij,kj->ki", Uband[:-1], xs[1:]))
        Hx = Hx.at[sb - 1].add((1.0 - lastm) * (Uband[sb - 1] @ x_next0))
        Hx = Hx.at[1:].add(jnp.einsum("kji,kj->ki", Uband[:-1], xs[:-1]))
        Hx = Hx.at[0].add((1.0 - firstm) * (U_prevl.T @ x_prevl))
        gTd_loc = gband @ x_band
        dHd_loc = x_band @ Hx.reshape(sb * GBD)
        gTd = jax.lax.psum(gTd_loc, MEASUREMENT_AXIS)
        dHd = jax.lax.psum(dHd_loc, MEASUREMENT_AXIS)
        if ns:
            Bx = jax.lax.psum(Bloc @ x_band, MEASUREMENT_AXIS)
            gTd = gTd + gsen[:ns] @ x_sen
            dHd = dHd + 2.0 * x_sen @ Bx + x_sen @ (Csen[:ns, :ns] @ x_sen)
        pred = -(gTd + 0.5 * dHd)
        gmax = jax.lax.pmax(jnp.max(jnp.abs(gband)), MEASUREMENT_AXIS)
        if ns:
            gmax = jnp.maximum(gmax, jnp.max(jnp.abs(gsen[:ns])))
        return x_band, x_sen, pred, gmax

    def _solve(Dband, Uband, gband, Bsen, Csen, gsen, lam):
        diag_band = jax.vmap(jnp.diag)(Dband).reshape(Pk)
        damp = lam * jnp.clip(diag_band, 1e-6, 1e32) + (1.0 - mask_band_j)
        Dd = Dband + jax.vmap(jnp.diag)(damp.reshape(nb_tot, GBD))
        if ns:
            diag_sen = jnp.diag(Csen)[:ns]
            damp_s = lam * jnp.clip(diag_sen, 1e-6, 1e32) + (1.0 - mask_sen_j)
            Cd = Csen[:ns, :ns] + jnp.diag(damp_s)
            rhs = jnp.concatenate(
                [-gband[:, None], Bsen[:ns].T], axis=1
            ).reshape(nb_tot, GBD, 1 + ns)
            sol = block_tridiag_solve(Dd, Uband, rhs).reshape(Pk, 1 + ns)
            y, X = sol[:, 0], sol[:, 1:]
            Ssen = Cd - Bsen[:ns] @ X
            x_sen = jnp.linalg.solve(Ssen, -gsen[:ns] - Bsen[:ns] @ y)
            x_band = y - X @ x_sen
        else:
            x_band = block_tridiag_solve(
                Dd, Uband, (-gband).reshape(nb_tot, GBD, 1)
            ).reshape(Pk)
            x_sen = jnp.zeros((0,), gband.dtype)
        # back to original tangent order
        delta = jnp.concatenate([x_band[perm_j], x_sen]) * problem.mask
        # pred / grad from band quantities
        gTd = gband @ x_band + (gsen[:ns] @ x_sen if ns else 0.0)
        Hx = jnp.einsum("kij,kj->ki", Dband, x_band.reshape(nb_tot, GBD))
        xs = x_band.reshape(nb_tot, GBD)
        Hx = Hx.at[:-1].add(jnp.einsum("kij,kj->ki", Uband[:-1], xs[1:]))
        Hx = Hx.at[1:].add(jnp.einsum("kji,kj->ki", Uband[:-1], xs[:-1]))
        dHd = x_band @ Hx.reshape(Pk)
        if ns:
            dHd = (
                dHd
                + 2.0 * x_sen @ (Bsen[:ns] @ x_band)
                + x_sen @ (Csen[:ns, :ns] @ x_sen)
            )
        pred = -(gTd + 0.5 * dHd)
        grad_max = jnp.maximum(
            jnp.max(jnp.abs(gband)),
            jnp.max(jnp.abs(gsen[:ns])) if ns else 0.0,
        )
        return delta, pred, grad_max

    # With >= 2 super-blocks per shard the band solve runs distributed
    # (SPIKE, O(sb) per device); tiny problems fall back to the replicated
    # recursion.
    if n > 1 and sb >= 2:
        solve_sm = jax.shard_map(
            _solve_local,
            mesh=mesh,
            in_specs=(
                P(MEASUREMENT_AXIS), P(MEASUREMENT_AXIS), P(MEASUREMENT_AXIS),
                P(), P(), P(), P(),
            ),
            out_specs=(P(MEASUREMENT_AXIS), P(), P(), P()),
            check_vma=False,
        )

        def solve_j(Dband, Uband, gband, Bsen, Csen, gsen, lam):
            x_band, x_sen, pred, gmax = solve_sm(
                Dband, Uband, gband, Bsen, Csen, gsen, lam
            )
            delta = jnp.concatenate([x_band[perm_j], x_sen]) * problem.mask
            return delta, pred, gmax

    else:
        solve_j = jax.jit(_solve)

    # padded-layout spec for retraction (knot arrays padded to nk_pad)
    pad_per = nk_pad - nk
    pad_splines = []
    off = 0
    for sp in spec.splines:
        td = _TANGENT_DIMS[sp.kind]
        pad_splines.append(sp._replace(n=nk_pad, tangent_offset=off))
        off += nk_pad * td
    spec_pad = spec._replace(
        splines=tuple(pad_splines),
        sensor_offset=off,
        landmark_offset=off + ns,
        vt_offset=off + ns,
        num_tangent=off + (spec.num_tangent - spec.sensor_offset),
    )

    def _extend_mask():
        parts = []
        for sp in spec.splines:
            td = _TANGENT_DIMS[sp.kind]
            m = mask_np[sp.tangent_offset : sp.tangent_offset + nk * td]
            parts.append(np.concatenate([m, np.zeros(pad_per * td, dtype)]))
        parts.append(mask_np[spec.sensor_offset :])
        return jnp.asarray(np.concatenate(parts))

    def _extend_delta(delta):
        parts = []
        for sp in spec.splines:
            td = _TANGENT_DIMS[sp.kind]
            dpart = delta[sp.tangent_offset : sp.tangent_offset + nk * td]
            parts.append(
                jnp.concatenate([dpart, jnp.zeros((pad_per * td,), delta.dtype)])
            )
        parts.append(delta[spec.sensor_offset :])
        return jnp.concatenate(parts)

    ext_mask = _extend_mask()

    def _retract(st, delta):
        return _retract_state(
            spec_pad,
            {"mask": ext_mask, "d_max": runtime_p["d_max"]},
            st,
            _extend_delta(delta),
        )

    @jax.jit
    def step(state, lam):
        st = _place_state(state)
        cost, Dband, Uband, gband, Bsen, Csen, gsen = lin_sm(runtime_p, st)
        delta, pred, grad_max = solve_j(
            Dband, Uband, gband, Bsen, Csen, gsen, lam
        )
        new_st = _retract(st, delta)
        new_cost = cost_sm(runtime_p, new_st)
        return cost, _unpad_knots(new_st), new_cost, pred, delta, grad_max

    @jax.jit
    def total_cost(state):
        return cost_sm(runtime_p, _place_state(state))

    return step, total_cost


def make_segment_sharded_solver(problem, mesh, max_iterations=50,
                                function_tolerance=1e-6):
    """Full on-device LM through the knot-segment-sharded step (shared
    trust-region policy). Returns state -> (state, final_cost, iterations)."""
    from ..solver.lm import trust_region_loop

    step, total_cost = make_segment_sharded_step(problem, mesh)

    def solve_fn(state):
        cost0 = total_cost(state)
        return trust_region_loop(
            step, cost0, state,
            max_iterations=max_iterations,
            function_tolerance=function_tolerance,
            dtype=problem.mask.dtype,
        )

    return jax.jit(solve_fn)
