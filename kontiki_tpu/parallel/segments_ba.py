"""Composed knot-segment x landmark-block sharding: distributed BA.

BASELINE config 5 as specified: "knot-segment + landmark-block sharded
distributed BA" at 10k+ keyframes / 100k+ landmarks. This module composes
the two state-sharding axes that previously existed separately
(`parallel/segments.py` trajectory-only, `parallel/schur.py` landmark-only):

- **Knot axis sharded** in contiguous time segments (sequence parallelism).
  Each device stores only its ``seg`` knots; windows straddling segment
  boundaries read a two-sided halo (left + right) fetched with one
  ``ppermute`` each, and boundary-straddling Gauss-Newton contributions are
  returned to their owner by the reverse permutes. This replaces the
  reference's active-window sparsity (spline_base.h:361-404) at pod scale.
- **Landmark axis sharded by ownership.** Every observation row of a
  landmark shares the landmark's *reference* view (inverse-depth
  parameterization, static_rscamera_measurement.h:21-55), so rows are
  assigned to the device owning the reference window's base knot — which
  automatically co-locates each landmark with *all* of its rows. The
  landmark blocks ``D/g_l`` and the elimination products therefore need no
  cross-device reduction at all.
- **Matrix-free PCG on the reduced system** (Ceres ITERATIVE_SCHUR
  analogue, trajectory_estimator.h:40): the damped Schur complement matvec
  runs on the per-device compressed row Jacobians; the only communication
  per matvec is the two knot-halo permutes, their reverses, and one psum of
  the small sensor border + CG scalars. Per-device memory is
  O(seg knots + L/n landmarks + rows/n) — nothing global but [ns] and
  scalars.

Preconditioner: damped per-knot [td, td] + per-sensor [13, 13] block-Jacobi
(identical structure to ``solver.iterative``), assembled locally with a
halo reduce.

Scope: rs_static + rs_newton camera buckets plus single-window
trajectory/IMU buckets, all splines on one knot grid. Sensor time offsets
may be locked OR unlocked: row ownership and anchors are static (computed
from the lower bound of each row's window-base range) while halos and
superblocks are sized to cover the full -+max_time_offset motion, exactly
as the reference widens measurement spans
(gyroscope_measurement.h:84-92); the offset column itself rides the
psum-reduced global sensor border. rs_lifting falls back to the
measurement-sharded iterative path (its per-row vt parameters are not
landmark-owned).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..solver.iterative import _bucket_layout, duplicate_cross_diag
from ..solver.kernels import (
    SENSOR_TANGENT_DIM,
    _TANGENT_DIMS,
    _bucket_terms,
    _huber,
    _huber_prime,
    _make_residual,
    retract_window,
    problem_runtime,
    problem_spec,
)
from ..math import quaternion as quat
from ..math import se3 as se3m
from . import MEASUREMENT_AXIS

__all__ = ["make_segment_ba_step", "make_segment_ba_solver", "segment_ba_layout"]

_SINGLE_WINDOW = ("position", "orientation", "gyro", "accel")


def segment_ba_layout(problem, n_shards):
    """Static layout for the composed sharding.

    Returns (spec, spec_local, runtime_sharded, lay) where ``runtime_sharded``
    has every bucket's rows reordered by owning shard (padded per shard) and
    landmark ids rewritten to per-shard local slots."""
    spec = problem_spec(problem)
    runtime = problem_runtime(problem)
    kinds = [b.kind.split(":")[0] for b in spec.buckets]
    for k in kinds:
        if k not in _SINGLE_WINDOW + ("rs_static", "rs_newton", "rs_lifting"):
            raise ValueError(
                f"segment BA sharding supports rs_static/rs_newton/"
                f"rs_lifting + trajectory/IMU buckets; got {k}"
            )
    mask = np.asarray(problem.mask)
    d0 = np.array([s.time_offset if hasattr(s, "time_offset") else 0.0
                   for s in problem.sensors])
    S_n = len(problem.sensors)
    d_unlocked = np.array([
        mask[problem.sensor_offset + i * SENSOR_TANGENT_DIM + 6] != 0.0
        for i in range(S_n)
    ], dtype=bool)
    d_max_s = np.asarray(problem.d_max).reshape(-1)[: max(S_n, 1)]
    # Dynamic time-offset range per sensor: the retraction bounds
    # |d| <= max_time_offset (sensors.h:158-160), so an unlocked offset's
    # evaluation times range over t -+ d_max regardless of the current d;
    # a locked offset stays at d0. This is the reference's span widening
    # (gyroscope_measurement.h:84-92) applied to the static sharded
    # layout: row ownership and anchors are computed from the LOWER bound
    # of each row's window-base range, and halos/superblocks are sized to
    # cover the full range, so the windows may move with d at runtime
    # without leaving their anchor's two-superblock span.
    if S_n:
        t_add_lo = np.where(d_unlocked, -d_max_s[:S_n], d0)
        t_add_hi = np.where(d_unlocked, d_max_s[:S_n], d0)
    else:
        t_add_lo = t_add_hi = d0
    grids = {(sp.n, round(float(problem.splines[i].t0), 12),
              round(float(problem.splines[i].dt), 12))
             for i, sp in enumerate(spec.splines)}
    if len(grids) != 1:
        raise ValueError("segment BA sharding requires all splines on one grid")
    nk = spec.splines[0].n
    t0 = float(problem.splines[0].t0)
    dt = float(problem.splines[0].dt)
    W_max = max(max(b.windows) for b in spec.buckets)
    n = n_shards

    # --- row ownership + halo sizing (host-side, offsets locked) ---------
    # Indices are the rows' WINDOW-BASE knots, computed exactly as the
    # linearization kernels compute i_base (kernels._with_base_times +
    # _i_bases: frame-start times for camera rows, clip to n - W), so the
    # anchor/halo/rel-id math below bounds the actual column support —
    # row-time-based indices can sit up to ceil(readout/dt) knots RIGHT of
    # the true window base and silently under-anchor.
    i_refs = []        # LOWER window-base bound: ownership + anchors
    i_obs_list = []
    i_ref_hi_list = []
    i_obs_hi_list = []
    max_dpos = 0  # max rightward column reach beyond the anchor (knots)
    max_dneg = 0  # max leftward column reach before the anchor (knots)
    for bspec, data in zip(spec.buckets, runtime["data"]):
        d = {k: np.asarray(v) for k, v in data.items()}
        W_b = max(bspec.windows)

        def _idx(t):
            return np.clip(
                np.floor((t - t0) / dt).astype(np.int64), 0, nk - W_b
            )

        i_obs = i_obs_hi = None
        if bspec.kind.startswith("rs_"):
            lo_add = t_add_lo[d["sid"]]
            hi_add = t_add_hi[d["sid"]]
            i_ref = _idx(d["t0_ref"] + lo_add)
            i_ref_hi = _idx(d["t0_ref"] + hi_add)
            i_obs = _idx(d["t0_obs"] + lo_add)
            i_obs_hi = _idx(d["t0_obs"] + hi_add)
            if len(i_ref):
                right = np.maximum(i_obs_hi, i_ref_hi) - i_ref
                left = np.maximum(i_ref - i_obs, 0)
                max_dpos = max(max_dpos, int(right.max()))
                max_dneg = max(max_dneg, int(left.max()))
        else:
            if "sid" in d:
                lo_add = t_add_lo[d["sid"]]
                hi_add = t_add_hi[d["sid"]]
            else:
                lo_add = hi_add = np.zeros(len(d["t"]))
            i_ref = _idx(d["t"] + lo_add)
            i_ref_hi = _idx(d["t"] + hi_add)
            if len(i_ref):
                max_dpos = max(max_dpos, int((i_ref_hi - i_ref).max()))
        i_refs.append(i_ref)
        i_obs_list.append(i_obs)
        i_ref_hi_list.append(i_ref_hi)
        i_obs_hi_list.append(i_obs_hi)

    # Per-landmark knot-column support [lm_lo, lm_hi + W_max): i_ref varies
    # across a landmark's rows when the rolling-shutter readout spans
    # multiple knot intervals (v_ref*readout/rows shifts the reference
    # window), so the per-row bound max_dpos+max_dneg can undercount the
    # per-landmark span. All of a landmark's rows are anchored at its
    # block, so G must fit the *landmark* support in two superblocks.
    L = spec.num_landmarks
    lm_lo = np.full(max(L, 1), 10**9, dtype=np.int64)
    lm_hi = np.full(max(L, 1), -1, dtype=np.int64)
    for bspec, data, i_ref, i_obs, i_ref_hi, i_obs_hi in zip(
        spec.buckets, runtime["data"], i_refs, i_obs_list,
        i_ref_hi_list, i_obs_hi_list,
    ):
        if not bspec.kind.startswith("rs_"):
            continue
        lid = np.asarray(data["lid"])
        np.minimum.at(lm_lo, lid, np.minimum(i_ref, i_obs))
        np.maximum.at(lm_hi, lid, np.maximum(i_ref_hi, i_obs_hi))

    # Pair-block size for the banded reduced system: with G >= any single
    # row's / landmark's column span, every row/landmark touches at most
    # TWO consecutive G-blocks and the reduced system is block-tridiagonal
    # in G-superblocks.
    G = max(max_dpos + max_dneg + W_max, 2)
    seen_lm = lm_hi >= 0
    if seen_lm.any():
        # span <= G guarantees the two-superblock property for any
        # anchor offset (enforced by the assert below); widen G by the
        # observed per-landmark ref spread
        span = lm_hi[seen_lm] - lm_lo[seen_lm] + W_max
        G = max(G, int(span.max()))
        assert (
            lm_hi[seen_lm] + W_max - 1 - (lm_lo[seen_lm] // G) * G < 2 * G
        ).all(), "landmark column support exceeds two G-superblocks"
    if n == 1:
        Hl = Hr = 0
        # one extra pad block so the (anchor, anchor+1) pair always exists
        seg = (int(math.ceil(nk / G)) + 1) * G
    else:
        Hl = int(math.ceil((max_dneg + W_max) / G)) * G
        Hr = int(math.ceil((max_dpos + W_max) / G)) * G
        # one-ppermute-hop halos must fit in a neighbor's segment, and the
        # distributed SPIKE band solve needs >= 2 superblocks per shard
        seg = max(int(math.ceil(nk / n)), W_max, Hl, Hr, 2 * G)
        seg = int(math.ceil(seg / G)) * G
    nk_pad = seg * n
    owners = [np.minimum(i_ref // seg, n - 1) for i_ref in i_refs]

    # --- landmark blocks: owner = owner of the landmark's rows ----------
    lm_owner = np.zeros(L, dtype=np.int64)
    seen = np.zeros(L, dtype=bool)
    for bspec, data, owner in zip(spec.buckets, runtime["data"], owners):
        if not bspec.kind.startswith("rs_"):
            continue
        lid = np.asarray(data["lid"])
        first = ~seen[lid]
        lm_owner[lid] = np.where(seen[lid], lm_owner[lid], owner)
        seen[lid] = True
        if np.any(lm_owner[lid] != owner):
            raise ValueError("landmark observed from rows on multiple shards")
    lm_owner[~seen] = 0
    counts_l = np.bincount(lm_owner, minlength=n)
    Lb = max(int(counts_l.max()), 1)
    # global landmark id -> (owner, slot); slot assignment in id order
    slot = np.zeros(L, dtype=np.int64)
    for s in range(n):
        ids = np.nonzero(lm_owner == s)[0]
        slot[ids] = np.arange(len(ids))
    lid_to_padded = lm_owner * Lb + slot  # [L] -> index into [n*Lb]

    # --- lifting vt blocks: one vt per row, owned with its row ----------
    # (lifting_rscamera_measurement.h:199-204: vt is a per-observation
    # bounded parameter; every row touches exactly its own vt, so the vt
    # axis shards with row ownership and needs no cross-device reduction)
    V = spec.num_vt
    vt_owner = np.zeros(max(V, 1), dtype=np.int64)
    vt_seen = np.zeros(max(V, 1), dtype=bool)
    for bspec, data, owner in zip(spec.buckets, runtime["data"], owners):
        if bspec.kind.split(":")[0] != "rs_lifting":
            continue
        vti = np.asarray(data["vt_idx"])
        vt_owner[vti] = owner
        vt_seen[vti] = True
    Vb = 1
    vslot = np.zeros(max(V, 1), dtype=np.int64)
    if V:
        counts_v = np.bincount(vt_owner[vt_seen], minlength=n)
        Vb = max(int(counts_v.max()), 1)
        for s in range(n):
            ids = np.nonzero(vt_seen & (vt_owner == s))[0]
            vslot[ids] = np.arange(len(ids))
    vtid_to_padded = vt_owner * Vb + vslot  # [V] -> index into [n*Vb]

    # --- banded-block bookkeeping (host-side) ----------------------------
    sbG = seg // G
    hl_b, hr_b = Hl // G, Hr // G
    nbloc = hl_b + sbG + hr_b

    # per-landmark minimum window knot (all rows of a landmark are co-owned;
    # computed above for the G-sizing check)
    lm_imin = lm_lo

    # landmark anchor block (local ids) + per-(shard, anchor) slot layout
    la_of_lm = np.zeros(max(L, 1), dtype=np.int64)
    if L:
        la_of_lm = np.where(
            seen, lm_imin // G - lm_owner * sbG + hl_b, 0
        )
        if seen.any():
            chk = la_of_lm[seen]
            assert chk.min() >= 0 and chk.max() <= nbloc - 2, (
                chk.min(), chk.max(), nbloc)
    slot_in_anchor = np.zeros(max(L, 1), dtype=np.int64)
    LaMax = 1
    lid_of_slot = np.zeros((n, nbloc, 1), dtype=np.int64)
    smask = np.zeros((n, nbloc, 1))
    if L:
        counts_sa = np.zeros((n, nbloc), dtype=np.int64)
        for lid in range(L):
            s, a = lm_owner[lid], la_of_lm[lid]
            slot_in_anchor[lid] = counts_sa[s, a]
            counts_sa[s, a] += 1
        LaMax = max(int(counts_sa.max()), 1)
        lid_of_slot = np.zeros((n, nbloc, LaMax), dtype=np.int64)
        smask = np.zeros((n, nbloc, LaMax))
        for lid in range(L):
            s, a = lm_owner[lid], la_of_lm[lid]
            lid_of_slot[s, a, slot_in_anchor[lid]] = slot[lid]
            smask[s, a, slot_in_anchor[lid]] = 1.0

    # --- reindex rows per shard ------------------------------------------
    new_data = []
    new_buckets = []
    banded_tables = []
    for bspec, data, owner, i_ref in zip(
        spec.buckets, runtime["data"], owners, i_refs
    ):
        cam = bspec.kind.startswith("rs_")
        d = {k: np.asarray(v) for k, v in data.items()}
        counts = np.bincount(owner, minlength=n)
        M_per = max(int(counts.max()), 1)
        idx = np.zeros(n * M_per, dtype=np.int64)
        valid = np.zeros(n * M_per)
        for s in range(n):
            rows = np.nonzero(owner == s)[0]
            idx[s * M_per: s * M_per + len(rows)] = rows
            valid[s * M_per: s * M_per + len(rows)] = 1.0
        owner_row = np.arange(n * M_per) // M_per
        # anchor block of each (reordered) row, as a *local* block id:
        # camera rows anchor at their landmark's block (so one grouping
        # serves both the H and the landmark-elimination passes)
        if cam:
            anchor = (lm_imin[d["lid"][idx]] // G
                      - owner_row * sbG + hl_b)
            lrel = slot_in_anchor[d["lid"][idx]]
        else:
            anchor = i_ref[idx] // G - owner_row * sbG + hl_b
            lrel = None
        d = {k: v[idx] for k, v in d.items()}
        seg_start_t = t0 + (np.arange(n * M_per) // M_per) * seg * dt
        pin_t = seg_start_t + min(W_max + 1, max(seg - 4, 1)) * dt
        # pad rows: pin inside the owning segment; their anchor comes from
        # the pinned time (their contributions are zeroed by valid)
        i_pin = np.clip(((pin_t - t0) / dt).astype(np.int64), 0, nk_pad - 4)
        a_pin = np.clip(i_pin // G - owner_row * sbG + hl_b, 0, nbloc - 2)
        anchor = np.where(valid > 0, anchor, a_pin)
        assert anchor.min() >= 0 and anchor.max() <= nbloc - 2, (
            anchor.min(), anchor.max(), nbloc)
        if cam:
            d["t0_ref"] = np.where(valid > 0, d["t0_ref"], pin_t)
            d["t0_obs"] = np.where(valid > 0, d["t0_obs"], pin_t)
            d["v_ref"] = np.where(valid > 0, d["v_ref"], 0.0)
            d["v_obs"] = np.where(valid > 0, d["v_obs"], 0.0)
            # local slot ids replace globals inside the shard program
            d["lid"] = np.where(valid > 0, slot[d["lid"]], 0).astype(np.int32)
            d["lrel"] = np.where(valid > 0, lrel, 0).astype(np.int32)
            if "vt_idx" in d:
                d["vt_idx"] = np.where(
                    valid > 0, vslot[d["vt_idx"]], 0
                ).astype(np.int32)
        else:
            d["t"] = np.where(valid > 0, d["t"], pin_t)
        d["valid"] = valid.astype(mask.dtype)
        d["anchor"] = anchor.astype(np.int32)

        # anchor-grouped row permutation (per shard, padded uniformly)
        cnt = np.zeros((n, nbloc), dtype=np.int64)
        for s in range(n):
            a_s = anchor[s * M_per:(s + 1) * M_per]
            v_s = valid[s * M_per:(s + 1) * M_per]
            for a, v in zip(a_s, v_s):
                if v > 0:
                    cnt[s, a] += 1
        Ma = max(int(cnt.max()), 1)
        perm = np.zeros((n, nbloc, Ma), dtype=np.int64)
        pmask = np.zeros((n, nbloc, Ma))
        fill = np.zeros((n, nbloc), dtype=np.int64)
        for s in range(n):
            for r in range(M_per):
                if valid[s * M_per + r] > 0:
                    a = anchor[s * M_per + r]
                    perm[s, a, fill[s, a]] = r
                    pmask[s, a, fill[s, a]] = 1.0
                    fill[s, a] += 1
        banded_tables.append(dict(
            perm=jnp.asarray(perm.reshape(n, nbloc * Ma).astype(np.int32)),
            pmask=jnp.asarray(pmask.reshape(n, nbloc * Ma).astype(mask.dtype)),
            Ma=Ma,
        ))
        new_data.append({k: jnp.asarray(v) for k, v in d.items()})
        new_buckets.append(bspec._replace(M=n * M_per))

    # local spec: per-device knot arrays are [Hl + seg + Hr] long, landmark
    # table is the local block [Lb]
    nloc = Hl + seg + Hr
    loc_splines = []
    off = 0
    for sp in spec.splines:
        loc_splines.append(sp._replace(n=nloc, tangent_offset=off))
        off += nloc * _TANGENT_DIMS[sp.kind]
    Pk_loc = off
    spec_local = spec._replace(
        splines=tuple(loc_splines),
        buckets=tuple(new_buckets),
        num_landmarks=Lb,
        num_vt=Vb if V else 0,
    )
    runtime["data"] = new_data

    # landmark mask, permuted into padded slots
    mask_l = np.zeros(n * Lb, dtype=mask.dtype)
    if L:
        mask_l[lid_to_padded] = mask[
            spec.landmark_offset: spec.landmark_offset + L
        ]
    # vt mask, permuted into padded per-shard slots
    mask_v = np.zeros(n * Vb, dtype=mask.dtype)
    if V:
        mask_v[vtid_to_padded] = mask[spec.vt_offset: spec.vt_offset + V]
    # knot tangent mask, padded to nk_pad (pad knots are locked)
    kmask = []
    for sp in spec.splines:
        td = _TANGENT_DIMS[sp.kind]
        m = mask[sp.tangent_offset: sp.tangent_offset + nk * td]
        kmask.append(
            np.concatenate([m, np.zeros((nk_pad - nk) * td, mask.dtype)])
            .reshape(nk_pad, td)
        )
    ns = len(problem.sensors) * SENSOR_TANGENT_DIM
    mask_sen = mask[spec.sensor_offset: spec.sensor_offset + ns]

    lay = dict(
        nk=nk, nk_pad=nk_pad, seg=seg, Hl=Hl, Hr=Hr, n=n, Lb=Lb, L=L,
        t0=t0, dt=dt, Pk_loc=Pk_loc, ns=ns, nloc=nloc,
        V=V, Vb=Vb, vtid_to_padded=vtid_to_padded,
        mask_v=jnp.asarray(mask_v),
        lid_to_padded=lid_to_padded,
        mask_l=jnp.asarray(mask_l), mask_sen=jnp.asarray(mask_sen),
        kmask=[jnp.asarray(m) for m in kmask],
        W_max=W_max,
        # banded reduced-system structure
        G=G, sbG=sbG, hl_b=hl_b, hr_b=hr_b, nbloc=nbloc, LaMax=LaMax,
        lid_of_slot=jnp.asarray(
            lid_of_slot.reshape(n, nbloc * LaMax).astype(np.int32)
        ),
        smask=jnp.asarray(
            smask.reshape(n, nbloc * LaMax).astype(mask.dtype)
        ),
        banded_tables=banded_tables,
    )
    return spec, spec_local, runtime, lay


def _build_segment_ba(problem, mesh, cg_tol, cg_maxiter, mode="banded"):
    n = mesh.devices.size
    spec, spec_local, runtime, lay = segment_ba_layout(problem, n)
    residuals = [_make_residual(spec_local, b) for b in spec_local.buckets]
    layouts = [
        _bucket_layout(spec_local, b, r[1])
        for b, r in zip(spec_local.buckets, residuals)
    ]
    seg, Hl, Hr, nloc = lay["seg"], lay["Hl"], lay["Hr"], lay["nloc"]
    Lb, Pk_loc, ns = lay["Lb"], lay["Pk_loc"], lay["ns"]
    # per-shard vt slots (rs_lifting): extra LOCAL columns past the sensor
    # border — each vt is touched only by its own (locally owned) row, so
    # the vt segment of every cat vector needs neither halo nor psum
    nvt = lay["Vb"] if lay["V"] else 0
    if nvt and mode == "banded":
        raise ValueError(
            "rs_lifting buckets ride the segment-BA PCG mode (per-row vt "
            "columns are not banded); use mode='pcg'"
        )
    tds = [_TANGENT_DIMS[sp.kind] for sp in spec.splines]
    Pown = seg * sum(tds)
    dtype = np.asarray(problem.mask).dtype
    S = len(problem.sensors)

    # owned-vector layout: per-spline [seg*td] slices then nothing else
    own_off = np.concatenate([[0], np.cumsum([seg * td for td in tds])])
    loc_off = np.concatenate([[0], np.cumsum([nloc * td for td in tds])])

    to_left = [(i, (i - 1) % n) for i in range(n)]   # send to left neighbor
    to_right = [(i, (i + 1) % n) for i in range(n)]  # send to right neighbor

    def _halo_fill(x_own):
        """[Pown] owned knot tangents -> [Pk_loc] with halos filled."""
        parts = []
        for si, td in enumerate(tds):
            xo = x_own[own_off[si]: own_off[si + 1]]
            if Hl or Hr:
                left = jax.lax.ppermute(
                    xo[(seg - Hl) * td:], MEASUREMENT_AXIS, to_right
                ) if Hl else xo[:0]
                right = jax.lax.ppermute(
                    xo[: Hr * td], MEASUREMENT_AXIS, to_left
                ) if Hr else xo[:0]
                parts.append(jnp.concatenate([left, xo, right]))
            else:
                parts.append(xo)
        return jnp.concatenate(parts)

    def _halo_reduce(y_loc):
        """[Pk_loc] local scatter result -> [Pown] with halo contributions
        returned to their owners."""
        parts = []
        for si, td in enumerate(tds):
            yl = y_loc[loc_off[si]: loc_off[si + 1]]
            core = yl[Hl * td: (Hl + seg) * td]
            if Hl:
                from_right = jax.lax.ppermute(
                    yl[: Hl * td], MEASUREMENT_AXIS, to_left
                )
                core = core.at[(seg - Hl) * td:].add(from_right)
            if Hr:
                from_left = jax.lax.ppermute(
                    yl[(Hl + seg) * td:], MEASUREMENT_AXIS, to_right
                )
                core = core.at[: Hr * td].add(from_left)
            parts.append(core)
        return jnp.concatenate(parts)

    def _halo_state(state):
        """Extend sharded knot arrays with both halos (ppermute per spline)."""
        out = dict(state)
        for sp in spec.splines:
            local = state[sp.kind]  # [seg, D] inside shard_map
            pieces = []
            if Hl:
                pieces.append(jax.lax.ppermute(
                    local[seg - Hl:], MEASUREMENT_AXIS, to_right))
            pieces.append(local)
            if Hr:
                pieces.append(jax.lax.ppermute(
                    local[:Hr], MEASUREMENT_AXIS, to_left))
            out[sp.kind] = jnp.concatenate(pieces, axis=0) if len(pieces) > 1 else local
        return out

    def _local_runtime(rt):
        s = jax.lax.axis_index(MEASUREMENT_AXIS)
        rt = dict(rt)
        shift = (s * seg - Hl).astype(dtype)
        rt["spline_t0"] = [
            t0_ + shift * dt_ for t0_, dt_ in zip(rt["spline_t0"], rt["spline_dt"])
        ]
        # evaluation bound = GLOBAL knot count in local coordinates: the
        # local arrays carry halo + pad knots past the real spline end, and
        # out-of-range times (the Newton clamp can overshoot max_time) must
        # extrapolate from the same terminal window as the single-chip path
        # instead of sliding into pad knots (kernels._spline_n_eval)
        rt["spline_n_eval"] = [
            jnp.asarray(nk_g, jnp.int32) - (s * seg - Hl).astype(jnp.int32)
            for nk_g in [sp.n for sp in spec.splines]
        ]
        return rt

    def _own_mask():
        s = jax.lax.axis_index(MEASUREMENT_AXIS)
        parts = []
        for si, sp in enumerate(spec.splines):
            km = jax.lax.dynamic_slice(
                lay["kmask"][si],
                ((s * seg).astype(jnp.int32), jnp.zeros((), jnp.int32)),
                (seg, tds[si]),
            )
            parts.append(km.reshape(-1))
        return jnp.concatenate(parts)

    def _own_mask_l():
        s = jax.lax.axis_index(MEASUREMENT_AXIS)
        return jax.lax.dynamic_slice(
            lay["mask_l"], ((s * Lb).astype(jnp.int32),), (Lb,)
        )

    def _own_mask_v():
        s = jax.lax.axis_index(MEASUREMENT_AXIS)
        return jax.lax.dynamic_slice(
            lay["mask_v"], ((s * nvt).astype(jnp.int32),), (nvt,)
        )

    # column remap: window positions index the local knot tangent space
    # as-is; sensor positions move to [Pk_loc, Pk_loc + ns); vt positions
    # (rs_lifting, last column) move to [Pk_loc + ns, Pk_loc + ns + Vb)
    col_shift = []
    for layout in layouts:
        shift = np.zeros(layout.C, np.int32)
        if layout.sensor_off >= 0:
            shift[layout.sensor_off: layout.sensor_off + SENSOR_TANGENT_DIM] = (
                Pk_loc - spec_local.sensor_offset
            )
        vt_pos = (layout.sensor_off + SENSOR_TANGENT_DIM
                  if layout.sensor_off >= 0 else 0)
        if layout.C > vt_pos:  # trailing vt column (kernels emit
            # spec_local.vt_offset + local slot there)
            shift[vt_pos:] = Pk_loc + ns - spec_local.vt_offset
        col_shift.append(jnp.asarray(shift))

    def _whitened_blocks(rt, state, col_mask=True):
        """(cost, blocks, mask_l): per-bucket compressed, robust-whitened
        Jacobian blocks with cols in the local layout.

        ``col_mask=True`` applies the lock mask per row (PCG path, whose
        matvecs consume Jw directly). The banded path passes False: the
        per-row gather ``mask_cat[cols_m]`` ([M, C] from the [Pk_loc+ns]
        vector) was the single slowest op of the config-5 step (~230 ms),
        and since H = (JM)^T(JM) = M J^TJ M the identical masking applies
        post-assembly in the tiny pair-block space instead."""
        rt_l = _local_runtime(rt)
        st = _halo_state(state)
        mask_l = _own_mask_l()
        if col_mask:
            mask_own = _own_mask()
            mask_loc = _halo_fill(mask_own)
            mask_cat = jnp.concatenate(
                [mask_loc, lay["mask_sen"]]
                + ([_own_mask_v()] if nvt else [])
            )

        cost = jnp.zeros((), dtype)
        blocks = []
        for bi, (bspec, (res, flags), data) in enumerate(
            zip(spec_local.buckets, residuals, rt_l["data"])
        ):
            out = _bucket_terms(
                spec_local, bspec, res, flags, rt_l, st, data, True,
                split_rho=flags["rho"],
            )
            if flags["rho"]:
                r, J, cols, J_rho = out
            else:
                r, J, cols = out
                J_rho = None
            s2 = jnp.sum(r * r, axis=-1)
            if flags["loss"]:
                c = data["huber_c"]
                rho_p = _huber_prime(s2, c)
                cost = cost + 0.5 * jnp.sum(_huber(s2, c))
            else:
                rho_p = jnp.ones_like(s2)
                cost = cost + 0.5 * jnp.sum(s2)
            cols_m = cols + col_shift[bi][None, :]
            sq = jnp.sqrt(rho_p)
            Jw = J * sq[:, None, None]
            if col_mask:
                Jw = Jw * mask_cat[cols_m][:, None, :]
            rw = r * sq[:, None]
            blk = {"rw": rw, "Jw": Jw, "cols": cols_m,
                   "anchor": data["anchor"]}
            if J_rho is not None:
                blk["J_rho"] = J_rho * sq[:, None] * mask_l[data["lid"]][:, None]
                blk["lid"] = data["lid"]
                blk["lrel"] = data["lrel"]
            blocks.append(blk)
        cost = jax.lax.psum(cost, MEASUREMENT_AXIS)
        return cost, blocks, mask_l

    def _linearize_local(rt, state):
        """Per-device compressed linearization.

        Returns (cost, blocks, g_own, g_sen, diag_own, diag_sen, D, g_l,
        kblocks, sblocks)."""
        cost, blocks, mask_l = _whitened_blocks(rt, state)

        # gradient + duplicate-aware diagonal over [Pk_loc + ns + nvt]
        g_cat = jnp.zeros((Pk_loc + ns + nvt,), dtype)
        diag_cat = jnp.zeros((Pk_loc + ns + nvt,), dtype)
        D = jnp.zeros((Lb,), dtype)
        g_l = jnp.zeros((Lb,), dtype)
        for blk, layout in zip(blocks, layouts):
            g_cat = g_cat.at[blk["cols"]].add(
                jnp.einsum("mrc,mr->mc", blk["Jw"], blk["rw"])
            )
            diag_cat = diag_cat.at[blk["cols"]].add(
                jnp.sum(blk["Jw"] ** 2, axis=1)
                + duplicate_cross_diag(blk, layout, dtype)
            )
            if "J_rho" in blk:
                D = D.at[blk["lid"]].add(jnp.sum(blk["J_rho"] ** 2, axis=1))
                g_l = g_l.at[blk["lid"]].add(
                    jnp.sum(blk["J_rho"] * blk["rw"], axis=1)
                )
        g_own = _halo_reduce(g_cat[:Pk_loc])
        diag_own = _halo_reduce(diag_cat[:Pk_loc])
        g_sen = jax.lax.psum(g_cat[Pk_loc:Pk_loc + ns], MEASUREMENT_AXIS)
        diag_sen = jax.lax.psum(
            diag_cat[Pk_loc:Pk_loc + ns], MEASUREMENT_AXIS
        )
        g_vt = g_cat[Pk_loc + ns:]      # local: vt rows are shard-owned
        diag_vt = diag_cat[Pk_loc + ns:]

        # block-Jacobi preconditioner blocks (per local knot, halo-reduced)
        kblocks = []
        for si, sp in enumerate(spec.splines):
            td = tds[si]
            kb = jnp.zeros((nloc, td, td), dtype)
            for blk, layout in zip(blocks, layouts):
                Jw, cols = blk["Jw"], blk["cols"]
                for off, sj, W, tdj in layout.windows:
                    if sj != si:
                        continue
                    Jwin = Jw[:, :, off:off + W * tdj].reshape(
                        Jw.shape[0], Jw.shape[1], W, tdj
                    )
                    contrib = jnp.einsum("mrwd,mrwe->mwde", Jwin, Jwin)
                    kidx = (cols[:, off] - loc_off[si]) // tdj
                    kidx = kidx[:, None] + jnp.arange(W)[None, :]
                    kb = kb.at[kidx].add(contrib)
            flat = _halo_reduce_blocks(kb.reshape(nloc, td * td), si)
            kblocks.append(flat.reshape(seg, td, td))
        sblocks = jnp.zeros((max(S, 1), SENSOR_TANGENT_DIM, SENSOR_TANGENT_DIM), dtype)
        for blk, layout in zip(blocks, layouts):
            if layout.sensor_off < 0:
                continue
            so = layout.sensor_off
            Js = blk["Jw"][:, :, so:so + SENSOR_TANGENT_DIM]
            contrib = jnp.einsum("mrd,mre->mde", Js, Js)
            sid = (blk["cols"][:, so] - Pk_loc) // SENSOR_TANGENT_DIM
            sblocks = sblocks.at[sid].add(contrib)
        sblocks = jax.lax.psum(sblocks, MEASUREMENT_AXIS)
        return (cost, blocks, g_own, g_sen, diag_own, diag_sen, D, g_l,
                kblocks, sblocks, g_vt, diag_vt)

    def _halo_reduce_blocks(flat, si):
        """[nloc, k] per-knot quantities -> [seg, k] with halo rows returned."""
        td_k = flat.shape[1]
        core = flat[Hl: Hl + seg]
        if Hl:
            from_right = jax.lax.ppermute(flat[:Hl], MEASUREMENT_AXIS, to_left)
            core = core.at[seg - Hl:].add(from_right)
        if Hr:
            from_left = jax.lax.ppermute(
                flat[Hl + seg:], MEASUREMENT_AXIS, to_right
            )
            core = core.at[:Hr].add(from_left)
        return core

    # ---- matvecs ---------------------------------------------------------

    def _cat(x):
        """(own, sen, vt) triple -> [Pk_loc + ns + nvt] with halos."""
        return jnp.concatenate([_halo_fill(x[0]), x[1], x[2]])

    def _uncat(y_cat):
        """[Pk_loc + ns + nvt] scatter result -> reduced (own, sen, vt):
        halos returned to owners, sensor psum-reduced, vt local-only."""
        return (
            _halo_reduce(y_cat[:Pk_loc]),
            jax.lax.psum(y_cat[Pk_loc:Pk_loc + ns], MEASUREMENT_AXIS),
            y_cat[Pk_loc + ns:],
        )

    def _rows_matvec(blocks, x, w_l=None, D_d=None, free=None):
        """y = A_cc x  (minus E^T diag(free/D_d) E x when D_d given): the
        Schur-complement matvec on compressed rows with halo exchange.
        ``x`` is an (owned knots, sensor, vt) triple; the vt part is
        per-shard local (rs_lifting rows are landmark-owned)."""
        x_cat = _cat(x)
        y_cat = jnp.zeros_like(x_cat)
        Ex = jnp.zeros((Lb,), dtype)
        ts = []
        for blk in blocks:
            t = jnp.einsum("mrc,mc->mr", blk["Jw"], x_cat[blk["cols"]])
            ts.append(t)
            if D_d is not None and "J_rho" in blk:
                Ex = Ex.at[blk["lid"]].add(jnp.sum(blk["J_rho"] * t, axis=1))
        if D_d is not None:
            if free is not None:
                Ex = Ex * free
            w = Ex / D_d
        for blk, t in zip(blocks, ts):
            if D_d is not None and "J_rho" in blk:
                t = t - blk["J_rho"] * w[blk["lid"]][:, None]
            y_cat = y_cat.at[blk["cols"]].add(
                jnp.einsum("mrc,mr->mc", blk["Jw"], t)
            )
        return _uncat(y_cat)

    def _e_matvec(blocks, x):
        """E x -> [Lb] (local: all of a landmark's rows live here)."""
        x_cat = _cat(x)
        Ex = jnp.zeros((Lb,), dtype)
        for blk in blocks:
            if "J_rho" not in blk:
                continue
            t = jnp.einsum("mrc,mc->mr", blk["Jw"], x_cat[blk["cols"]])
            Ex = Ex.at[blk["lid"]].add(jnp.sum(blk["J_rho"] * t, axis=1))
        return Ex

    def _et_matvec(blocks, w_l):
        """E^T w -> (owned, sensor, vt)."""
        y_cat = jnp.zeros((Pk_loc + ns + nvt,), dtype)
        for blk in blocks:
            if "J_rho" not in blk:
                continue
            coeff = blk["J_rho"] * w_l[blk["lid"]][:, None]
            y_cat = y_cat.at[blk["cols"]].add(
                jnp.einsum("mr,mrc->mc", coeff, blk["Jw"])
            )
        return _uncat(y_cat)

    def _pdot(a, b):
        """Distributed dot over (owned knots, sensor[, vt]) tuples: owned
        and vt parts are shard-disjoint (psum), sensor is replicated.
        The banded path passes pairs (it has no vt columns)."""
        local = jnp.dot(a[0], b[0])
        if len(a) > 2:
            local = local + jnp.dot(a[2], b[2])
        total = jax.lax.psum(local, MEASUREMENT_AXIS)
        return total + jnp.dot(a[1], b[1])

    def _precond_apply(kblocks, sblocks, diag_dk, diag_ds, diag_dv,
                       r_own, r_sen, r_vt):
        out_parts = []
        for si, td in enumerate(tds):
            rk = r_own[own_off[si]: own_off[si + 1]].reshape(seg, td)
            dk = diag_dk[own_off[si]: own_off[si + 1]].reshape(seg, td)
            B = kblocks[si] + jax.vmap(jnp.diag)(dk)
            sol = jnp.linalg.solve(B, rk[..., None])[..., 0]
            out_parts.append(sol.reshape(-1))
        out_own = jnp.concatenate(out_parts)
        if S:
            rk = r_sen.reshape(S, SENSOR_TANGENT_DIM)
            dk = diag_ds.reshape(S, SENSOR_TANGENT_DIM)
            B = sblocks[:S] + jax.vmap(jnp.diag)(dk)
            out_sen = jnp.linalg.solve(B, rk[..., None])[..., 0].reshape(-1)
        else:
            out_sen = r_sen
        # vt: scalar Jacobi (each vt couples only through its own row)
        out_vt = r_vt / diag_dv if nvt else r_vt
        return out_own, out_sen, out_vt

    # ---- damped PCG solve + LM step --------------------------------------

    def _solve(blocks, lin, lam, state):
        (cost, _, g_own, g_sen, diag_own, diag_sen, D, g_l,
         kblocks, sblocks, g_vt, diag_vt) = lin
        from ..solver.kernels import landmark_free_mask

        mask_own = _own_mask()
        mask_v = _own_mask_v() if nvt else g_vt
        # bound active set: freeze rho=0 landmarks with outward gradient
        # for this step (kernels.landmark_free_mask)
        mask_l = landmark_free_mask(state["rho"], g_l, _own_mask_l())
        diag_dk = lam * jnp.clip(diag_own, 1e-6, 1e32) + (1.0 - mask_own)
        diag_ds = lam * jnp.clip(diag_sen, 1e-6, 1e32) + (1.0 - lay["mask_sen"])
        diag_dv = (
            lam * jnp.clip(diag_vt, 1e-6, 1e32) + (1.0 - mask_v)
            if nvt else diag_vt
        )
        D_d = D + lam * jnp.clip(D, 1e-6, 1e32) + (1.0 - mask_l)

        rhs_et = _et_matvec(blocks, mask_l * g_l / D_d)
        g3 = (g_own, g_sen, g_vt)
        rhs = jax.tree_util.tree_map(lambda a, b: a - b, rhs_et, g3)

        def matvec(x):
            y = _rows_matvec(blocks, x, D_d=D_d, free=mask_l)
            return (
                y[0] + diag_dk * x[0],
                y[1] + diag_ds * x[1],
                y[2] + diag_dv * x[2] if nvt else y[2],
            )

        def precond(r):
            return _precond_apply(
                kblocks, sblocks, diag_dk, diag_ds, diag_dv, *r
            )

        x0 = jax.tree_util.tree_map(jnp.zeros_like, rhs)
        r0 = rhs
        z0 = precond(r0)
        bnorm2 = _pdot(rhs, rhs)
        thresh2 = (cg_tol * cg_tol) * bnorm2

        def cond(carry):
            x, r, z, p, rz, k = carry
            return (k < cg_maxiter) & (_pdot(r, r) > thresh2)

        def body(carry):
            x, r, z, p, rz, k = carry
            Ap = matvec(p)
            pAp = _pdot(p, Ap)
            alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
            x = jax.tree_util.tree_map(lambda a, b: a + alpha * b, x, p)
            r = jax.tree_util.tree_map(lambda a, b: a - alpha * b, r, Ap)
            z = precond(r)
            rz_new = _pdot(r, z)
            beta = rz_new / jnp.where(rz == 0, 1.0, rz)
            p = jax.tree_util.tree_map(lambda a, b: a + beta * b, z, p)
            return (x, r, z, p, rz_new, k + 1)

        carry = (x0, r0, z0, z0, _pdot(r0, z0), jnp.asarray(0))
        (dc, _, _, _, _, k) = jax.lax.while_loop(cond, body, carry)
        dvt = dc[2] * mask_v if nvt else dc[2]
        if nvt:
            # project to the bounded retraction's increment (vt in [0, 1],
            # lifting_rscamera_measurement.h:199-204) for an honest pred
            dvt = jnp.clip(state["vt"] + dvt, 0.0, 1.0) - state["vt"]
        dc = (dc[0] * mask_own, dc[1] * lay["mask_sen"], dvt)
        dl = -(g_l + _e_matvec(blocks, dc)) / D_d * mask_l
        # project to the bounded retraction's increment (rho >= 0) so pred
        # reflects the step actually taken (see kernels.project_delta)
        dl = jnp.maximum(state["rho"] + dl, 0.0) - state["rho"]

        # pred + grad_max (landmark dots are over local blocks -> psum)
        lm_dot = jax.lax.psum(jnp.dot(g_l, dl), MEASUREMENT_AXIS)
        gTd = _pdot(g3, dc) + lm_dot
        Hdc = _rows_matvec(blocks, dc)
        dHd = _pdot(dc, Hdc)
        Edc = _e_matvec(blocks, dc)
        dHd = dHd + jax.lax.psum(
            2.0 * jnp.dot(dl, Edc) + jnp.dot(dl, D * dl), MEASUREMENT_AXIS
        )
        pred = -(gTd + 0.5 * dHd)
        gmax_own = jax.lax.pmax(
            jnp.max(jnp.abs(g_own)) if Pown else jnp.zeros((), dtype),
            MEASUREMENT_AXIS,
        )
        gmax_l = jax.lax.pmax(
            jnp.max(jnp.abs(g_l)) if Lb else jnp.zeros((), dtype),
            MEASUREMENT_AXIS,
        )
        if nvt:
            gmax_l = jnp.maximum(
                gmax_l, jax.lax.pmax(jnp.max(jnp.abs(g_vt)), MEASUREMENT_AXIS)
            )
        gmax = jnp.maximum(jnp.maximum(gmax_own, gmax_l),
                           jnp.max(jnp.abs(g_sen)) if ns else 0.0)
        return dc, dl, pred, gmax

    # ---- banded-direct reduced solve --------------------------------------
    #
    # The scalable TPU path: instead of PCG (whose matvecs scatter per
    # iteration), assemble the reduced system ONCE per LM iteration in
    # block-tridiagonal pair form and solve it exactly with the distributed
    # SPIKE factorization. Assembly is scatter-free: rows are expanded to
    # dense pair-window Jacobians with a one-hot matmul and reduced
    # per-anchor with batched MXU matmuls; landmark elimination is a
    # batched rank-structured matmul over per-anchor landmark slots.
    G, sbG = lay["G"], lay["sbG"]
    hl_b, hr_b, nbloc = lay["hl_b"], lay["hr_b"], lay["nbloc"]
    LaMax = lay["LaMax"]
    BD = sum(tds)
    GBD = G * BD
    WB = 2 * GBD + ns
    sub_off = np.concatenate([[0], np.cumsum(tds)[:-1]]).astype(np.int64)
    Ma_static = [t["Ma"] for t in lay["banded_tables"]]

    # static permutations between the per-spline-contiguous ("ps") and the
    # knot-interleaved banded layouts, owned and local+halo domains
    def _band_perms(n_knots, offsets):
        ps_of_band = np.zeros(n_knots * BD, dtype=np.int64)
        for si, td in enumerate(tds):
            for k in range(n_knots):
                for j in range(td):
                    ps_of_band[k * BD + sub_off[si] + j] = (
                        offsets[si] + k * td + j
                    )
        band_of_ps = np.zeros_like(ps_of_band)
        band_of_ps[ps_of_band] = np.arange(len(ps_of_band))
        return jnp.asarray(ps_of_band), jnp.asarray(band_of_ps)

    ps_of_band_own, band_of_ps_own = _band_perms(seg, own_off)
    ps_of_band_loc, band_of_ps_loc = _band_perms(nloc, loc_off)

    def _colrel(blk, layout):
        """Pair-window-relative column ids aligned with Jw's C axis:
        knot cols -> banded id - anchor*GBD in [0, 2GBD); sensor cols ->
        2GBD + slot."""
        cols = blk["cols"]
        M = cols.shape[0]
        parts = []
        for off, si, W, td in layout.windows:
            k0 = (cols[:, off] - loc_off[si]) // td
            w = jnp.arange(W, dtype=cols.dtype)
            j = jnp.arange(td, dtype=cols.dtype)
            b = (k0[:, None, None] + w[None, :, None]) * BD \
                + sub_off[si] + j[None, None, :]
            parts.append(b.reshape(M, W * td))
        rel = jnp.concatenate(parts, axis=1) \
            - (blk["anchor"].astype(cols.dtype) * GBD)[:, None]
        if layout.sensor_off >= 0:
            srel = cols[:, layout.sensor_off:
                        layout.sensor_off + SENSOR_TANGENT_DIM] \
                - Pk_loc + 2 * GBD
            rel = jnp.concatenate([rel, srel], axis=1)
        return rel

    def _dense_rows(Jw, rel, chunk=4096):
        """One-hot expansion Jd [M, rdim, WB] (scatter-free).

        On TPU this is a Pallas kernel (the expansion never leaves VMEM);
        elsewhere a chunked XLA one-hot matmul computes the identical
        result."""
        if jax.default_backend() == "tpu":
            from ..ops.linearize_kernels import onehot_expand_rows

            return onehot_expand_rows(Jw, rel, WB=WB)
        M, rdim, C = Jw.shape
        iota = jnp.arange(WB, dtype=rel.dtype)

        def expand(args):
            Jc, rc = args
            oh = (rc[:, :, None] == iota[None, None, :]).astype(Jc.dtype)
            return jnp.einsum("mrc,mcw->mrw", Jc, oh)

        if M <= chunk:
            return expand((Jw, rel))
        Mp = -(-M // chunk) * chunk
        Jp = jnp.pad(Jw, ((0, Mp - M), (0, 0), (0, 0)))
        rp = jnp.pad(rel, ((0, Mp - M), (0, 0)))
        out = jax.lax.map(
            expand,
            (Jp.reshape(-1, chunk, rdim, C), rp.reshape(-1, chunk, C)),
        )
        return out.reshape(Mp, rdim, WB)[:M]

    def _halo_reduce_anchors(arr):
        """[nbloc, ...] per-block quantities -> [sbG, ...] owned, with halo
        blocks returned to their owners."""
        core = arr[hl_b: hl_b + sbG]
        if hl_b:
            from_right = jax.lax.ppermute(arr[:hl_b], MEASUREMENT_AXIS, to_left)
            core = core.at[sbG - hl_b:].add(from_right)
        if hr_b:
            from_left = jax.lax.ppermute(
                arr[hl_b + sbG:], MEASUREMENT_AXIS, to_right
            )
            core = core.at[:hr_b].add(from_left)
        return core

    def _assemble_band(rt, blocks):
        """Lock-masked pair-block assembly (Pa, ga, Ea, Da, gla).

        Depends only on the linearization ``blocks`` — not on ``lam`` or
        the trust-region state — so the speculative loop can carry it
        across iterations and re-solve with a new damping on rejects
        without re-streaming the rows."""
        bt = rt["banded"]

        Pa = jnp.zeros((nbloc, WB, WB), dtype)
        ga = jnp.zeros((nbloc, WB), dtype)
        Ea = jnp.zeros((nbloc, LaMax, WB), dtype)
        Da = jnp.zeros((nbloc, LaMax), dtype)
        gla = jnp.zeros((nbloc, LaMax), dtype)
        for bi, (blk, layout) in enumerate(zip(blocks, layouts)):
            rel = _colrel(blk, layout)
            Jd = _dense_rows(blk["Jw"], rel)
            Ma = Ma_static[bi]
            perm = bt["buckets"][bi]["perm"][0]
            pmask = bt["buckets"][bi]["pmask"][0]
            rdim = Jd.shape[1]
            Jg = Jd[perm].reshape(nbloc, Ma, rdim, WB) \
                * pmask.reshape(nbloc, Ma)[:, :, None, None]
            rg = blk["rw"][perm].reshape(nbloc, Ma, rdim) \
                * pmask.reshape(nbloc, Ma)[:, :, None]
            Pa = Pa + jnp.einsum("amrw,amrv->awv", Jg, Jg)
            ga = ga + jnp.einsum("amrw,amr->aw", Jg, rg)
            if "J_rho" in blk:
                Jr = blk["J_rho"][perm].reshape(nbloc, Ma, rdim) \
                    * pmask.reshape(nbloc, Ma)[:, :, None]
                lrel = blk["lrel"][perm].reshape(nbloc, Ma)
                ohL = (
                    lrel[:, :, None]
                    == jnp.arange(LaMax, dtype=lrel.dtype)[None, None, :]
                ).astype(dtype) * pmask.reshape(nbloc, Ma)[:, :, None]
                A = jnp.einsum("amr,amrw->amw", Jr, Jg)
                Ea = Ea + jnp.einsum("aml,amw->alw", ohL, A)
                Da = Da + jnp.einsum(
                    "aml,am->al", ohL, jnp.sum(Jr * Jr, axis=2)
                )
                gla = gla + jnp.einsum(
                    "aml,am->al", ohL, jnp.sum(Jr * rg, axis=2)
                )

        # lock masking post-assembly in pair-block space (Jw arrives
        # unmasked from _whitened_blocks(col_mask=False)): H = M J^TJ M,
        # g = M J^T r, E = E M — identical to masking J's columns per row
        # but [nbloc, WB] instead of a [M, C] gather
        mask_band_loc = _halo_fill(_own_mask())[ps_of_band_loc]
        mb = mask_band_loc.reshape(nbloc, GBD)
        mb_next = jnp.concatenate(
            [mb[1:], jnp.zeros((1, GBD), dtype)], axis=0
        )
        mask_w = jnp.concatenate(
            [mb, mb_next,
             jnp.broadcast_to(lay["mask_sen"][None, :], (nbloc, ns))],
            axis=1,
        )
        Pa = Pa * mask_w[:, :, None] * mask_w[:, None, :]
        ga = ga * mask_w
        Ea = Ea * mask_w[:, None, :]
        return dict(Pa=Pa, ga=ga, Ea=Ea, Da=Da, gla=gla)

    def _solve_band_from_asm(rt, asm, mask_l, lam, state):
        """Damped SPIKE solve of the assembled pair blocks.

        Returns ((dc_own_ps, dc_sen), dl, pred, gmax) — the same contract
        as the PCG ``_solve``."""
        bt = rt["banded"]
        mask_own = _own_mask()
        Pa, ga, Ea = asm["Pa"], asm["ga"], asm["Ea"]
        Da, gla = asm["Da"], asm["gla"]

        # damping diagonals come from A_cc (pre-elimination), exactly as in
        # the PCG path / the exact-Schur path (damp-then-eliminate)
        diagPa = jnp.einsum("aww->aw", Pa)
        dband_blocks = diagPa[:, :GBD]
        dband_blocks = dband_blocks.at[1:].add(diagPa[:-1, GBD:2 * GBD])
        diag_band_own = _halo_reduce_anchors(dband_blocks).reshape(-1)
        diag_sen = jax.lax.psum(
            jnp.sum(diagPa[:, 2 * GBD:], axis=0), MEASUREMENT_AXIS
        )
        # raw (pre-elimination) gradient, for pred/gmax parity with PCG
        graw_blocks = ga[:, :GBD]
        graw_blocks = graw_blocks.at[1:].add(ga[:-1, GBD:2 * GBD])
        g_own_band_raw = _halo_reduce_anchors(graw_blocks).reshape(-1)
        g_sen_raw = jax.lax.psum(
            jnp.sum(ga[:, 2 * GBD:], axis=0), MEASUREMENT_AXIS
        )

        # landmark elimination in slot space (damp-then-eliminate);
        # bound active set: freeze rho=0 slots with outward gradient
        smask = bt["smask"][0]
        lid_slot = bt["lid_of_slot"][0]
        smask_a = smask.reshape(nbloc, LaMax)
        rho_slots = state["rho"][lid_slot].reshape(nbloc, LaMax)
        free_slots = 1.0 - (
            (rho_slots <= 0.0) & (gla > 0.0)
        ).astype(dtype)
        mask_l_slots = (
            mask_l[lid_slot].reshape(nbloc, LaMax) * smask_a * free_slots
        )
        D_d_slots = Da + lam * jnp.clip(Da, 1e-6, 1e32) + (1.0 - mask_l_slots)
        w_slots = smask_a * free_slots / D_d_slots
        Pa_raw = Pa  # pre-elimination pair blocks, reused for pred below
        Pa = Pa - jnp.einsum("alw,al,alv->awv", Ea, w_slots, Ea)
        ga = ga - jnp.einsum("alw,al,al->aw", Ea, w_slots, gla)

        # fold pair blocks into the band + sensor border
        Dband = Pa[:, :GBD, :GBD]
        Dband = Dband.at[1:].add(Pa[:-1, GBD:2 * GBD, GBD:2 * GBD])
        Uband = Pa[:, :GBD, GBD:2 * GBD]
        Bblocks = Pa[:, 2 * GBD:, :GBD]
        Bblocks = Bblocks.at[1:].add(Pa[:-1, 2 * GBD:, GBD:2 * GBD])
        Csen = jax.lax.psum(
            jnp.sum(Pa[:, 2 * GBD:, 2 * GBD:], axis=0), MEASUREMENT_AXIS
        )
        gb_blocks = ga[:, :GBD]
        gb_blocks = gb_blocks.at[1:].add(ga[:-1, GBD:2 * GBD])
        Dband_own = _halo_reduce_anchors(Dband)
        Uband_own = _halo_reduce_anchors(Uband)
        Bown = _halo_reduce_anchors(Bblocks)            # [sbG, ns, GBD]
        gband_own = _halo_reduce_anchors(gb_blocks).reshape(-1)
        gsen = jax.lax.psum(jnp.sum(ga[:, 2 * GBD:], axis=0), MEASUREMENT_AXIS)

        # damping + SPIKE solve with the sensor border as extra rhs columns
        mask_band_own = mask_own[ps_of_band_own]
        damp = lam * jnp.clip(diag_band_own, 1e-6, 1e32) + (1.0 - mask_band_own)
        Dd = Dband_own + jax.vmap(jnp.diag)(damp.reshape(sbG, GBD))
        if ns:
            Bloc = Bown.transpose(1, 0, 2).reshape(ns, sbG * GBD)
            rhs = jnp.concatenate(
                [-gband_own[:, None], Bloc.T], axis=1
            ).reshape(sbG, GBD, 1 + ns)
        else:
            rhs = (-gband_own).reshape(sbG, GBD, 1)
        from ..solver.banded import (
            block_tridiag_solve,
            spike_block_tridiag_solve,
        )

        if n == 1:
            sol = block_tridiag_solve(Dd, Uband_own, rhs)
        else:
            sol = spike_block_tridiag_solve(
                Dd, Uband_own, rhs, MEASUREMENT_AXIS, n
            )
        sol = sol.reshape(sbG * GBD, rhs.shape[-1])
        y = sol[:, 0]
        if ns:
            X = sol[:, 1:]
            diag_s = diag_sen
            damp_s = lam * jnp.clip(diag_s, 1e-6, 1e32) + (1.0 - lay["mask_sen"])
            Cd = Csen + jnp.diag(damp_s)
            Ssen = Cd - jax.lax.psum(Bloc @ X, MEASUREMENT_AXIS)
            rhs_s = -gsen - jax.lax.psum(Bloc @ y, MEASUREMENT_AXIS)
            x_sen = jnp.linalg.solve(Ssen, rhs_s) * lay["mask_sen"]
            x_band = y - X @ x_sen
        else:
            x_sen = jnp.zeros((ns,), dtype)
            x_band = y
        x_band = x_band * mask_band_own
        dc_own = x_band[band_of_ps_own]
        dc = (dc_own * mask_own, x_sen)

        # landmark back-substitution in slot space
        x_loc_ps = _halo_fill(dc[0])
        x_loc_band = x_loc_ps[ps_of_band_loc].reshape(nbloc, GBD)
        xb_next = jnp.concatenate(
            [x_loc_band[1:], jnp.zeros((1, GBD), dtype)], axis=0
        )
        dcw = jnp.concatenate(
            [x_loc_band, xb_next,
             jnp.broadcast_to(x_sen[None, :], (nbloc, ns))], axis=1
        )
        Edc_slots = jnp.einsum("alw,aw->al", Ea, dcw)
        dl_slots = -(gla + Edc_slots) / D_d_slots * mask_l_slots
        dl = jnp.zeros((Lb,), dtype).at[lid_slot].add(
            jnp.where(smask > 0, dl_slots.reshape(-1), 0.0)
        )
        # projected landmark step (rho >= 0) for an honest pred
        dl = jnp.maximum(state["rho"] + dl, 0.0) - state["rho"]

        # pred/gmax from the assembled pair blocks: H = sum_a S_a^T Pa_a S_a
        # with S_a dc = dcw_a, so dc^T H dc = sum_a dcw_a^T Pa_raw_a dcw_a
        # (each row lives in exactly one anchor on one shard, so the psum
        # counts every row once) and E dc comes from the slot-space Ea —
        # the row-space matvecs this replaces were the step's single
        # largest cost (a [M, C]-gather fusion, ~230 ms at config-5 scale)
        D_lb = jnp.zeros((Lb,), dtype).at[lid_slot].add(
            jnp.where(smask > 0, Da.reshape(-1), 0.0)
        )
        gl_lb = jnp.zeros((Lb,), dtype).at[lid_slot].add(
            jnp.where(smask > 0, gla.reshape(-1), 0.0)
        )
        g_own_ps = g_own_band_raw[band_of_ps_own]
        lm_dot = jax.lax.psum(jnp.dot(gl_lb, dl), MEASUREMENT_AXIS)
        gTd = _pdot((g_own_ps, g_sen_raw), dc) + lm_dot
        dHd = jax.lax.psum(
            jnp.einsum("aw,awv,av->", dcw, Pa_raw, dcw), MEASUREMENT_AXIS
        )
        Edc_lb = jnp.zeros((Lb,), dtype).at[lid_slot].add(
            jnp.where(smask > 0, Edc_slots.reshape(-1), 0.0)
        )
        dHd = dHd + jax.lax.psum(
            2.0 * jnp.dot(dl, Edc_lb) + jnp.dot(dl, D_lb * dl), MEASUREMENT_AXIS
        )
        pred = -(gTd + 0.5 * dHd)
        gmax_own = jax.lax.pmax(jnp.max(jnp.abs(g_own_ps)), MEASUREMENT_AXIS)
        gmax_l = jax.lax.pmax(jnp.max(jnp.abs(gl_lb)), MEASUREMENT_AXIS)
        gmax = jnp.maximum(jnp.maximum(gmax_own, gmax_l),
                           jnp.max(jnp.abs(g_sen_raw)) if ns else 0.0)
        return dc, dl, pred, gmax

    def _retract_local(state, dc, dl):
        dc_own, dc_sen = dc[0], dc[1]
        new = dict(state)
        for si, sp in enumerate(spec.splines):
            td = tds[si]
            blk = dc_own[own_off[si]: own_off[si + 1]].reshape(seg, td)
            new[sp.kind] = retract_window(sp.kind, state[sp.kind], blk)
        if S:
            sens = dc_sen.reshape(S, SENSOR_TANGENT_DIM)
            new["q_ct"] = quat.qmul(se3m.so3_exp_quat(sens[:, 0:3]), state["q_ct"])
            new["p_ct"] = state["p_ct"] + sens[:, 3:6]
            new["d"] = jnp.clip(
                state["d"] + sens[:, 6], -lay_dmax, lay_dmax
            )
            new["abias"] = state["abias"] + sens[:, 7:10]
            new["gbias"] = state["gbias"] + sens[:, 10:13]
        new["rho"] = jnp.maximum(state["rho"] + dl, 0.0)
        if nvt and len(dc) > 2:
            new["vt"] = jnp.clip(state["vt"] + dc[2], 0.0, 1.0)
        return new

    lay_dmax = jnp.asarray(np.asarray(problem.d_max), dtype)

    def _cost_local(rt, state):
        rt_l = _local_runtime(rt)
        st = _halo_state(state)
        cost = jnp.zeros((), dtype)
        for bspec, (res, flags), data in zip(
            spec_local.buckets, residuals, rt_l["data"]
        ):
            r = _bucket_terms(spec_local, bspec, res, flags, rt_l, st, data, False)
            s2 = jnp.sum(r * r, axis=-1)
            if flags["loss"]:
                cost = cost + 0.5 * jnp.sum(_huber(s2, data["huber_c"]))
            else:
                cost = cost + 0.5 * jnp.sum(s2)
        return jax.lax.psum(cost, MEASUREMENT_AXIS)

    def _step_local_pcg(rt, state, lam):
        lin = _linearize_local(rt, state)
        cost, blocks = lin[0], lin[1]
        dc, dl, pred, gmax = _solve(blocks, lin, lam, state)
        new_state = _retract_local(state, dc, dl)
        new_cost = _cost_local(rt, new_state)
        return cost, new_state, new_cost, pred, (dc, dl), gmax

    def _banded_solve(rt, blocks, mask_l, lam, state):
        return _solve_band_from_asm(
            rt, _assemble_band(rt, blocks), mask_l, lam, state
        )

    def _step_local_banded(rt, state, lam):
        cost, blocks, mask_l = _whitened_blocks(rt, state, col_mask=False)
        dc, dl, pred, gmax = _banded_solve(rt, blocks, mask_l, lam, state)
        new_state = _retract_local(state, dc, dl)
        new_cost = _cost_local(rt, new_state)
        return cost, new_state, new_cost, pred, (dc, dl), gmax

    def _lin0_banded(rt, state):
        """(cost, asm, mask_l) — the carried linearization of the
        speculative loop (see solver.lm.trust_region_loop_spec)."""
        cost, blocks, mask_l = _whitened_blocks(rt, state, col_mask=False)
        return cost, _assemble_band(rt, blocks), mask_l

    def _step_spec_banded(rt, state, lin, lam):
        """Speculative-linearization banded step: solve from the carried
        assembly, then linearize+assemble the candidate — its (psum'd)
        cost IS the re-cost, so each accepted LM iteration streams the
        measurement rows ONCE (the separate `_cost_local` residual pass —
        measured 27% of the config-5 step — disappears); rejected steps
        re-solve the tiny carried band with a new damping without
        re-streaming anything."""
        cost, asm, mask_l = lin
        dc, dl, pred, gmax = _solve_band_from_asm(
            rt, asm, mask_l, lam, state
        )
        new_state = _retract_local(state, dc, dl)
        new_lin = _lin0_banded(rt, new_state)
        return new_state, new_lin, pred

    _step_local = _step_local_banded if mode == "banded" else _step_local_pcg

    # ---- sharding setup ---------------------------------------------------
    # banded grouping tables ride the runtime (sharded on the leading shard
    # axis) so per-shard values reach their device inside shard_map
    runtime["banded"] = {
        "buckets": [
            {"perm": t["perm"], "pmask": t["pmask"]}
            for t in lay["banded_tables"]
        ],
        "lid_of_slot": lay["lid_of_slot"],
        "smask": lay["smask"],
    }
    rt_specs = jax.tree_util.tree_map(lambda _: P(), runtime)
    rt_specs["data"] = [
        {k: P(MEASUREMENT_AXIS) for k in d} for d in runtime["data"]
    ]
    rt_specs["banded"] = jax.tree_util.tree_map(
        lambda _: P(MEASUREMENT_AXIS), runtime["banded"]
    )
    runtime_p = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), runtime, rt_specs
    )

    st_specs = {k: P() for k in problem.state0}
    for sp in spec.splines:
        st_specs[sp.kind] = P(MEASUREMENT_AXIS)
    st_specs["rho"] = P(MEASUREMENT_AXIS)
    if nvt:
        st_specs["vt"] = P(MEASUREMENT_AXIS)

    nk, nk_pad, L = lay["nk"], lay["nk_pad"], lay["L"]
    lid_to_padded = jnp.asarray(lay["lid_to_padded"])
    vtid_to_padded = jnp.asarray(lay["vtid_to_padded"])

    def _to_sharded(state):
        st = dict(state)
        for sp in spec.splines:
            arr = state[sp.kind]
            pad = nk_pad - arr.shape[0]
            if pad:
                # replicated pad block: stops the rows-sharded concat spec
                # propagating onto the [pad, D] broadcast (SPMD would
                # involuntarily rematerialize the reshape otherwise)
                pad_arr = jax.lax.with_sharding_constraint(
                    jnp.repeat(arr[-1:], pad, axis=0),
                    NamedSharding(mesh, P()),
                )
                st[sp.kind] = jnp.concatenate([arr, pad_arr], axis=0)
        rho_p = jnp.zeros((n * Lb,), state["rho"].dtype)
        if L:
            rho_p = rho_p.at[lid_to_padded].set(state["rho"])
        st["rho"] = rho_p
        if nvt:
            vt_p = jnp.zeros((n * nvt,), state["vt"].dtype)
            vt_p = vt_p.at[vtid_to_padded].set(state["vt"])
            st["vt"] = vt_p
        return {
            k: jax.lax.with_sharding_constraint(v, NamedSharding(mesh, st_specs[k]))
            for k, v in st.items()
        }

    def _to_global(st):
        out = dict(st)
        for sp in spec.splines:
            out[sp.kind] = st[sp.kind][:nk]
        out["rho"] = st["rho"][lid_to_padded] if L else st["rho"][:0]
        if nvt:
            out["vt"] = st["vt"][vtid_to_padded]
        return out

    return dict(
        spec=spec, lay=lay, runtime=runtime_p, rt_specs=rt_specs,
        st_specs=st_specs, step_local=_step_local, cost_local=_cost_local,
        to_sharded=_to_sharded, to_global=_to_global, mesh=mesh,
        # speculative-linearization handles (banded mode only)
        lin0_local=_lin0_banded if mode == "banded" else None,
        step_spec_local=_step_spec_banded if mode == "banded" else None,
        # debug/profiling handles
        whitened_blocks=_whitened_blocks, banded_solve=_banded_solve,
        linearize_local=_linearize_local,
    )


def make_segment_ba_step(problem, mesh, cg_tol=1e-10, cg_maxiter=500,
                        mode="banded"):
    """step(state, lam) with knot-segment x landmark-block sharding.

    Contract matches ``kernels.make_step`` minus the dense delta (the delta
    slot returns the (sharded knots, sensor) tangent pair and landmark
    increments are applied in-place): returns (cost, new_state(global),
    new_cost, pred, grad_max)."""
    b = _build_segment_ba(problem, mesh, cg_tol, cg_maxiter, mode)
    out_state_specs = dict(b["st_specs"])

    step_sm = jax.shard_map(
        lambda rt, st, lam: _drop_delta(b["step_local"](rt, st, lam)),
        mesh=b["mesh"],
        in_specs=(b["rt_specs"], b["st_specs"], P()),
        out_specs=(P(), out_state_specs, P(), P(), P()),
        check_vma=False,
    )
    cost_sm = jax.shard_map(
        b["cost_local"], mesh=b["mesh"],
        in_specs=(b["rt_specs"], b["st_specs"]), out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def step(state, lam):
        st = b["to_sharded"](state)
        cost, new_st, new_cost, pred, gmax = step_sm(b["runtime"], st, lam)
        return cost, b["to_global"](new_st), new_cost, pred, gmax

    @jax.jit
    def total_cost(state):
        return cost_sm(b["runtime"], b["to_sharded"](state))

    return step, total_cost


def _drop_delta(out):
    cost, new_state, new_cost, pred, delta, gmax = out
    return cost, new_state, new_cost, pred, gmax


def make_segment_ba_solver(problem, mesh, max_iterations=50,
                           function_tolerance=1e-6, cg_tol=1e-6,
                           cg_maxiter=200, mode="banded"):
    """Fully on-device LM with the composed segment x landmark sharding:
    the entire trust-region loop runs inside one shard_map program; state
    stays sharded across iterations (knots by segment, landmarks by block).
    Returns state -> (state, final_cost, iterations)."""
    from ..solver.lm import trust_region_loop, trust_region_loop_spec

    b = _build_segment_ba(problem, mesh, cg_tol, cg_maxiter, mode)

    def lm_loop(rt, state):
        if mode == "banded":
            # speculative loop: the candidate's linearize+assemble doubles
            # as the re-cost, and rejects re-solve the carried (tiny) band
            # assembly with fresh damping without re-streaming the rows
            lin0 = b["lin0_local"](rt, state)
            return trust_region_loop_spec(
                lambda st, lin, lam: b["step_spec_local"](rt, st, lin, lam),
                lin0, state,
                max_iterations=max_iterations,
                function_tolerance=function_tolerance,
                dtype=lin0[0].dtype,
            )

        def one_step(st, lam):
            cost, new_st, new_cost, pred, delta, gmax = b["step_local"](
                rt, st, lam
            )
            return cost, new_st, new_cost, pred

        cost0 = b["cost_local"](rt, state)
        return trust_region_loop(
            one_step, cost0, state,
            max_iterations=max_iterations,
            function_tolerance=function_tolerance,
            dtype=cost0.dtype,
        )

    solve_sm = jax.shard_map(
        lm_loop, mesh=b["mesh"],
        in_specs=(b["rt_specs"], b["st_specs"]),
        out_specs=(b["st_specs"], P(), P()),
        check_vma=False,
    )

    @jax.jit
    def solve_fn(state):
        st = b["to_sharded"](state)
        st, cost, it = solve_sm(b["runtime"], st)
        return b["to_global"](st), cost, it

    return solve_fn
