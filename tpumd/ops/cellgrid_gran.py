"""Granular contact forces on the rolled cell grid with DENSE per-candidate
shear history.

TPU redesign of pair gran/hooke/history + FixNeighHistory
(src/GRANULAR/pair_gran_hooke_history.cpp:169-380,
src/fix_neigh_history.cpp): the matrix engine's (N, K) neighbor gather
costs ~5 ms/step at 32k spheres because TPU gathers pay per ROW.  Here
contacts are enumerated gather-free by rolling the dense cell grid (same
scheme as cellgrid_pair_sums), and the per-contact tangential shear
accumulator lives in a DENSE array indexed by candidate coordinates
(z-shift, cell, i-slot, j-lane) — a stable pair identity while the
binning is frozen, so every step reads/writes history with ZERO matching.

At a re-bin the candidate coordinates change, so history is carried over
compactly: touching entries (shear != 0) are compacted per atom into a
small tag-keyed table (Kh slots), permuted with the atoms, and
redistributed into the new candidate layout by tag matching — the grid
analog of FixNeighHistory's paged copy, paid only at rebuilds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpumd.core.state import Box
from tpumd.ops.cellgrid import CellGridConfig, _offs, _roll_nbr

KH = 16          # compact history slots per atom carried across rebuilds


def _plan(cfg: CellGridConfig):
    cap = cfg.cap
    xoffs = _offs(cfg.nx)
    foldy = 3 * cap < 128
    yoffs = _offs(cfg.ny) if foldy else (0,)
    shifts = ([(dz, 0) for dz in _offs(cfg.nz)] if foldy else
              [(dz, dy) for dz in _offs(cfg.nz) for dy in _offs(cfg.ny)])
    rowlen = len(xoffs) * len(yoffs) * cap
    return cap, xoffs, yoffs, foldy, shifts, rowlen


def shear_shape(cfg: CellGridConfig):
    cap, xoffs, yoffs, foldy, shifts, rowlen = _plan(cfg)
    return (len(shifts), cfg.nz, cfg.ny, cfg.nx, cap, rowlen, 3)


def _rows(cfg, box, x, planes):
    """Widened xy-rows for the j-side: positions get periodic coordinate
    corrections on periodic dims (non-periodic dims roll without
    correction — wrapped cells are distance-filtered)."""
    cap, xoffs, yoffs, foldy, shifts, rowlen = _plan(cfg)
    gshape = (cfg.nz, cfg.ny, cfg.nx, cap)
    Lx = box.lengths[0] if box.periodic[0] else None
    Ly = box.lengths[1] if box.periodic[1] else None

    def xyrow(a, corrx, corry):
        row = jnp.concatenate(
            [_roll_nbr(a, o, 2, corrx) for o in xoffs], axis=-1)
        if not foldy:
            return row
        return jnp.concatenate(
            [_roll_nbr(row, o, 1, corry) for o in yoffs], axis=-1)

    xg = [x[:, c].reshape(gshape) for c in range(3)]
    rows = [xyrow(xg[0], Lx, None), xyrow(xg[1], None, Ly),
            xyrow(xg[2], None, None)]
    prow = [xyrow(p.reshape(gshape), None, None) for p in planes]
    return xg, rows, prow, gshape


def gran_candidate_sums(x, valid, shear_cand, box: Box,
                        cfg: CellGridConfig, params, state_planes,
                        dt, shearupdate: bool):
    """One granular force sweep.  params: dict of scalars (kn, kt,
    gamman, gammat, xmu, limit_damping, freeze_bit, exclude_bits);
    state_planes: (v(3), omega(3), radius, rmass, gmask_f) per-slot
    planes.  Returns (f (Np,3), torque (Np,3), shear_cand_new)."""
    cap, xoffs, yoffs, foldy, shifts, rowlen = _plan(cfg)
    dtype = x.dtype
    vx, vy, vz, ox, oy, oz, rad, rm, gm = state_planes
    planes = [vx, vy, vz, ox, oy, oz, rad, rm, gm,
              valid.astype(dtype)]
    xg, rows, prow, gshape = _rows(cfg, box, x, planes)
    vrowj = prow[:3]
    orowj = prow[3:6]
    radrow, rmrow, gmrow, valrow = prow[6], prow[7], prow[8], prow[9]

    vg = [p.reshape(gshape) for p in (vx, vy, vz)]
    og = [p.reshape(gshape) for p in (ox, oy, oz)]
    radg = rad.reshape(gshape)
    rmg = rm.reshape(gshape)
    gmg = gm.reshape(gshape).astype(jnp.int32)
    validg = valid.reshape(gshape)

    Lz = box.lengths[2] if box.periodic[2] else None
    zero_seg = yoffs.index(0) * len(xoffs) + xoffs.index(0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 1)
    not_self = jj != ii + zero_seg * cap

    kn = params["kn"]
    kt = params["kt"]
    gamman = params["gamman"]
    gammat = params["gammat"]
    xmu = params["xmu"]
    freeze_bit = params["freeze_bit"]
    exclude_bits = params["exclude_bits"]
    limit_damping = params["limit_damping"]

    fx = [jnp.zeros(gshape, dtype) for _ in range(3)]
    tq = [jnp.zeros(gshape, dtype) for _ in range(3)]
    shear_new = []

    for si, (dz, dy) in enumerate(shifts):
        def roll2(a, corrz, corry):
            r = _roll_nbr(a, dz, 0, corrz)
            return _roll_nbr(r, dy, 1, corry) if not foldy else r

        Ly = box.lengths[1] if box.periodic[1] else None
        xj = [roll2(rows[0], None, None), roll2(rows[1], None, Ly),
              roll2(rows[2], Lz, None)]
        vj = [roll2(r, None, None) for r in vrowj]
        oj = [roll2(r, None, None) for r in orowj]
        radj = roll2(radrow, None, None)[..., None, :]
        rmj = roll2(rmrow, None, None)[..., None, :]
        gmj = roll2(gmrow, None, None).astype(jnp.int32)[..., None, :]
        valj = roll2(valrow, None, None)[..., None, :] > 0.5

        d = [xg[c][..., :, None] - xj[c][..., None, :] for c in range(3)]
        rsq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        mask = validg[..., :, None] & valj
        if dz == 0 and dy == 0:
            mask = mask & not_self
        if exclude_bits:
            gi = gmg[..., :, None]
            for b1, b2 in exclude_bits:
                both = (((gi & b1) > 0) & ((gmj & b2) > 0)) | (
                    ((gi & b2) > 0) & ((gmj & b1) > 0))
                mask = mask & ~both

        radi = radg[..., :, None]
        radsum = radi + radj
        touching = mask & (rsq < radsum * radsum)
        rsq_safe = jnp.where(touching, rsq, jnp.ones_like(rsq))
        r = jnp.sqrt(rsq_safe)
        rinv = 1.0 / r
        rsqinv = 1.0 / rsq_safe

        vr = [vg[c][..., :, None] - vj[c][..., None, :] for c in range(3)]
        vnnr = vr[0] * d[0] + vr[1] * d[1] + vr[2] * d[2]
        vt = [vr[c] - d[c] * (vnnr * rsqinv) for c in range(3)]
        wr = [(radi * og[c][..., :, None] + radj * oj[c][..., None, :])
              * rinv for c in range(3)]

        mi = rmg[..., :, None]
        meff = mi * rmj / (mi + rmj)
        if freeze_bit:
            fi = (gmg[..., :, None] & freeze_bit) > 0
            fj = (gmj & freeze_bit) > 0
            meff = jnp.where(fi, rmj, meff)
            meff = jnp.where(fj, mi, meff)

        damp = meff * gamman * vnnr * rsqinv
        ccel = kn * (radsum - r) * rinv - damp
        if limit_damping:
            ccel = jnp.maximum(ccel, 0.0)

        vtr = [vt[0] + (d[1] * wr[2] - d[2] * wr[1]),
               vt[1] + (d[2] * wr[0] - d[0] * wr[2]),
               vt[2] + (d[0] * wr[1] - d[1] * wr[0])]

        shold = shear_cand[si]
        sh = [jnp.where(touching, shold[..., c], 0.0) for c in range(3)]
        if shearupdate:
            sh = [jnp.where(touching, sh[c] + vtr[c] * dt, sh[c])
                  for c in range(3)]
        shrmag = jnp.sqrt(sh[0] * sh[0] + sh[1] * sh[1] + sh[2] * sh[2])
        if shearupdate:
            rsht = (sh[0] * d[0] + sh[1] * d[1] + sh[2] * d[2]) * rsqinv
            sh = [sh[c] - d[c] * rsht for c in range(3)]

        gt = meff * gammat
        fs_v = [-(kt * sh[c] + gt * vtr[c]) for c in range(3)]
        fs = jnp.sqrt(fs_v[0] ** 2 + fs_v[1] ** 2 + fs_v[2] ** 2)
        fn = xmu * jnp.abs(ccel * r)
        slip = touching & (fs > fn)
        ratio = fn / jnp.where(fs > 0, fs, 1.0)
        nonzero = shrmag != 0.0
        resc = slip & nonzero
        for c in range(3):
            damp_t = gt * vtr[c] / kt if kt else 0.0 * vtr[c]
            sh[c] = jnp.where(resc, ratio * (sh[c] + damp_t) - damp_t,
                              sh[c])
            fs_v[c] = jnp.where(slip,
                                jnp.where(nonzero, fs_v[c] * ratio, 0.0),
                                fs_v[c])

        for c in range(3):
            fpc = jnp.where(touching, d[c] * ccel + fs_v[c], 0.0)
            fx[c] = fx[c] + jnp.sum(fpc, axis=-1)
        tor = [(d[1] * fs_v[2] - d[2] * fs_v[1]) * rinv,
               (d[2] * fs_v[0] - d[0] * fs_v[2]) * rinv,
               (d[0] * fs_v[1] - d[1] * fs_v[0]) * rinv]
        for c in range(3):
            tq[c] = tq[c] - jnp.sum(
                jnp.where(touching, radi * tor[c], 0.0), axis=-1)
        if shearupdate:
            shear_new.append(jnp.stack(
                [jnp.where(touching, sh[c], 0.0) for c in range(3)],
                axis=-1))

    f = jnp.stack([c.reshape(-1) for c in fx], axis=1)
    torque = jnp.stack([c.reshape(-1) for c in tq], axis=1)
    out_shear = (jnp.stack(shear_new) if shearupdate else shear_cand)
    return f, torque, out_shear


def extract_compact_history(shear_cand, tag, cfg: CellGridConfig):
    """Compact nonzero candidate shear into a per-atom tag-keyed table.

    Returns (ctags (Np, KH) int32 partner tags, cshear (Np, KH, 3)).
    Entries beyond KH simultaneous contacts are dropped (kissing number
    for spheres is 12; KH=16 leaves headroom)."""
    cap, xoffs, yoffs, foldy, shifts, rowlen = _plan(cfg)
    gshape = (cfg.nz, cfg.ny, cfg.nx, cap)
    npad = cfg.capacity
    tg = tag.reshape(gshape)

    def xyrow(a):
        row = jnp.concatenate([_roll_nbr(a, o, 2, None) for o in xoffs],
                              axis=-1)
        if not foldy:
            return row
        return jnp.concatenate([_roll_nbr(row, o, 1, None)
                                for o in yoffs], axis=-1)

    tagrow = xyrow(tg)
    ctags = jnp.zeros((npad, KH), jnp.int32)
    cshear = jnp.zeros((npad, KH, 3), shear_cand.dtype)
    base = jnp.zeros(gshape, jnp.int32)
    for si, (dz, dy) in enumerate(shifts):
        def roll2(a):
            r = _roll_nbr(a, dz, 0, None)
            return _roll_nbr(r, dy, 1, None) if not foldy else r
        tagj = roll2(tagrow)                                  # (..., rowlen)
        sh = shear_cand[si]                                   # (..., cap, rowlen, 3)
        has = jnp.any(sh != 0.0, axis=-1)                     # (..., cap, rowlen)
        pos = base[..., None] + jnp.cumsum(has, axis=-1) - 1
        # write each contact into its per-atom slot via K one-hot passes
        tj = jnp.broadcast_to(tagj[..., None, :], sh.shape[:-1])
        for k in range(KH):
            hit = has & (pos == k)
            tk = jnp.max(jnp.where(hit, tj, 0), axis=-1)
            sk = jnp.sum(jnp.where(hit[..., None], sh, 0.0), axis=-2)
            ctags = ctags.at[:, k].max(tk.reshape(-1))
            cshear = cshear.at[:, k].add(sk.reshape(-1, 3))
        base = base + jnp.sum(has, axis=-1)
    return ctags, cshear


def redistribute_history(ctags, cshear, tag, cfg: CellGridConfig):
    """Scatter the compact per-atom history into the (new) dense candidate
    layout by matching each candidate's tag against the atom's KH compact
    slots (paid once per rebuild)."""
    cap, xoffs, yoffs, foldy, shifts, rowlen = _plan(cfg)
    gshape = (cfg.nz, cfg.ny, cfg.nx, cap)
    tg = tag.reshape(gshape)
    ctags_g = ctags.reshape(gshape + (KH,))
    cshear_g = cshear.reshape(gshape + (KH, 3))

    def xyrow(a):
        row = jnp.concatenate([_roll_nbr(a, o, 2, None) for o in xoffs],
                              axis=-1)
        if not foldy:
            return row
        return jnp.concatenate([_roll_nbr(row, o, 1, None)
                                for o in yoffs], axis=-1)

    tagrow = xyrow(tg)
    outs = []
    for si, (dz, dy) in enumerate(shifts):
        def roll2(a):
            r = _roll_nbr(a, dz, 0, None)
            return _roll_nbr(r, dy, 1, None) if not foldy else r
        tagj = roll2(tagrow)[..., None, :]        # (..., 1, rowlen)
        acc = jnp.zeros(gshape[:-1] + (cap, rowlen, 3), cshear.dtype)
        for k in range(KH):
            ct = ctags_g[..., :, k:k + 1]          # (..., cap, 1)
            hit = (ct > 0) & (ct == tagj)
            acc = acc + jnp.where(
                hit[..., None], cshear_g[..., :, None, k, :], 0.0)
        outs.append(acc)
    return jnp.stack(outs)
