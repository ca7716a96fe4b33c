"""Granular contact forces on the rolled cell grid with COMPACT tag-keyed
shear history.

TPU redesign of pair gran/hooke/history + FixNeighHistory
(src/GRANULAR/pair_gran_hooke_history.cpp:169-380,
src/fix_neigh_history.cpp).  The matrix engine's (N, K) neighbor gather
costs ~5 ms/step at 32k spheres because TPU gathers pay per ROW; a dense
per-candidate history array avoids matching but costs ~0.5 GB of HBM
traffic per sweep.  The design here carries history COMPACTLY per atom:

    shear_tags (Np, KH) int32   partner tag of each live contact
    shear      (Np, KH, 3)      its accumulated tangential displacement

Each force sweep enumerates candidates gather-free by rolling the dense
cell grid (as in cellgrid_pair_sums), matches every candidate's tag
against the i slot's KH compact slots to fetch the old shear (pure
VPU compares, no HBM gathers), and RE-COMPACTS the touching contacts
into fresh KH slots via an in-sweep cumsum + one-hot contraction.
Because the tables are per-ATOM, a re-bin carries them with the same
one-gather/one-scatter permutation as the rest of the state — the
O(grid) extract/redistribute of a dense layout disappears.

KH = 12 slots (the kissing number for equal spheres is 12).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpumd.core.state import Box
from tpumd.ops.cellgrid import CellGridConfig, _offs, _roll_nbr

KH = 12


def _plan(cfg: CellGridConfig, periodic=(True, True, True)):
    cap = cfg.cap
    px, py, pz = (bool(p) for p in periodic)
    xoffs = _offs(cfg.nx, px)
    foldy = 3 * cap < 128
    yoffs = _offs(cfg.ny, py) if foldy else (0,)
    shifts = ([(dz, 0) for dz in _offs(cfg.nz, pz)] if foldy else
              [(dz, dy) for dz in _offs(cfg.nz, pz)
               for dy in _offs(cfg.ny, py)])
    rowlen = len(xoffs) * len(yoffs) * cap
    return cap, xoffs, yoffs, foldy, shifts, rowlen


def gran_compact_sums(x, tag, valid, shear_tags, shear, box: Box,
                      cfg: CellGridConfig, params, state_planes,
                      dt, shearupdate: bool):
    """One granular force sweep with compact history.

    params: dict of scalars (kn, kt, gamman, gammat, xmu, limit_damping,
    freeze_bit, exclude_bits); state_planes: (v(3), omega(3), radius,
    rmass, gmask) per-slot planes.  Returns (f (Np,3), torque (Np,3),
    shear_tags_new, shear_new)."""
    cap, xoffs, yoffs, foldy, shifts, rowlen = _plan(cfg, box.periodic)
    gshape = (cfg.nz, cfg.ny, cfg.nx, cap)
    dtype = x.dtype
    vx, vy, vz, ox, oy, oz, rad, rm, gm = state_planes
    Lx = box.lengths[0] if box.periodic[0] else None
    Ly = box.lengths[1] if box.periodic[1] else None
    Lz = box.lengths[2] if box.periodic[2] else None

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
    jplanes = [xyrow(p.reshape(gshape), None, None)
               for p in (vx, vy, vz, ox, oy, oz, rad, rm,
                         gm.astype(dtype), valid.astype(dtype))]
    tagrow = xyrow(tag.reshape(gshape), None, None)

    vg = [p.reshape(gshape) for p in (vx, vy, vz)]
    og = [p.reshape(gshape) for p in (ox, oy, oz)]
    radg = rad.reshape(gshape)
    rmg = rm.reshape(gshape)
    gmg = gm.reshape(gshape).astype(jnp.int32)
    validg = valid.reshape(gshape)
    stags_g = shear_tags.reshape(gshape + (KH,))
    sh_g = shear.reshape(gshape + (KH, 3))

    zero_seg = yoffs.index(0) * len(xoffs) + xoffs.index(0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 1)
    not_self = jj != ii + zero_seg * cap

    kn, kt = params["kn"], params["kt"]
    gamman, gammat = params["gamman"], params["gammat"]
    xmu = params["xmu"]
    freeze_bit = params["freeze_bit"]
    exclude_bits = params["exclude_bits"]
    limit_damping = params["limit_damping"]

    fx = [jnp.zeros(gshape, dtype) for _ in range(3)]
    tq = [jnp.zeros(gshape, dtype) for _ in range(3)]
    new_tags = jnp.zeros(gshape + (KH,), jnp.int32)
    new_shear = jnp.zeros(gshape + (KH, 3), dtype)
    count = jnp.zeros(gshape, jnp.int32)    # contacts compacted so far

    for si, (dz, dy) in enumerate(shifts):
        def roll2(a, corrz, corry):
            r = _roll_nbr(a, dz, 0, corrz)
            return _roll_nbr(r, dy, 1, corry) if not foldy else r

        xj = [roll2(rows[0], None, None), roll2(rows[1], None, Ly),
              roll2(rows[2], Lz, None)]
        vj = [roll2(jplanes[c], None, None) for c in range(3)]
        oj = [roll2(jplanes[3 + c], None, None) for c in range(3)]
        radj = roll2(jplanes[6], None, None)[..., None, :]
        rmj = roll2(jplanes[7], None, None)[..., None, :]
        gmj = roll2(jplanes[8], None, None).astype(jnp.int32)[..., None, :]
        valj = roll2(jplanes[9], None, None)[..., None, :] > 0.5
        tagj = roll2(tagrow, None, None)[..., None, :]   # (...,1,rowlen)

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
        poly = None
        if params.get("hertz"):
            poly = jnp.sqrt(jnp.where(
                touching, (radsum - r) * radi * radj / radsum, 0.0))
            ccel = ccel * poly
        if limit_damping:
            ccel = jnp.maximum(ccel, 0.0)

        vtr = [vt[0] + (d[1] * wr[2] - d[2] * wr[1]),
               vt[1] + (d[2] * wr[0] - d[0] * wr[2]),
               vt[2] + (d[0] * wr[1] - d[1] * wr[0])]

        # old shear: match candidate tag against the i slot's KH compact
        # slots (selects; no gathers)
        sh = [jnp.zeros_like(rsq) for _ in range(3)]
        for k in range(KH):
            st = stags_g[..., :, k:k + 1]
            hit = (st > 0) & (st == tagj)
            for c in range(3):
                sh[c] = sh[c] + jnp.where(hit, sh_g[..., :, None, k, c], 0.0)
        sh = [jnp.where(touching, sh[c], 0.0) for c in range(3)]

        if shearupdate:
            sh = [sh[c] + jnp.where(touching, vtr[c] * dt, 0.0)
                  for c in range(3)]
        shrmag = jnp.sqrt(sh[0] * sh[0] + sh[1] * sh[1] + sh[2] * sh[2])
        if shearupdate:
            rsht = (sh[0] * d[0] + sh[1] * d[1] + sh[2] * d[2]) * rsqinv
            sh = [sh[c] - d[c] * rsht for c in range(3)]

        gt = meff * gammat
        fs_v = [-(kt * sh[c] + gt * vtr[c]) for c in range(3)]
        if poly is not None:
            fs_v = [poly * fc for fc in fs_v]
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
            # re-compact this shift's touching contacts into the fresh
            # per-atom tables: global position = running count + rank
            pos = count[..., None] + jnp.cumsum(touching, axis=-1) - 1
            tjb = jnp.broadcast_to(tagj, touching.shape)
            shs = jnp.stack(sh, axis=-1)
            for k in range(KH):
                hit = touching & (pos == k)
                tk = jnp.max(jnp.where(hit, tjb, 0), axis=-1)
                sk = jnp.sum(jnp.where(hit[..., None], shs, 0.0), axis=-2)
                new_tags = new_tags.at[..., k].max(tk)
                new_shear = new_shear.at[..., k, :].add(sk)
            count = count + jnp.sum(touching, axis=-1)

    f = jnp.stack([c.reshape(-1) for c in fx], axis=1)
    torque = jnp.stack([c.reshape(-1) for c in tq], axis=1)
    if shearupdate:
        out_tags = new_tags.reshape(-1, KH)
        out_shear = new_shear.reshape(-1, KH, 3)
    else:
        out_tags, out_shear = shear_tags, shear
    return f, torque, out_tags, out_shear
