"""Pallas-fused CHARMM (lj/charmm/coul/long) cell-grid force kernel.

The rhodo-class force eval is the per-step wall: the XLA rolled-block
path materializes every (cap, rowlen) intermediate of the switched-LJ +
erfc-Coulomb + special-matching chain in HBM (~110 ms/eval at the 32k
peptide shape).  This kernel computes one cap-block of a (z, y) pencil
per program with the three z-shifted candidate planes in-register:

- grid = (nz, ny, cap_blocks).  The i-side arrays are pre-reshaped to
  (nz, ny, ncb, nx, capb) so the cap-block is addressed by the grid and
  every BlockSpec keeps the legal equal-to-array trailing dims; the
  folded 9*cap j-rows are shared across cap-blocks of a pencil.
- per-type coefficients arrive as per-i-slot rows (capb, ntypes+1)
  gathered OUTSIDE the kernel; the j side resolves with an exact
  ntypes-term select chain on the rolled type row (the same trick as
  PairStyle.coef - full-block 2-D gathers serialize on TPU).
- 1-2/1-3/1-4 exclusion weights are matched in-kernel: each candidate's
  rolled tag is compared against the i slot's S-wide special list
  (reference SBBITS analog, src/pair_lj_charmm_coul_long.cpp:104-158).

Force+virial only (eflag evals stay on the XLA path: they run once per
thermo stop, not per step).  f32 throughout, like the XLA bench path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EWALD_F = 1.12837917
EWALD_P = 0.3275911
A1 = 0.254829592
A2 = -0.284496736
A3 = 1.421413741
A4 = -1.453152027
A5 = 1.061405429


def _kernel(xi0, xi1, xi2, qi, vi, stags, swl, swc,
            a1r, a2r, a3r, a4r,
            rm0, rm1, rm2, qm, vm, tm, gm,
            r00, r01, r02, q0, v0, t0, g0,
            rp0, rp1, rp2, qp, vp, tp, gp,
            f0_ref, f1_ref, f2_ref, vir_ref,
            *, qqrd2e: float, g_ewald: float, cut_coulsq: float,
            cut_ljsq: float, cut_lj_innersq: float, denom_lj: float,
            ntypes: int, S: int, cap: int, capb: int, rowlen: int,
            zero_seg: int):
    cb = pl.program_id(2)
    jj = jax.lax.broadcasted_iota(jnp.int32, (capb, rowlen), 1)
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (capb, rowlen), 0)
    not_self = (jj != iota_i + cb * capb
                + zero_seg * cap).astype(jnp.float32)

    xi_c = [a[0, 0, 0][:, :, None] for a in (xi0, xi1, xi2)]
    qi_c = qi[0, 0, 0][:, :, None]                  # (nx, capb, 1)
    vi_c = vi[0, 0, 0][:, :, None]
    st_c = stags[0, 0, 0]                           # (nx, capb, S)
    wl_c = swl[0, 0, 0]
    wc_c = swc[0, 0, 0]
    ar_c = [a[0, 0, 0] for a in (a1r, a2r, a3r, a4r)]  # (nx, capb, nt+1)

    planes = (((rm0, rm1, rm2), qm, vm, tm, gm, False),
              ((r00, r01, r02), q0, v0, t0, g0, True),
              ((rp0, rp1, rp2), qp, vp, tp, gp, False))

    acc = [jnp.zeros(xi_c[0].shape[:2], jnp.float32) for _ in range(3)]
    vacc = jnp.zeros((8, 128), jnp.float32)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

    for rows, qrow, vrow, trow, grow, is_zero in planes:
        xj = [r[0, 0][:, None, :] for r in rows]    # (nx, 1, rowlen)
        qj = qrow[0, 0][:, None, :]
        vj = vrow[0, 0][:, None, :]
        tj = trow[0, 0][:, None, :]                 # int32 types
        tagj = grow[0, 0][:, None, :]               # int32 tags

        d = [xi_c[c] - xj[c] for c in range(3)]
        r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        mask = vi_c * vj
        if is_zero:
            mask = mask * not_self[None, :, :]
        r2 = jnp.where(mask > 0, r2, jnp.float32(1.0))

        # special weights via in-kernel tag matching
        w_lj = jnp.ones_like(r2)
        w_coul = jnp.ones_like(r2)
        for s in range(S):
            stc = st_c[:, :, s:s + 1]
            hit = (stc > 0) & (stc == tagj)
            w_lj = w_lj + jnp.where(hit, wl_c[:, :, s:s + 1] - 1.0, 0.0)
            w_coul = w_coul + jnp.where(hit, wc_c[:, :, s:s + 1] - 1.0,
                                        0.0)

        # per-pair coefficients: j side resolved by select chain
        co = [jnp.zeros_like(r2) for _ in range(4)]
        for t in range(1, ntypes + 1):
            tm_ = (tj == t)
            for c in range(4):
                co[c] = co[c] + jnp.where(tm_, ar_c[c][:, :, t:t + 1],
                                          0.0)
        lj1, lj2, lj3, lj4 = co

        r2inv = 1.0 / r2
        # coulomb: erfc real space + kspace-exclusion compensation
        r = jnp.sqrt(r2)
        grij = g_ewald * r
        expm2 = jnp.exp(-grij * grij)
        tpoly = 1.0 / (1.0 + EWALD_P * grij)
        erfc = tpoly * (A1 + tpoly * (A2 + tpoly *
                        (A3 + tpoly * (A4 + tpoly * A5)))) * expm2
        prefactor = qqrd2e * qi_c * qj / r
        forcecoul = prefactor * (erfc + EWALD_F * grij * expm2) \
            - (1.0 - w_coul) * prefactor
        forcecoul = jnp.where(r2 < cut_coulsq, forcecoul, 0.0)

        # switched LJ
        r6inv = r2inv * r2inv * r2inv
        forcelj = r6inv * (lj1 * r6inv - lj2)
        philj = r6inv * (lj3 * r6inv - lj4)
        tt = cut_ljsq - r2
        switch1 = tt * tt * (cut_ljsq + 2.0 * r2
                             - 3.0 * cut_lj_innersq) / denom_lj
        switch2 = 12.0 * r2 * tt * (r2 - cut_lj_innersq) / denom_lj
        sw_on = r2 > cut_lj_innersq
        forcelj = jnp.where(sw_on, forcelj * switch1 + philj * switch2,
                            forcelj)
        forcelj = jnp.where(r2 < cut_ljsq, forcelj * w_lj, 0.0)

        fpair = (forcelj + forcecoul) * r2inv * mask
        for c in range(3):
            acc[c] = acc[c] + jnp.sum(d[c] * fpair, axis=-1)
        # virial: sum fp * d_a d_b (xx yy zz xy xz yz); one row of the
        # (8, 128) accumulator tile per component, caller sums/halves
        for vi_, (a_, b_) in enumerate(
                ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))):
            comp = jnp.sum(fpair * d[a_] * d[b_])
            vacc = vacc + jnp.where(rowid == vi_, comp, 0.0)

    f0_ref[0, 0, 0] = acc[0]
    f1_ref[0, 0, 0] = acc[1]
    f2_ref[0, 0, 0] = acc[2]
    vir_ref[0, 0, 0] = vacc


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "qqrd2e", "g_ewald", "cut_coulsq", "cut_ljsq",
                     "cut_lj_innersq", "denom_lj", "ntypes", "capb"))
def charmm_cellgrid_forces_pallas(
        x, q, type_, tag, valid, stags, swl, swc, box, cfg,
        lj_tables, qqrd2e: float, g_ewald: float, cut_coulsq: float,
        cut_ljsq: float, cut_lj_innersq: float, denom_lj: float,
        ntypes: int, capb: int = 16):
    """Force+virial CHARMM eval on the cell grid via the fused kernel.

    lj_tables: (4, ntypes+1, ntypes+1) f32 [lj1, lj2, lj3, lj4];
    stags/swl/swc: (Np, S) special tag/weight planes (zero-padded).
    Returns (f (Np, 3), virial6).
    """
    from tpumd.ops.cellgrid import _offs, _roll_nbr

    cap = cfg.cap
    nz, ny, nx = cfg.nz, cfg.ny, cfg.nx
    while cap % capb:
        capb //= 2
    ncb = cap // capb
    gshape = (nz, ny, nx, cap)
    f32 = jnp.float32
    xg = [x[:, c].reshape(gshape).astype(f32) for c in range(3)]
    qg = q.reshape(gshape).astype(f32)
    vg = valid.reshape(gshape).astype(f32)
    tg = type_.reshape(gshape)
    gg = tag.reshape(gshape)
    S = stags.shape[1]
    nt1 = ntypes + 1

    def iblocks(a, trail=()):
        """(nz, ny, nx, cap, *trail) -> (nz, ny, ncb, nx, capb, *trail)."""
        ntr = len(trail)
        a = a.reshape((nz, ny, nx, ncb, capb) + trail)
        perm = (0, 1, 3, 2, 4) + tuple(5 + i for i in range(ntr))
        return a.transpose(perm)

    xib = [iblocks(a) for a in xg]
    qib = iblocks(qg)
    vib = iblocks(vg)
    stib = iblocks(stags.reshape(gshape + (S,)), (S,))
    swlib = iblocks(swl.reshape(gshape + (S,)).astype(f32), (S,))
    swcib = iblocks(swc.reshape(gshape + (S,)).astype(f32), (S,))
    arib = [iblocks(jnp.asarray(lj_tables[c], f32)[tg], (nt1,))
            for c in range(4)]

    xoffs = _offs(nx)
    yoffs = _offs(ny)
    Lx = box.lengths[0].astype(f32)
    Ly = box.lengths[1].astype(f32)
    Lz = box.lengths[2].astype(f32)

    def xyrow(a, corrx, corry):
        row = jnp.concatenate(
            [_roll_nbr(a, o, 2, corrx) for o in xoffs], axis=-1)
        return jnp.concatenate(
            [_roll_nbr(row, o, 1, corry) for o in yoffs], axis=-1)

    rows = [xyrow(xg[0], Lx, None), xyrow(xg[1], None, Ly),
            xyrow(xg[2], None, None)]
    qrow = xyrow(qg, None, None)
    vrow = xyrow(vg, None, None)
    trow = xyrow(tg, None, None)
    grow = xyrow(gg, None, None)
    rowlen = len(xoffs) * len(yoffs) * cap
    zero_seg = yoffs.index(0) * len(xoffs) + xoffs.index(0)

    zoffs = _offs(nz)
    if len(zoffs) != 3:
        raise ValueError("pallas charmm kernel needs nz >= 3")
    planes = []
    for dz in zoffs:
        planes.append([_roll_nbr(rows[c], dz, 0, Lz if c == 2 else None)
                       for c in range(3)]
                      + [_roll_nbr(qrow, dz, 0, None),
                         _roll_nbr(vrow, dz, 0, None),
                         _roll_nbr(trow, dz, 0, None),
                         _roll_nbr(grow, dz, 0, None)])

    blk_i = pl.BlockSpec((1, 1, 1, nx, capb),
                         lambda z, y, cb: (z, y, cb, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_is = pl.BlockSpec((1, 1, 1, nx, capb, S),
                          lambda z, y, cb: (z, y, cb, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    blk_ia = pl.BlockSpec((1, 1, 1, nx, capb, nt1),
                          lambda z, y, cb: (z, y, cb, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    blk_r = pl.BlockSpec((1, 1, nx, rowlen),
                         lambda z, y, cb: (z, y, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_v = pl.BlockSpec((1, 1, 1, 8, 128),
                         lambda z, y, cb: (z, y, cb, 0, 0),
                         memory_space=pltpu.VMEM)

    inputs = (xib + [qib, vib, stib, swlib, swcib] + arib
              + planes[0] + planes[1] + planes[2])
    kern = functools.partial(
        _kernel, qqrd2e=float(qqrd2e), g_ewald=float(g_ewald),
        cut_coulsq=float(cut_coulsq), cut_ljsq=float(cut_ljsq),
        cut_lj_innersq=float(cut_lj_innersq), denom_lj=float(denom_lj),
        ntypes=int(ntypes), S=int(S), cap=cap, capb=capb, rowlen=rowlen,
        zero_seg=zero_seg)
    bshape = (nz, ny, ncb, nx, capb)
    f = pl.pallas_call(
        kern,
        grid=(nz, ny, ncb),
        in_specs=([blk_i] * 5 + [blk_is] * 3 + [blk_ia] * 4
                  + [blk_r] * 21),
        out_specs=[blk_i] * 3 + [blk_v],
        out_shape=[jax.ShapeDtypeStruct(bshape, f32)] * 3
        + [jax.ShapeDtypeStruct((nz, ny, ncb, 8, 128), f32)],
    )(*inputs)

    def unblock(a):
        return a.transpose(0, 1, 3, 2, 4).reshape(-1)

    out = jnp.stack([unblock(c) for c in f[:3]], axis=1)
    virial = 0.5 * jnp.sum(f[3], axis=(0, 1, 2, 4))[:6] / 128.0
    return out.astype(x.dtype), virial.astype(x.dtype)
