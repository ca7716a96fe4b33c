"""Pallas-fused LJ cell-grid force kernel (TPU).

Fuses the whole 27-stencil force evaluation into one VMEM-resident
kernel: the x/y stencil offsets are pre-folded into 9*cap-wide j-rows
(as in tpumd/ops/cellgrid.py), the three z-shifted row planes are passed
as separate pre-rolled inputs (periodic wrap corrections baked in at
fold time), and each program computes one (z, y) pencil of cells —
(nx, cap, rowlen) pair blocks never leave VMEM, replacing the XLA
path's HBM round trips between shift iterations.

Single-element lj/cut only (the flagship bench); other styles use the
XLA cell-grid path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xi0, xi1, xi2, vi,
            rm0, rm1, rm2, vm,
            r00, r01, r02, v0,
            rp0, rp1, rp2, vp,
            f0_ref, f1_ref, f2_ref,
            *, c12: float, c6: float, cut2: float, cap: int, rowlen: int,
            zero_seg: int):
    nx = xi0.shape[2]
    ii = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 1)
    not_self = (jj != ii + zero_seg * cap).astype(jnp.float32)

    xi = [xi0[0, 0], xi1[0, 0], xi2[0, 0]]        # (nx, cap)
    vi_b = vi[0, 0]                                # float 0/1 validity
    acc = [jnp.zeros((nx, cap), jnp.float32) for _ in range(3)]

    for rows, vrow, is_zero in (((rm0, rm1, rm2), vm, False),
                                ((r00, r01, r02), v0, True),
                                ((rp0, rp1, rp2), vp, False)):
        xj = [r[0, 0] for r in rows]              # (nx, rowlen)
        vj = vrow[0, 0]
        d = [xi[c][:, :, None] - xj[c][:, None, :] for c in range(3)]
        r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        mask = vi_b[:, :, None] * vj[:, None, :]
        if is_zero:
            mask = mask * not_self[None, :, :]
        mask = mask * (r2 < cut2).astype(jnp.float32)
        r2s = jnp.where(mask > 0, r2, jnp.float32(1.0))
        r2inv = 1.0 / r2s
        r6inv = r2inv * r2inv * r2inv
        fpair = r6inv * (c12 * r6inv - c6) * r2inv * mask
        for c in range(3):
            acc[c] = acc[c] + jnp.sum(d[c] * fpair, axis=-1)

    f0_ref[0, 0] = acc[0]
    f1_ref[0, 0] = acc[1]
    f2_ref[0, 0] = acc[2]


@functools.partial(jax.jit, static_argnames=("cfg", "lj1", "lj2", "cutsq"))
def lj_cellgrid_forces_pallas(x, valid, box, cfg, lj1: float, lj2: float,
                              cutsq: float):
    """Force-only LJ evaluation on the cell grid via the fused kernel.

    lj1/lj2: 48*eps*sig^12 / 24*eps*sig^6 (LAMMPS lj1/lj2 convention:
    fpair = r6inv*(lj1*r6inv - lj2)*r2inv).
    """
    from tpumd.ops.cellgrid import _offs, _roll_nbr

    cap = cfg.cap
    nz, ny, nx = cfg.nz, cfg.ny, cfg.nx
    gshape = (nz, ny, nx, cap)
    xg = [x[:, c].reshape(gshape).astype(jnp.float32) for c in range(3)]
    vg = valid.reshape(gshape).astype(jnp.float32)

    xoffs = _offs(nx)
    yoffs = _offs(ny)
    Lx = box.lengths[0].astype(jnp.float32)
    Ly = box.lengths[1].astype(jnp.float32)
    Lz = box.lengths[2].astype(jnp.float32)

    def xyrow(a, corrx, corry):
        row = jnp.concatenate(
            [_roll_nbr(a, o, 2, corrx) for o in xoffs], axis=-1)
        return jnp.concatenate(
            [_roll_nbr(row, o, 1, corry) for o in yoffs], axis=-1)

    rows = [xyrow(xg[0], Lx, None), xyrow(xg[1], None, Ly),
            xyrow(xg[2], None, None)]
    vrow = xyrow(vg, None, None)
    rowlen = len(xoffs) * len(yoffs) * cap
    zero_seg = yoffs.index(0) * len(xoffs) + xoffs.index(0)

    zoffs = _offs(nz)
    if len(zoffs) != 3:
        raise ValueError("pallas LJ kernel needs nz >= 3 (use XLA path)")
    planes = []
    for dz in zoffs:
        planes.append([_roll_nbr(rows[c], dz, 0, Lz if c == 2 else None)
                       for c in range(3)]
                      + [_roll_nbr(vrow, dz, 0, None)])

    blk_i = pl.BlockSpec((1, 1, nx, cap), lambda z, y: (z, y, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_r = pl.BlockSpec((1, 1, nx, rowlen), lambda z, y: (z, y, 0, 0),
                         memory_space=pltpu.VMEM)
    # zoffs = (-1, 0, 1): kernel expects (minus, zero, plus)
    minus, zero, plus = planes[0], planes[1], planes[2]

    inputs = (xg + [vg]
              + minus + zero + plus)
    kern = functools.partial(
        _kernel, c12=float(lj1), c6=float(lj2), cut2=float(cutsq),
        cap=cap, rowlen=rowlen, zero_seg=zero_seg)
    f = pl.pallas_call(
        kern,
        grid=(nz, ny),
        in_specs=[blk_i] * 4 + [blk_r] * 12,
        out_specs=[blk_i] * 3,
        out_shape=[jax.ShapeDtypeStruct(gshape, jnp.float32)] * 3,
    )(*inputs)
    out = jnp.stack([c.reshape(-1) for c in f], axis=1)
    return out.astype(x.dtype)


def lj_forces_reference(x, valid, box, cfg, lj1, lj2, cutsq):
    """XLA cell-grid path with the same fpair, for validation."""
    from tpumd.ops.cellgrid import cellgrid_pair_sums

    def pair_fn(r2, ti, tj):
        r2inv = 1.0 / r2
        r6inv = r2inv * r2inv * r2inv
        fpair = r6inv * (lj1 * r6inv - lj2) * r2inv
        fpair = jnp.where(r2 < cutsq, fpair, 0.0)
        return fpair, jnp.zeros_like(fpair), None, None

    f, _, _, _ = cellgrid_pair_sums(x, jnp.ones(x.shape[0], jnp.int32),
                                    valid, box, cfg, pair_fn, False, False)
    return f


def _kernel_fene(xi0, xi1, xi2, vi, tg, bt0, bt1,
                 rm0, rm1, rm2, vm, tm,
                 r00, r01, r02, v0, t0,
                 rp0, rp1, rp2, vp, tp,
                 f0_ref, f1_ref, f2_ref,
                 *, c12: float, c6: float, cut2: float,
                 fk: float, fr0sq: float, feps: float, fsig2: float,
                 cap: int, rowlen: int, zero_seg: int):
    """LJ + in-kernel FENE bonds (the chain bench fast path): candidate
    tags matched against the i slot's two bond-partner tags; bonded
    pairs take ONLY the FENE force (fene special_bonds collapse,
    kernel_bond_excl semantics of ops/cellgrid.py).  Blocks are y-SLABS
    ((ybs, nx, cap) pencils) so per-program work amortizes the grid-step
    overhead that dominates at small caps."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 1)
    not_self = (jj != ii + zero_seg * cap).astype(jnp.float32)

    xi = [xi0[0], xi1[0], xi2[0]]                 # (ybs, nx, cap)
    vi_b = vi[0]
    b0 = bt0[0][..., :, None]
    b1 = bt1[0][..., :, None]
    acc = [jnp.zeros(xi[0].shape, jnp.float32) for _ in range(3)]

    for rows, vrow, trow, is_zero in (
            ((rm0, rm1, rm2), vm, tm, False),
            ((r00, r01, r02), v0, t0, True),
            ((rp0, rp1, rp2), vp, tp, False)):
        xj = [r[0] for r in rows]                 # (ybs, nx, rowlen)
        vj = vrow[0]
        tagj = trow[0][..., None, :]              # (ybs, nx, 1, rowlen)
        d = [xi[c][..., :, None] - xj[c][..., None, :] for c in range(3)]
        r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        mask = vi_b[..., :, None] * vj[..., None, :]
        if is_zero:
            mask = mask * not_self
        bonded = ((b0 > 0) & (b0 == tagj)) | ((b1 > 0) & (b1 == tagj))
        bondf = bonded.astype(jnp.float32) * mask
        ljm = mask * (1.0 - bonded.astype(jnp.float32)) \
            * (r2 < cut2).astype(jnp.float32)
        r2s = jnp.where(mask > 0, r2, jnp.float32(1.0))
        r2inv = 1.0 / r2s
        r6inv = r2inv * r2inv * r2inv
        fp = r6inv * (c12 * r6inv - c6) * r2inv * ljm
        # FENE + WCA (BondFENE.kernel_bond_fn, models/bonded.py)
        rlogarg = jnp.maximum(1.0 - r2s / fr0sq, jnp.float32(0.1))
        fbond = -fk / rlogarg
        sr2 = fsig2 * r2inv
        sr6 = sr2 * sr2 * sr2
        inside = (r2s < jnp.float32(2.0 ** (1.0 / 3.0)) * fsig2) \
            .astype(jnp.float32)
        fbond = fbond + inside * 48.0 * feps * sr6 * (sr6 - 0.5) * r2inv
        fp = fp + fbond * bondf
        for c in range(3):
            acc[c] = acc[c] + jnp.sum(d[c] * fp, axis=-1)

    f0_ref[0] = acc[0]
    f1_ref[0] = acc[1]
    f2_ref[0] = acc[2]


@functools.partial(jax.jit, static_argnames=("cfg", "lj1", "lj2", "cutsq",
                                             "fene"))
def lj_fene_cellgrid_forces_pallas(x, valid, tag, btag0, btag1, box, cfg,
                                   lj1: float, lj2: float, cutsq: float,
                                   fene: tuple):
    """Force-only LJ + FENE evaluation (chain bench fast path).

    fene: (k, r0sq, eps, sig2) static scalars (single bond type)."""
    from tpumd.ops.cellgrid import _offs, _roll_nbr

    cap = cfg.cap
    nz, ny, nx = cfg.nz, cfg.ny, cfg.nx
    gshape = (nz, ny, nx, cap)
    xg = [x[:, c].reshape(gshape).astype(jnp.float32) for c in range(3)]
    vg = valid.reshape(gshape).astype(jnp.float32)
    tg = tag.reshape(gshape)
    b0g = btag0.reshape(gshape)
    b1g = btag1.reshape(gshape)

    xoffs = _offs(nx)
    yoffs = _offs(ny)
    Lx = box.lengths[0].astype(jnp.float32)
    Ly = box.lengths[1].astype(jnp.float32)
    Lz = box.lengths[2].astype(jnp.float32)

    def xyrow(a, corrx, corry):
        row = jnp.concatenate(
            [_roll_nbr(a, o, 2, corrx) for o in xoffs], axis=-1)
        return jnp.concatenate(
            [_roll_nbr(row, o, 1, corry) for o in yoffs], axis=-1)

    rows = [xyrow(xg[0], Lx, None), xyrow(xg[1], None, Ly),
            xyrow(xg[2], None, None)]
    vrow = xyrow(vg, None, None)
    trow = xyrow(tg, None, None)
    rowlen = len(xoffs) * len(yoffs) * cap
    zero_seg = yoffs.index(0) * len(xoffs) + xoffs.index(0)

    zoffs = _offs(nz)
    if len(zoffs) != 3:
        raise ValueError("pallas chain kernel needs nz >= 3")
    planes = []
    for dz in zoffs:
        planes.append([_roll_nbr(rows[c], dz, 0, Lz if c == 2 else None)
                       for c in range(3)]
                      + [_roll_nbr(vrow, dz, 0, None),
                         _roll_nbr(trow, dz, 0, None)])

    # y-slab blocks: big enough to amortize the per-program overhead,
    # small enough that ~10 live (ybs, nx, cap, rowlen) intermediates
    # fit the 16M scoped-VMEM budget
    ybs = 1
    for cand in (ny, ny // 2 if ny % 2 == 0 else 1, 4, 2):
        if cand >= 1 and ny % cand == 0 \
                and cand * nx * cap * rowlen * 4 * 12 <= 12 * 2 ** 20:
            ybs = cand
            break
    blk_i = pl.BlockSpec((1, ybs, nx, cap), lambda z, y: (z, y, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_r = pl.BlockSpec((1, ybs, nx, rowlen), lambda z, y: (z, y, 0, 0),
                         memory_space=pltpu.VMEM)
    minus, zero, plus = planes[0], planes[1], planes[2]
    fk, fr0sq, feps, fsig2 = fene

    inputs = (xg + [vg, tg, b0g, b1g] + minus + zero + plus)
    kern = functools.partial(
        _kernel_fene, c12=float(lj1), c6=float(lj2), cut2=float(cutsq),
        fk=float(fk), fr0sq=float(fr0sq), feps=float(feps),
        fsig2=float(fsig2), cap=cap, rowlen=rowlen, zero_seg=zero_seg)
    f = pl.pallas_call(
        kern,
        grid=(nz, ny // ybs),
        in_specs=[blk_i] * 7 + [blk_r] * 15,
        out_specs=[blk_i] * 3,
        out_shape=[jax.ShapeDtypeStruct(gshape, jnp.float32)] * 3,
    )(*inputs)
    out = jnp.stack([c.reshape(-1) for c in f], axis=1)
    return out.astype(x.dtype)
