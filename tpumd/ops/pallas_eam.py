"""Pallas-fused two-pass EAM cell-grid kernel (TPU, single element).

The XLA grid path (models/pair_eam.py compute_cellgrid) runs the 9
(dz,dy) shifts as a lax.scan of dynamically-rolled HBM-resident blocks
with 8-segment masked-select splines — HBM-bound at ~12 ms/step on the
32k bench.  Here both sweeps become VMEM-resident pallas kernels in the
pallas_lj.py mold (x/y offsets pre-folded into 9*cap rows, three
pre-rolled z-planes, one (z, y-slab) pencil per program), and every
radial function collapses to a SINGLE polynomial evaluated by Horner —
fit_cheb(deg~16) Chebyshev series (Clenshaw) reproduce the spline tables
to ~3e-5 relative (validated at fit time; worse fits fall back to XLA).

Pass 1 accumulates host densities rho_i; the embedding derivative
F'(rho) is a plain elementwise polynomial between the kernels; pass 2
consumes the pre-rolled F' planes for the pair forces — the TPU
replacement for the reference's mid-force rho/fp ghost exchanges
(src/MANYBODY/pair_eam.cpp:224,251).

Force path only (per-step compute_forces); energy/virial evaluations
keep the exact XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cheb(r, coefs, lo, hi):
    """Chebyshev series by Clenshaw over [lo, hi] — the f32-stable way
    to evaluate a degree-16+ fit in kernel (a monomial Horner of the
    same fit cancels catastrophically; see segpoly.ChebPoly)."""
    t = (r - lo) * (2.0 / (hi - lo)) - 1.0
    t2 = 2.0 * t
    b1 = jnp.zeros_like(r)
    b2 = jnp.zeros_like(r)
    for c in coefs[:0:-1]:
        b1, b2 = t2 * b1 - b2 + jnp.float32(c), b1
    return t * b1 - b2 + jnp.float32(coefs[0])


def _prep(x, valid, box, cfg, extra=None):
    """Shared plane prep (pallas_lj.xyrow pattern): returns block inputs."""
    from tpumd.ops.cellgrid import _offs, _roll_nbr

    cap = cfg.cap
    nz, ny, nx = cfg.nz, cfg.ny, cfg.nx
    gshape = (nz, ny, nx, cap)
    xg = [x[:, c].reshape(gshape).astype(jnp.float32) for c in range(3)]
    vg = valid.reshape(gshape).astype(jnp.float32)
    eg = None if extra is None else extra.reshape(gshape).astype(jnp.float32)

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
    erow = None if eg is None else xyrow(eg, None, None)
    rowlen = len(xoffs) * len(yoffs) * cap
    zero_seg = yoffs.index(0) * len(xoffs) + xoffs.index(0)

    zoffs = _offs(nz)
    if len(zoffs) != 3:
        raise ValueError("pallas EAM kernel needs nz >= 3")
    planes = []
    for dz in zoffs:
        p = [_roll_nbr(rows[c], dz, 0, Lz if c == 2 else None)
             for c in range(3)] + [_roll_nbr(vrow, dz, 0, None)]
        if erow is not None:
            p.append(_roll_nbr(erow, dz, 0, None))
        planes.append(p)

    # y-slab blocking to amortize per-program overhead within VMEM
    nplanes = 12 if extra is None else 16
    ybs = 1
    for cand in (ny, ny // 2 if ny % 2 == 0 else 1, 4, 2):
        if cand >= 1 and ny % cand == 0 \
                and cand * nx * cap * rowlen * 4 * (nplanes // 2) \
                <= 10 * 2 ** 20:
            ybs = cand
            break
    return (xg, vg, eg, planes, gshape, cap, rowlen, zero_seg, ybs)


def _rho_kernel(xi0, xi1, xi2, vi,
                rm0, rm1, rm2, vm,
                r00, r01, r02, v0,
                rp0, rp1, rp2, vp,
                rho_ref, *, rho_c, lo, hi, cut2, cap, rowlen, zero_seg):
    ii = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 1)
    not_self = (jj != ii + zero_seg * cap).astype(jnp.float32)

    xi = [xi0[0], xi1[0], xi2[0]]                 # (ybs, nx, cap)
    vi_b = vi[0]
    acc = jnp.zeros(xi[0].shape, jnp.float32)

    for rows, vrow, is_zero in (((rm0, rm1, rm2), vm, False),
                                ((r00, r01, r02), v0, True),
                                ((rp0, rp1, rp2), vp, False)):
        xj = [r[0] for r in rows]                 # (ybs, nx, rowlen)
        vj = vrow[0]
        d = [xi[c][..., :, None] - xj[c][..., None, :] for c in range(3)]
        r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        mask = vi_b[..., :, None] * vj[..., None, :]
        if is_zero:
            mask = mask * not_self
        mask = mask * (r2 < cut2).astype(jnp.float32)
        r = jnp.sqrt(jnp.where(mask > 0, r2, jnp.float32(1.0)))
        acc = acc + jnp.sum(_cheb(r, rho_c, lo, hi) * mask, axis=-1)
    rho_ref[0] = acc


def _force_kernel(xi0, xi1, xi2, vi, fpi,
                  rm0, rm1, rm2, vm, em,
                  r00, r01, r02, v0, e0,
                  rp0, rp1, rp2, vp, ep,
                  f0_ref, f1_ref, f2_ref,
                  *, rhod_c, z2_c, z2d_c, lo, hi, cut2, cap, rowlen,
                  zero_seg):
    ii = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 1)
    not_self = (jj != ii + zero_seg * cap).astype(jnp.float32)

    xi = [xi0[0], xi1[0], xi2[0]]
    vi_b = vi[0]
    fpi_b = fpi[0][..., :, None]
    acc = [jnp.zeros(xi[0].shape, jnp.float32) for _ in range(3)]

    for rows, vrow, erow, is_zero in (
            ((rm0, rm1, rm2), vm, em, False),
            ((r00, r01, r02), v0, e0, True),
            ((rp0, rp1, rp2), vp, ep, False)):
        xj = [r[0] for r in rows]
        vj = vrow[0]
        fpj = erow[0][..., None, :]
        d = [xi[c][..., :, None] - xj[c][..., None, :] for c in range(3)]
        r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        mask = vi_b[..., :, None] * vj[..., None, :]
        if is_zero:
            mask = mask * not_self
        mask = mask * (r2 < cut2).astype(jnp.float32)
        r = jnp.sqrt(jnp.where(mask > 0, r2, jnp.float32(1.0)))
        recip = 1.0 / r
        rhop = _cheb(r, rhod_c, lo, hi)
        z2 = _cheb(r, z2_c, lo, hi)
        z2p = _cheb(r, z2d_c, lo, hi)
        phi = z2 * recip
        phip = z2p * recip - phi * recip
        psip = (fpi_b + fpj) * rhop + phip
        fpair = -psip * recip * mask
        for c in range(3):
            acc[c] = acc[c] + jnp.sum(d[c] * fpair, axis=-1)
    f0_ref[0] = acc[0]
    f1_ref[0] = acc[1]
    f2_ref[0] = acc[2]


def eam_rho_pallas(x, valid, box, cfg, rho_c, lo, hi, cut2: float):
    """Pass 1: host densities rho_i (capacity,) via the fused sweep."""
    (xg, vg, _, planes, gshape, cap, rowlen, zero_seg, ybs) = _prep(
        x, valid, box, cfg)
    nz, ny, nx = cfg.nz, cfg.ny, cfg.nx
    blk_i = pl.BlockSpec((1, ybs, nx, cap), lambda z, y: (z, y, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_r = pl.BlockSpec((1, ybs, nx, rowlen), lambda z, y: (z, y, 0, 0),
                         memory_space=pltpu.VMEM)
    minus, zero, plus = planes
    rho = pl.pallas_call(
        functools.partial(
            _rho_kernel, rho_c=rho_c, lo=lo, hi=hi, cut2=float(cut2),
            cap=cap, rowlen=rowlen, zero_seg=zero_seg),
        grid=(nz, ny // ybs),
        in_specs=[blk_i] * 4 + [blk_r] * 12,
        out_specs=blk_i,
        out_shape=jax.ShapeDtypeStruct(gshape, jnp.float32),
    )(*(xg + [vg] + minus + zero + plus))
    return rho.reshape(-1)


def eam_force_pallas(x, valid, fp, box, cfg, rhod_c, z2_c, z2d_c,
                     lo, hi, cut2: float):
    """Pass 2: pair forces given the per-slot embedding derivative fp."""
    (xg, vg, eg, planes, gshape, cap, rowlen, zero_seg, ybs) = _prep(
        x, valid, box, cfg, extra=fp)
    nz, ny, nx = cfg.nz, cfg.ny, cfg.nx
    blk_i = pl.BlockSpec((1, ybs, nx, cap), lambda z, y: (z, y, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_r = pl.BlockSpec((1, ybs, nx, rowlen), lambda z, y: (z, y, 0, 0),
                         memory_space=pltpu.VMEM)
    minus, zero, plus = planes
    f = pl.pallas_call(
        functools.partial(
            _force_kernel, rhod_c=rhod_c, z2_c=z2_c, z2d_c=z2d_c,
            lo=lo, hi=hi, cut2=float(cut2), cap=cap, rowlen=rowlen,
            zero_seg=zero_seg),
        grid=(nz, ny // ybs),
        in_specs=[blk_i] * 5 + [blk_r] * 15,
        out_specs=[blk_i] * 3,
        out_shape=[jax.ShapeDtypeStruct(gshape, jnp.float32)] * 3,
    )(*(xg + [vg, eg] + minus + zero + plus))
    out = jnp.stack([c.reshape(-1) for c in f], axis=1)
    return out.astype(x.dtype)
