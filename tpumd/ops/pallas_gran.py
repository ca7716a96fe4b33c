"""Pallas-fused granular cell-grid kernel (TPU).

The XLA rolled-block granular sweep (ops/cellgrid_gran.py) is
HBM-bound: its ~30 (nx, cap, rowlen) intermediates have many consumers,
XLA declines to duplicate them into fusions, and every one round-trips
HBM (~57 ms/step at chute scale).  This kernel keeps one (z, y) pencil
of cells in VMEM and iterates the three z-shifted candidate planes as
the INNERMOST grid dimension: the output blocks (forces, torques,
compact history) are revisited across the three shifts and accumulated
in-place (the pallas reduction pattern), so only ONE shift's pair
intermediates are ever live — that is what fits the 16M scoped-VMEM
budget at chute geometry (36x8x72 blocks).

The within-row contact rank (a cumsum) is a strict-lower-triangular
matmul riding the MXU; the cross-shift contact count persists in a VMEM
scratch.  Layouts are channel-FIRST so the trailing (nx, cap|rowlen)
dims tile the VPU lanes fully.

Measured verdict (chute, 32k spheres, v5e): the kernel output is
BIT-IDENTICAL to the XLA path and VMEM-resident, but at chute's
nonuniform density the fixed-capacity grid computes ~37M candidate
pairs for ~1.3M real ones (cap=8 against a mean cell occupancy of 1.5,
plus the free-surface headspace), so both grid paths are ALU-bound at
~55 ms/step while the matrix engine's (N, K=16) gather path does 5 ms.
Sparse/nonuniform granular systems genuinely favor the gather
formulation; the grid engine wins on dense uniform systems.  The auto
engine choice (Simulation._resolve_mode) reflects that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpumd.ops.cellgrid_gran import KH, _plan


def _kernel(ifl, igm, istags, ishear, jf, ji,
            f_ref, tq_ref, stags_ref, shear_ref, count_ref,
            *, kn, kt, gamman, gammat, xmu, limit_damping,
            freeze_bit, exclude_bits, dt, cap, rowlen, zero_seg):
    nx = ifl.shape[3]
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _init():
        f_ref[...] = jnp.zeros_like(f_ref)
        tq_ref[...] = jnp.zeros_like(tq_ref)
        stags_ref[...] = jnp.zeros_like(stags_ref)
        shear_ref[...] = jnp.zeros_like(shear_ref)
        count_ref[...] = jnp.zeros_like(count_ref)

    xi = [ifl[c, 0, 0] for c in range(3)]         # (nx, cap)
    vi = [ifl[3 + c, 0, 0] for c in range(3)]
    oi = [ifl[6 + c, 0, 0] for c in range(3)]
    radi = ifl[9, 0, 0]
    rmi = ifl[10, 0, 0]
    validi = ifl[11, 0, 0]
    gmi = igm[0, 0, 0]

    ii = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 1)
    not_self = (jj != ii + zero_seg * cap)[None, :, :]

    xj = [jf[0, c, 0, 0] for c in range(3)]       # (nx, rowlen)
    vj = [jf[0, 3 + c, 0, 0] for c in range(3)]
    oj = [jf[0, 6 + c, 0, 0] for c in range(3)]
    radj = jf[0, 9, 0, 0][:, None, :]
    rmj = jf[0, 10, 0, 0][:, None, :]
    validj = jf[0, 11, 0, 0][:, None, :]
    gmj = ji[0, 0, 0, 0][:, None, :]
    tagj = ji[0, 1, 0, 0][:, None, :]

    d = [xi[c][:, :, None] - xj[c][:, None, :] for c in range(3)]
    rsq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    mask = (validi[:, :, None] > 0.5) & (validj > 0.5)
    # self-pair exclusion applies only in the zero shift (s == 1)
    mask = mask & (not_self | (s != 1))
    gib = gmi[:, :, None]
    for b1, b2 in exclude_bits:
        both = (((gib & b1) > 0) & ((gmj & b2) > 0)) | (
            ((gib & b2) > 0) & ((gmj & b1) > 0))
        mask = mask & ~both

    radib = radi[:, :, None]
    radsum = radib + radj
    touching = mask & (rsq < radsum * radsum)
    rsq_safe = jnp.where(touching, rsq, jnp.float32(1.0))
    r = jnp.sqrt(rsq_safe)
    rinv = 1.0 / r
    rsqinv = 1.0 / rsq_safe

    vr = [vi[c][:, :, None] - vj[c][:, None, :] for c in range(3)]
    vnnr = vr[0] * d[0] + vr[1] * d[1] + vr[2] * d[2]
    vt = [vr[c] - d[c] * (vnnr * rsqinv) for c in range(3)]
    wr = [(radib * oi[c][:, :, None] + radj * oj[c][:, None, :]) * rinv
          for c in range(3)]

    mi = rmi[:, :, None]
    meff = mi * rmj / (mi + rmj)
    if freeze_bit:
        fi = (gib & freeze_bit) > 0
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

    # old shear by tag match over the KH compact slots
    sh = [jnp.zeros_like(rsq) for _ in range(3)]
    for k in range(KH):
        st = istags[k, 0, 0][:, :, None]
        hit = (st > 0) & (st == tagj)
        for c in range(3):
            sh[c] = sh[c] + jnp.where(
                hit, ishear[3 * k + c, 0, 0][:, :, None], 0.0)
    sh = [jnp.where(touching, sh[c] + vtr[c] * dt, 0.0) for c in range(3)]
    shrmag = jnp.sqrt(sh[0] * sh[0] + sh[1] * sh[1] + sh[2] * sh[2])
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
        sh[c] = jnp.where(resc, ratio * (sh[c] + damp_t) - damp_t, sh[c])
        fs_v[c] = jnp.where(slip,
                            jnp.where(nonzero, fs_v[c] * ratio, 0.0),
                            fs_v[c])

    tch = touching.astype(jnp.float32)
    for c in range(3):
        f_ref[c, 0, 0] += jnp.sum((d[c] * ccel + fs_v[c]) * tch, axis=-1)
    tor = [(d[1] * fs_v[2] - d[2] * fs_v[1]) * rinv,
           (d[2] * fs_v[0] - d[0] * fs_v[2]) * rinv,
           (d[0] * fs_v[1] - d[1] * fs_v[0]) * rinv]
    for c in range(3):
        tq_ref[c, 0, 0] += -jnp.sum(radib * tor[c] * tch, axis=-1)

    # re-compact this shift's touching contacts; rank via MXU matmul
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (rowlen, rowlen), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (rowlen, rowlen), 1)
    lower = (iota_r <= iota_c).astype(jnp.float32)
    rank = jax.lax.dot_general(
        tch.reshape(nx * cap, rowlen), lower,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(nx, cap, rowlen)
    count = count_ref[0, 0, 0]
    pos = count[:, :, None] + rank.astype(jnp.int32) - 1
    for k in range(KH):
        hit = touching & (pos == k)
        hf = hit.astype(jnp.float32)
        stags_ref[k, 0, 0] = jnp.maximum(
            stags_ref[k, 0, 0], jnp.max(jnp.where(hit, tagj, 0), axis=-1))
        for c in range(3):
            shear_ref[3 * k + c, 0, 0] += jnp.sum(sh[c] * hf, axis=-1)
    count_ref[0, 0, 0] = count + jnp.sum(
        touching.astype(jnp.int32), axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg", "params_t", "dt"))
def gran_cellgrid_forces_pallas(x, tag, valid, shear_tags, shear,
                                box, cfg, params_t, dt: float,
                                planes):
    """Granular sweep via the fused kernel (f32, shearupdate=True).

    params_t: hashable tuple (kn, kt, gamman, gammat, xmu,
    limit_damping, freeze_bit, exclude_bits)."""
    from tpumd.ops.cellgrid import _roll_nbr
    kn, kt, gamman, gammat, xmu, limit_damping, freeze_bit, excl = params_t
    cap, xoffs, yoffs, foldy, shifts, rowlen = _plan(
        cfg, tuple(bool(p) for p in box.periodic))
    if not foldy or len(shifts) != 3 or cfg.nz < 3:
        raise ValueError("pallas granular kernel needs foldy + nz >= 3")
    nz, ny, nx = cfg.nz, cfg.ny, cfg.nx
    gshape = (nz, ny, nx, cap)
    f32 = jnp.float32

    vx, vy, vz, ox, oy, oz, rad, rm, gm = planes
    xg = [x[:, c].reshape(gshape).astype(f32) for c in range(3)]
    ifl = jnp.stack(
        xg + [p.reshape(gshape).astype(f32)
              for p in (vx, vy, vz, ox, oy, oz, rad, rm)]
        + [valid.reshape(gshape).astype(f32)])          # (12, ...)
    igm = gm.reshape(gshape).astype(jnp.int32)[None]
    istags = jnp.moveaxis(shear_tags.reshape(gshape + (KH,)), -1, 0)
    ishear = jnp.moveaxis(
        shear.reshape(gshape + (KH * 3,)), -1, 0).astype(f32)

    Lx = box.lengths[0].astype(f32) if box.periodic[0] else None
    Ly = box.lengths[1].astype(f32) if box.periodic[1] else None
    Lz = box.lengths[2].astype(f32) if box.periodic[2] else None

    def xyrow(a, corrx, corry):
        row = jnp.concatenate(
            [_roll_nbr(a, o, 2, corrx) for o in xoffs], axis=-1)
        return jnp.concatenate(
            [_roll_nbr(row, o, 1, corry) for o in yoffs], axis=-1)

    jrows_f = [xyrow(xg[0], Lx, None), xyrow(xg[1], None, Ly),
               xyrow(xg[2], None, None)]
    jrows_f += [xyrow(p.reshape(gshape).astype(f32), None, None)
                for p in (vx, vy, vz, ox, oy, oz, rad, rm)]
    jrows_f.append(xyrow(valid.reshape(gshape).astype(f32), None, None))
    jrow_gm = xyrow(gm.reshape(gshape).astype(jnp.int32), None, None)
    jrow_tag = xyrow(tag.reshape(gshape), None, None)

    jf_all = jnp.stack([
        jnp.stack([_roll_nbr(r, dz, 0, Lz if c == 2 else None)
                   for c, r in enumerate(jrows_f)])
        for dz in (-1, 0, 1)])                       # (3, 12, ...)
    ji_all = jnp.stack([
        jnp.stack([_roll_nbr(jrow_gm, dz, 0, None),
                   _roll_nbr(jrow_tag, dz, 0, None)])
        for dz in (-1, 0, 1)])                       # (3, 2, ...)

    zero_seg = yoffs.index(0) * len(xoffs) + xoffs.index(0)

    def bi(c):
        return pl.BlockSpec((c, 1, 1, nx, cap),
                            lambda z, y, s: (0, z, y, 0, 0),
                            memory_space=pltpu.VMEM)

    def bj(c):
        return pl.BlockSpec((1, c, 1, 1, nx, rowlen),
                            lambda z, y, s: (s, 0, z, y, 0, 0),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(
        _kernel, kn=float(kn), kt=float(kt), gamman=float(gamman),
        gammat=float(gammat), xmu=float(xmu),
        limit_damping=bool(limit_damping), freeze_bit=int(freeze_bit),
        exclude_bits=tuple(excl), dt=float(dt), cap=cap, rowlen=rowlen,
        zero_seg=zero_seg)
    f, tq, stags_new, shear_new = pl.pallas_call(
        kern,
        grid=(nz, ny, 3),
        in_specs=[bi(12), bi(1), bi(KH), bi(3 * KH), bj(12), bj(2)],
        out_specs=[bi(3), bi(3), bi(KH), bi(3 * KH)],
        out_shape=[jax.ShapeDtypeStruct((3,) + gshape, f32),
                   jax.ShapeDtypeStruct((3,) + gshape, f32),
                   jax.ShapeDtypeStruct((KH,) + gshape, jnp.int32),
                   jax.ShapeDtypeStruct((3 * KH,) + gshape, f32)],
        scratch_shapes=[pltpu.VMEM((1, 1, 1, nx, cap), jnp.int32)],
    )(ifl, igm, istags, ishear, jf_all, ji_all)
    fout = jnp.moveaxis(f, 0, -1).reshape(-1, 3).astype(x.dtype)
    tout = jnp.moveaxis(tq, 0, -1).reshape(-1, 3).astype(x.dtype)
    stags_out = jnp.moveaxis(stags_new, 0, -1).reshape(-1, KH)
    shear_out = jnp.moveaxis(shear_new, 0, -1).reshape(-1, KH, 3) \
        .astype(x.dtype)
    return fout, tout, stags_out, shear_out
