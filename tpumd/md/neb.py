"""Nudged elastic band (neb command) — climbing-image NEB over a
replica lane axis (src/REPLICA/neb.cpp, src/REPLICA/fix_neb.cpp).

The reference runs one replica per MPI partition and exchanges
neighbor-image coordinates point-to-point (fix_neb.cpp
inter_replica_comm).  Here the whole band is ONE stacked computation:
replica coordinates live on a leading lane axis (R, N, 3), per-image
forces/energies come from a vmapped force evaluation, and the NEB
projection (upwind tangent, parallel spring, climbing image) is plain
batched array math with lane rolls standing in for the inter-replica
sends.  Damped-dynamics minimization is a batched FIRE loop (the
reference requires min_style quickmin/fire for neb, min_fire.cpp), so
N1+N2 iterations compile to a handful of fixed-shape device programs
and the host only checks convergence every ``nevery`` steps.

Physics matched to fix_neb.cpp (default options: mode=neigh,
kspringPerp=0, fixed ends):
- upwind tangent selection by neighbor-image energies
  (fix_neb.cpp:336-420), normalized by the per-image global norm;
- interior prefactor  -F.t + kspring*(nlen - plen)   (:566)
- climbing image      -2 (F.t)                        (:564)
- endpoint images keep their true forces (:470 "no change to forces").

The band runs on the matrix engine: its row order is stable across
neighbor rebuilds, so lane k's atom i is lane j's atom i (the cell-grid
engine re-permutes slots per lane, which would misalign the band).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from tpumd.md.minimize import FIRE_PARAMS
from tpumd.md.verlet import compute_forces
from tpumd.ops import neighbor as nb


def read_neb_file(path: str, natoms: int):
    """Parse the NEB final-coordinates file: one count line, then
    'ID x y z' rows (NEB::readfile, src/REPLICA/neb.cpp:446-533).
    Returns (tags, coords) numpy arrays."""
    rows = []
    count = None
    with open(path) as fh:
        for raw in fh:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            t = line.split()
            if count is None:
                count = int(t[0])
                continue
            rows.append((int(t[0]), float(t[1]), float(t[2]), float(t[3])))
    if count is None or len(rows) < count:
        raise ValueError(f"incorrectly formatted NEB file {path!r}")
    rows = rows[:count]
    tags = np.asarray([r[0] for r in rows], np.int64)
    xyz = np.asarray([r[1:] for r in rows], np.float64)
    return tags, xyz


def _min_image(d, box):
    L = box.lengths
    per = jnp.asarray(box.periodic)
    shift = jnp.round(d / L)
    return d - jnp.where(per, shift * L, 0.0)


def _neb_project(x, f, veng, box, gsel, kspring, climber):
    """Apply the NEB force projection to the stacked band.

    x, f: (R, N, 3); veng: (R,); gsel: (N,) bool NEB-group mask;
    climber: int32 lane index or -1.  Returns modified f."""
    R = x.shape[0]
    dt_ = x.dtype
    sel = gsel[None, :, None]

    xprev = jnp.roll(x, 1, axis=0)
    xnext = jnp.roll(x, -1, axis=0)
    delp = _min_image(x - xprev, box)      # x - xprev   (R, N, 3)
    deln = _min_image(xnext - x, box)      # xnext - x
    vprev = jnp.roll(veng, 1)
    vnext = jnp.roll(veng, -1)

    # upwind tangent (fix_neb.cpp:336-420) — per-image scalars broadcast
    up = (vnext > veng) & (veng > vprev)
    down = (vnext < veng) & (veng < vprev)
    dvmax = jnp.maximum(jnp.abs(vnext - veng), jnp.abs(vprev - veng))
    dvmin = jnp.minimum(jnp.abs(vnext - veng), jnp.abs(vprev - veng))
    wn = jnp.where(vnext > vprev, dvmax, dvmin)
    wp = jnp.where(vnext > vprev, dvmin, dvmax)
    mixed = jnp.where((vnext == vprev)[:, None, None],
                      deln + delp,
                      wn[:, None, None] * deln + wp[:, None, None] * delp)
    tangent = jnp.where(up[:, None, None], deln,
                        jnp.where(down[:, None, None], delp, mixed))
    tangent = jnp.where(sel, tangent, 0.0)

    def lane_norm(a):
        return jnp.sqrt(jnp.sum(a * a, axis=(1, 2)))

    plen = lane_norm(jnp.where(sel, delp, 0.0))
    nlen = lane_norm(jnp.where(sel, deln, 0.0))
    tlen = lane_norm(tangent)
    tangent = tangent / jnp.maximum(tlen, 1e-30)[:, None, None]

    dot = jnp.sum(f * tangent, axis=(1, 2))              # (R,)
    lane = jnp.arange(R)
    interior = (lane > 0) & (lane < R - 1)
    prefactor = jnp.where(lane == climber,
                          -2.0 * dot,
                          -dot + kspring * (nlen - plen)).astype(dt_)
    fneb = f + prefactor[:, None, None] * tangent
    return jnp.where(interior[:, None, None] & sel, fneb, f)


def neb(sim, etol, ftol, n1, n2, nevery, final_tags, final_xyz,
        kspring=1.0, nreplica=None, log=print):
    """Run the two-stage CI-NEB (NEB::run, src/REPLICA/neb.cpp:200-380).

    Returns a dict with per-replica energies, reaction coordinates, EBF
    and EBR after each stage."""
    if sim._ctx is None:
        sim.setup()
    ctx = sim._ctx
    if ctx.is_cellgrid:
        raise ValueError("neb requires the matrix engine (small systems);"
                         " set TPUMD_ENGINE=matrix")
    if nreplica is None or nreplica < 3:
        raise ValueError("neb needs >= 3 replicas")
    R = nreplica
    # interpolated images squeeze the hopping atoms past their
    # neighbors: grow the per-atom neighbor cap up front so mid-path
    # configurations cannot silently overflow (dropped pairs read as
    # spuriously LOW energies and destroy the band)
    sim._kmax_override = int(ctx.neigh_cfg.kmax * 1.5) + 16
    sim._rebuild_ctx(sim._carry)
    ctx = sim._ctx
    s0, neigh0 = sim._carry[0], sim._carry[1]
    box = s0.box
    dt_ = s0.x.dtype
    N = s0.x.shape[0]

    # NEB group: atoms of the `fix ID group neb` group
    gsel = jnp.asarray(sim.neb_gsel, bool) if hasattr(sim, "neb_gsel") \
        else jnp.ones((N,), bool)

    # build the band: linear interpolation along the min-image
    # displacement to the final coords (NEB::readfile:533-560)
    tag_h = np.asarray(jax.device_get(s0.tag))
    x0_h = np.asarray(jax.device_get(s0.x), np.float64)
    dx = np.zeros_like(x0_h)
    row_of_tag = {int(t): i for i, t in enumerate(tag_h)}
    Lh = np.asarray(jax.device_get(box.lengths), np.float64)
    per = np.asarray(box.periodic)
    for t, xyz in zip(final_tags, final_xyz):
        i = row_of_tag.get(int(t))
        if i is None:
            raise ValueError(f"invalid atom ID {t} in NEB file")
        d = xyz - x0_h[i]
        shift = np.round(d / Lh)
        dx[i] = d - np.where(per, shift * Lh, 0.0)
    fracs = np.arange(R, dtype=np.float64) / (R - 1)
    xs_h = x0_h[None] + fracs[:, None, None] * dx[None]
    lo_h = np.asarray(jax.device_get(box.lo), np.float64)
    shift = np.floor((xs_h - lo_h) / Lh) * np.where(per, 1.0, 0.0)
    xs = jnp.asarray(xs_h - shift * Lh, dt_)

    # per-lane state/neighbors (vmapped rebuild aligns each image's list
    # with its own coordinates; matrix idx keeps row order stable)
    import dataclasses as _dc
    cfg_band = _dc.replace(ctx.neigh_cfg,
                           cell_cap=ctx.neigh_cfg.cell_cap + 8)

    def wrap(x):
        # Domain::pbc — the band coordinates THEMSELVES stay wrapped:
        # build and force eval must see identical positions (small-box
        # multi-image lists key image slots off the given coordinates),
        # and the inter-image tangents are min-imaged anyway
        ell = box.lengths
        shift = jnp.floor((x - box.lo) / ell)
        pmask = jnp.asarray([1.0 if p else 0.0 for p in box.periodic],
                            x.dtype)
        return x - shift * pmask * ell

    def rebuild(x):
        idx, sbits, _, over = nb.build_neighbors(
            x, box, cfg_band, special_tags=s0.special_tags,
            special_codes=s0.special_codes, tag=s0.tag, gmask=s0.gmask)
        return idx, sbits, over

    def e_and_f(x, idx, sbits):
        st = s0.replace(x=x)
        ne = neigh0.replace(idx=idx, sbits=sbits)
        f, energies, _, _, _ = compute_forces(
            st, ne, ctx, eflag=True, vflag=False, consts=sim._consts)
        return f, sum(energies.values())

    m = ctx.mass_table[s0.type]
    invm = (1.0 / m)[:, None].astype(dt_)
    p = FIRE_PARAMS
    dt0 = jnp.asarray(ctx.dt, dt_)
    dmax = 0.1

    def fire_chunk(xs, vels, dts, alphas, nnegs, climber, niter):
        """niter batched FIRE iterations with NEB-projected forces."""

        def one(carry, _):
            xs, vels, dts, alphas, nnegs, ovf = carry
            idx, sbits, over = jax.vmap(rebuild)(xs)
            ovf = ovf | jnp.any(over)
            fs, vengs = jax.vmap(e_and_f)(xs, idx, sbits)
            fs = _neb_project(xs, fs, vengs, box, gsel, kspring, climber)

            v = vels + dts[:, None, None] * fs * invm[None]
            vdotf = jnp.sum(v * fs, axis=(1, 2))
            fnorm = jnp.sqrt(jnp.sum(fs * fs, axis=(1, 2)))
            vnorm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2)))
            mix = ((1.0 - alphas)[:, None, None] * v
                   + (alphas * vnorm / jnp.maximum(fnorm, 1e-30))
                   [:, None, None] * fs)
            uphill = vdotf <= 0.0
            v = jnp.where(uphill[:, None, None], 0.0, mix)
            grow = (~uphill) & (nnegs > p["delaystep"])
            dts = jnp.where(grow, jnp.minimum(dts * p["dt_grow"],
                                              p["tmax"] * dt0), dts)
            alphas = jnp.where(grow, alphas * p["alpha_shrink"], alphas)
            dts = jnp.where(uphill, dts * p["dt_shrink"], dts)
            alphas = jnp.where(uphill, jnp.asarray(p["alpha0"], dt_),
                               alphas)
            nnegs = jnp.where(uphill, 0, nnegs + 1)

            dstep = dts[:, None, None] * v
            dlen = jnp.sqrt(jnp.sum(dstep * dstep, axis=-1, keepdims=True))
            scale = jnp.minimum(1.0, dmax / jnp.maximum(dlen, 1e-30))
            xs = wrap(xs + dstep * scale)
            return (xs, v, dts, alphas, nnegs, ovf), None

        ovf0 = jnp.zeros((), bool)
        (xs, vels, dts, alphas, nnegs, ovf), _ = jax.lax.scan(
            one, (xs, vels, dts, alphas, nnegs, ovf0), None, length=niter)
        # final diagnostics at the new positions
        idx, sbits, over = jax.vmap(rebuild)(xs)
        ovf = ovf | jnp.any(over)
        fs, vengs = jax.vmap(e_and_f)(xs, idx, sbits)
        fs_neb = _neb_project(xs, fs, vengs, box, gsel, kspring, climber)
        fmax_atom = jnp.max(jnp.abs(fs_neb))
        fmax_repl = jnp.sqrt(jnp.max(jnp.sum(fs_neb * fs_neb,
                                             axis=(1, 2))))
        return xs, vels, dts, alphas, nnegs, vengs, fmax_atom, fmax_repl, \
            ovf

    chunk = jax.jit(fire_chunk, static_argnames=("niter",))

    vels = jnp.zeros_like(xs)
    dts = jnp.full((R,), ctx.dt, dt_)
    alphas = jnp.full((R,), p["alpha0"], dt_)
    nnegs = jnp.zeros((R,), jnp.int32)

    def reaction_coords(xs_h):
        rd = [0.0]
        for i in range(1, R):
            d = xs_h[i] - xs_h[i - 1]
            shift = np.round(d / Lh)
            d = d - np.where(per, shift * Lh, 0.0)
            rd.append(rd[-1] + float(np.sqrt((d * d).sum())))
        tot = rd[-1] if rd[-1] > 0 else 1.0
        return [r / tot for r in rd]

    def stage(tag, nsteps, climber):
        nonlocal xs, vels, dts, alphas, nnegs
        e_prev = None
        out = None
        log(f"NEB {tag}: Step MaxReplicaForce MaxAtomForce "
            f"EBF EBR RDn PEn ...")
        done = 0
        while done < nsteps:
            it = min(nevery, nsteps - done)
            xs, vels, dts, alphas, nnegs, vengs, fa, fr, ovf = chunk(
                xs, vels, dts, alphas, nnegs, jnp.int32(climber), niter=it)
            done += it
            if bool(jax.device_get(ovf)):
                raise RuntimeError(
                    "neb: neighbor-list overflow in a band image — "
                    "increase neigh_modify one/page headroom")
            vh = np.asarray(jax.device_get(vengs), np.float64)
            fa_h = float(jax.device_get(fa))
            fr_h = float(jax.device_get(fr))
            ebf = float(vh.max() - vh[0])
            ebr = float(vh.max() - vh[-1])
            rd = reaction_coords(np.asarray(jax.device_get(xs),
                                            np.float64))
            cols = " ".join(f"{r:.4f} {e:.6f}" for r, e in zip(rd, vh))
            log(f"NEB {tag} {done:6d} {fr_h:.6g} {fa_h:.6g} "
                f"{ebf:.8g} {ebr:.8g} {cols}")
            out = dict(step=done, fmax_atom=fa_h, fmax_replica=fr_h,
                       energies=vh.tolist(), ebf=ebf, ebr=ebr, rd=rd)
            if fa_h < ftol:
                break
            if e_prev is not None and abs(vh.max() - e_prev) \
                    < etol * max(abs(vh.max()), 1e-30):
                break
            e_prev = vh.max()
        return out

    t0 = time.perf_counter()
    res1 = stage("stage1", n1, -1)
    top = int(np.argmax(np.asarray(res1["energies"][1:-1]))) + 1
    res2 = stage("stage2(climb)", n2, top)
    res2["climber"] = top
    res2["stage1"] = res1
    res2["wall_s"] = time.perf_counter() - t0
    res2["band_x"] = np.asarray(jax.device_get(xs), np.float64)
    # leave the climbing image's configuration in the sim
    sim._carry = (s0.replace(x=xs[top]),) + tuple(sim._carry[1:])
    sim.state = sim._carry[0]
    return res2
