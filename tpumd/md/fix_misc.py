"""Common small fixes: setforce, addforce, spring/self, viscous,
momentum, temp/rescale, temp/berendsen, press/berendsen (isotropic),
gravity, efield.

Physics per the corresponding reference fixes (src/fix_setforce.cpp,
fix_addforce.cpp, fix_spring_self.cpp, fix_viscous.cpp,
fix_momentum.cpp, fix_temp_rescale.cpp, fix_temp_berendsen.cpp).
Group support: fixes act on atoms whose group mask matches (currently
"all" or a type-based group).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpumd.md import computes
from tpumd.md.fixes import Fix


def _valid(s):
    return (s.type > 0)[:, None]


class FixSetForce(Fix):
    """Zero/override force components each step (NULL keeps)."""

    name = "setforce"

    def __init__(self, fx, fy, fz):
        self.target = (fx, fy, fz)  # float or None (NULL)

    def post_force(self, s, fstate, ctx, xin=None):
        f = s.f
        for d, val in enumerate(self.target):
            if val is not None:
                f = f.at[:, d].set(jnp.where(self.group_sel(s), val, f[:, d]))
        return s.replace(f=f), fstate

    def post_force_respa_lower(self, s, fstate, ctx):
        """Inner respa levels: zero the constrained components so inner
        kicks don't reintroduce force (FixSetForce::post_force_respa,
        src/fix_setforce.cpp: non-top levels set the group's force to
        zero regardless of the target values)."""
        f = s.f
        for d, val in enumerate(self.target):
            if val is not None:
                f = f.at[:, d].set(jnp.where(self.group_sel(s), 0.0,
                                             f[:, d]))
        return s.replace(f=f), fstate


class FixAddForce(Fix):
    name = "addforce"

    def __init__(self, fx, fy, fz):
        self.add = (fx, fy, fz)

    def post_force(self, s, fstate, ctx, xin=None):
        add = jnp.asarray(self.add, s.x.dtype)
        f = s.f + jnp.where(self.group_sel(s)[:, None], add[None, :], 0.0)
        return s.replace(f=f), fstate


class FixSpringSelf(Fix):
    """Tether each atom to its original position: f -= k (x - x0)."""

    name = "spring/self"
    peratom_state = True      # x0 rides cell-grid slot permutations

    def __init__(self, k):
        self.k = float(k)

    def init_state(self, s, ctx):
        return s.x  # x0

    def post_force(self, s, fstate, ctx, xin=None):
        f = s.f - jnp.where(self.group_sel(s)[:, None], self.k * (s.x - fstate), 0.0)
        return s.replace(f=f), fstate


class FixViscous(Fix):
    """Drag force f -= gamma v (src/fix_viscous.cpp)."""

    name = "viscous"

    def __init__(self, gamma):
        self.gamma = float(gamma)

    def post_force(self, s, fstate, ctx, xin=None):
        f = s.f - jnp.where(self.group_sel(s)[:, None], self.gamma * s.v, 0.0)
        return s.replace(f=f), fstate


class FixMomentum(Fix):
    """Zero linear momentum every N steps (src/fix_momentum.cpp)."""

    name = "momentum"
    needs_step = True

    def __init__(self, every=1):
        self.every = max(int(every), 1)

    def init_state(self, s, ctx):
        return jnp.zeros((), jnp.int32)  # current step (set by the loop)

    def set_step(self, fstate, istep):
        return istep

    def end_of_step(self, s, fstate, ctx):
        apply = (fstate % self.every) == 0
        m = ctx.mass_per_atom(s)
        valid = self.group_sel(s)
        mm = jnp.where(valid, m, 0.0)
        p = jnp.sum(mm[:, None] * s.v, axis=0)
        vcm = p / jnp.sum(mm)
        v = jnp.where(apply & valid[:, None], s.v - vcm[None, :], s.v)
        return s.replace(v=v), fstate


class FixTempRescale(Fix):
    """Hard velocity rescale toward target T inside a window
    (src/fix_temp_rescale.cpp)."""

    name = "temp/rescale"

    def __init__(self, every, t_start, t_stop, window, fraction):
        self.every = int(every)
        self.t_start = float(t_start)
        self.t_stop = float(t_stop)
        self.window = float(window)
        self.fraction = float(fraction)

    def end_of_step(self, s, fstate, ctx):
        u = ctx.units
        m = ctx.mass_per_atom(s)
        t = computes.temperature(s.v, m, ctx.tdof, u.boltz, u.mvv2e)
        t_target = self.t_start
        out = jnp.abs(t - t_target) > self.window
        lamda = jnp.sqrt(jnp.maximum(
            1.0 + self.fraction * (t_target / jnp.maximum(t, 1e-30) - 1.0),
            0.0))
        factor = jnp.where(out & (t > 0), lamda, 1.0)
        return s.replace(v=s.v * factor), fstate


class FixTempBerendsen(Fix):
    """Berendsen weak-coupling thermostat (src/fix_temp_berendsen.cpp)."""

    name = "temp/berendsen"

    def __init__(self, t_start, t_stop, damp):
        self.t_start = float(t_start)
        self.t_stop = float(t_stop)
        self.damp = float(damp)

    def end_of_step(self, s, fstate, ctx):
        u = ctx.units
        m = ctx.mass_per_atom(s)
        t = computes.temperature(s.v, m, ctx.tdof, u.boltz, u.mvv2e)
        lamda = jnp.sqrt(jnp.maximum(
            1.0 + ctx.dt / self.damp
            * (self.t_start / jnp.maximum(t, 1e-30) - 1.0), 0.0))
        factor = jnp.where(t > 0, lamda, 1.0)
        return s.replace(v=s.v * factor), fstate


class FixPressBerendsen(Fix):
    """Berendsen weak-coupling barostat (src/fix_press_berendsen.cpp):
    each end_of_step dilates the box per flagged dim by
    mu = (1 - dt/P_period (P_target - P) / bulkmodulus)^(1/3) about the
    box center and rescales atom lamda coords; no velocity scaling.
    Orthogonal boxes only (as the reference)."""

    name = "press/berendsen"
    needs_step = True
    needs_virial = True
    box_change = True
    eos_box_change = True

    def __init__(self, p_flags, p_start, p_stop, p_period,
                 modulus=10.0, couple=False):
        self.p_flags = tuple(p_flags)        # per-dim bool
        self.p_start = tuple(p_start)
        self.p_stop = tuple(p_stop)
        self.p_period = tuple(p_period)
        self.modulus = float(modulus)
        self.couple = bool(couple)           # xyz/iso -> scalar pressure

    def init_state(self, s, ctx):
        z = jnp.zeros((), jnp.int32)
        return {"step": z, "begin": z, "end": z,
                "virial": jnp.zeros((6,), s.x.dtype)}

    def set_step(self, fstate, istep):
        return {**fstate, "step": istep}

    def pre_run(self, fstate, begin, end):
        return {**fstate, "begin": jnp.asarray(begin, jnp.int32),
                "end": jnp.asarray(end, jnp.int32)}

    def save_virial(self, fstate, virial):
        return {**fstate, "virial": virial}

    def end_of_step(self, s, fst, ctx):
        dt_ = s.x.dtype
        u = ctx.units
        m = ctx.mass_per_atom(s)
        mvv = u.mvv2e * jnp.sum(m[:, None] * s.v * s.v, axis=0)
        vol = s.box.volume
        p_cur = (mvv + fst["virial"][:3]) / vol * u.nktv2p
        if self.couple:
            p_cur = jnp.full((3,), jnp.sum(p_cur) / 3.0, dt_)
        num = (fst["step"] - fst["begin"]).astype(dt_)
        den = jnp.maximum((fst["end"] - fst["begin"]).astype(dt_), 1.0)
        delta = num / den
        box = s.box
        lam = (s.x - box.lo) / box.lengths
        lo, hi = [], []
        for d in range(3):
            lo_d, hi_d = box.lo[d], box.hi[d]
            if self.p_flags[d]:
                tgt = self.p_start[d] + delta \
                    * (self.p_stop[d] - self.p_start[d])
                dil = (1.0 - ctx.dt / self.p_period[d]
                       * (tgt - p_cur[d]) / self.modulus) ** (1.0 / 3.0)
                ctr = 0.5 * (lo_d + hi_d)
                lo_d = (lo_d - ctr) * dil + ctr
                hi_d = (hi_d - ctr) * dil + ctr
            lo.append(lo_d)
            hi.append(hi_d)
        lo = jnp.stack(lo)
        hi = jnp.stack(hi)
        x = lo + lam * (hi - lo)
        return s.replace(x=x, box=box.replace(lo=lo, hi=hi)), fst


class FixSpring(Fix):
    """fix spring tether K x y z R0: restoring force on the group COM,
    distributed mass-weighted over the group (src/fix_spring.cpp
    spring_tether); NULL pins no force in that component."""

    name = "spring"
    thermo_scalar = True

    def __init__(self, k, xc, yc, zc, r0):
        self.k = float(k)
        self.pt = (xc, yc, zc)  # floats or None (NULL)
        self.r0 = float(r0)
        self.espring = 0.0

    def post_force(self, s, fstate, ctx, xin=None):
        sel = self.group_sel(s)
        m = ctx.mass_per_atom(s)
        mm = jnp.where(sel, m, 0.0)
        mtot = jnp.sum(mm)
        xcm = jnp.sum(mm[:, None] * s.x, axis=0) / mtot
        d = jnp.stack([xcm[c] - self.pt[c] if self.pt[c] is not None
                       else jnp.zeros((), s.x.dtype) for c in range(3)])
        r = jnp.maximum(jnp.linalg.norm(d), 1e-10)
        dr = r - self.r0
        fvec = self.k * d * dr / r          # total force magnitude
        fper = fvec / jnp.maximum(mtot, 1e-30)
        f = s.f - jnp.where(sel[:, None], fper[None, :] * m[:, None], 0.0)
        return s.replace(f=f), fstate


class FixEfield(Fix):
    """fix efield Ex Ey Ez: f += qE (src/fix_efield.cpp CONSTANT);
    field values are pre-scaled by qe2f at parse time."""

    name = "efield"

    def __init__(self, ex, ey, ez):
        self.e = (float(ex), float(ey), float(ez))

    def post_force(self, s, fstate, ctx, xin=None):
        if s.q is None:
            return s, fstate
        e = jnp.asarray(self.e, s.x.dtype)
        add = s.q[:, None] * e[None, :]
        f = s.f + jnp.where(self.group_sel(s)[:, None], add, 0.0)
        return s.replace(f=f), fstate


class FixDrag(Fix):
    """fix drag x y z fmag delta: constant-magnitude force toward a
    point for atoms beyond delta (src/EXTRA-FIX/fix_drag.cpp); NULL
    components excluded."""

    name = "drag"

    def __init__(self, xc, yc, zc, fmag, delta):
        self.pt = (xc, yc, zc)
        self.fmag = float(fmag)
        self.delta = float(delta)

    def post_force(self, s, fstate, ctx, xin=None):
        from tpumd.core.state import minimum_image
        d = jnp.stack(
            [s.x[:, c] - self.pt[c] if self.pt[c] is not None
             else jnp.zeros_like(s.x[:, c]) for c in range(3)], axis=1)
        d = minimum_image(d, s.box)
        r = jnp.linalg.norm(d, axis=1)
        apply = self.group_sel(s) & (r > self.delta)
        pre = self.fmag / jnp.maximum(r, 1e-30)
        f = s.f - jnp.where(apply[:, None], pre[:, None] * d, 0.0)
        return s.replace(f=f), fstate


class FixRecenter(Fix):
    """fix recenter x y z: shift group coords each step so the group COM
    sits at the target (INIT = COM at setup); src/fix_recenter.cpp —
    runs after initial_integrate, box units only."""

    name = "recenter"

    def __init__(self, xc, yc, zc):
        self.pt = [None if v in ("NULL",) else v for v in (xc, yc, zc)]

    def init_state(self, s, ctx):
        sel = self.group_sel(s)
        m = ctx.mass_per_atom(s)
        mm = jnp.where(sel, m, 0.0)
        xcm = jnp.sum(mm[:, None] * s.x, axis=0) / jnp.sum(mm)
        target = jnp.stack([
            xcm[c] if self.pt[c] in (None, "INIT")
            else jnp.asarray(float(self.pt[c]), s.x.dtype)
            for c in range(3)])
        mask = jnp.asarray([0.0 if self.pt[c] is None else 1.0
                            for c in range(3)], s.x.dtype)
        return (target, mask)

    def post_integrate(self, s, fstate, ctx):
        target, mask = fstate
        sel = self.group_sel(s)
        m = ctx.mass_per_atom(s)
        mm = jnp.where(sel, m, 0.0)
        xcm = jnp.sum(mm[:, None] * s.x, axis=0) / jnp.sum(mm)
        shift = (target - xcm) * mask
        x = s.x + jnp.where(sel[:, None], shift[None, :], 0.0)
        return s.replace(x=x), fstate


class FixAveForce(Fix):
    """fix aveforce fx fy fz: same resultant force on every group atom =
    group average plus the given value (src/fix_aveforce.cpp); NULL
    leaves that component's individual forces."""

    name = "aveforce"

    def __init__(self, fx, fy, fz):
        self.add = (fx, fy, fz)

    def post_force(self, s, fstate, ctx, xin=None):
        sel = self.group_sel(s)
        n = jnp.maximum(jnp.sum(sel.astype(s.x.dtype)), 1.0)
        f = s.f
        for c, val in enumerate(self.add):
            if val is None:
                continue
            ave = jnp.sum(jnp.where(sel, f[:, c], 0.0)) / n
            f = f.at[:, c].set(jnp.where(sel, ave + val, f[:, c]))
        return s.replace(f=f), fstate


class FixPlaneForce(Fix):
    """fix planeforce nx ny nz: keep forces in the plane normal to n
    (src/fix_planeforce.cpp)."""

    name = "planeforce"

    def __init__(self, nx, ny, nz):
        n = np.asarray([nx, ny, nz], np.float64)
        self.n = n / np.linalg.norm(n)

    def post_force(self, s, fstate, ctx, xin=None):
        n = jnp.asarray(self.n, s.x.dtype)
        dot = s.f @ n
        f = s.f - jnp.where(self.group_sel(s)[:, None],
                            dot[:, None] * n[None, :], 0.0)
        return s.replace(f=f), fstate


class FixLineForce(Fix):
    """fix lineforce dx dy dz: keep only the force component along d
    (src/fix_lineforce.cpp)."""

    name = "lineforce"

    def __init__(self, dx, dy, dz):
        d = np.asarray([dx, dy, dz], np.float64)
        self.d = d / np.linalg.norm(d)

    def post_force(self, s, fstate, ctx, xin=None):
        d = jnp.asarray(self.d, s.x.dtype)
        dot = s.f @ d
        proj = dot[:, None] * d[None, :]
        f = jnp.where(self.group_sel(s)[:, None], proj, s.f)
        return s.replace(f=f), fstate


class FixIndent(Fix):
    """fix indent K sphere x y z R [side out|in]: repulsive spherical
    indenter F = -k dr^2 (src/fix_indent.cpp:215-250)."""

    name = "indent"

    def __init__(self, k, xc, yc, zc, radius, side="out"):
        self.k = float(k)
        self.ctr = (float(xc), float(yc), float(zc))
        self.radius = float(radius)
        self.side = side

    def post_force(self, s, fstate, ctx, xin=None):
        from tpumd.core.state import minimum_image
        d = s.x - jnp.asarray(self.ctr, s.x.dtype)[None, :]
        d = minimum_image(d, s.box)
        r = jnp.maximum(jnp.linalg.norm(d, axis=1), 1e-30)
        if self.side == "out":
            dr = r - self.radius
            fmag = self.k * dr * dr
        else:
            dr = self.radius - r
            fmag = -self.k * dr * dr
        apply = self.group_sel(s) & (dr < 0.0)
        f = s.f + jnp.where(apply[:, None], (fmag / r)[:, None] * d, 0.0)
        return s.replace(f=f), fstate


class FixEnforce2D(Fix):
    """fix enforce2d: zero the z force and velocity each step (and the
    xy angular components on sphere atoms) so a `dimension 2` run stays
    planar (src/fix_enforce2d.cpp:86-118)."""

    name = "enforce2d"

    def post_force(self, s, fstate, ctx, xin=None):
        sel = self.group_sel(s)
        f = s.f.at[:, 2].set(jnp.where(sel, 0.0, s.f[:, 2]))
        v = s.v.at[:, 2].set(jnp.where(sel, 0.0, s.v[:, 2]))
        s = s.replace(f=f, v=v)
        if s.omega is not None:
            om = jnp.where(sel[:, None],
                           s.omega * jnp.asarray([0.0, 0.0, 1.0],
                                                 s.omega.dtype),
                           s.omega)
            s = s.replace(omega=om)
        if s.torque is not None:
            tq = jnp.where(sel[:, None],
                           s.torque * jnp.asarray([0.0, 0.0, 1.0],
                                                  s.torque.dtype),
                           s.torque)
            s = s.replace(torque=tq)
        return s, fstate


class FixBalance(Fix):
    """fix balance N thresh rcb|shift [dims]: periodic host-side
    rebalance (src/fix_balance.cpp) — when the equal-count row blocks'
    spatial imbalance exceeds thresh, re-run the RCB/shift reorder."""

    name = "balance"

    def __init__(self, nevery, thresh, style, dims=""):
        self.host_every = max(int(nevery), 1)
        self.thresh = float(thresh)
        self.style = style
        self.dims = dims
        self.last = (1.0, 1.0)

    def host_end_of_step(self, sim):
        import jax as _jax
        from tpumd.parallel.balance import slab_imbalance, balance_atoms
        x = np.asarray(_jax.device_get(sim.state.x), np.float64)
        nparts = max(len(_jax.devices()), 1)
        cur = slab_imbalance(x, np.arange(len(x)), nparts)
        if cur > self.thresh:
            self.last = balance_atoms(sim, self.style, dims=self.dims)
