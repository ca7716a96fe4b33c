"""NEMD and thermal fixes: thermal/conductivity, viscosity (the
Muller-Plathe reverse-NEMD swaps), heat, oneway, vector.

All are end_of_step fixes in the reference; here they run as host fixes
at their Nevery segment boundaries — the run loop applies host
end_of_step fixes BEFORE thermo/dump output, exactly the reference's
Verlet::run ordering, so swapped velocities land in the same step's
thermo.  The swaps are fully deterministic (no RNG), so trajectories
match the reference digit for digit.

References: src/fix_thermal_conductivity.cpp,
src/EXTRA-FIX/fix_viscosity.cpp, src/fix_heat.cpp,
src/EXTRA-FIX/fix_oneway.cpp, src/fix_vector.cpp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpumd.md.fixes import Fix

BIG = 1.0e10  # fix_viscosity.cpp:35 / fix_thermal_conductivity.cpp:32


def _get(sim):
    s = sim._carry[0]
    x = np.asarray(jax.device_get(s.x), np.float64)
    v = np.array(jax.device_get(s.v), np.float64)
    typ = np.asarray(jax.device_get(s.type))
    m = (np.asarray(jax.device_get(s.rmass), np.float64)
         if s.rmass is not None else sim.mass[typ])
    return s, x, v, m


def _put_v(sim, s, v):
    s2 = s.replace(v=jnp.asarray(v, s.v.dtype))
    sim._carry = (s2,) + tuple(sim._carry[1:])
    sim.state = s2


def _groupsel(sim, s, groupbit):
    typ = np.asarray(jax.device_get(s.type))
    sel = typ > 0
    if groupbit != 1:
        gm = np.asarray(jax.device_get(s.gmask))
        sel = sel & ((gm & groupbit) > 0)
    return sel


class FixThermalConductivity(Fix):
    """Muller-Plathe heat-flux swaps: every N steps exchange the full
    velocity of the hottest atom in the cold slab (bin 0) with the
    coldest atom in the hot slab (bin nbin/2), momentum-conserving via
    the pair's COM frame (fix_thermal_conductivity.cpp:140-260).
    Accumulated exchanged KE is the fix's scalar (for kappa)."""

    name = "thermal/conductivity"

    def __init__(self, nevery, edim, nbin, nswap=1):
        self.nevery = int(nevery)
        self.host_every = self.nevery
        self.edim = {"x": 0, "y": 1, "z": 2}[edim]
        self.nbin = int(nbin)
        if self.nbin % 2 or self.nbin <= 2:
            raise ValueError("fix thermal/conductivity nbin must be even > 2")
        self.nswap = int(nswap)
        self.e_exchange = 0.0

    def output(self, sim):
        return self.e_exchange

    def host_end_of_step(self, sim):
        s, x, v, m = _get(sim)
        lo = float(np.asarray(jax.device_get(s.box.lo))[self.edim])
        hi = float(np.asarray(jax.device_get(s.box.hi))[self.edim])
        prd = hi - lo
        binsize = prd / self.nbin
        sel = _groupsel(sim, s, self.groupbit)
        coord = x[:, self.edim].copy()
        coord = np.where(coord < lo, coord + prd, coord)
        coord = np.where(coord >= hi, coord - prd, coord)
        ke = 0.5 * m * (v * v).sum(1)
        in_lo = sel & (coord >= lo) & (coord < lo + binsize)
        in_hi = sel & (coord >= lo + (self.nbin // 2) * binsize) \
            & (coord < lo + (self.nbin // 2 + 1) * binsize)
        # hottest in the lo slab, coldest in the hi slab (stable order
        # ties resolve like the reference's storage-order insertion)
        # hottest in the lo slab, coldest in the hi slab; stable order
        # matches the reference's strict-improvement admission for ties
        lo_idx = np.nonzero(in_lo)[0]
        hi_idx = np.nonzero(in_hi)[0]
        lo_idx = lo_idx[np.argsort(-ke[lo_idx], kind="stable")][:self.nswap]
        hi_idx = hi_idx[np.argsort(ke[hi_idx], kind="stable")][:self.nswap]
        npair = min(len(lo_idx), len(hi_idx))
        if npair == 0:
            return
        eswap = 0.0
        for i, j in zip(lo_idx[:npair], hi_idx[:npair]):
            mi_, mj = m[i], m[j]
            vcm = (mi_ * v[i] + mj * v[j]) / (mi_ + mj)
            vi_old = v[i].copy()
            vj_old = v[j].copy()
            v[j] = 2.0 * vcm - vj_old
            v[i] = 2.0 * vcm - vi_old
            eswap += mj * np.dot(vcm, vcm - vj_old)
            eswap -= mi_ * np.dot(vcm, vcm - vi_old)
        self.e_exchange += sim.units.mvv2e * eswap
        _put_v(sim, s, v)


class FixViscosity(Fix):
    """Muller-Plathe momentum-flux swaps: exchange the vdim velocity
    component of the atom closest to +vtarget in the lo slab with the
    atom closest to -vtarget in the hi slab
    (src/EXTRA-FIX/fix_viscosity.cpp:150-280)."""

    name = "viscosity"

    def __init__(self, nevery, vdim, pdim, nbin, nswap=1, vtarget=BIG):
        self.nevery = int(nevery)
        self.host_every = self.nevery
        self.vdim = {"x": 0, "y": 1, "z": 2}[vdim]
        self.pdim = {"x": 0, "y": 1, "z": 2}[pdim]
        self.nbin = int(nbin)
        if self.nbin % 2 or self.nbin <= 2:
            raise ValueError("fix viscosity nbin must be even > 2")
        self.nswap = int(nswap)
        self.vtarget = float(vtarget)
        self.p_exchange = 0.0

    def output(self, sim):
        return self.p_exchange

    def host_end_of_step(self, sim):
        s, x, v, m = _get(sim)
        lo = float(np.asarray(jax.device_get(s.box.lo))[self.pdim])
        hi = float(np.asarray(jax.device_get(s.box.hi))[self.pdim])
        prd = hi - lo
        binsize = prd / self.nbin
        sel = _groupsel(sim, s, self.groupbit)
        coord = x[:, self.pdim].copy()
        coord = np.where(coord < lo, coord + prd, coord)
        coord = np.where(coord >= hi, coord - prd, coord)
        vv = v[:, self.vdim]
        in_lo = sel & (coord >= lo) & (coord < lo + binsize) & (vv >= 0.0)
        in_hi = sel & (coord >= lo + (self.nbin // 2) * binsize) \
            & (coord < lo + (self.nbin // 2 + 1) * binsize) & (vv <= 0.0)
        # closest to +/-vtarget; the default vtarget is the reference's
        # BIG=1e10 (NOT inf): |v - 1e10| stays resolvable at double
        # precision, so the pick is effectively the extreme velocity
        pos_idx = np.nonzero(in_lo)[0]
        neg_idx = np.nonzero(in_hi)[0]
        pos_idx = pos_idx[np.argsort(np.abs(vv[pos_idx] - self.vtarget),
                                     kind="stable")][:self.nswap]
        neg_idx = neg_idx[np.argsort(np.abs(vv[neg_idx] + self.vtarget),
                                     kind="stable")][:self.nswap]
        npair = min(len(pos_idx), len(neg_idx))
        if npair == 0:
            return
        pswap = 0.0
        for ipos, ineg in zip(pos_idx[:npair], neg_idx[:npair]):
            mp, mn = m[ipos], m[ineg]
            vp, vn = vv[ipos], vv[ineg]
            vcm = (mn * vn + mp * vp) / (mn + mp)
            v[ineg, self.vdim] = 2.0 * vcm - vn
            v[ipos, self.vdim] = 2.0 * vcm - vp
            pswap += mp * (vcm - vp) - mn * (vcm - vn)
        self.p_exchange += pswap
        _put_v(sim, s, v)


class FixHeat(Fix):
    """fix heat: add/subtract a constant heat flux by velocity rescale
    about the group COM velocity (src/fix_heat.cpp:140-200, constant
    style)."""

    name = "heat"

    def __init__(self, nevery, flux):
        self.nevery = int(nevery)
        self.host_every = self.nevery
        self.flux = float(flux)

    def host_end_of_step(self, sim):
        s, x, v, m = _get(sim)
        sel = _groupsel(sim, s, self.groupbit)
        u = sim.units
        masstotal = m[sel].sum()
        ke = 0.5 * (m[sel] * (v[sel] ** 2).sum(1)).sum() \
            * u.mvv2e * u.ftm2v
        vcm = (m[sel, None] * v[sel]).sum(0) / masstotal
        vcmsq = float(np.dot(vcm, vcm))
        heat = self.flux * self.nevery * sim.dt * u.ftm2v
        denom = ke - 0.5 * vcmsq * masstotal
        escale = (ke + heat - 0.5 * vcmsq * masstotal) / denom
        if escale < 0.0:
            raise ValueError("Fix heat kinetic energy went negative")
        scale = np.sqrt(escale)
        vsub = (scale - 1.0) * vcm
        v[sel] = scale * v[sel] - vsub
        _put_v(sim, s, v)


class FixOneway(Fix):
    """fix oneway: flip wrong-direction velocity components of atoms
    inside a region (src/EXTRA-FIX/fix_oneway.cpp end_of_step)."""

    name = "oneway"

    def __init__(self, nevery, region, direction):
        self.nevery = int(nevery)
        self.host_every = self.nevery
        self.region = region
        d = direction.lower()
        self.dim = {"x": 0, "y": 1, "z": 2}[d[-1]]
        self.minus = d.startswith("-")

    def host_end_of_step(self, sim):
        s, x, v, m = _get(sim)
        sel = _groupsel(sim, s, self.groupbit)
        inside = self.region.inside(x)
        sel = sel & inside
        comp = v[:, self.dim]
        if self.minus:
            flip = sel & (comp > 0.0)
        else:
            flip = sel & (comp < 0.0)
        v[flip, self.dim] = -comp[flip]
        _put_v(sim, s, v)


class FixVector(Fix):
    """fix vector: accumulate global values every Nevery steps into a
    growing table (src/fix_vector.cpp); rows readable as f_ID[i] /
    columns as a time series."""

    name = "vector"

    def __init__(self, nevery, inputs):
        self.nevery = int(nevery)
        self.host_every = self.nevery
        self.inputs = list(inputs)
        self.table: list[list[float]] = []

    def _value(self, sim, name):
        if name.startswith("c_"):
            base = name[2:]
            col = None
            if "[" in base:
                base, rest = base.split("[", 1)
                col = int(rest.rstrip("]")) - 1
            out = sim.computes[base].evaluate(sim)
            out = np.asarray(out)
            return float(out if col is None and out.ndim == 0
                         else (out[col] if col is not None else out))
        if name.startswith("v_"):
            return float(sim.script.evaluate_variable(name[2:]))
        if name.startswith("f_"):
            base = name[2:].split("[")[0]
            for fx in sim.fixes:
                if getattr(fx, "id", None) == base:
                    return float(fx.output(sim))
            raise ValueError(f"fix vector input {name!r} not found")
        return float(sim.thermo_values()[name])

    def host_end_of_step(self, sim):
        self.table.append([self._value(sim, nm) for nm in self.inputs])
