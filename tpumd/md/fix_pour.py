"""fix pour: pour granular particles into an insertion region.

Reimplements FixPour ATOM mode (src/GRANULAR/fix_pour.cpp): every
``nfreq`` steps (computed so the previous batch falls clear of the
insertion volume under gravity), up to ``nper`` spheres are placed at
random non-overlapping positions inside a block or z-cylinder region
and released with a downward velocity matched to free fall from the
region top.  The RanPark draw ORDER follows the reference exactly
(:363-700), so insertions are bit-identical to the binary for the same
seed.

TPU design: insertion is a HOST-side event at a scan-segment boundary —
the padded device state is compacted, the new rows are appended, and
the simulation re-setups (one recompile per insertion event; the step
itself stays a pure traced function).  This is the analog of the
reference's pre_exchange + forced reneighboring.

Limitations vs the reference: ATOM mode only (no mol/rigid/shake
templates), 3d, and at least one atom must exist before the first
insertion.
"""

from __future__ import annotations

import math

import numpy as np

from tpumd.md.fixes import Fix
from tpumd.utils.ranpark import RanPark


class FixPour(Fix):
    name = "pour"
    host_every = 0   # set to nfreq in host_setup

    def __init__(self, sim_parser, ninsert, ntype, seed, *args):
        self.ninsert = int(ninsert)
        self.ntype = int(ntype)
        self.rng = RanPark(int(seed))
        # warm-up draws (fix_pour.cpp:166)
        for _ in range(30):
            self.rng.uniform()
        self.dstyle = "one"
        self.radius_one = self.radius_max = 0.5
        self.radius_lo = self.radius_hi = 0.0
        self.radius_poly = self.frac_poly = None
        self.density_lo = self.density_hi = 1.0
        self.volfrac = 0.25
        self.maxattempt = 50
        self.rate = 0.0
        self.vxlo = self.vxhi = self.vylo = self.vyhi = self.vz = 0.0
        self.region = None
        args = list(args)
        i = 0
        while i < len(args):
            k = args[i]
            if k == "region":
                self.region = sim_parser.regions[args[i + 1]]
                i += 2
            elif k == "diam":
                if args[i + 1] == "one":
                    self.dstyle = "one"
                    self.radius_one = 0.5 * float(args[i + 2])
                    self.radius_max = self.radius_one
                    i += 3
                elif args[i + 1] == "range":
                    self.dstyle = "range"
                    self.radius_lo = 0.5 * float(args[i + 2])
                    self.radius_hi = 0.5 * float(args[i + 3])
                    self.radius_max = self.radius_hi
                    i += 4
                elif args[i + 1] == "poly":
                    self.dstyle = "poly"
                    npoly = int(args[i + 2])
                    vals = [float(v) for v in args[i + 3:i + 3 + 2 * npoly]]
                    self.radius_poly = [0.5 * v for v in vals[0::2]]
                    self.frac_poly = vals[1::2]
                    self.radius_max = max(self.radius_poly)
                    i += 3 + 2 * npoly
                else:
                    raise ValueError("fix pour diam style")
            elif k == "dens":
                self.density_lo = float(args[i + 1])
                self.density_hi = float(args[i + 2])
                i += 3
            elif k == "vol":
                self.volfrac = float(args[i + 1])
                self.maxattempt = int(args[i + 2])
                i += 3
            elif k == "rate":
                self.rate = float(args[i + 1])
                i += 2
            elif k == "vel":
                self.vxlo, self.vxhi = float(args[i + 1]), float(args[i + 2])
                self.vylo, self.vyhi = float(args[i + 3]), float(args[i + 4])
                self.vz = float(args[i + 5])
                i += 6
            else:
                raise ValueError(f"fix pour keyword {k!r} not supported")
        if self.region is None:
            raise ValueError("Must specify a region in fix pour")
        from tpumd.core.region import BlockRegion, CylinderRegion
        if isinstance(self.region, BlockRegion):
            self.region_style = 1
            self.xlo, self.ylo, self.zlo = self.region.lo
            self.xhi, self.yhi, self.zhi = self.region.hi
        elif isinstance(self.region, CylinderRegion) \
                and self.region.dim == 2:
            self.region_style = 2
            self.xc, self.yc = self.region.c1, self.region.c2
            self.rc = self.region.radius
            self.zlo, self.zhi = self.region.lo, self.region.hi
        else:
            raise ValueError(
                "Must use a block or z-cylinder region with fix pour")
        self._ninserted = 0
        self._pending_first = True

    # ------------------------------------------------------------ setup
    def host_setup(self, sim):
        if hasattr(self, "nper"):
            return
        # grav = z acceleration in force units (fix_pour.cpp:175-203);
        # requires fix gravity pointing down -z
        from tpumd.md.fix_sphere import FixGravity
        gravs = [fx for fx in sim.fixes if isinstance(fx, FixGravity)]
        if len(gravs) != 1:
            raise ValueError("No fix gravity or more than one fix gravity"
                             " defined for fix pour")
        acc = gravs[0].acc
        if abs(acc[0]) > 1e-12 or abs(acc[1]) > 1e-12 or acc[2] >= 0:
            raise ValueError("Gravity must point in -z for fix pour")
        self.grav = acc[2] * sim.units.ftm2v
        v_rel = self.vz - self.rate
        delta = self.zhi - self.zlo
        t = (-v_rel - math.sqrt(v_rel * v_rel - 2.0 * self.grav * delta)) \
            / self.grav
        self.nfreq = max(1, int(t / sim.dt + 0.5))
        self.host_every = self.nfreq
        # bit-exact C operation order (fix_pour.cpp:210-255: an
        # off-by-one-ulp here changes int() truncation, e.g. the
        # 24-sphere cylinder batch truncates to 23 in the reference)
        MY_4PI3 = 4.18879020478639098461
        if self.region_style == 1:
            dy = max(self.yhi - self.ylo, 1.0)
            volume = (self.xhi - self.xlo) * dy * (self.zhi - self.zlo)
        else:
            volume = math.pi * self.rc * self.rc * (self.zhi - self.zlo)
        if self.dstyle == "poly":
            volume_one = 0.0
            for r, f in zip(self.radius_poly, self.frac_poly):
                volume_one += (MY_4PI3 * r * r * r) * f
        else:
            rm = self.radius_max
            volume_one = MY_4PI3 * rm * rm * rm
        self.nper = int(self.volfrac * volume / volume_one)
        if self.nper == 0:
            raise ValueError("Fix pour insertion count per timestep is 0")
        sim._log(f"Particle insertion: {self.nper} every {self.nfreq} "
                 f"steps, {self.ninsert} total")

    # ---------------------------------------------------------- insert
    def host_run_begin(self, sim):
        if not hasattr(self, "nper"):   # embedding-API fallback
            self.host_setup(sim)
        # first batch goes in at the start of the first run (reference:
        # next_reneighbor = ntimestep + 1 at construction)
        if self._pending_first and self._ninserted < self.ninsert:
            self._pending_first = False
            self._insert(sim)

    def host_end_of_step(self, sim):
        if self._ninserted >= self.ninsert:
            return
        self._insert(sim)

    def _radius_sample(self):
        if self.dstyle == "one":
            return self.radius_one
        if self.dstyle == "range":
            return self.radius_lo + self.rng.uniform() \
                * (self.radius_hi - self.radius_lo)
        value = self.rng.uniform()
        i, tot = 0, 0.0
        while tot < value:
            tot += self.frac_poly[i]
            i += 1
        return self.radius_poly[i - 1]

    def _xyz_random(self, h):
        if self.region_style == 1:
            cx = self.xlo + self.rng.uniform() * (self.xhi - self.xlo)
            cy = self.ylo + self.rng.uniform() * (self.yhi - self.ylo)
        else:
            while True:
                r1 = self.rng.uniform() - 0.5
                r2 = self.rng.uniform() - 0.5
                if r1 * r1 + r2 * r2 < 0.25:
                    break
            cx = self.xc + 2.0 * r1 * self.rc
            cy = self.yc + 2.0 * r2 * self.rc
        return np.array([cx, cy, h])

    def _insert(self, sim):
        import jax
        import jax.numpy as jnp
        # pull the live carry back into sim.state (compacted to natoms
        # rows) BEFORE appending; also stashes surviving fix states
        sim.invalidate_ctx()
        step_ref = sim.step + 1   # reference ntimestep at pre_exchange
        nfirst = getattr(self, "_nfirst", step_ref)
        self._nfirst = nfirst
        lo_c = self.zlo + (step_ref - nfirst) * sim.dt * self.rate
        hi_c = self.zhi + (step_ref - nfirst) * sim.dt * self.rate
        nnew = min(self.nper, self.ninsert - self._ninserted)

        x = np.asarray(jax.device_get(sim.state.x), np.float64)
        rad = np.asarray(jax.device_get(sim.state.radius), np.float64)
        tags = np.asarray(jax.device_get(sim.state.tag))
        box = sim.state.box
        ell = np.asarray(jax.device_get(box.lengths), np.float64)
        per = np.asarray([bool(p) for p in box.periodic])
        # xnear: existing atoms overlapping the (extended) region
        delta = rad + self.radius_max
        if self.region_style == 1:
            near = ((x[:, 0] >= self.xlo - delta)
                    & (x[:, 0] <= self.xhi + delta)
                    & (x[:, 1] >= self.ylo - delta)
                    & (x[:, 1] <= self.yhi + delta))
        else:
            near = ((x[:, 0] - self.xc)**2 + (x[:, 1] - self.yc)**2
                    <= (self.rc + delta)**2)
        near &= (x[:, 2] >= lo_c - delta) & (x[:, 2] <= hi_c + delta)
        xnear = list(np.concatenate(
            [x[near], rad[near, None]], axis=1))

        new_rows = []   # (x, y, z, radius, vx, vy, vz, rmass)
        attempt = 0
        maxiter = nnew * self.maxattempt
        nsuccess = 0
        while nsuccess < nnew:
            rn = self.rng.uniform()
            h = hi_c - rn * rn * (hi_c - lo_c)
            radtmp = self._radius_sample()
            success = False
            while attempt < maxiter:
                attempt += 1
                coord = self._xyz_random(h)
                ok = True
                for xn in xnear:
                    d = coord - xn[:3]
                    # minimum image on periodic dims (domain->minimum_image)
                    d = np.where(per, d - ell * np.round(d / ell), d)
                    rsq = float(d @ d)
                    radsum = radtmp + xn[3]
                    if rsq <= radsum * radsum:
                        ok = False
                        break
                if ok:
                    success = True
                    break
            if not success:
                break
            nsuccess += 1
            xnear.append(np.array([*coord, radtmp]))
            vx = self.vxlo + self.rng.uniform() * (self.vxhi - self.vxlo)
            vy = self.vylo + self.rng.uniform() * (self.vyhi - self.vylo)
            vzn = -math.sqrt(self.vz**2
                             + 2.0 * self.grav * (coord[2] - hi_c))
            dens = self.density_lo + self.rng.uniform() \
                * (self.density_hi - self.density_lo)
            rmass = 4.0 / 3.0 * math.pi * radtmp**3 * dens
            new_rows.append((*coord, radtmp, vx, vy, vzn, rmass))
        if not new_rows:
            return
        self._ninserted += nsuccess

        rows = np.asarray(new_rows, np.float64)
        # timing correction: the reference inserts at pre_exchange, AFTER
        # the step's initial_integrate (Verlet::run) — inserted atoms get
        # NO position update and only the final half-kick that step.  We
        # insert at the previous segment boundary, so the next step fully
        # integrates them; start them half a step "earlier" so the
        # post-step state is identical (exact: free flight under constant
        # gravity, no contacts at insertion altitude):
        #   x0 = x_ins - dt*v_ins,  v0 = v_ins - dt/2 * g
        dt = sim.dt
        rows[:, 0:3] -= dt * rows[:, 4:7]
        rows[:, 6] -= 0.5 * dt * self.grav / sim.units.ftm2v
        nadd = len(rows)
        maxid = int(tags.max()) if len(tags) else 0
        dt_ = sim.state.x.dtype
        gbit = 1 | self.groupbit

        def ext(name, newvals):
            old = getattr(sim.state, name)
            if old is None:
                return None
            add = jnp.asarray(newvals).astype(old.dtype)
            if add.ndim < old.ndim:
                add = jnp.broadcast_to(add[..., None], (nadd,)
                                       + old.shape[1:])
            return jnp.concatenate([old, add])

        upd = dict(
            x=ext("x", rows[:, 0:3]),
            v=ext("v", rows[:, 4:7]),
            f=ext("f", np.zeros((nadd, 3))),
            type=ext("type", np.full(nadd, self.ntype, np.int32)),
            tag=ext("tag", maxid + 1 + np.arange(nadd, dtype=np.int32)),
            gmask=ext("gmask", np.full(nadd, gbit, np.int32)),
            radius=ext("radius", rows[:, 3]),
            rmass=ext("rmass", rows[:, 7]),
        )
        for name in ("omega", "torque"):
            if getattr(sim.state, name) is not None:
                upd[name] = ext(name, np.zeros((nadd, 3)))
        for name in ("q", "molecule"):
            if getattr(sim.state, name) is not None:
                upd[name] = ext(name, np.zeros(nadd))
        if sim.state.image is not None:
            upd["image"] = ext("image", np.zeros((nadd, 3), np.int32))
        if sim.state.extras:
            upd["extras"] = {
                k: jnp.concatenate([a, jnp.zeros((nadd,) + a.shape[1:],
                                                 a.dtype)])
                for k, a in sim.state.extras.items()}
        upd["nlocal"] = jnp.asarray(sim.natoms + nadd, jnp.int32)
        sim.state = sim.state.replace(**upd)
        sim._natoms = None   # re-derive from nlocal; re-setup is pending
        sim._log(f"fix pour: inserted {nsuccess} atoms "
                 f"({self._ninserted}/{self.ninsert})")
