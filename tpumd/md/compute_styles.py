"""Compute styles accessible from thermo_style custom (c_ID references).

Covers the global computes most used with the `compute` command:
temp, pe, ke, pressure, com, msd, vacf, gyration, ke/atom-sums
(reference contracts: src/compute_temp.cpp, compute_msd.cpp,
compute_com.cpp, compute_gyration.cpp, compute_vacf.cpp).
Computes are evaluated host-side at output steps from the synced state.
"""

from __future__ import annotations

import jax
import numpy as np

from tpumd.md import computes as cmod


class Compute:
    scalar = True

    def __init__(self, cid, group):
        self.id = cid
        self.group = group
        self._ref = None  # reference state (msd/vacf)

    def prepare(self, sim):
        pass

    def evaluate(self, sim):
        raise NotImplementedError


def _arrays(sim):
    s = sim.state
    tag = np.asarray(jax.device_get(s.tag))
    valid = tag > 0
    x = np.asarray(jax.device_get(s.x), dtype=np.float64)[valid]
    v = np.asarray(jax.device_get(s.v), dtype=np.float64)[valid]
    typ = np.asarray(jax.device_get(s.type))[valid]
    img = np.asarray(jax.device_get(s.image))[valid]
    ell = np.asarray(jax.device_get(s.box.lengths), dtype=np.float64)
    m = sim.mass[typ]
    order = np.argsort(tag[valid])
    return (x[order], v[order], m[order], img[order], ell)


class ComputeTemp(Compute):
    style = "temp"

    def evaluate(self, sim):
        return sim.thermo_values()["temp"]


class ComputePE(Compute):
    style = "pe"

    def evaluate(self, sim):
        return sim.thermo_values()["pe"]


class ComputeKE(Compute):
    style = "ke"

    def evaluate(self, sim):
        return sim.thermo_values()["ke"]


class ComputePressure(Compute):
    style = "pressure"

    def evaluate(self, sim):
        return sim.thermo_values()["press"]


class ComputeCOM(Compute):
    style = "com"
    scalar = False

    def evaluate(self, sim):
        x, v, m, img, ell = _arrays(sim)
        xu = x + img * ell
        return (m[:, None] * xu).sum(0) / m.sum()


class ComputeMSD(Compute):
    """Mean-squared displacement from the state at compute creation,
    using unwrapped coordinates (src/compute_msd.cpp)."""

    style = "msd"
    scalar = False

    def prepare(self, sim):
        x, v, m, img, ell = _arrays(sim)
        self._ref = x + img * ell

    def evaluate(self, sim):
        x, v, m, img, ell = _arrays(sim)
        if self._ref is None:
            self.prepare(sim)
        d = (x + img * ell) - self._ref
        out = np.zeros(4)
        out[:3] = (d * d).mean(0)
        out[3] = out[:3].sum()
        return out


class ComputeVACF(Compute):
    style = "vacf"
    scalar = False

    def prepare(self, sim):
        x, v, m, img, ell = _arrays(sim)
        self._ref = v.copy()

    def evaluate(self, sim):
        x, v, m, img, ell = _arrays(sim)
        if self._ref is None:
            self.prepare(sim)
        out = np.zeros(4)
        out[:3] = (v * self._ref).mean(0)
        out[3] = out[:3].sum()
        return out


class ComputeERotateSphere(Compute):
    """Rotational KE of finite spheres: 0.5 * 2/5 m r^2 w^2 * mvv2e
    (src/compute_erotate_sphere.cpp:44-72)."""

    style = "erotate/sphere"

    def evaluate(self, sim):
        s = sim.state
        tag = np.asarray(jax.device_get(s.tag))
        valid = tag > 0
        omega = np.asarray(jax.device_get(s.omega), dtype=np.float64)[valid]
        radius = np.asarray(jax.device_get(s.radius), dtype=np.float64)[valid]
        rmass = np.asarray(jax.device_get(s.rmass), dtype=np.float64)[valid]
        if self.group != "all":
            gm = np.asarray(jax.device_get(s.gmask))[valid]
            sel = (gm & sim.groups[self.group]) > 0
            omega, radius, rmass = omega[sel], radius[sel], rmass[sel]
        er = ((omega * omega).sum(1) * radius * radius * rmass).sum()
        return 0.5 * sim.units.mvv2e * 0.4 * er


class ComputeGyration(Compute):
    style = "gyration"

    def evaluate(self, sim):
        x, v, m, img, ell = _arrays(sim)
        xu = x + img * ell
        com = (m[:, None] * xu).sum(0) / m.sum()
        return float(np.sqrt((m * ((xu - com) ** 2).sum(1)).sum() / m.sum()))


class ComputePEAtom(Compute):
    """Per-atom potential energy (src/compute_pe_atom.cpp); tag order."""

    style = "pe/atom"
    scalar = False
    peratom = True

    def evaluate(self, sim):
        from tpumd.md.peratom import pair_bonded_tallies
        eatom, _ = pair_bonded_tallies(sim)
        return eatom


class ComputeKEAtom(Compute):
    style = "ke/atom"
    scalar = False
    peratom = True

    def evaluate(self, sim):
        from tpumd.md.peratom import _tag_order, mass_tag_order
        order = _tag_order(sim)
        v = np.asarray(jax.device_get(sim.state.v), np.float64)[order]
        m = mass_tag_order(sim)
        return 0.5 * sim.units.mvv2e * m * (v * v).sum(1)


class ComputeStressAtom(Compute):
    """Per-atom stress tensor * volume (src/compute_stress_atom.cpp):
    6 columns xx yy zz xy xz yz."""

    style = "stress/atom"
    scalar = False
    peratom = True

    def evaluate(self, sim):
        from tpumd.md.peratom import stress_atom
        return stress_atom(sim)


class ComputePropertyAtom(Compute):
    style = "property/atom"
    scalar = False
    peratom = True

    def __init__(self, cid, group, fields=()):
        super().__init__(cid, group)
        self.fields = list(fields)

    def evaluate(self, sim):
        from tpumd.script.formula import SimFormulaContext
        ctx = SimFormulaContext(sim, sim.script)
        cols = [ctx.peratom(f) for f in self.fields]
        if any(c is None for c in cols):
            bad = [f for f, c in zip(self.fields, cols) if c is None]
            raise ValueError(f"property/atom fields {bad} not available")
        return cols[0] if len(cols) == 1 else np.stack(cols, axis=1)


class ComputeReduce(Compute):
    """compute reduce sum/min/max/ave over per-atom inputs
    (src/compute_reduce.cpp)."""

    style = "reduce"

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.mode = args[0]
        self.inputs = list(args[1:])

    def _input(self, sim, name):
        from tpumd.script.formula import SimFormulaContext
        if name.startswith("c_"):
            base = name[2:]
            col = None
            if "[" in base:
                base, rest = base.split("[", 1)
                col = int(rest.rstrip("]")) - 1
            out = np.asarray(sim.computes[base].evaluate(sim))
            return out if col is None else out[:, col]
        if name.startswith("v_"):
            return np.asarray(sim.script.evaluate_variable(name[2:]))
        ctx = SimFormulaContext(sim, sim.script)
        pa = ctx.peratom(name)
        if pa is None:
            raise ValueError(f"reduce input {name!r} not available")
        return pa

    def evaluate(self, sim):
        fn = {"sum": np.sum, "min": np.min, "max": np.max,
              "ave": np.mean, "sumsq": lambda a: np.sum(a * a)}[self.mode]
        out = np.array([fn(self._input(sim, nm)) for nm in self.inputs])
        return out[0] if len(out) == 1 else out


class ComputeChunkAtom(Compute):
    """compute chunk/atom bin/1d|type: per-atom chunk ids, 1-based
    (src/compute_chunk_atom.cpp); .nchunk set after evaluate."""

    style = "chunk/atom"
    scalar = False
    peratom = True

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.args = list(args)
        self.nchunk = 0

    def evaluate(self, sim):
        import jax as _jax
        from tpumd.md.peratom import _tag_order
        order = _tag_order(sim)
        style = self.args[0]
        if style == "type":
            typ = np.asarray(_jax.device_get(sim.state.type))[order]
            self.nchunk = int(sim.ntypes)
            return typ.astype(np.float64)
        if style == "molecule":
            mol = np.asarray(_jax.device_get(sim.state.molecule))[order]
            self.nchunk = int(mol.max())
            return mol.astype(np.float64)
        if style == "bin/1d":
            dim = "xyz".index(self.args[1])
            x = np.asarray(_jax.device_get(sim.state.x),
                           np.float64)[order, dim]
            lo = float(np.asarray(_jax.device_get(sim.state.box.lo))[dim])
            hi = float(np.asarray(_jax.device_get(sim.state.box.hi))[dim])
            origin = lo if self.args[2] == "lower" else (
                hi if self.args[2] == "upper" else float(self.args[2]))
            delta = float(self.args[3])
            ids = np.floor((x - origin) / delta).astype(np.int64) + 1
            self.nchunk = int(np.ceil((hi - lo) / delta))
            return np.clip(ids, 1, self.nchunk).astype(np.float64)
        raise ValueError(f"chunk/atom style {style!r} not supported")


_STYLES = {c.style: c for c in (ComputeTemp, ComputePE, ComputeKE,
                                ComputePressure, ComputeCOM, ComputeMSD,
                                ComputeVACF, ComputeGyration,
                                ComputeERotateSphere, ComputePEAtom,
                                ComputeKEAtom, ComputeStressAtom)}
_ARG_STYLES = {"property/atom": ComputePropertyAtom,
               "reduce": ComputeReduce, "chunk/atom": ComputeChunkAtom}


def create_compute(cid, group, style, args=()):
    from tpumd.md import compute_pair as cp
    arg_styles = dict(_ARG_STYLES)
    from tpumd.md import compute_struct as cs
    from tpumd.md import compute_local as cl
    arg_styles.update({c.style: c for c in (
        cp.ComputeRDF, cp.ComputeCoordAtom, cp.ComputeClusterAtom,
        cp.ComputeGroupGroup, cp.ComputeHeatFlux, cs.ComputeCNAAtom,
        cs.ComputeCentroAtom, cs.ComputeOrientOrderAtom,
        cl.ComputePropertyLocal, cl.ComputeBondLocal,
        cl.ComputeAngleLocal, cp.ComputeDipole, cp.ComputeDipoleChunk,
        cp.ComputeEventDisplace,
        cp.ComputeTempCOM, cp.ComputeTempPartial,
        cp.ComputeTempRegion)})
    from tpumd.md import compute_chunk as cc
    from tpumd.md import compute_extra as ce
    arg_styles.update({c.style: c for c in cc.CHUNK_STYLES})
    arg_styles.update({c.style: c for c in ce.EXTRA_ARG_STYLES})
    if style in arg_styles:
        return arg_styles[style](cid, group, args)
    styles = dict(_STYLES)
    styles["displace/atom"] = cp.ComputeDisplaceAtom
    styles.update({c.style: c for c in cc.PLAIN_STYLES})
    styles.update({c.style: c for c in ce.EXTRA_PLAIN_STYLES})
    if style not in styles:
        raise ValueError(f"Unknown compute style {style!r}")
    return styles[style](cid, group)
