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


_STYLES = {c.style: c for c in (ComputeTemp, ComputePE, ComputeKE,
                                ComputePressure, ComputeCOM, ComputeMSD,
                                ComputeVACF, ComputeGyration,
                                ComputeERotateSphere)}


def create_compute(cid, group, style):
    if style not in _STYLES:
        raise ValueError(f"Unknown compute style {style!r}")
    return _STYLES[style](cid, group)
