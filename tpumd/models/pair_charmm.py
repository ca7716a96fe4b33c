"""CHARMM pair styles: lj/charmm/coul/charmm and lj/charmm/coul/long.

Physics per the reference (src/MOLECULE/pair_lj_charmm_coul_charmm.cpp,
src/KSPACE/pair_lj_charmm_coul_long.cpp:37,143-158): LJ with the CHARMM
energy-switching function between inner and outer cutoffs; Coulomb either
switched (coul/charmm) or Ewald real-space erfc (coul/long, polynomial
erfc approximation with EWALD_P/A1..A5).  Special-bond weights are applied
in-kernel: for coul/long, excluded pairs keep the k-space compensation
term (forcecoul -= (1-w) * prefactor), matching the reference exactly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpumd.models.base import PairStyle
from tpumd.models.registry import register_pair

EWALD_F = 1.12837917
EWALD_P = 0.3275911
A1, A2, A3, A4, A5 = (0.254829592, -0.284496736, 1.421413741,
                      -1.453152027, 1.061405429)


@register_pair("lj/charmm/coul/long")
class PairLJCharmmCoulLong(PairStyle):
    name = "lj/charmm/coul/long"
    supports_cellgrid = True

    def __init__(self, ntypes: int):
        super().__init__(ntypes)
        shape = (ntypes + 1, ntypes + 1)
        self.epsilon = np.zeros(shape)
        self.sigma = np.zeros(shape)
        self.eps14 = np.zeros(shape)
        self.sigma14 = np.zeros(shape)
        self.g_ewald = 0.0   # set by the kspace solver at init

    def default_mix(self):
        return "arithmetic"

    def settings(self, cut_lj_inner, cut_lj, cut_coul=None):
        self.cut_lj_inner = float(cut_lj_inner)
        self.cut_lj = float(cut_lj)
        self.cut_coul = float(cut_coul) if cut_coul is not None else self.cut_lj

    def coeff(self, ilo, ihi, jlo, jhi, epsilon, sigma,
              eps14=None, sigma14=None):
        if eps14 is None:
            eps14 = epsilon
        if sigma14 is None:
            sigma14 = sigma
        for i in range(ilo, ihi + 1):
            for j in range(max(jlo, i), jhi + 1):
                self.epsilon[i, j] = epsilon
                self.sigma[i, j] = sigma
                self.eps14[i, j] = eps14
                self.sigma14[i, j] = sigma14
                self._setflag[i, j] = True

    def coeff_from_data(self, rows):
        """Pair Coeffs section of a data file: type eps sigma [eps14 sig14]."""
        for r in rows:
            t = int(r[0])
            vals = [float(v) for v in r[1:]]
            if len(vals) == 2:
                vals = vals + vals
            self.epsilon[t, t], self.sigma[t, t] = vals[0], vals[1]
            self.eps14[t, t], self.sigma14[t, t] = vals[2], vals[3]
            self._setflag[t, t] = True

    def init(self):
        nt = self.ntypes
        for i in range(1, nt + 1):
            for j in range(i, nt + 1):
                if not self._setflag[i, j]:
                    self.epsilon[i, j] = self.mix_energy(
                        self.epsilon[i, i], self.epsilon[j, j],
                        self.sigma[i, i], self.sigma[j, j])
                    self.sigma[i, j] = self.mix_distance(
                        self.sigma[i, i], self.sigma[j, j])
                    self.eps14[i, j] = self.mix_energy(
                        self.eps14[i, i], self.eps14[j, j],
                        self.sigma14[i, i], self.sigma14[j, j])
                    self.sigma14[i, j] = self.mix_distance(
                        self.sigma14[i, i], self.sigma14[j, j])
                for arr in (self.epsilon, self.sigma, self.eps14, self.sigma14):
                    arr[j, i] = arr[i, j]
        eps, sig = self.epsilon, self.sigma
        self.lj1 = 48.0 * eps * sig**12
        self.lj2 = 24.0 * eps * sig**6
        self.lj3 = 4.0 * eps * sig**12
        self.lj4 = 4.0 * eps * sig**6
        e14, s14 = self.eps14, self.sigma14
        self.lj14_1 = 48.0 * e14 * s14**12
        self.lj14_2 = 24.0 * e14 * s14**6
        self.lj14_3 = 4.0 * e14 * s14**12
        self.lj14_4 = 4.0 * e14 * s14**6
        self.cut_ljsq = self.cut_lj**2
        self.cut_lj_innersq = self.cut_lj_inner**2
        self.cut_coulsq = self.cut_coul**2
        self.denom_lj = (self.cut_ljsq - self.cut_lj_innersq)**3

    @property
    def max_cutoff(self) -> float:
        return max(self.cut_lj, self.cut_coul)

    def compute_cellgrid(self, x, type_, valid, box, cfg,
                         eflag: bool, vflag: bool, q=None, special=None,
                         bond=None):
        import os as _os
        import jax as _jax
        if (self.name == "lj/charmm/coul/long"
                and not eflag and bond is None and special is not None
                and q is not None and _jax.default_backend() != "cpu"
                and cfg.nz >= 3 and cfg.ny >= 3 and cfg.nx >= 3
                and _os.environ.get("TPUMD_PALLAS_CHARMM", "1") != "0"):
            # per-step force eval rides the fused VMEM kernel (energies
            # are evaluated on the XLA path once per thermo stop)
            from tpumd.ops.pallas_charmm import (
                charmm_cellgrid_forces_pallas)
            atag, stags, swl, swc = special
            if swc is None:
                swc = swl
            tables = jnp.stack(
                [jnp.asarray(t, jnp.float32)
                 for t in (self.lj1, self.lj2, self.lj3, self.lj4)])
            f, vir = charmm_cellgrid_forces_pallas(
                x, q, type_, atag, valid, stags, swl, swc, box, cfg,
                tables, float(self.units.qqr2e), float(self.g_ewald),
                float(self.cut_coulsq), float(self.cut_ljsq),
                float(self.cut_lj_innersq), float(self.denom_lj),
                int(self.ntypes))
            return f, None, None, (vir if vflag else None)
        return super().compute_cellgrid(
            x, type_, valid, box, cfg, eflag, vflag, q=q,
            special=special, bond=bond)

    def pair_fn_ex(self, r2, itype, jtype, w_lj, w_coul, qi, qj):
        dt_ = r2.dtype
        qqrd2e = self.units.qqr2e
        lj1 = self.coef(self.lj1, itype, jtype, dt_)
        lj2 = self.coef(self.lj2, itype, jtype, dt_)
        lj3 = self.coef(self.lj3, itype, jtype, dt_)
        lj4 = self.coef(self.lj4, itype, jtype, dt_)

        r2inv = 1.0 / r2
        # ---- coulomb: erfc real space + special compensation ------------
        in_coul = r2 < self.cut_coulsq
        r = jnp.sqrt(r2)
        grij = self.g_ewald * r
        expm2 = jnp.exp(-grij * grij)
        t = 1.0 / (1.0 + EWALD_P * grij)
        erfc = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * expm2
        prefactor = qqrd2e * qi * qj / r
        forcecoul = prefactor * (erfc + EWALD_F * grij * expm2)
        forcecoul = forcecoul - (1.0 - w_coul) * prefactor
        ecoul = prefactor * erfc - (1.0 - w_coul) * prefactor
        forcecoul = jnp.where(in_coul, forcecoul, 0.0)
        ecoul = jnp.where(in_coul, ecoul, 0.0)

        # ---- LJ with CHARMM switching -----------------------------------
        in_lj = r2 < self.cut_ljsq
        r6inv = r2inv * r2inv * r2inv
        forcelj = r6inv * (lj1 * r6inv - lj2)
        philj = r6inv * (lj3 * r6inv - lj4)
        sw_on = r2 > self.cut_lj_innersq
        tt = self.cut_ljsq - r2
        switch1 = (tt * tt * (self.cut_ljsq + 2.0 * r2
                              - 3.0 * self.cut_lj_innersq) / self.denom_lj)
        switch2 = 12.0 * r2 * tt * (r2 - self.cut_lj_innersq) / self.denom_lj
        forcelj_sw = forcelj * switch1 + philj * switch2
        forcelj = jnp.where(sw_on, forcelj_sw, forcelj)
        philj = jnp.where(sw_on, philj * switch1, philj)
        forcelj = jnp.where(in_lj, forcelj * w_lj, 0.0)
        evdwl = jnp.where(in_lj, philj * w_lj, 0.0)

        fpair = forcelj * r2inv
        fcoul = forcecoul * r2inv
        return fpair, evdwl, ecoul, fcoul


@register_pair("lj/charmm/coul/charmm")
class PairLJCharmmCoulCharmm(PairLJCharmmCoulLong):
    """Fully switched CHARMM LJ + switched Coulomb (no kspace)."""

    name = "lj/charmm/coul/charmm"

    def settings(self, cut_lj_inner, cut_lj, cut_coul_inner=None,
                 cut_coul=None):
        super().settings(cut_lj_inner, cut_lj, cut_coul)
        self.cut_coul_inner = (float(cut_coul_inner)
                               if cut_coul_inner is not None
                               else float(cut_lj_inner))
        if cut_coul is None:
            self.cut_coul = self.cut_lj

    def init(self):
        super().init()
        self.cut_coul_innersq = self.cut_coul_inner**2
        self.denom_coul = (self.cut_coulsq - self.cut_coul_innersq)**3

    def pair_fn_ex(self, r2, itype, jtype, w_lj, w_coul, qi, qj):
        dt_ = r2.dtype
        qqrd2e = self.units.qqr2e
        lj1 = self.coef(self.lj1, itype, jtype, dt_)
        lj2 = self.coef(self.lj2, itype, jtype, dt_)
        lj3 = self.coef(self.lj3, itype, jtype, dt_)
        lj4 = self.coef(self.lj4, itype, jtype, dt_)
        r2inv = 1.0 / r2

        in_coul = r2 < self.cut_coulsq
        forcecoul = qqrd2e * qi * qj * jnp.sqrt(r2inv)
        sw_c = r2 > self.cut_coul_innersq
        tt = self.cut_coulsq - r2
        sw = (tt * tt * (self.cut_coulsq + 2.0 * r2
                         - 3.0 * self.cut_coul_innersq) / self.denom_coul)
        forcecoul_sw = forcecoul * sw  # energy-switched (matches reference)
        forcecoul = jnp.where(sw_c, forcecoul_sw, forcecoul)
        forcecoul = jnp.where(in_coul, forcecoul * w_coul, 0.0)
        ecoul = forcecoul

        in_lj = r2 < self.cut_ljsq
        r6inv = r2inv * r2inv * r2inv
        forcelj = r6inv * (lj1 * r6inv - lj2)
        philj = r6inv * (lj3 * r6inv - lj4)
        sw_on = r2 > self.cut_lj_innersq
        tt = self.cut_ljsq - r2
        switch1 = (tt * tt * (self.cut_ljsq + 2.0 * r2
                              - 3.0 * self.cut_lj_innersq) / self.denom_lj)
        switch2 = 12.0 * r2 * tt * (r2 - self.cut_lj_innersq) / self.denom_lj
        forcelj = jnp.where(sw_on, forcelj * switch1 + philj * switch2,
                            forcelj)
        philj = jnp.where(sw_on, philj * switch1, philj)
        forcelj = jnp.where(in_lj, forcelj * w_lj, 0.0)
        evdwl = jnp.where(in_lj, philj * w_lj, 0.0)
        return forcelj * r2inv, evdwl, ecoul, forcecoul * r2inv
