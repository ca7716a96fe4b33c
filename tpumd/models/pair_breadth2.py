"""Pair-style breadth wave 2: the remaining core styles plus the
commonly-used KSPACE / CLASS2 / EXTRA-PAIR family members.

Styles: coul/long, coul/dsf, coul/wolf, zbl, buck/coul/cut,
buck/coul/long, born/coul/long, lj/class2(/coul/cut,/coul/long),
nm/cut, mie/cut, lj/gromacs, lj/smooth/linear, harmonic/cut.

All are one-screen kernels on the shared pairwise driver; physics per
the reference kernels cited on each class.  Coulomb self-energy styles
(dsf/wolf) expose ``ecoul_self(q)`` which the step loop adds to ecoul
(reference tallies e_self via ev_tally(i,i,...)).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import erfc as jerfc

from tpumd.models.pair_charmm import A1, A2, A3, A4, A5, EWALD_F, EWALD_P
from tpumd.models.pair_misc import (
    PairBuck, PairLJCutCoulCut, _SimpleTablePair)
from tpumd.models.registry import register_pair

MY_PIS = float(np.sqrt(np.pi))


@register_pair("coul/long")
class PairCoulLong(_SimpleTablePair):
    """Ewald-erfc real-space coulomb only (src/KSPACE/pair_coul_long.cpp).

    pair_coeff takes no parameters; cutoff is global from settings."""

    name = "coul/long"
    ncoeff = 0
    g_ewald = 0.0

    def settings(self, cut_coul):
        self.cut_global = float(cut_coul)
        self.cut_coul = float(cut_coul)

    def coeff(self, ilo, ihi, jlo, jhi, *vals):
        for i in range(ilo, ihi + 1):
            for j in range(max(jlo, i), jhi + 1):
                self.cut[i, j] = self.cut_global
                self._setflag[i, j] = True

    def derive(self):
        self.cut_coulsq = self.cut_coul ** 2

    @property
    def max_cutoff(self):
        return self.cut_coul

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        in_c = r2 < self.cut_coulsq
        r = jnp.sqrt(r2)
        grij = self.g_ewald * r
        expm2 = jnp.exp(-grij * grij)
        t = 1.0 / (1.0 + EWALD_P * grij)
        erfc = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * expm2
        prefactor = self.units.qqr2e * qi * qj / r
        forcecoul = prefactor * (erfc + EWALD_F * grij * expm2) \
            - (1.0 - w_coul) * prefactor
        ec = jnp.where(in_c, prefactor * erfc
                       - (1.0 - w_coul) * prefactor, 0.0)
        fcoul = jnp.where(in_c, forcecoul / r2, 0.0)
        z = jnp.zeros_like(r2)
        return z, z, ec, fcoul


@register_pair("coul/dsf")
class PairCoulDSF(_SimpleTablePair):
    """Damped-shifted-force coulomb (src/pair_coul_dsf.cpp:95-215,
    Fennell & Gezelter JCP 124, 234104).  Includes the per-atom
    self-energy tally (:37)."""

    name = "coul/dsf"
    ncoeff = 0

    def settings(self, alpha, cut_coul):
        self.alpha = float(alpha)
        self.cut_global = float(cut_coul)
        self.cut_coul = float(cut_coul)

    def coeff(self, ilo, ihi, jlo, jhi, *vals):
        for i in range(ilo, ihi + 1):
            for j in range(max(jlo, i), jhi + 1):
                self.cut[i, j] = self.cut_global
                self._setflag[i, j] = True

    def derive(self):
        # init_style :209-212 — shifts from TRUE erfc at the cutoff
        from math import erfc, exp
        rc = self.cut_coul
        self.cut_coulsq = rc * rc
        erfcc = erfc(self.alpha * rc)
        erfcd = exp(-self.alpha * self.alpha * rc * rc)
        self.f_shift = -(erfcc / self.cut_coulsq
                         + 2.0 / MY_PIS * self.alpha * erfcd / rc)
        self.e_shift = erfcc / rc - self.f_shift * rc

    @property
    def max_cutoff(self):
        return self.cut_coul

    def ecoul_self(self, q):
        """Sum_i e_self (ev_tally(i,i,...) at :37)."""
        return jnp.sum(-(self.e_shift / 2.0 + self.alpha / MY_PIS)
                       * q * q * self.units.qqr2e)

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        in_c = r2 < self.cut_coulsq
        r = jnp.sqrt(r2)
        prefactor = self.units.qqr2e * qi * qj / r
        erfcd = jnp.exp(-self.alpha * self.alpha * r2)
        t = 1.0 / (1.0 + EWALD_P * self.alpha * r)
        erfcc = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * erfcd
        forcecoul = prefactor * (erfcc / r + 2.0 * self.alpha / MY_PIS
                                 * erfcd + r * self.f_shift) * r
        forcecoul = forcecoul - (1.0 - w_coul) * prefactor
        ec = prefactor * (erfcc - r * self.e_shift - r2 * self.f_shift) \
            - (1.0 - w_coul) * prefactor
        z = jnp.zeros_like(r2)
        return z, z, jnp.where(in_c, ec, 0.0), \
            jnp.where(in_c, forcecoul / r2, 0.0)


@register_pair("coul/wolf")
class PairCoulWolf(_SimpleTablePair):
    """Wolf-summation coulomb (src/pair_coul_wolf.cpp, Wolf et al JCP
    110, 8254).  True erfc (not the polynomial) per the reference."""

    name = "coul/wolf"
    ncoeff = 0

    def settings(self, alf, cut_coul):
        self.alf = float(alf)
        self.cut_global = float(cut_coul)
        self.cut_coul = float(cut_coul)

    def coeff(self, ilo, ihi, jlo, jhi, *vals):
        for i in range(ilo, ihi + 1):
            for j in range(max(jlo, i), jhi + 1):
                self.cut[i, j] = self.cut_global
                self._setflag[i, j] = True

    def derive(self):
        from math import erfc, exp
        rc = self.cut_coul
        self.cut_coulsq = rc * rc
        self.e_shift = erfc(self.alf * rc) / rc
        self.f_shift = -(self.e_shift + 2.0 * self.alf / MY_PIS
                         * exp(-self.alf * self.alf * rc * rc)) / rc

    @property
    def max_cutoff(self):
        return self.cut_coul

    def ecoul_self(self, q):
        return jnp.sum(-(self.e_shift / 2.0 + self.alf / MY_PIS)
                       * q * q * self.units.qqr2e)

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        in_c = r2 < self.cut_coulsq
        r = jnp.sqrt(r2)
        prefactor = self.units.qqr2e * qi * qj / r
        erfcc = jerfc(self.alf * r)
        erfcd = jnp.exp(-self.alf * self.alf * r2)
        v_sh = (erfcc - self.e_shift * r) * prefactor
        dvdrr = (erfcc / r2 + 2.0 * self.alf / MY_PIS * erfcd / r) \
            + self.f_shift
        forcecoul = dvdrr * r2 * prefactor \
            - (1.0 - w_coul) * prefactor
        ec = v_sh - (1.0 - w_coul) * prefactor
        z = jnp.zeros_like(r2)
        return z, z, jnp.where(in_c, ec, 0.0), \
            jnp.where(in_c, forcecoul / r2, 0.0)


# ZBL universal screening constants (src/pair_zbl_const.h)
_Z_PZBL, _Z_A0 = 0.23, 0.46850
_Z_C = (0.02817, 0.28022, 0.50986, 0.18175)
_Z_D = (0.20162, 0.40290, 0.94229, 3.19980)


@register_pair("zbl")
class PairZBL(_SimpleTablePair):
    """Ziegler-Biersack-Littmark screened nuclear repulsion with the
    smooth inner/outer switching (src/pair_zbl.cpp:95-150, set_coeff
    :440-).  coeff: Z_i Z_j; settings: cut_inner cut_global."""

    name = "zbl"
    ncoeff = 1  # z

    def settings(self, cut_inner, cut_global):
        self.cut_inner = float(cut_inner)
        self.cut_global = float(cut_global)

    def coeff(self, ilo, ihi, jlo, jhi, zi, zj=None):
        for i in range(ilo, ihi + 1):
            for j in range(max(jlo, i), jhi + 1):
                self.params[0, i, j] = zi
                # z_one/z_two: diagonal sets z[i]; init_one mixes z[i],z[j]
                self.params[0, j, i] = zj if zj is not None else zi
                self.cut[i, j] = self.cut_global
                self._setflag[i, j] = True
        if zj is not None and ilo == jlo:
            self.params[0, ilo, ilo] = zi

    def init(self):
        nt = self.ntypes
        z = np.zeros(nt + 1)
        for i in range(1, nt + 1):
            if self._setflag[i, i]:
                z[i] = self.params[0, i, i]
        zi_t = np.zeros((nt + 1, nt + 1))
        zj_t = np.zeros((nt + 1, nt + 1))
        for i in range(1, nt + 1):
            for j in range(1, nt + 1):
                zi_t[i, j] = self.params[0, i, j] if self._setflag[i, j] \
                    or self._setflag[j, i] else z[i]
                zj_t[i, j] = self.params[0, j, i] if self._setflag[i, j] \
                    or self._setflag[j, i] else z[j]
                if not (self._setflag[i, j] or self._setflag[j, i]):
                    zi_t[i, j], zj_t[i, j] = z[i], z[j]
        # set_coeff: ZBL tables (units enter via angstrom/qelectron)
        u = self.units
        ainv = (zi_t ** _Z_PZBL + zj_t ** _Z_PZBL) / (_Z_A0 * u.angstrom)
        self.d_a = [d * ainv for d in _Z_D]
        self.zze = zi_t * zj_t * u.qqr2e * u.qelectron * u.qelectron

        def e_zbl(r):
            s = sum(c * np.exp(-da * r) for c, da in zip(_Z_C, self.d_a))
            return self.zze * s / r

        def dzbldr(r):
            es = [np.exp(-da * r) for da in self.d_a]
            s = sum(c * e for c, e in zip(_Z_C, es))
            sp = -sum(c * da * e for c, da, e in zip(_Z_C, self.d_a, es))
            return self.zze * (sp - s / r) / r

        def d2zbldr2(r):
            es = [np.exp(-da * r) for da in self.d_a]
            s = sum(c * e for c, e in zip(_Z_C, es))
            sp = sum(c * e * da for c, da, e in zip(_Z_C, self.d_a, es))
            spp = sum(c * e * da * da
                      for c, da, e in zip(_Z_C, self.d_a, es))
            return self.zze * (spp + 2.0 * sp / r + 2.0 * s / (r * r)) / r

        tc = self.cut_global - self.cut_inner
        fc = e_zbl(self.cut_global)
        fcp = dzbldr(self.cut_global)
        fcpp = d2zbldr2(self.cut_global)
        swa = (-3.0 * fcp + tc * fcpp) / (tc * tc)
        swb = (2.0 * fcp - tc * fcpp) / (tc ** 3)
        self.sw1, self.sw2 = swa, swb
        self.sw3, self.sw4 = swa / 3.0, swb / 4.0
        self.sw5 = -fc + (tc / 2.0) * fcp - (tc * tc / 12.0) * fcpp
        self.cutsq = np.full((nt + 1, nt + 1), self.cut_global ** 2)

    @property
    def max_cutoff(self):
        return self.cut_global

    def pair_fn(self, r2, it, jt):
        dt_ = r2.dtype
        inside = r2 < self.cut_global ** 2
        r = jnp.sqrt(r2)
        d_a = [jnp.asarray(d, dt_)[it, jt] for d in self.d_a]
        zze = jnp.asarray(self.zze, dt_)[it, jt]
        es = [jnp.exp(-da * r) for da in d_a]
        ssum = sum(c * e for c, e in zip(_Z_C, es))
        sp = -sum(c * da * e for c, da, e in zip(_Z_C, d_a, es))
        dzbl = zze * (sp - ssum / r) / r
        ezbl = zze * ssum / r
        t = r - self.cut_inner
        outer = r2 > self.cut_inner ** 2
        sw1 = jnp.asarray(self.sw1, dt_)[it, jt]
        sw2 = jnp.asarray(self.sw2, dt_)[it, jt]
        sw3 = jnp.asarray(self.sw3, dt_)[it, jt]
        sw4 = jnp.asarray(self.sw4, dt_)[it, jt]
        sw5 = jnp.asarray(self.sw5, dt_)[it, jt]
        fpair = dzbl + jnp.where(outer, t * t * (sw1 + sw2 * t), 0.0)
        fpair = jnp.where(inside, -fpair / r, 0.0)
        e = ezbl + sw5 + jnp.where(outer, t ** 3 * (sw3 + sw4 * t), 0.0)
        return fpair, jnp.where(inside, e, 0.0), None, None


@register_pair("buck/coul/cut")
class PairBuckCoulCut(PairBuck):
    """Buckingham + truncated coulomb (src/pair_buck_coul_cut.cpp)."""

    name = "buck/coul/cut"

    def settings(self, cut_lj, cut_coul=None):
        self.cut_global = float(cut_lj)
        self.cut_coul = float(cut_coul if cut_coul is not None else cut_lj)

    def derive(self):
        self.cut_coulsq = self.cut_coul ** 2

    @property
    def max_cutoff(self):
        return max(float(self.cut[1:, 1:].max()), self.cut_coul)

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        fb, eb, _, _ = PairBuck.pair_fn(self, r2, it, jt)
        in_c = r2 < self.cut_coulsq
        forcecoul = self.units.qqr2e * qi * qj / jnp.sqrt(r2)
        fcoul = jnp.where(in_c, w_coul * forcecoul / r2, 0.0)
        ec = jnp.where(in_c, w_coul * forcecoul, 0.0)
        return w_lj * fb, w_lj * eb, ec, fcoul


@register_pair("buck/coul/long")
class PairBuckCoulLong(PairBuckCoulCut):
    """Buckingham + Ewald-erfc coulomb
    (src/KSPACE/pair_buck_coul_long.cpp)."""

    name = "buck/coul/long"
    g_ewald = 0.0

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        fb, eb, _, _ = PairBuck.pair_fn(self, r2, it, jt)
        in_c = r2 < self.cut_coulsq
        r = jnp.sqrt(r2)
        grij = self.g_ewald * r
        expm2 = jnp.exp(-grij * grij)
        t = 1.0 / (1.0 + EWALD_P * grij)
        erfc = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * expm2
        prefactor = self.units.qqr2e * qi * qj / r
        forcecoul = prefactor * (erfc + EWALD_F * grij * expm2) \
            - (1.0 - w_coul) * prefactor
        ec = jnp.where(in_c, prefactor * erfc
                       - (1.0 - w_coul) * prefactor, 0.0)
        fcoul = jnp.where(in_c, forcecoul / r2, 0.0)
        return w_lj * fb, w_lj * eb, ec, fcoul


@register_pair("born/coul/long")
class PairBornCoulLong(_SimpleTablePair):
    """Born-Mayer-Huggins + Ewald-erfc coulomb
    (src/KSPACE/pair_born_coul_long.cpp)."""

    name = "born/coul/long"
    ncoeff = 5  # a, rho, sigma, c, d
    g_ewald = 0.0

    def settings(self, cut_lj, cut_coul=None):
        self.cut_global = float(cut_lj)
        self.cut_coul = float(cut_coul if cut_coul is not None else cut_lj)

    def derive(self):
        a, rho, sig, c, d = self.params
        rho_s = np.where(rho > 0, rho, 1.0)
        self.born1 = a / rho_s
        self.born2 = 6.0 * c
        self.born3 = 8.0 * d
        self.cut_coulsq = self.cut_coul ** 2
        if self.shift:
            rc = np.where(self.cut > 0, self.cut, 1.0)
            self.offset = np.where(
                self.cut > 0,
                a * np.exp((sig - rc) / rho_s) - c / rc ** 6 + d / rc ** 8,
                0.0)
        else:
            self.offset = np.zeros_like(a)

    @property
    def max_cutoff(self):
        return max(float(self.cut[1:, 1:].max()), self.cut_coul)

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        dt_ = r2.dtype
        a = jnp.asarray(self.params[0], dt_)[it, jt]
        rho = jnp.asarray(self.params[1], dt_)[it, jt]
        sig = jnp.asarray(self.params[2], dt_)[it, jt]
        c = jnp.asarray(self.params[3], dt_)[it, jt]
        d = jnp.asarray(self.params[4], dt_)[it, jt]
        b1 = jnp.asarray(self.born1, dt_)[it, jt]
        b2 = jnp.asarray(self.born2, dt_)[it, jt]
        b3 = jnp.asarray(self.born3, dt_)[it, jt]
        off = jnp.asarray(self.offset, dt_)[it, jt]
        in_lj = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        r = jnp.sqrt(r2)
        r2inv = 1.0 / r2
        r6inv = r2inv ** 3
        rexp = jnp.exp((sig - r) / jnp.maximum(rho, 1e-30))
        forceborn = b1 * r * rexp - b2 * r6inv + b3 * r6inv * r2inv
        fpair = jnp.where(in_lj, w_lj * forceborn * r2inv, 0.0)
        e = jnp.where(in_lj, w_lj * (a * rexp - c * r6inv
                                     + d * r6inv * r2inv - off), 0.0)
        in_c = r2 < self.cut_coulsq
        grij = self.g_ewald * r
        expm2 = jnp.exp(-grij * grij)
        t = 1.0 / (1.0 + EWALD_P * grij)
        erfc = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * expm2
        prefactor = self.units.qqr2e * qi * qj / r
        forcecoul = prefactor * (erfc + EWALD_F * grij * expm2) \
            - (1.0 - w_coul) * prefactor
        ec = jnp.where(in_c, prefactor * erfc
                       - (1.0 - w_coul) * prefactor, 0.0)
        fcoul = jnp.where(in_c, forcecoul * r2inv, 0.0)
        return fpair, e, ec, fcoul


@register_pair("lj/class2")
class PairLJClass2(_SimpleTablePair):
    """COMPASS 9-6 LJ (src/CLASS2/pair_lj_class2.cpp:509-527);
    sixthpower epsilon/sigma mixing always."""

    name = "lj/class2"
    ncoeff = 2  # epsilon sigma

    def default_mix(self):
        return "sixthpower"

    def init(self):
        nt = self.ntypes
        eps, sig = self.params[0], self.params[1]
        for i in range(1, nt + 1):
            for j in range(i, nt + 1):
                if not self._setflag[i, j]:
                    # always sixthpower for eps/sigma (:509)
                    e1, e2 = eps[i, i], eps[j, j]
                    s1, s2 = sig[i, i], sig[j, j]
                    eps[i, j] = (2.0 * np.sqrt(e1 * e2) * s1**3 * s2**3) \
                        / (s1**6 + s2**6) if (s1**6 + s2**6) else 0.0
                    sig[i, j] = (0.5 * (s1**6 + s2**6)) ** (1.0 / 6.0)
                    self.cut[i, j] = self.cut_global
                self.params[:, j, i] = self.params[:, i, j]
                self.cut[j, i] = self.cut[i, j]
        self.cutsq = self.cut * self.cut
        self.derive()

    def derive(self):
        eps, sig = self.params[0], self.params[1]
        self.lj1 = 18.0 * eps * sig ** 9
        self.lj2 = 18.0 * eps * sig ** 6
        self.lj3 = 2.0 * eps * sig ** 9
        self.lj4 = 3.0 * eps * sig ** 6
        if self.shift:
            rc = np.where(self.cut > 0, self.cut, 1.0)
            ratio = sig / rc
            self.offset = np.where(self.cut > 0,
                                   eps * (2.0 * ratio**9 - 3.0 * ratio**6),
                                   0.0)
        else:
            self.offset = np.zeros_like(eps)

    def _lj96(self, r2, it, jt, w_lj):
        dt_ = r2.dtype
        in_lj = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        r2inv = 1.0 / r2
        rinv = jnp.sqrt(r2inv)
        r3inv = r2inv * rinv
        r6inv = r3inv * r3inv
        lj1 = jnp.asarray(self.lj1, dt_)[it, jt]
        lj2 = jnp.asarray(self.lj2, dt_)[it, jt]
        lj3 = jnp.asarray(self.lj3, dt_)[it, jt]
        lj4 = jnp.asarray(self.lj4, dt_)[it, jt]
        off = jnp.asarray(self.offset, dt_)[it, jt]
        forcelj = r6inv * (lj1 * r3inv - lj2)
        fpair = jnp.where(in_lj, w_lj * forcelj * r2inv, 0.0)
        e = jnp.where(in_lj, w_lj * (r6inv * (lj3 * r3inv - lj4) - off),
                      0.0)
        return fpair, e

    def pair_fn(self, r2, it, jt):
        fpair, e = self._lj96(r2, it, jt, 1.0)
        return fpair, e, None, None

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        fpair, e = self._lj96(r2, it, jt, w_lj)
        return fpair, e, None, None


@register_pair("lj/class2/coul/cut")
class PairLJClass2CoulCut(PairLJClass2):
    """9-6 LJ + truncated coulomb (src/CLASS2/pair_lj_class2_coul_cut)."""

    name = "lj/class2/coul/cut"

    def settings(self, cut_lj, cut_coul=None):
        self.cut_global = float(cut_lj)
        self.cut_coul = float(cut_coul if cut_coul is not None else cut_lj)

    def derive(self):
        super().derive()
        self.cut_coulsq = self.cut_coul ** 2

    @property
    def max_cutoff(self):
        return max(float(self.cut[1:, 1:].max()), self.cut_coul)

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        fpair, e = self._lj96(r2, it, jt, w_lj)
        in_c = r2 < self.cut_coulsq
        forcecoul = self.units.qqr2e * qi * qj / jnp.sqrt(r2)
        fcoul = jnp.where(in_c, w_coul * forcecoul / r2, 0.0)
        ec = jnp.where(in_c, w_coul * forcecoul, 0.0)
        return fpair, e, ec, fcoul


@register_pair("lj/class2/coul/long")
class PairLJClass2CoulLong(PairLJClass2CoulCut):
    """9-6 LJ + Ewald-erfc coulomb
    (src/CLASS2/pair_lj_class2_coul_long.cpp)."""

    name = "lj/class2/coul/long"
    g_ewald = 0.0

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        fpair, e = self._lj96(r2, it, jt, w_lj)
        in_c = r2 < self.cut_coulsq
        r = jnp.sqrt(r2)
        grij = self.g_ewald * r
        expm2 = jnp.exp(-grij * grij)
        t = 1.0 / (1.0 + EWALD_P * grij)
        erfc = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * expm2
        prefactor = self.units.qqr2e * qi * qj / r
        forcecoul = prefactor * (erfc + EWALD_F * grij * expm2) \
            - (1.0 - w_coul) * prefactor
        ec = jnp.where(in_c, prefactor * erfc
                       - (1.0 - w_coul) * prefactor, 0.0)
        fcoul = jnp.where(in_c, forcecoul / r2, 0.0)
        return fpair, e, ec, fcoul


@register_pair("nm/cut")
class PairNMCut(_SimpleTablePair):
    """N-M potential E = E0/(n-m) [m(r0/r)^n - n(r0/r)^m]
    (src/EXTRA-PAIR/pair_nm_cut.cpp:110-140, Clarke et al)."""

    name = "nm/cut"
    ncoeff = 4  # e0, r0, n, m

    def derive(self):
        e0, r0, nn, mm = self.params
        nm_diff = np.where(nn != mm, nn - mm, 1.0)
        self.e0nm = e0 / nm_diff
        self.nm = nn * mm
        self.r0n = np.where(r0 > 0, r0, 1.0) ** nn
        self.r0m = np.where(r0 > 0, r0, 1.0) ** mm
        if self.shift:
            rc = np.where(self.cut > 0, self.cut, 1.0)
            self.offset = np.where(
                self.cut > 0,
                self.e0nm * (mm * self.r0n / rc ** nn
                             - nn * self.r0m / rc ** mm), 0.0)
        else:
            self.offset = np.zeros_like(e0)

    def pair_fn(self, r2, it, jt):
        dt_ = r2.dtype
        nn = jnp.asarray(self.params[2], dt_)[it, jt]
        mm = jnp.asarray(self.params[3], dt_)[it, jt]
        e0nm = jnp.asarray(self.e0nm, dt_)[it, jt]
        nm = jnp.asarray(self.nm, dt_)[it, jt]
        r0n = jnp.asarray(self.r0n, dt_)[it, jt]
        r0m = jnp.asarray(self.r0m, dt_)[it, jt]
        off = jnp.asarray(self.offset, dt_)[it, jt]
        inside = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        r2inv = 1.0 / r2
        r = jnp.sqrt(r2)
        rninv = r2inv ** (nn / 2.0)
        rminv = r2inv ** (mm / 2.0)
        forcenm = e0nm * nm * (r0n / r ** nn - r0m / r ** mm)
        fpair = jnp.where(inside, forcenm * r2inv, 0.0)
        e = jnp.where(inside,
                      e0nm * (mm * r0n * rninv - nn * r0m * rminv) - off,
                      0.0)
        return fpair, e, None, None


@register_pair("mie/cut")
class PairMIECut(_SimpleTablePair):
    """Mie potential (src/EXTRA-PAIR/pair_mie_cut.cpp:110-140)."""

    name = "mie/cut"
    ncoeff = 4  # epsilon, sigma, gammaR, gammaA

    def derive(self):
        eps, sig, gr, ga = self.params
        diff = np.where(gr != ga, gr - ga, 1.0)
        ratio = np.where(ga != 0, gr / np.where(ga != 0, ga, 1.0), 1.0)
        cmie = gr / diff * ratio ** (ga / diff)
        sig_s = np.where(sig > 0, sig, 1.0)
        self.mie1 = cmie * gr * eps * sig_s ** gr
        self.mie2 = cmie * ga * eps * sig_s ** ga
        self.mie3 = cmie * eps * sig_s ** gr
        self.mie4 = cmie * eps * sig_s ** ga
        if self.shift:
            rc = np.where(self.cut > 0, self.cut, 1.0)
            ratio_c = sig_s / rc
            self.offset = np.where(
                self.cut > 0, cmie * eps * (ratio_c ** gr - ratio_c ** ga),
                0.0)
        else:
            self.offset = np.zeros_like(eps)

    def pair_fn(self, r2, it, jt):
        dt_ = r2.dtype
        gr = jnp.asarray(self.params[2], dt_)[it, jt]
        ga = jnp.asarray(self.params[3], dt_)[it, jt]
        m1 = jnp.asarray(self.mie1, dt_)[it, jt]
        m2 = jnp.asarray(self.mie2, dt_)[it, jt]
        m3 = jnp.asarray(self.mie3, dt_)[it, jt]
        m4 = jnp.asarray(self.mie4, dt_)[it, jt]
        off = jnp.asarray(self.offset, dt_)[it, jt]
        inside = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        r2inv = 1.0 / r2
        rgamA = r2inv ** (ga / 2.0)
        rgamR = r2inv ** (gr / 2.0)
        forcemie = m1 * rgamR - m2 * rgamA
        fpair = jnp.where(inside, forcemie * r2inv, 0.0)
        e = jnp.where(inside, m3 * rgamR - m4 * rgamA - off, 0.0)
        return fpair, e, None, None


@register_pair("lj/gromacs")
class PairLJGromacs(_SimpleTablePair):
    """LJ with GROMACS force-switching between inner and outer cutoffs
    (src/EXTRA-PAIR/pair_lj_gromacs.cpp:110-145, init_one :268-287)."""

    name = "lj/gromacs"
    ncoeff = 2  # epsilon sigma

    def settings(self, cut_inner, cut_global):
        self.cut_inner_g = float(cut_inner)
        self.cut_global = float(cut_global)

    def derive(self):
        eps, sig = self.params
        self.lj1 = 48.0 * eps * sig ** 12
        self.lj2 = 24.0 * eps * sig ** 6
        self.lj3 = 4.0 * eps * sig ** 12
        self.lj4 = 4.0 * eps * sig ** 6
        rc = np.where(self.cut > 0, self.cut, 1.0)
        ri = np.full_like(rc, self.cut_inner_g)
        r6inv = 1.0 / rc ** 6
        r8inv = 1.0 / rc ** 8
        t = rc - ri
        t = np.where(t > 0, t, 1.0)
        t2inv = 1.0 / (t * t)
        t3inv = t2inv / t
        t3 = 1.0 / t3inv
        a6 = (7.0 * ri - 10.0 * rc) * r8inv * t2inv
        b6 = (9.0 * rc - 7.0 * ri) * r8inv * t3inv
        a12 = (13.0 * ri - 16.0 * rc) * r6inv * r8inv * t2inv
        b12 = (15.0 * rc - 13.0 * ri) * r6inv * r8inv * t3inv
        c6 = r6inv - t3 * (6.0 * a6 / 3.0 + 6.0 * b6 * t / 4.0)
        c12 = r6inv * r6inv - t3 * (12.0 * a12 / 3.0 + 12.0 * b12 * t / 4.0)
        self.ljsw1 = self.lj1 * a12 - self.lj2 * a6
        self.ljsw2 = self.lj1 * b12 - self.lj2 * b6
        self.ljsw3 = -self.lj3 * 12.0 * a12 / 3.0 + self.lj4 * 6.0 * a6 / 3.0
        self.ljsw4 = -self.lj3 * 12.0 * b12 / 4.0 + self.lj4 * 6.0 * b6 / 4.0
        self.ljsw5 = -self.lj3 * c12 + self.lj4 * c6

    def pair_fn(self, r2, it, jt):
        dt_ = r2.dtype
        inside = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        r2inv = 1.0 / r2
        r6inv = r2inv ** 3
        lj1 = jnp.asarray(self.lj1, dt_)[it, jt]
        lj2 = jnp.asarray(self.lj2, dt_)[it, jt]
        lj3 = jnp.asarray(self.lj3, dt_)[it, jt]
        lj4 = jnp.asarray(self.lj4, dt_)[it, jt]
        sw1 = jnp.asarray(self.ljsw1, dt_)[it, jt]
        sw2 = jnp.asarray(self.ljsw2, dt_)[it, jt]
        sw3 = jnp.asarray(self.ljsw3, dt_)[it, jt]
        sw4 = jnp.asarray(self.ljsw4, dt_)[it, jt]
        sw5 = jnp.asarray(self.ljsw5, dt_)[it, jt]
        forcelj = r6inv * (lj1 * r6inv - lj2)
        r = jnp.sqrt(r2)
        t = r - self.cut_inner_g
        outer = r2 > self.cut_inner_g ** 2
        forcelj = forcelj + jnp.where(outer, r * t * t * (sw1 + sw2 * t),
                                      0.0)
        fpair = jnp.where(inside, forcelj * r2inv, 0.0)
        e = r6inv * (lj3 * r6inv - lj4) + sw5
        e = e + jnp.where(outer, t ** 3 * (sw3 + sw4 * t), 0.0)
        return fpair, jnp.where(inside, e, 0.0), None, None


@register_pair("lj/smooth/linear")
class PairLJSmoothLinear(_SimpleTablePair):
    """LJ shifted so that E and F vanish at the cutoff
    (src/EXTRA-PAIR/pair_lj_smooth_linear.cpp:100-130, :235-241)."""

    name = "lj/smooth/linear"
    ncoeff = 2  # epsilon sigma

    def derive(self):
        eps, sig = self.params
        self.lj1 = 48.0 * eps * sig ** 12
        self.lj2 = 24.0 * eps * sig ** 6
        self.lj3 = 4.0 * eps * sig ** 12
        self.lj4 = 4.0 * eps * sig ** 6
        rc = np.where(self.cut > 0, self.cut, 1.0)
        cut6inv = 1.0 / rc ** 6
        cutinv = 1.0 / rc
        self.ljcut = cut6inv * (self.lj3 * cut6inv - self.lj4)
        self.dljcut = cutinv * cut6inv * (self.lj1 * cut6inv - self.lj2)

    def pair_fn(self, r2, it, jt):
        dt_ = r2.dtype
        inside = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        r2inv = 1.0 / r2
        r6inv = r2inv ** 3
        rinv = jnp.sqrt(r2inv)
        lj1 = jnp.asarray(self.lj1, dt_)[it, jt]
        lj2 = jnp.asarray(self.lj2, dt_)[it, jt]
        lj3 = jnp.asarray(self.lj3, dt_)[it, jt]
        lj4 = jnp.asarray(self.lj4, dt_)[it, jt]
        ljc = jnp.asarray(self.ljcut, dt_)[it, jt]
        dljc = jnp.asarray(self.dljcut, dt_)[it, jt]
        rcut = jnp.asarray(self.cut, dt_)[it, jt]
        forcelj = r6inv * (lj1 * r6inv - lj2)
        forcelj = rinv * forcelj - dljc
        fpair = jnp.where(inside, forcelj * rinv, 0.0)
        r = jnp.sqrt(r2)
        e = r6inv * (lj3 * r6inv - lj4) - ljc + (r - rcut) * dljc
        return fpair, jnp.where(inside, e, 0.0), None, None


@register_pair("harmonic/cut")
class PairHarmonicCut(_SimpleTablePair):
    """Repulsive-only harmonic spring E = k (rc - r)^2
    (src/EXTRA-PAIR/pair_harmonic_cut.cpp)."""

    name = "harmonic/cut"
    ncoeff = 1  # k

    def settings(self):
        self.cut_global = 0.0  # cutoffs are per-coeff

    def coeff(self, ilo, ihi, jlo, jhi, k, cut):
        for i in range(ilo, ihi + 1):
            for j in range(max(jlo, i), jhi + 1):
                self.params[0, i, j] = k
                self.cut[i, j] = cut
                self._setflag[i, j] = True

    def init(self):
        nt = self.ntypes
        k = self.params[0]
        for i in range(1, nt + 1):
            for j in range(i, nt + 1):
                if not self._setflag[i, j]:
                    # init_one: k mixed geometric, cut mixed arithmetic
                    k[i, j] = np.sqrt(k[i, i] * k[j, j])
                    self.cut[i, j] = 0.5 * (self.cut[i, i]
                                            + self.cut[j, j])
                self.params[:, j, i] = self.params[:, i, j]
                self.cut[j, i] = self.cut[i, j]
        self.cutsq = self.cut * self.cut

    def pair_fn(self, r2, it, jt):
        dt_ = r2.dtype
        k = jnp.asarray(self.params[0], dt_)[it, jt]
        rc = jnp.asarray(self.cut, dt_)[it, jt]
        inside = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        r = jnp.sqrt(r2)
        delta = rc - r
        fpair = jnp.where(inside, 2.0 * k * delta / r, 0.0)
        e = jnp.where(inside, k * delta * delta, 0.0)
        return fpair, e, None, None


class _LJWolfDSFBase(_SimpleTablePair):
    """Shared LJ 12-6 + damped-coulomb machinery for the wolf/dsf
    combos (src/EXTRA-PAIR/pair_lj_cut_coul_{wolf,dsf}.cpp)."""

    ncoeff = 2  # epsilon sigma

    def settings(self, alf, cut_lj, cut_coul=None):
        self.alf = float(alf)
        self.cut_global = float(cut_lj)
        self.cut_coul = (float(cut_coul) if cut_coul is not None
                         else float(cut_lj))

    def derive(self):
        eps, sig = self.params
        self.lj1 = 48.0 * eps * sig**12
        self.lj2 = 24.0 * eps * sig**6
        self.lj3 = 4.0 * eps * sig**12
        self.lj4 = 4.0 * eps * sig**6
        self._derive_coul()

    @property
    def max_cutoff(self):
        return max(float(self.cut[1:, 1:].max()), self.cut_coul)

    def _lj_terms(self, r2, it, jt, w_lj):
        dt_ = r2.dtype
        in_lj = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        r2inv = 1.0 / r2
        r6inv = r2inv**3
        lj1 = jnp.asarray(self.lj1, dt_)[it, jt]
        lj2 = jnp.asarray(self.lj2, dt_)[it, jt]
        lj3 = jnp.asarray(self.lj3, dt_)[it, jt]
        lj4 = jnp.asarray(self.lj4, dt_)[it, jt]
        forcelj = r6inv * (lj1 * r6inv - lj2)
        fpair = jnp.where(in_lj, w_lj * forcelj * r2inv, 0.0)
        e = jnp.where(in_lj, w_lj * r6inv * (lj3 * r6inv - lj4), 0.0)
        return fpair, e


@register_pair("lj/cut/coul/wolf")
class PairLJCutCoulWolf(_LJWolfDSFBase):
    """LJ 12-6 + Wolf-summation coulomb
    (src/EXTRA-PAIR/pair_lj_cut_coul_wolf.cpp:76-200)."""

    name = "lj/cut/coul/wolf"

    def _derive_coul(self):
        from math import erfc, exp
        rc = self.cut_coul
        self.cut_coulsq = rc * rc
        self.e_shift = erfc(self.alf * rc) / rc
        self.f_shift = -(self.e_shift + 2.0 * self.alf / MY_PIS
                         * exp(-self.alf * self.alf * rc * rc)) / rc

    def ecoul_self(self, q):
        return jnp.sum(-(self.e_shift / 2.0 + self.alf / MY_PIS)
                       * q * q * self.units.qqr2e)

    def _coul_terms(self, r2, w_coul, qi, qj):
        in_c = r2 < self.cut_coulsq
        r = jnp.sqrt(r2)
        prefactor = self.units.qqr2e * qi * qj / r
        erfcc = jerfc(self.alf * r)
        erfcd = jnp.exp(-self.alf * self.alf * r2)
        v_sh = (erfcc - self.e_shift * r) * prefactor
        dvdrr = (erfcc / r2 + 2.0 * self.alf / MY_PIS * erfcd / r) \
            + self.f_shift
        forcecoul = dvdrr * r2 * prefactor - (1.0 - w_coul) * prefactor
        ec = v_sh - (1.0 - w_coul) * prefactor
        return jnp.where(in_c, ec, 0.0), jnp.where(in_c, forcecoul / r2,
                                                   0.0)

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        fpair, e = self._lj_terms(r2, it, jt, w_lj)
        ec, fc = self._coul_terms(r2, w_coul, qi, qj)
        return fpair, e, ec, fc


@register_pair("lj/cut/coul/dsf")
class PairLJCutCoulDSF(_LJWolfDSFBase):
    """LJ 12-6 + damped-shifted-force coulomb
    (src/EXTRA-PAIR/pair_lj_cut_coul_dsf.cpp:85-215)."""

    name = "lj/cut/coul/dsf"

    def _derive_coul(self):
        from math import erfc, exp
        rc = self.cut_coul
        self.cut_coulsq = rc * rc
        erfcc = erfc(self.alf * rc)
        erfcd = exp(-self.alf * self.alf * rc * rc)
        self.f_shift = -(erfcc / self.cut_coulsq
                         + 2.0 / MY_PIS * self.alf * erfcd / rc)
        self.e_shift = erfcc / rc - self.f_shift * rc

    def ecoul_self(self, q):
        return jnp.sum(-(self.e_shift / 2.0 + self.alf / MY_PIS)
                       * q * q * self.units.qqr2e)

    # lj/cut/coul/dsf uses the A1-A5 erfc polynomial; born/coul/dsf
    # computes the TRUE erfc via erfcx*exp(-x^2)
    # (src/EXTRA-PAIR/pair_born_coul_dsf.cpp:135-137)
    dsf_true_erfc = False

    def _coul_terms(self, r2, w_coul, qi, qj):
        in_c = r2 < self.cut_coulsq
        r = jnp.sqrt(r2)
        prefactor = self.units.qqr2e * qi * qj / r
        erfcd = jnp.exp(-self.alf * self.alf * r2)
        if self.dsf_true_erfc:
            erfcc = jerfc(self.alf * r)
        else:
            t = 1.0 / (1.0 + EWALD_P * self.alf * r)
            erfcc = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) \
                * erfcd
        forcecoul = prefactor * (erfcc / r + 2.0 * self.alf / MY_PIS
                                 * erfcd + r * self.f_shift) * r
        forcecoul = forcecoul - (1.0 - w_coul) * prefactor
        ec = prefactor * (erfcc - r * self.e_shift - r2 * self.f_shift) \
            - (1.0 - w_coul) * prefactor
        return jnp.where(in_c, ec, 0.0), jnp.where(in_c, forcecoul / r2,
                                                   0.0)

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        fpair, e = self._lj_terms(r2, it, jt, w_lj)
        ec, fc = self._coul_terms(r2, w_coul, qi, qj)
        return fpair, e, ec, fc


class _BornCoulBase(_SimpleTablePair):
    """Born-Mayer-Huggins repulsion for the wolf/dsf combos
    (src/EXTRA-PAIR/pair_born_coul_{wolf,dsf}.cpp)."""

    ncoeff = 5  # a rho sigma c d

    def _derive_born(self):
        a, rho, sig, c, d = self.params
        with np.errstate(divide="ignore", invalid="ignore"):
            self.rhoinv = np.where(rho > 0, 1.0 / np.where(rho > 0, rho, 1),
                                   0.0)
        self.born1 = a * self.rhoinv
        self.born2 = 6.0 * c
        self.born3 = 8.0 * d

    def _born_terms(self, r2, it, jt, w_lj):
        dt_ = r2.dtype
        in_r = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        r2inv = 1.0 / r2
        r6inv = r2inv**3
        r = jnp.sqrt(r2)
        a = jnp.asarray(self.params[0], dt_)[it, jt]
        sig = jnp.asarray(self.params[2], dt_)[it, jt]
        c = jnp.asarray(self.params[3], dt_)[it, jt]
        d = jnp.asarray(self.params[4], dt_)[it, jt]
        rhoinv = jnp.asarray(self.rhoinv, dt_)[it, jt]
        rexp = jnp.exp((sig - r) * rhoinv)
        forceborn = (a * rhoinv * r * rexp - 6.0 * c * r6inv
                     + 8.0 * d * r2inv * r6inv)
        e = a * rexp - c * r6inv + d * r6inv * r2inv
        return (jnp.where(in_r, w_lj * forceborn * r2inv, 0.0),
                jnp.where(in_r, w_lj * e, 0.0))


@register_pair("born/coul/wolf")
class PairBornCoulWolf(_BornCoulBase, PairLJCutCoulWolf):
    name = "born/coul/wolf"
    ncoeff = 5

    def derive(self):
        self._derive_born()
        self._derive_coul()

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        fpair, e = self._born_terms(r2, it, jt, w_lj)
        ec, fc = self._coul_terms(r2, w_coul, qi, qj)
        return fpair, e, ec, fc


@register_pair("born/coul/dsf")
class PairBornCoulDSF(_BornCoulBase, PairLJCutCoulDSF):
    name = "born/coul/dsf"
    ncoeff = 5
    dsf_true_erfc = True

    def derive(self):
        self._derive_born()
        self._derive_coul()

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        fpair, e = self._born_terms(r2, it, jt, w_lj)
        ec, fc = self._coul_terms(r2, w_coul, qi, qj)
        return fpair, e, ec, fc
