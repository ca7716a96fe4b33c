"""Assorted pairwise styles: morse, buck, yukawa, coul/cut, coul/long,
lj/cut/coul/cut, lj/cut/coul/long, soft, gauss, zero.

One-screen styles built on the shared pairwise driver; physics per the
reference kernels (src/pair_morse.cpp, pair_buck.cpp, pair_yukawa.cpp,
pair_coul_cut.cpp, src/KSPACE/pair_lj_cut_coul_long.cpp, ...).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpumd.models.base import PairStyle
from tpumd.models.pair_charmm import A1, A2, A3, A4, A5, EWALD_F, EWALD_P
from tpumd.models.registry import register_pair


class _SimpleTablePair(PairStyle):
    """Per-type-pair coefficient table with a global cutoff."""

    ncoeff = 0

    def __init__(self, ntypes):
        super().__init__(ntypes)
        shape = (ntypes + 1, ntypes + 1)
        self.params = np.zeros((self.ncoeff,) + shape)
        self.cut = np.zeros(shape)
        self.cut_global = 0.0

    def settings(self, cut_global):
        self.cut_global = float(cut_global)

    def coeff(self, ilo, ihi, jlo, jhi, *vals):
        cut = self.cut_global
        if len(vals) == self.ncoeff + 1:
            *vals, cut = vals
        for i in range(ilo, ihi + 1):
            for j in range(max(jlo, i), jhi + 1):
                for c, v in enumerate(vals):
                    self.params[c, i, j] = v
                self.cut[i, j] = cut
                self._setflag[i, j] = True

    allow_unset = False  # hybrid sub-styles own only some type pairs

    def init(self):
        nt = self.ntypes
        for i in range(1, nt + 1):
            for j in range(i, nt + 1):
                if not self._setflag[i, j]:
                    if self._setflag[i, i] and self._setflag[j, j]:
                        for c in range(self.ncoeff):
                            self.params[c, i, j] = self.mix_energy(
                                self.params[c, i, i], self.params[c, j, j],
                                1.0, 1.0) if c == 0 else 0.5 * (
                                self.params[c, i, i] + self.params[c, j, j])
                        self.cut[i, j] = self.cut_global
                    elif not self.allow_unset:
                        raise ValueError(f"pair coeffs not set for {i},{j}")
                self.params[:, j, i] = self.params[:, i, j]
                self.cut[j, i] = self.cut[i, j]
        self.cutsq = self.cut * self.cut
        self.derive()

    def derive(self):
        pass

    @property
    def max_cutoff(self):
        return float(self.cut[1:, 1:].max())


@register_pair("morse")
class PairMorse(_SimpleTablePair):
    """E = D0[e^{-2a(r-r0)} - 2e^{-a(r-r0)}] (src/pair_morse.cpp)."""

    name = "morse"
    ncoeff = 3  # d0, alpha, r0

    def derive(self):
        d0, alpha, r0 = self.params
        self.morse1 = 2.0 * d0 * alpha
        if self.shift:
            ratio = np.exp(-alpha * (self.cut - r0))
            self.offset = np.where(self.cut > 0, d0 * (ratio**2 - 2 * ratio), 0)
        else:
            self.offset = np.zeros_like(d0)

    def pair_fn(self, r2, it, jt):
        dt_ = r2.dtype
        d0 = jnp.asarray(self.params[0], dt_)[it, jt]
        alpha = jnp.asarray(self.params[1], dt_)[it, jt]
        r0 = jnp.asarray(self.params[2], dt_)[it, jt]
        m1 = jnp.asarray(self.morse1, dt_)[it, jt]
        off = jnp.asarray(self.offset, dt_)[it, jt]
        inside = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        r = jnp.sqrt(r2)
        ralpha = jnp.exp(-alpha * (r - r0))
        fpair = jnp.where(inside, m1 * (ralpha * ralpha - ralpha) / r, 0.0)
        e = jnp.where(inside, d0 * (ralpha * ralpha - 2.0 * ralpha) - off, 0.0)
        return fpair, e, None, None


@register_pair("buck")
class PairBuck(_SimpleTablePair):
    """E = A e^{-r/rho} - C/r^6 (src/pair_buck.cpp)."""

    name = "buck"
    ncoeff = 3  # a, rho, c

    def pair_fn(self, r2, it, jt):
        dt_ = r2.dtype
        a = jnp.asarray(self.params[0], dt_)[it, jt]
        rho = jnp.asarray(self.params[1], dt_)[it, jt]
        c = jnp.asarray(self.params[2], dt_)[it, jt]
        inside = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        r = jnp.sqrt(r2)
        r2inv = 1.0 / r2
        r6inv = r2inv**3
        rexp = jnp.exp(-r / jnp.maximum(rho, 1e-30))
        forcebuck = a / jnp.maximum(rho, 1e-30) * r * rexp - 6.0 * c * r6inv
        fpair = jnp.where(inside, forcebuck * r2inv, 0.0)
        e = jnp.where(inside, a * rexp - c * r6inv, 0.0)
        return fpair, e, None, None


@register_pair("yukawa")
class PairYukawa(_SimpleTablePair):
    """E = A e^{-kappa r}/r (src/pair_yukawa.cpp); kappa in settings."""

    name = "yukawa"
    ncoeff = 1  # a

    def settings(self, kappa, cut_global):
        self.kappa = float(kappa)
        self.cut_global = float(cut_global)

    def pair_fn(self, r2, it, jt):
        dt_ = r2.dtype
        a = jnp.asarray(self.params[0], dt_)[it, jt]
        inside = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        r = jnp.sqrt(r2)
        rinv = 1.0 / r
        screening = jnp.exp(-self.kappa * r)
        forceyuk = a * screening * (self.kappa + rinv)
        fpair = jnp.where(inside, forceyuk * rinv * rinv, 0.0)
        e = jnp.where(inside, a * screening * rinv, 0.0)
        return fpair, e, None, None


@register_pair("coul/cut")
class PairCoulCut(_SimpleTablePair):
    """E = C q_i q_j / r, truncated (src/pair_coul_cut.cpp)."""

    name = "coul/cut"
    ncoeff = 0

    def coeff(self, ilo, ihi, jlo, jhi, *vals):
        cut = vals[0] if vals else self.cut_global
        for i in range(ilo, ihi + 1):
            for j in range(max(jlo, i), jhi + 1):
                self.cut[i, j] = cut
                self._setflag[i, j] = True

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        dt_ = r2.dtype
        inside = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        rinv = 1.0 / jnp.sqrt(r2)
        forcecoul = self.units.qqr2e * qi * qj * rinv
        fcoul = jnp.where(inside, w_coul * forcecoul / r2, 0.0)
        ec = jnp.where(inside, w_coul * forcecoul, 0.0)
        return jnp.zeros_like(r2), jnp.zeros_like(r2), ec, fcoul


@register_pair("lj/cut/coul/cut")
class PairLJCutCoulCut(_SimpleTablePair):
    name = "lj/cut/coul/cut"
    ncoeff = 2  # epsilon sigma

    def settings(self, cut_lj, cut_coul=None):
        self.cut_global = float(cut_lj)
        self.cut_coul = float(cut_coul) if cut_coul is not None else float(cut_lj)

    def derive(self):
        eps, sig = self.params
        self.lj1 = 48.0 * eps * sig**12
        self.lj2 = 24.0 * eps * sig**6
        self.lj3 = 4.0 * eps * sig**12
        self.lj4 = 4.0 * eps * sig**6
        self.cut_coulsq = self.cut_coul**2

    @property
    def max_cutoff(self):
        return max(float(self.cut[1:, 1:].max()), self.cut_coul)

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
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
        fcoul = ec = None
        if qi is not None:
            in_c = r2 < self.cut_coulsq
            forcecoul = self.units.qqr2e * qi * qj * jnp.sqrt(r2inv)
            fcoul = jnp.where(in_c, w_coul * forcecoul * r2inv, 0.0)
            ec = jnp.where(in_c, w_coul * forcecoul, 0.0)
        return fpair, e, ec, fcoul


@register_pair("lj/cut/coul/long")
class PairLJCutCoulLong(PairLJCutCoulCut):
    """LJ + Ewald-erfc coulomb (src/KSPACE/pair_lj_cut_coul_long.cpp)."""

    name = "lj/cut/coul/long"
    g_ewald = 0.0

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
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
        in_c = r2 < self.cut_coulsq
        r = jnp.sqrt(r2)
        grij = self.g_ewald * r
        expm2 = jnp.exp(-grij * grij)
        t = 1.0 / (1.0 + EWALD_P * grij)
        erfc = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * expm2
        prefactor = self.units.qqr2e * qi * qj / r
        forcecoul = prefactor * (erfc + EWALD_F * grij * expm2) \
            - (1.0 - w_coul) * prefactor
        ec = jnp.where(in_c, prefactor * erfc - (1.0 - w_coul) * prefactor, 0.0)
        fcoul = jnp.where(in_c, forcecoul * r2inv, 0.0)
        return fpair, e, ec, fcoul


@register_pair("soft")
class PairSoft(_SimpleTablePair):
    """E = A(1 + cos(pi r / rc)) (src/pair_soft.cpp)."""

    name = "soft"
    ncoeff = 1

    def pair_fn(self, r2, it, jt):
        dt_ = r2.dtype
        a = jnp.asarray(self.params[0], dt_)[it, jt]
        cut = jnp.asarray(self.cut, dt_)[it, jt]
        inside = r2 < cut * cut
        r = jnp.sqrt(r2)
        arg = jnp.pi / jnp.maximum(cut, 1e-30)
        fpair = jnp.where(inside & (r > 0),
                          a * arg * jnp.sin(arg * r) / jnp.maximum(r, 1e-30), 0.0)
        e = jnp.where(inside, a * (1.0 + jnp.cos(arg * r)), 0.0)
        return fpair, e, None, None


@register_pair("gauss")
class PairGauss(_SimpleTablePair):
    """E = -A exp(-B r^2) (src/pair_gauss.cpp)."""

    name = "gauss"
    ncoeff = 2

    def pair_fn(self, r2, it, jt):
        dt_ = r2.dtype
        a = jnp.asarray(self.params[0], dt_)[it, jt]
        b = jnp.asarray(self.params[1], dt_)[it, jt]
        inside = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        fpair = jnp.where(inside, -2.0 * a * b * jnp.exp(-b * r2), 0.0)
        e = jnp.where(inside, -a * jnp.exp(-b * r2), 0.0)
        return fpair, e, None, None


@register_pair("zero")
class PairZero(_SimpleTablePair):
    """No interactions, only a neighbor cutoff (src/pair_zero.cpp)."""

    name = "zero"
    ncoeff = 0

    def coeff(self, ilo, ihi, jlo, jhi, *vals):
        for i in range(ilo, ihi + 1):
            for j in range(max(jlo, i), jhi + 1):
                self.cut[i, j] = self.cut_global
                self._setflag[i, j] = True

    def pair_fn(self, r2, it, jt):
        z = jnp.zeros_like(r2)
        return z, z, None, None


@register_pair("born")
class PairBorn(_SimpleTablePair):
    """Born-Mayer-Huggins: E = A e^{(sigma-r)/rho} - C/r^6 + D/r^8
    (src/pair_born.cpp)."""

    name = "born"
    ncoeff = 5  # a, rho, sigma, c, d

    def derive(self):
        a, rho, sigma, c, d = self.params
        with np.errstate(divide="ignore", invalid="ignore"):
            rhoinv = np.where(rho > 0, 1.0 / np.where(rho > 0, rho, 1), 0.0)
        self.born1 = a * rhoinv
        self.born2 = 6.0 * c
        self.born3 = 8.0 * d
        if self.shift:
            rc = np.where(self.cut > 0, self.cut, 1.0)
            self.offset = np.where(
                self.cut > 0,
                a * np.exp((sigma - rc) * rhoinv) - c / rc**6 + d / rc**8, 0)
        else:
            self.offset = np.zeros_like(a)

    def pair_fn(self, r2, it, jt):
        dt_ = r2.dtype
        a = jnp.asarray(self.params[0], dt_)[it, jt]
        rhoinv = jnp.asarray(
            np.where(self.params[1] > 0, 1.0 /
                     np.where(self.params[1] > 0, self.params[1], 1), 0.0),
            dt_)[it, jt]
        sigma = jnp.asarray(self.params[2], dt_)[it, jt]
        c = jnp.asarray(self.params[3], dt_)[it, jt]
        d = jnp.asarray(self.params[4], dt_)[it, jt]
        b1 = jnp.asarray(self.born1, dt_)[it, jt]
        b2 = jnp.asarray(self.born2, dt_)[it, jt]
        b3 = jnp.asarray(self.born3, dt_)[it, jt]
        off = jnp.asarray(self.offset, dt_)[it, jt]
        inside = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        r = jnp.sqrt(r2)
        r2inv = 1.0 / r2
        r6inv = r2inv * r2inv * r2inv
        rexp = jnp.exp((sigma - r) * rhoinv)
        forceborn = b1 * r * rexp - b2 * r6inv + b3 * r6inv * r2inv
        fpair = jnp.where(inside, forceborn * r2inv, 0.0)
        e = jnp.where(inside,
                      a * rexp - c * r6inv + d * r6inv * r2inv - off, 0.0)
        return fpair, e, None, None


@register_pair("lj/expand")
class PairLJExpand(_SimpleTablePair):
    """Shifted-core LJ: E = 4 eps[(s/(r-delta))^12 - (s/(r-delta))^6]
    (src/pair_lj_expand.cpp)."""

    name = "lj/expand"
    ncoeff = 3  # epsilon, sigma, delta

    def derive(self):
        eps, sig, delta = self.params
        # PairLJExpand::init_one returns cut + shift: the interaction
        # range extends past the nominal cutoff by the core shift
        self.cutsq = np.where(self.cut > 0, (self.cut + delta) ** 2, 0.0)
        self.lj1 = 48.0 * eps * sig**12
        self.lj2 = 24.0 * eps * sig**6
        self.lj3 = 4.0 * eps * sig**12
        self.lj4 = 4.0 * eps * sig**6
        if self.shift:
            rc = np.where(self.cut > 0, self.cut, 1.0)
            sr6 = (sig / rc) ** 6
            self.offset = np.where(self.cut > 0,
                                   4.0 * eps * (sr6**2 - sr6), 0.0)
        else:
            self.offset = np.zeros_like(eps)

    def pair_fn(self, r2, it, jt):
        dt_ = r2.dtype
        delta = jnp.asarray(self.params[2], dt_)[it, jt]
        lj1 = jnp.asarray(self.lj1, dt_)[it, jt]
        lj2 = jnp.asarray(self.lj2, dt_)[it, jt]
        lj3 = jnp.asarray(self.lj3, dt_)[it, jt]
        lj4 = jnp.asarray(self.lj4, dt_)[it, jt]
        off = jnp.asarray(self.offset, dt_)[it, jt]
        inside = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        r = jnp.sqrt(r2)
        rshift = jnp.where(inside, r - delta, jnp.ones_like(r))
        rshift = jnp.where(rshift > 0, rshift, 1e-10)
        rinv2 = 1.0 / (rshift * rshift)
        r6inv = rinv2 * rinv2 * rinv2
        forcelj = r6inv * (lj1 * r6inv - lj2)
        fpair = jnp.where(inside, forcelj / rshift / r, 0.0)
        e = jnp.where(inside, r6inv * (lj3 * r6inv - lj4) - off, 0.0)
        return fpair, e, None, None

    @property
    def max_cutoff(self):
        return float((self.cut + self.params[2])[1:, 1:].max())


@register_pair("coul/debye")
class PairCoulDebye(_SimpleTablePair):
    """Screened Coulomb: E = qq/r e^{-kappa r} (src/pair_coul_debye.cpp)."""

    name = "coul/debye"
    ncoeff = 0

    def settings(self, kappa, cut_global):
        self.kappa = float(kappa)
        self.cut_global = float(cut_global)
        self._setflag[1:, 1:] = True
        self.cut[:, :] = self.cut_global

    def coeff(self, ilo, ihi, jlo, jhi, *vals):
        cut = float(vals[0]) if vals else self.cut_global
        for i in range(ilo, ihi + 1):
            for j in range(max(jlo, i), jhi + 1):
                self.cut[i, j] = self.cut[j, i] = cut
                self._setflag[i, j] = True

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        dt_ = r2.dtype
        qqrd2e = self.units.qqr2e
        inside = r2 < jnp.asarray(self.cutsq, dt_)[it, jt]
        r = jnp.sqrt(r2)
        rinv = 1.0 / r
        screening = jnp.exp(-self.kappa * r)
        forcecoul = qqrd2e * qi * qj * screening * (self.kappa + rinv)
        fpair = jnp.where(inside, w_coul * forcecoul * rinv * rinv, 0.0)
        ecoul = jnp.where(inside,
                          w_coul * qqrd2e * qi * qj * rinv * screening, 0.0)
        zero = jnp.zeros_like(fpair)
        return fpair, zero, ecoul, None
