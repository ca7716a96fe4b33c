"""Many-body pair styles: Stillinger-Weber (sw) and Tersoff.

Physics per the reference (src/MANYBODY/pair_sw.cpp, pair_tersoff.cpp),
both on FULL neighbor lists.  JAX-native design: the styles define the
total potential ENERGY as a pure function of positions; forces are exact
reverse-mode gradients (``jax.grad``) and the virial is the strain
derivative W_ab = -dE/d(eps_ab) — no hand-derived three-body force
algebra, no scatter (the reference instead scatters fj/fk from each
central atom's loop, pair_sw.cpp:539-600).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpumd.models.base import PairStyle
from tpumd.models.registry import register_pair


def _strained(x, box_lengths, eps6):
    """Apply a symmetric strain (xx,yy,zz,xy,xz,yz) to coords + box."""
    e = jnp.array([[eps6[0], eps6[3], eps6[4]],
                   [0.0, eps6[1], eps6[5]],
                   [0.0, 0.0, eps6[2]]], x.dtype)
    strain = jnp.eye(3, dtype=x.dtype) + e
    # full-f32 matmul: bf16 passes on TPU would corrupt the strained
    # coordinates (|x| ~ box size) and the virial derivative with them
    hi = jax.lax.Precision.HIGHEST
    return (jnp.matmul(x, strain.T, precision=hi),
            jnp.matmul(strain, box_lengths, precision=hi))


class EnergyPairStyle(PairStyle):
    """Pair style defined by a total-energy function; forces via autodiff."""

    supports_cellgrid = False
    supports_image_ext = False

    def energy(self, x, type_, ell, idx):
        raise NotImplementedError

    def compute(self, x, type_, box, idx, sbits, special_lj, special_coul,
                eflag: bool, vflag: bool, q=None, ext=None):
        assert ext is None, (
            f"{self.name}: small-box multi-image mode not supported")
        ell = box.lengths

        e, negf = jax.value_and_grad(self.energy)(x, type_, ell, idx)
        f = -negf
        virial = None
        if vflag:
            def e_of_strain(eps6):
                xs, ells = _strained(x, ell, eps6)
                return self.energy(xs, type_, ells, idx)
            virial = -jax.grad(e_of_strain)(jnp.zeros((6,), x.dtype))
        return f, (e if eflag else None), None, virial


def _read_sw_file(path: str):
    entries = {}
    toks = []
    with open(path) as fh:
        for line in fh:
            line = line.split("#", 1)[0].strip()
            if line:
                toks.extend(line.split())
    i = 0
    while i + 14 <= len(toks):   # 3 element names + 11 parameters
        e1, e2, e3 = toks[i:i + 3]
        entries[(e1, e2, e3)] = [float(v) for v in toks[i + 3:i + 14]]
        i += 14
    return entries


@register_pair("sw")
class PairSW(EnergyPairStyle):
    """Stillinger-Weber: phi2 + angular phi3 over central-atom triplets.

    Parameter file rows: elem1 elem2 elem3 epsilon sigma a lambda gamma
    costheta0 A B p q tol (src/MANYBODY/pair_sw.cpp read_file).
    """

    name = "sw"

    def settings(self):
        pass

    def coeff(self, ilo, ihi, jlo, jhi, filename, *elems):
        self.elements = [str(e) for e in elems]
        entries = _read_sw_file(str(filename))
        nt = self.ntypes
        names = ["epsilon", "sigma", "a", "lambda", "gamma", "costheta0",
                 "A", "B", "p", "q", "tol"]
        self.p = {n: np.zeros((nt + 1,) * 3) for n in names}
        for i in range(1, nt + 1):
            for j in range(1, nt + 1):
                for k in range(1, nt + 1):
                    key = (self.elements[i - 1], self.elements[j - 1],
                           self.elements[k - 1])
                    vals = entries[key]
                    for c, nme in enumerate(names):
                        self.p[nme][i, j, k] = vals[c]

    def init(self):
        self.cut_tbl = self.p["sigma"] * self.p["a"]

    @property
    def max_cutoff(self):
        return float(self.cut_tbl[1:, 1:, 1:].max())

    def energy(self, x, type_, ell, idx):
        dt_ = x.dtype
        n, k = idx.shape
        self_idx = jnp.arange(n, dtype=idx.dtype)[:, None]
        nmask = idx != self_idx
        d = x[:, None, :] - x[idx]
        d = d - ell * jnp.round(d / ell)
        r2 = jnp.sum(d * d, -1)
        it = type_[:, None]
        jt = type_[idx]

        cut = jnp.asarray(self.cut_tbl, dt_)
        sig = jnp.asarray(self.p["sigma"], dt_)
        eps = jnp.asarray(self.p["epsilon"], dt_)
        A_ = jnp.asarray(self.p["A"], dt_)
        B_ = jnp.asarray(self.p["B"], dt_)
        pp = jnp.asarray(self.p["p"], dt_)
        qq = jnp.asarray(self.p["q"], dt_)
        lam = jnp.asarray(self.p["lambda"], dt_)
        gam = jnp.asarray(self.p["gamma"], dt_)
        cth0 = jnp.asarray(self.p["costheta0"], dt_)

        # two-body, params (i,j,j)
        cij = cut[it, jt, jt]
        in2 = nmask & (r2 < cij * cij)
        r = jnp.sqrt(jnp.where(in2, r2, 1.0))
        rs = jnp.where(in2, r, cij - 1.0)  # keep exp argument finite
        sij = sig[it, jt, jt]
        phi2 = (A_[it, jt, jt] * eps[it, jt, jt]
                * (B_[it, jt, jt] * (sij / rs) ** pp[it, jt, jt]
                   - (sij / rs) ** qq[it, jt, jt])
                * jnp.exp(sij / (rs - cij)))
        e2 = 0.5 * jnp.sum(jnp.where(in2, phi2, 0.0))

        # three-body legs: g_ij with params (i,j,j) per the reference's
        # elem3param(i,j,j) leg convention
        gleg = jnp.where(
            in2, jnp.exp(gam[it, jt, jt] * sij / (rs - cij)), 0.0)
        rinv = jnp.where(in2, 1.0 / rs, 0.0)
        # cos(theta_jik) over neighbor pairs (j, k) of i
        dot = jnp.einsum("nkc,nlc->nkl", d, d)
        cs = dot * rinv[:, :, None] * rinv[:, None, :]
        lam3 = lam[type_[:, None, None], jt[:, :, None], jt[:, None, :]]
        eps3 = eps[type_[:, None, None], jt[:, :, None], jt[:, None, :]]
        ct3 = cth0[type_[:, None, None], jt[:, :, None], jt[:, None, :]]
        delc = cs - ct3
        samej = idx[:, :, None] == idx[:, None, :]
        tmask = in2[:, :, None] & in2[:, None, :] & ~samej
        phi3 = lam3 * eps3 * delc * delc * gleg[:, :, None] * gleg[:, None, :]
        e3 = 0.5 * jnp.sum(jnp.where(tmask, phi3, 0.0))
        return e2 + e3


def _read_tersoff_file(path: str):
    entries = {}
    toks = []
    with open(path) as fh:
        for line in fh:
            line = line.split("#", 1)[0].strip()
            if line:
                toks.extend(line.split())
    i = 0
    while i + 17 <= len(toks):
        e1, e2, e3 = toks[i:i + 3]
        entries[(e1, e2, e3)] = [float(v) for v in toks[i + 3:i + 17]]
        i += 17
    return entries


@register_pair("tersoff")
class PairTersoff(EnergyPairStyle):
    """Tersoff bond-order potential (src/MANYBODY/pair_tersoff.cpp).

    File rows: e1 e2 e3 m gamma lambda3 c d costheta0 n beta lambda2 B R D
    lambda1 A.
    """

    name = "tersoff"

    def settings(self):
        pass

    def coeff(self, ilo, ihi, jlo, jhi, filename, *elems):
        self.elements = [str(e) for e in elems]
        entries = _read_tersoff_file(str(filename))
        nt = self.ntypes
        names = ["m", "gamma", "lam3", "c", "d", "h", "n", "beta",
                 "lam2", "B", "R", "D", "lam1", "A"]
        self.p = {nme: np.zeros((nt + 1,) * 3) for nme in names}
        for i in range(1, nt + 1):
            for j in range(1, nt + 1):
                for k in range(1, nt + 1):
                    key = (self.elements[i - 1], self.elements[j - 1],
                           self.elements[k - 1])
                    vals = entries[key]
                    for c, nme in enumerate(names):
                        self.p[nme][i, j, k] = vals[c]

    def init(self):
        self.cut_tbl = self.p["R"] + self.p["D"]

    @property
    def max_cutoff(self):
        return float(self.cut_tbl[1:, 1:, 1:].max())

    def energy(self, x, type_, ell, idx):
        dt_ = x.dtype
        n, k = idx.shape
        self_idx = jnp.arange(n, dtype=idx.dtype)[:, None]
        nmask = idx != self_idx
        d = x[:, None, :] - x[idx]
        d = d - ell * jnp.round(d / ell)
        r2 = jnp.sum(d * d, -1)
        it = type_[:, None]
        jt = type_[idx]

        P = {nme: jnp.asarray(v, dt_) for nme, v in self.p.items()}
        R = P["R"][it, jt, jt]
        D = P["D"][it, jt, jt]
        cutsq = (R + D) ** 2
        in2 = nmask & (r2 < cutsq)
        r = jnp.sqrt(jnp.where(in2, r2, 1.0))
        rs = jnp.where(in2, r, R + D + 1.0)

        # cutoff function fC (ters_fc)
        def fc(rr, R_, D_):
            return jnp.where(
                rr < R_ - D_, 1.0,
                jnp.where(rr > R_ + D_, 0.0,
                          0.5 * (1.0 - jnp.sin(0.5 * np.pi * (rr - R_) / D_))))

        fc_ij = jnp.where(in2, fc(rs, R, D), 0.0)
        f_rep = P["A"][it, jt, jt] * jnp.exp(-P["lam1"][it, jt, jt] * rs)
        f_att = -P["B"][it, jt, jt] * jnp.exp(-P["lam2"][it, jt, jt] * rs)

        # zeta over k neighbors, params (i, j, k)
        i3 = type_[:, None, None]
        j3 = jt[:, :, None]
        k3 = jt[:, None, :]
        # leg ik cutoff uses param (i,k,k); angular params use (i,j,k)
        Rik = P["R"][i3, k3, k3]
        Dik = P["D"][i3, k3, k3]
        r_ik = rs[:, None, :]
        in_ik = in2[:, None, :]
        fc_ik = jnp.where(in_ik, fc(r_ik, Rik, Dik), 0.0)
        dot = jnp.einsum("nkc,nlc->nkl", d, d)
        rinv = jnp.where(in2, 1.0 / rs, 0.0)
        cs = dot * rinv[:, :, None] * rinv[:, None, :]
        c_ = P["c"][i3, j3, k3]
        d_ = P["d"][i3, j3, k3]
        h_ = P["h"][i3, j3, k3]
        gam = P["gamma"][i3, j3, k3]
        gtheta = gam * (1.0 + c_ * c_ / (d_ * d_)
                        - c_ * c_ / (d_ * d_ + (cs - h_) ** 2))
        lam3 = P["lam3"][i3, j3, k3]
        m_ = P["m"][i3, j3, k3]
        arg = lam3 * (rs[:, :, None] - r_ik)
        ex_delr = jnp.where(m_ == 3, jnp.exp(arg ** 3), jnp.exp(arg))
        ex_delr = jnp.minimum(ex_delr, 1.0e30)
        samej = idx[:, :, None] == idx[:, None, :]
        zmask = in2[:, :, None] & in_ik & ~samej
        zeta = jnp.sum(jnp.where(zmask, fc_ik * gtheta * ex_delr, 0.0),
                       axis=2)

        beta = P["beta"][it, jt, jt]
        nn = P["n"][it, jt, jt]
        bz = beta * zeta
        b_ij = _ters_bij_exact(bz, nn)
        e = 0.5 * jnp.sum(
            jnp.where(in2, fc_ij * (f_rep + b_ij * f_att), 0.0))
        return e


def _read_entries(path: str, nvals: int):
    """3-element keyed parameter entries (Tersoff-family file layout)."""
    entries = {}
    toks = []
    with open(path) as fh:
        for line in fh:
            line = line.split("#", 1)[0].strip()
            if line:
                toks.extend(line.split())
    i = 0
    while i + 3 + nvals <= len(toks):
        e1, e2, e3 = toks[i:i + 3]
        entries[(e1, e2, e3)] = [float(v) for v in toks[i + 3:i + 3 + nvals]]
        i += 3 + nvals
    return entries


def _ters_bij_exact(bz, nn):
    """The reference's 5-branch bond-order function (PairTersoff::
    ters_bij, src/MANYBODY/pair_tersoff.cpp:300-310) with
    c1..c4 = ((2n 1e-16)^-1/n, (2n 1e-8)^-1/n, 1/c2, 1/c1)."""
    c1 = (2.0 * nn * 1.0e-16) ** (-1.0 / nn)
    c2 = (2.0 * nn * 1.0e-8) ** (-1.0 / nn)
    c3 = 1.0 / c2
    c4 = 1.0 / c1
    bz_s = jnp.maximum(bz, 1e-30)
    central = (1.0 + bz_s ** nn) ** (-1.0 / (2.0 * nn))
    hi2 = (1.0 - bz_s ** (-nn) / (2.0 * nn)) / jnp.sqrt(bz_s)
    lo2 = 1.0 - bz_s ** nn / (2.0 * nn)
    return jnp.where(
        bz > c1, 1.0 / jnp.sqrt(bz_s),
        jnp.where(bz > c2, hi2,
                  jnp.where(bz < c4, 1.0,
                            jnp.where(bz < c3, lo2, central))))


@register_pair("tersoff/mod")
class PairTersoffMod(EnergyPairStyle):
    """Tersoff/MOD (Kumagai) bond order (src/MANYBODY/pair_tersoff_mod.cpp).

    File rows: e1 e2 e3 beta(m) alpha(lam3) h eta(n) beta lam2 B R D
    lam1 A n(delta) c1 c2 c3 c4 c5; fc uses the 1.125/0.125 double-sine
    window (:233-242), g(theta) the c1..c5 form (pair_tersoff_mod.h:50),
    bij = (1+(beta zeta)^n)^(-1/(2 delta)) (:259-264, central branch).
    """

    name = "tersoff/mod"
    _NVALS = 17
    _NAMES = ["m", "lam3", "h", "n", "beta", "lam2", "B", "R", "D",
              "lam1", "A", "ndel", "c1", "c2", "c3", "c4", "c5"]

    def settings(self):
        pass

    def coeff(self, ilo, ihi, jlo, jhi, filename, *elems):
        self.elements = [str(e) for e in elems]
        entries = _read_entries(str(filename), self._NVALS)
        nt = self.ntypes
        self.p = {nme: np.zeros((nt + 1,) * 3) for nme in self._NAMES}
        for i in range(1, nt + 1):
            for j in range(1, nt + 1):
                for k in range(1, nt + 1):
                    key = (self.elements[i - 1], self.elements[j - 1],
                           self.elements[k - 1])
                    vals = entries[key]
                    for c, nme in enumerate(self._NAMES):
                        self.p[nme][i, j, k] = vals[c]

    def init(self):
        self.cut_tbl = self.p["R"] + self.p["D"]

    @property
    def max_cutoff(self):
        return float(self.cut_tbl[1:, 1:, 1:].max())

    @staticmethod
    def _fc(rr, R_, D_):
        t = 0.5 * np.pi * (rr - R_) / D_
        return jnp.where(
            rr < R_ - D_, 1.0,
            jnp.where(rr > R_ + D_, 0.0,
                      0.5 * (1.0 - 1.125 * jnp.sin(t)
                             - 0.125 * jnp.sin(3.0 * t))))

    def energy(self, x, type_, ell, idx):
        dt_ = x.dtype
        n = idx.shape[0]
        self_idx = jnp.arange(n, dtype=idx.dtype)[:, None]
        nmask = idx != self_idx
        d = x[:, None, :] - x[idx]
        d = d - ell * jnp.round(d / ell)
        r2 = jnp.sum(d * d, -1)
        it = type_[:, None]
        jt = type_[idx]

        P = {nme: jnp.asarray(v, dt_) for nme, v in self.p.items()}
        R = P["R"][it, jt, jt]
        D = P["D"][it, jt, jt]
        in2 = nmask & (r2 < (R + D) ** 2)
        rs = jnp.where(in2, jnp.sqrt(jnp.where(in2, r2, 1.0)),
                       R + D + 1.0)
        fc_ij = jnp.where(in2, self._fc(rs, R, D), 0.0)
        f_rep = P["A"][it, jt, jt] * jnp.exp(-P["lam1"][it, jt, jt] * rs)
        f_att = -P["B"][it, jt, jt] * jnp.exp(-P["lam2"][it, jt, jt] * rs)

        i3 = type_[:, None, None]
        j3 = jt[:, :, None]
        k3 = jt[:, None, :]
        Rik = P["R"][i3, k3, k3]
        Dik = P["D"][i3, k3, k3]
        r_ik = rs[:, None, :]
        in_ik = in2[:, None, :]
        fc_ik = jnp.where(in_ik, self._fc(r_ik, Rik, Dik), 0.0)
        dot = jnp.einsum("nkc,nlc->nkl", d, d)
        rinv = jnp.where(in2, 1.0 / rs, 0.0)
        cs = dot * rinv[:, :, None] * rinv[:, None, :]
        th = (P["h"][i3, j3, k3] - cs) ** 2
        c1, c2, c3 = (P["c1"][i3, j3, k3], P["c2"][i3, j3, k3],
                      P["c3"][i3, j3, k3])
        c4, c5 = P["c4"][i3, j3, k3], P["c5"][i3, j3, k3]
        gtheta = c1 + (c2 * th / (c3 + th)) * (1.0 + c4 * jnp.exp(-c5 * th))
        lam3 = P["lam3"][i3, j3, k3]
        m_ = P["m"][i3, j3, k3]
        arg = lam3 * (rs[:, :, None] - r_ik)
        ex_delr = jnp.where(m_ == 3, jnp.exp(arg ** 3), jnp.exp(arg))
        ex_delr = jnp.minimum(ex_delr, 1.0e30)
        samej = idx[:, :, None] == idx[:, None, :]
        zmask = in2[:, :, None] & in_ik & ~samej
        zeta = jnp.sum(jnp.where(zmask, fc_ik * gtheta * ex_delr, 0.0),
                       axis=2)

        beta = P["beta"][it, jt, jt]
        nn = P["n"][it, jt, jt]
        ndel = P["ndel"][it, jt, jt]
        bz = beta * zeta
        b_ij = (1.0 + bz ** nn) ** (-1.0 / (2.0 * ndel))
        return 0.5 * jnp.sum(
            jnp.where(in2, fc_ij * (f_rep + b_ij * f_att), 0.0))


@register_pair("tersoff/zbl")
class PairTersoffZBL(PairTersoff):
    """Tersoff with ZBL universal repulsion blended by a Fermi switch
    (src/MANYBODY/pair_tersoff_zbl.cpp:185-224): the repulsive pair term
    becomes (1-F) E_ZBL + F fc A e^{-lam1 r} with
    F = 1/(1+e^{-A_f (r - r_C)}); the ZBL part is NOT cutoff-windowed
    (it is negligible past ZBLcut by construction)."""

    name = "tersoff/zbl"
    # e1 e2 e3 then tersoff's 14 + Z_i Z_j ZBLcut ZBLexpscale
    _ZNAMES = ["m", "gamma", "lam3", "c", "d", "h", "n", "beta",
               "lam2", "B", "R", "D", "lam1", "A",
               "Zi", "Zj", "zblcut", "zblexp"]

    def coeff(self, ilo, ihi, jlo, jhi, filename, *elems):
        self.elements = [str(e) for e in elems]
        entries = _read_entries(str(filename), 18)
        nt = self.ntypes
        self.p = {nme: np.zeros((nt + 1,) * 3) for nme in self._ZNAMES}
        for i in range(1, nt + 1):
            for j in range(1, nt + 1):
                for k in range(1, nt + 1):
                    key = (self.elements[i - 1], self.elements[j - 1],
                           self.elements[k - 1])
                    vals = entries[key]
                    for c, nme in enumerate(self._ZNAMES):
                        self.p[nme][i, j, k] = vals[c]

    # metal-units ZBL constants (pair_tersoff_zbl.cpp:50-52)
    _a0 = 0.529
    _eps0 = 0.00552635

    def energy(self, x, type_, ell, idx):
        dt_ = x.dtype
        n = idx.shape[0]
        self_idx = jnp.arange(n, dtype=idx.dtype)[:, None]
        nmask = idx != self_idx
        d = x[:, None, :] - x[idx]
        d = d - ell * jnp.round(d / ell)
        r2 = jnp.sum(d * d, -1)
        it = type_[:, None]
        jt = type_[idx]

        P = {nme: jnp.asarray(v, dt_) for nme, v in self.p.items()}
        R = P["R"][it, jt, jt]
        D = P["D"][it, jt, jt]
        in2 = nmask & (r2 < (R + D) ** 2)
        rs = jnp.where(in2, jnp.sqrt(jnp.where(in2, r2, 1.0)),
                       R + D + 1.0)

        def fc(rr, R_, D_):
            return jnp.where(
                rr < R_ - D_, 1.0,
                jnp.where(rr > R_ + D_, 0.0,
                          0.5 * (1.0 - jnp.sin(
                              0.5 * np.pi * (rr - R_) / D_))))

        fc_ij = jnp.where(in2, fc(rs, R, D), 0.0)
        e_ters = fc_ij * P["A"][it, jt, jt] * jnp.exp(
            -P["lam1"][it, jt, jt] * rs)
        # ZBL universal screening (:199-213)
        Zi = P["Zi"][it, jt, jt]
        Zj = P["Zj"][it, jt, jt]
        a_ij = (0.8854 * self._a0) / (Zi ** 0.23 + Zj ** 0.23)
        premult = Zi * Zj / (4.0 * np.pi * self._eps0)
        roa = rs / a_ij
        phi = (0.1818 * jnp.exp(-3.2 * roa)
               + 0.5099 * jnp.exp(-0.9423 * roa)
               + 0.2802 * jnp.exp(-0.4029 * roa)
               + 0.02817 * jnp.exp(-0.2016 * roa))
        e_zbl = premult * phi / rs
        F = 1.0 / (1.0 + jnp.exp(-P["zblexp"][it, jt, jt]
                                 * (rs - P["zblcut"][it, jt, jt])))
        e_rep = (1.0 - F) * e_zbl + F * e_ters
        # the attractive term carries the Fermi factor too
        # (PairTersoffZBL::ters_fa, pair_tersoff_zbl.cpp:228-233)
        f_att = -P["B"][it, jt, jt] * jnp.exp(
            -P["lam2"][it, jt, jt] * rs) * F

        i3 = type_[:, None, None]
        j3 = jt[:, :, None]
        k3 = jt[:, None, :]
        Rik = P["R"][i3, k3, k3]
        Dik = P["D"][i3, k3, k3]
        r_ik = rs[:, None, :]
        in_ik = in2[:, None, :]
        fc_ik = jnp.where(in_ik, fc(r_ik, Rik, Dik), 0.0)
        dot = jnp.einsum("nkc,nlc->nkl", d, d)
        rinv = jnp.where(in2, 1.0 / rs, 0.0)
        cs = dot * rinv[:, :, None] * rinv[:, None, :]
        c_ = P["c"][i3, j3, k3]
        d_ = P["d"][i3, j3, k3]
        h_ = P["h"][i3, j3, k3]
        gam = P["gamma"][i3, j3, k3]
        gtheta = gam * (1.0 + c_ * c_ / (d_ * d_)
                        - c_ * c_ / (d_ * d_ + (cs - h_) ** 2))
        lam3 = P["lam3"][i3, j3, k3]
        m_ = P["m"][i3, j3, k3]
        arg = lam3 * (rs[:, :, None] - r_ik)
        ex_delr = jnp.minimum(
            jnp.where(m_ == 3, jnp.exp(arg ** 3), jnp.exp(arg)), 1.0e30)
        samej = idx[:, :, None] == idx[:, None, :]
        zmask = in2[:, :, None] & in_ik & ~samej
        zeta = jnp.sum(jnp.where(zmask, fc_ik * gtheta * ex_delr, 0.0),
                       axis=2)
        beta = P["beta"][it, jt, jt]
        nn = P["n"][it, jt, jt]
        bz = beta * zeta
        b_ij = _ters_bij_exact(bz, nn)
        return 0.5 * jnp.sum(
            jnp.where(in2, e_rep + b_ij * fc_ij * f_att, 0.0))


@register_pair("vashishta")
class PairVashishta(EnergyPairStyle):
    """Vashishta 2+3 body potential (src/MANYBODY/pair_vashishta.cpp).

    Two-body (:twobody, shifted so V and V' vanish at rc):
      H/r^eta + ZiZj qqr2e e^{-r/l1}/r - D e^{-r/l4}/r^4 - W/r^6
      - vrc - (r - rc) dvrc
    Three-body (:threebody, active for r < r0 on both legs):
      B exp(g/(r1-r0) + g/(r2-r0)) dcos^2/(1 + C dcos^2).
    File rows: e1 e2 e3 H eta Zi Zj lambda1 D lambda4 W rc B gamma r0 C
    costheta (setup_params:395-466 for the derived shifts)."""

    name = "vashishta"
    _NAMES = ["H", "eta", "Zi", "Zj", "lam1", "Dd", "lam4", "W",
              "rc", "B", "gamma", "r0", "C", "costh"]
    qqr2e = 14.399645  # set per units at init via script (metal default)

    def settings(self):
        pass

    def coeff(self, ilo, ihi, jlo, jhi, filename, *elems):
        self.elements = [str(e) for e in elems]
        entries = _read_entries(str(filename), 14)
        nt = self.ntypes
        self.p = {nme: np.zeros((nt + 1,) * 3) for nme in self._NAMES}
        for i in range(1, nt + 1):
            for j in range(1, nt + 1):
                for k in range(1, nt + 1):
                    key = (self.elements[i - 1], self.elements[j - 1],
                           self.elements[k - 1])
                    vals = entries[key]
                    for c, nme in enumerate(self._NAMES):
                        self.p[nme][i, j, k] = vals[c]

    def init(self):
        pass

    @property
    def max_cutoff(self):
        return float(self.p["rc"][1:, 1:, 1:].max())

    def energy(self, x, type_, ell, idx):
        dt_ = x.dtype
        n = idx.shape[0]
        self_idx = jnp.arange(n, dtype=idx.dtype)[:, None]
        nmask = idx != self_idx
        d = x[:, None, :] - x[idx]
        d = d - ell * jnp.round(d / ell)
        r2 = jnp.sum(d * d, -1)
        it = type_[:, None]
        jt = type_[idx]
        P = {nme: jnp.asarray(v, dt_) for nme, v in self.p.items()}

        def pij(nme):
            return P[nme][it, jt, jt]

        rc = pij("rc")
        in2 = nmask & (r2 < rc * rc)
        r = jnp.sqrt(jnp.where(in2, r2, 1.0))
        rs = jnp.where(in2, r, rc + 1.0)
        H, eta, W, Dd = pij("H"), pij("eta"), pij("W"), pij("Dd")
        lam1, lam4 = pij("lam1"), pij("lam4")
        zizj = pij("Zi") * pij("Zj") * self.qqr2e
        l1inv = jnp.where(lam1 != 0, 1.0 / jnp.where(lam1 != 0, lam1, 1.0),
                          0.0)
        l4inv = jnp.where(lam4 != 0, 1.0 / jnp.where(lam4 != 0, lam4, 1.0),
                          0.0)

        def v2(rr):
            return (H * rr ** (-eta) + zizj * jnp.exp(-rr * l1inv) / rr
                    - Dd * jnp.exp(-rr * l4inv) / rr ** 4 - W / rr ** 6)

        vrc = v2(rc)
        dvrc = jax.grad(lambda rr: jnp.sum(v2(rr)))(rc)
        e2 = v2(rs) - vrc - (rs - rc) * dvrc
        e = 0.5 * jnp.sum(jnp.where(in2, e2, 0.0))

        # 3-body: legs under r0 (cutsq2), params (i,j,j)/(i,k,k)/(i,j,k)
        r0ij = pij("r0")
        in3 = nmask & (r2 < r0ij * r0ij)
        gs = P["gamma"][it, jt, jt] / jnp.where(in3, rs - r0ij, -1.0)
        expg = jnp.where(in3, jnp.exp(gs), 0.0)
        i3 = type_[:, None, None]
        j3 = jt[:, :, None]
        k3 = jt[:, None, :]
        dot = jnp.einsum("nkc,nlc->nkl", d, d)
        rinv = jnp.where(in3, 1.0 / rs, 0.0)
        cs = dot * rinv[:, :, None] * rinv[:, None, :]
        dcs = cs - P["costh"][i3, j3, k3]
        dcs2 = dcs * dcs
        pcs = dcs2 / (1.0 + P["C"][i3, j3, k3] * dcs2)
        samej = idx[:, :, None] == idx[:, None, :]
        zmask = in3[:, :, None] & in3[:, None, :] & ~samej
        e3 = P["B"][i3, j3, k3] * expg[:, :, None] * expg[:, None, :] * pcs
        # each (j,k) pair counted twice in the ordered double sum
        return e + 0.5 * jnp.sum(jnp.where(zmask, e3, 0.0))


@register_pair("atm")
class PairATM(EnergyPairStyle):
    """Axilrod-Teller-Muto triple-dipole dispersion
    (src/MANYBODY/pair_atm.cpp:353-375).

    Per triangle (i,j,k): E = nu * (r6 - 3 (rik.rij)(rij.rjk)(rjk.rik))
    / r6^{5/2} with r6 = rij^2 rjk^2 rik^2, counted when every pair
    distance <= cutoff AND r6 <= cut_triple^6 (settings: pair_style atm
    cutoff cut_triple; src/pair_atm.cpp:210-216).  The reference walks
    each triangle once via min-x ownership; here the central-atom
    ordered double sum visits it 6x (3 centers x 2 leg orders), so the
    total divides by 6 — bitwise-independent of rank layout by
    construction.  nu[i][j][k] is symmetrized over all 6 type
    permutations exactly like init_one (src/pair_atm.cpp:270-279)."""

    name = "atm"

    def settings(self, cut_global, cut_triple):
        self.cut_global = float(cut_global)
        self.cut_triple = float(cut_triple)
        self.nu = np.zeros((self.ntypes + 1,) * 3)

    def coeff(self, ilo, ihi, jlo, jhi, kspec, nu_one):
        nt = self.ntypes
        ks = str(kspec)
        if ks == "*":
            klo, khi = 1, nt
        elif ks.endswith("*"):
            klo, khi = int(float(ks[:-1])), nt
        elif ks.startswith("*"):
            klo, khi = 1, int(float(ks[1:]))
        else:
            klo = khi = int(float(ks))
        v = float(nu_one)
        from itertools import permutations
        for i in range(ilo, ihi + 1):
            for j in range(max(jlo, i), jhi + 1):
                for k in range(max(klo, j), khi + 1):
                    for p in permutations((i, j, k)):
                        self.nu[p] = v

    def init(self):
        pass

    @property
    def max_cutoff(self):
        return self.cut_global

    def energy(self, x, type_, ell, idx):
        dt_ = x.dtype
        n, K = idx.shape
        self_idx = jnp.arange(n, dtype=idx.dtype)[:, None]
        nmask = idx != self_idx
        d = x[:, None, :] - x[idx]          # r_ij = x_j - x_i sign conv
        d = d - ell * jnp.round(d / ell)
        r2 = jnp.sum(d * d, -1)
        c2 = self.cut_global * self.cut_global
        leg = nmask & (r2 < c2)

        # triangle legs: ij from slot a, ik from slot b, jk = d_b - d_a
        djk = d[:, None, :, :] - d[:, :, None, :]    # (n, a=j, b=k, 3)
        rjk2 = jnp.sum(djk * djk, -1)
        samej = idx[:, :, None] == idx[:, None, :]
        tmask = leg[:, :, None] & leg[:, None, :] & ~samej & (rjk2 < c2)
        rij2 = r2[:, :, None]
        rik2 = r2[:, None, :]
        r6 = rij2 * rjk2 * rik2
        ct3 = self.cut_triple ** 3
        tmask = tmask & (r6 <= ct3 * ct3)
        nu3 = jnp.asarray(self.nu, dt_)[
            type_[:, None, None], type_[idx][:, :, None],
            type_[idx][:, None, :]]
        tmask = tmask & (nu3 != 0.0)

        r6s = jnp.where(tmask, r6, 1.0)
        r5inv = nu3 / (r6s * r6s * jnp.sqrt(r6s))
        rri = jnp.einsum("nbc,nac->nab", d, d)       # rik . rij
        rrj = jnp.sum(d[:, :, None, :] * djk, -1)    # rij . rjk
        rrk = jnp.sum(djk * d[:, None, :, :], -1)    # rjk . rik
        rrr = 5.0 * rri * rrj * rrk
        eng = (r6s - 0.6 * rrr) * r5inv
        return jnp.sum(jnp.where(tmask, eng, 0.0)) / 6.0


def _read_edip_file(path: str, elements):
    """EDIP parameter entries: el1 el2 el3 + 17 values
    (PairEDIP::read_file, src/MANYBODY/pair_edip.cpp:783-840)."""
    names = ["A", "B", "cutoffA", "cutoffC", "alpha", "beta", "eta",
             "gamma", "lambda", "mu", "rho", "sigma", "Q0",
             "u1", "u2", "u3", "u4"]
    toks = []
    with open(path) as fh:
        for line in fh:
            line = line.split("#", 1)[0].strip()
            if line:
                toks.extend(line.split())
    i = 0
    while i + 20 <= len(toks):
        e1, e2, e3 = toks[i:i + 3]
        vals = dict(zip(names, (float(v) for v in toks[i + 3:i + 20])))
        i += 20
        if (e1, e2, e3) == (elements[0],) * 3:
            return vals
    raise ValueError(f"EDIP entry for {elements[0]} not found in {path}")


@register_pair("edip")
class PairEDIP(EnergyPairStyle):
    """EDIP (environment-dependent interatomic potential, Justo et al.)
    for single-element systems (src/MANYBODY/pair_edip.cpp).

    E = sum over ordered pairs  A e^{sigma/(r-a)} [(B/r)^rho - e^{-beta Z_i^2}]
      + sum_i sum_{j<k} e^{gamma/(r_ij-a)} e^{gamma/(r_ik-a)} h(cos, Z_i)
    with h(c,Z) = lambda[(1 - e^{-Q (c+tau)^2}) + eta Q (c+tau)^2],
    Q(Z) = Q0 e^{-mu Z}, tau(Z) = u1 + u2 u3 e^{-u4 Z} - u2 e^{-2 u4 Z},
    and coordination Z_i = sum f_c(r): 1 below cutoffC, exp(alpha/(1-x^-3))
    with x=(r-C)/(A-C) between, 0 beyond (initGrids, pair_edip.cpp:
    670-760 — the reference linearly interpolates 8000/A grids; here the
    same functions are evaluated analytically, which agrees to ~1e-9).
    Forces are the autodiff gradient of this energy, including the
    environment (Z) terms the reference carries via forceModCoord."""

    name = "edip"

    def settings(self):
        pass

    def coeff(self, ilo, ihi, jlo, jhi, filename, *elems):
        if self.ntypes != 1 or len(set(elems)) != 1:
            raise ValueError("pair_style edip: single element only "
                             "(the reference's pair_edip has the same "
                             "limit; edip/multi is not implemented)")
        self.p = _read_edip_file(str(filename), [str(elems[0])])

    def init(self):
        pass

    @property
    def max_cutoff(self):
        return float(self.p["cutoffA"])

    def energy(self, x, type_, ell, idx):
        p = self.p
        dt_ = x.dtype
        a_cut = p["cutoffA"]
        c_cut = p["cutoffC"]
        n, K = idx.shape
        self_idx = jnp.arange(n, dtype=idx.dtype)[:, None]
        nmask = idx != self_idx
        d = x[:, None, :] - x[idx]
        d = d - ell * jnp.round(d / ell)
        r2 = jnp.sum(d * d, -1)
        inside = nmask & (r2 < a_cut * a_cut)
        r = jnp.sqrt(jnp.where(inside, r2, 1.0))
        rs = jnp.where(inside, r, a_cut + 1.0)

        # coordination Z_i (cutoffFunction grid, analytic)
        frac = jnp.clip((rs - c_cut) / (a_cut - c_cut), 1e-12, None)
        x3 = frac ** (-3.0)
        fcut = jnp.where(rs < c_cut, 1.0,
                         jnp.where(inside & (rs < a_cut),
                                   jnp.exp(p["alpha"] / (1.0 - x3)), 0.0))
        Z = jnp.sum(jnp.where(inside, fcut, 0.0), axis=1)        # (N,)

        tau = (p["u1"] + p["u2"] * p["u3"] * jnp.exp(-p["u4"] * Z)
               - p["u2"] * jnp.exp(-2.0 * p["u4"] * Z))
        Q = p["Q0"] * jnp.exp(-p["mu"] * Z)
        embz = jnp.exp(-p["beta"] * Z * Z)

        # two-body (ordered pairs, Z of the CENTRAL atom)
        exp2b = p["A"] * jnp.exp(p["sigma"] / (rs - a_cut))
        pow2b = (p["B"] / rs) ** p["rho"]
        e2 = jnp.sum(jnp.where(inside,
                               exp2b * (pow2b - embz[:, None]), 0.0))

        # three-body over neighbor pairs (j, k) of i, ordered/2
        exp3b = jnp.where(inside, jnp.exp(p["gamma"] / (rs - a_cut)), 0.0)
        rinv = jnp.where(inside, 1.0 / rs, 0.0)
        dot = jnp.einsum("nkc,nlc->nkl", d, d)
        cs = dot * rinv[:, :, None] * rinv[:, None, :]
        ctd = cs + tau[:, None, None]
        qc2 = Q[:, None, None] * ctd * ctd
        h = p["lambda"] * ((1.0 - jnp.exp(-qc2)) + p["eta"] * qc2)
        samej = idx[:, :, None] == idx[:, None, :]
        tmask = inside[:, :, None] & inside[:, None, :] & ~samej
        e3 = 0.5 * jnp.sum(jnp.where(
            tmask, exp3b[:, :, None] * exp3b[:, None, :] * h, 0.0))
        return e2 + e3
