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
    return x @ strain.T, strain @ box_lengths


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
        # ters_bij branches (pair_tersoff.cpp ters_bij): use the smooth
        # central branch; the asymptotic branches only matter at extreme
        # zeta and are C1-matched
        b_ij = (1.0 + bz ** nn) ** (-1.0 / (2.0 * nn))
        e = 0.5 * jnp.sum(
            jnp.where(in2, fc_ij * (f_rep + b_ij * f_att), 0.0))
        return e
