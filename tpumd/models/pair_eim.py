"""pair_style eim — embedded-ion method for ionic compounds
(src/MANYBODY/pair_eim.cpp).

EAM-like three-pass evaluation with induced charges: a charge pass
rho_i = sum_j sigma_ij(r) (the ion-propensity function, antisymmetric in
electronegativity), a potential pass fp_i = sum_j rho_j * coul_ij(r),
then E = sum_i 1/2 rho_i fp_i + 1/2 sum_ij [phi_ij(r) - q0_i q0_j
coul_ij(r)] with the reference's exact pair force
psip = phi' + (rho_i rho_j - q0_i q0_j) coul' + fp_i sigma'_ji + fp_j
sigma'_ij (pair_eim.cpp:254-300).

The ffield.eim file carries ANALYTIC forms (type-1/type-2 phi, erfc
smoothing funccutoff); like the reference, they are sampled onto an
nr=5000 grid and evaluated through the shared EAM cubic-spline
machinery (read_file + funcphi/funcsigma/funccoul,
pair_eim.cpp:420-545, 821-910), so values match the binary bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from tpumd.core.state import minimum_image
from tpumd.models.base import PairStyle
from tpumd.models.pair_eam import _interpolate
from tpumd.models.registry import register_pair


def _parse_ffield(path: str):
    """Parse global:/element:/pair: records ('&' joins continuations)."""
    lines = []
    with open(path) as fh:
        buf = ""
        for raw in fh:
            raw = raw.split("###")[0].rstrip()
            if not raw.strip():
                continue
            buf += " " + raw
            if buf.rstrip().endswith("&"):
                buf = buf.rstrip()[:-1]
                continue
            lines.append(buf.strip())
            buf = ""
    glob = None
    elements = {}
    pairs = {}
    for ln in lines:
        toks = ln.split()
        if toks[0] == "global:":
            glob = dict(division=float(toks[1]), rbig=float(toks[2]),
                        rsmall=float(toks[3]))
        elif toks[0] == "element:":
            elements[toks[1]] = dict(
                ielement=int(toks[2]), mass=float(toks[3]),
                negativity=float(toks[4]), ra=float(toks[5]),
                ri=float(toks[6]), Ec=float(toks[7]), q0=float(toks[8]))
        elif toks[0] == "pair:":
            key = tuple(sorted((toks[1], toks[2])))
            v = [float(t) for t in toks[3:17]]
            pairs[key] = dict(
                rcutphiA=v[0], rcutphiR=v[1], Eb=v[2], r0=v[3],
                alpha=v[4], beta=v[5], rcutq=v[6], Asigma=v[7],
                rq=v[8], rcutsigma=v[9], Ac=v[10], zeta=v[11],
                rs=v[12], tp=int(v[13]))
    if glob is None:
        raise ValueError("Missing global line in EIM potential file")
    return glob, elements, pairs


@register_pair("eim")
class PairEIM(PairStyle):
    name = "eim"
    supports_cellgrid = False

    def __init__(self, ntypes: int):
        super().__init__(ntypes)
        self.mass = np.zeros(ntypes + 1)

    def settings(self):
        pass

    def coeff(self, ilo, ihi, jlo, jhi, *args):
        # pair_coeff * * <elem list in file order> ffield.eim El1 El2...
        # (reference usage: pair_coeff * * Na Cl ffield.eim Na Cl);
        # the leading element-name list declares which file entries load,
        # the trailing one maps atom types.
        args = [str(a) for a in args]
        fi = next(i for i, a in enumerate(args) if a.endswith(".eim")
                  or "/" in a)
        self._file_elems = args[:fi]
        filename = args[fi]
        type_elems = args[fi + 1:]
        if len(type_elems) != self.ntypes:
            raise ValueError("eim: need one element name per atom type")
        glob, elements, pairs = _parse_ffield(filename)
        self._glob, self._elements, self._pairs = glob, elements, pairs
        self._elnames = list(self._file_elems)
        self._typemap = np.zeros(self.ntypes + 1, dtype=np.int32)
        for t, e in enumerate(type_elems, start=1):
            if e not in self._elnames:
                raise ValueError(f"eim: element {e} not in pair_coeff list")
            self._typemap[t] = self._elnames.index(e)
            self.mass[t] = elements[e]["mass"]
            self._setflag[t, t] = True

    # ---- the reference's analytic forms (pair_eim.cpp:821-910) -------
    def _pairkey(self, i, j):
        return tuple(sorted((self._elnames[i], self._elnames[j])))

    def _funccutoff(self, rp, rc, r):
        g = self._glob
        a = (g["rsmall"] - g["rbig"]) / (rc - rp) * (r - rp) + g["rbig"]
        return ((math.erfc(a) - math.erfc(g["rsmall"]))
                / (math.erfc(g["rbig"]) - math.erfc(g["rsmall"])))

    def _funcphi(self, i, j, r):
        p = self._pairs[self._pairkey(i, j)]
        r = max(r, 0.2)
        value = 0.0
        if p["tp"] == 1:
            a = p["Eb"] * p["alpha"] / (p["beta"] - p["alpha"])
            b = p["Eb"] * p["beta"] / (p["beta"] - p["alpha"])
            if r < p["rcutphiA"]:
                value -= a * math.exp(-p["beta"] * (r / p["r0"] - 1.0)) \
                    * self._funccutoff(p["r0"], p["rcutphiA"], r)
            if r < p["rcutphiR"]:
                value += b * math.exp(-p["alpha"] * (r / p["r0"] - 1.0)) \
                    * self._funccutoff(p["r0"], p["rcutphiR"], r)
        elif p["tp"] == 2:
            a = (p["Eb"] * p["alpha"] * p["r0"] ** p["beta"]
                 / (p["beta"] - p["alpha"]))
            b = (a * p["beta"] / p["alpha"]
                 * p["r0"] ** (p["alpha"] - p["beta"]))
            if r < p["rcutphiA"]:
                value -= a / r ** p["beta"] \
                    * self._funccutoff(p["r0"], p["rcutphiA"], r)
            if r < p["rcutphiR"]:
                value += b / r ** p["alpha"] \
                    * self._funccutoff(p["r0"], p["rcutphiR"], r)
        return value

    def _funcsigma(self, i, j, r):
        p = self._pairs[self._pairkey(i, j)]
        r = max(r, 0.2)
        if r >= p["rcutq"]:
            return 0.0
        ni = self._elements[self._elnames[i]]["negativity"]
        nj = self._elements[self._elnames[j]]["negativity"]
        return p["Asigma"] * (nj - ni) \
            * self._funccutoff(p["rq"], p["rcutq"], r)

    def _funccoul(self, i, j, r):
        p = self._pairs[self._pairkey(i, j)]
        r = max(r, 0.2)
        if r >= p["rcutsigma"]:
            return 0.0
        return p["Ac"] * math.exp(-p["zeta"] * r) \
            * self._funccutoff(p["rs"], p["rcutsigma"], r)

    def init(self):
        ne = len(self._elnames)
        nt = self.ntypes
        self.nr = 5000
        cut = 0.0
        for i in range(ne):
            for j in range(i, ne):
                p = self._pairs[self._pairkey(i, j)]
                cut = max(cut, p["rcutphiA"], p["rcutphiR"],
                          p["rcutq"], p["rcutsigma"])
        self.dr = cut / (self.nr - 1.0)
        self.cutmax = cut
        # per-element-pair cutoffs -> per-type cutforcesq
        cuts = np.zeros((ne, ne))
        for i in range(ne):
            for j in range(i, ne):
                p = self._pairs[self._pairkey(i, j)]
                cuts[i, j] = cuts[j, i] = max(
                    p["rcutphiA"], p["rcutphiR"], p["rcutq"],
                    p["rcutsigma"])
        tm = self._typemap
        self.cutforcesq = np.zeros((nt + 1, nt + 1))
        for a in range(1, nt + 1):
            for b in range(1, nt + 1):
                self.cutforcesq[a, b] = cuts[tm[a], tm[b]] ** 2

        rgrid = np.arange(self.nr) * self.dr
        # grids sampled exactly like read_file (value[k+1] = func(k*dr))
        def tab(func, i, j):
            col = np.zeros(self.nr + 1)
            col[1:] = [func(i, j, r) for r in rgrid]
            return _interpolate(self.nr, self.dr, col)

        self.Fij_spline = np.stack(
            [tab(self._funcsigma, i, j)
             for i in range(ne) for j in range(ne)])
        tri = [(i, j) for i in range(ne) for j in range(i + 1)]
        self.Gij_spline = np.stack(
            [tab(self._funccoul, i, j) for (i, j) in tri])
        self.phiij_spline = np.stack(
            [tab(self._funcphi, i, j) for (i, j) in tri])
        trimap = {ij: n for n, ij in enumerate(tri)}
        self.type2Fij = np.zeros((nt + 1, nt + 1), dtype=np.int32)
        self.type2Gij = np.zeros_like(self.type2Fij)
        for a in range(1, nt + 1):
            for b in range(1, nt + 1):
                self.type2Fij[a, b] = tm[a] * ne + tm[b]
                key = (max(tm[a], tm[b]), min(tm[a], tm[b]))
                self.type2Gij[a, b] = trimap[key]
        self.q0 = np.zeros(nt + 1)
        self.negativity = np.zeros(nt + 1)
        for a in range(1, nt + 1):
            el = self._elements[self._elnames[tm[a]]]
            self.q0[a] = el["q0"]
            self.negativity[a] = el["negativity"]

    @property
    def max_cutoff(self) -> float:
        return float(self.cutmax)

    # ---- traced spline eval (identical to PairEAM's) -----------------
    def _r_index(self, r, dtype):
        p = r * (1.0 / self.dr) + 1.0
        m = jnp.minimum(p.astype(jnp.int32), self.nr - 1)
        m = jnp.maximum(m, 1)
        p = jnp.minimum(p - m, 1.0).astype(dtype)
        return m, p

    @staticmethod
    def _val(coeff, p):
        return ((coeff[..., 3] * p + coeff[..., 4]) * p + coeff[..., 5]) \
            * p + coeff[..., 6]

    @staticmethod
    def _der(coeff, p):
        return (coeff[..., 0] * p + coeff[..., 1]) * p + coeff[..., 2]

    def compute(self, x, type_, box, idx, sbits, special_lj, special_coul,
                eflag: bool, vflag: bool, q=None, ext=None):
        assert ext is None, "eim: small-box multi-image mode not supported"
        dtype = x.dtype
        n, k = idx.shape
        self_idx = jnp.arange(n, dtype=idx.dtype)[:, None]
        mask = idx != self_idx
        d = minimum_image(x[:, None, :] - x[idx], box)
        r2 = jnp.sum(d * d, axis=-1)
        it = type_[:, None]
        jt = type_[idx]
        cfs = jnp.asarray(self.cutforcesq, dtype)[it, jt]
        inside = mask & (r2 < cfs)
        r = jnp.sqrt(jnp.where(inside, r2, 1.0))
        m, p = self._r_index(r, dtype)

        t2F = jnp.asarray(self.type2Fij)
        t2G = jnp.asarray(self.type2Gij)
        F = jnp.asarray(self.Fij_spline, dtype)
        G = jnp.asarray(self.Gij_spline, dtype)
        PH = jnp.asarray(self.phiij_spline, dtype)
        ins = inside.astype(dtype)

        cF_ij = F[t2F[it, jt], m]          # sigma of pair as seen from i
        rho = jnp.sum(self._val(cF_ij, p) * ins, axis=1)
        cG = G[t2G[it, jt], m]
        gv = self._val(cG, p) * ins
        fp = jnp.sum(gv * rho[idx], axis=1)

        cF_ji = F[t2F[jt, it], m]
        rhoip = self._der(cF_ji, p)
        rhojp = self._der(cF_ij, p)
        cP = PH[t2G[it, jt], m]
        phip = self._der(cP, p)
        phi = self._val(cP, p)
        coul = self._val(cG, p)
        coulp = self._der(cG, p)
        q0 = jnp.asarray(self.q0, dtype)
        q0i = q0[it]
        q0j = q0[jt]
        psip = (phip + (rho[:, None] * rho[idx] - q0i * q0j) * coulp
                + fp[:, None] * rhojp + fp[idx] * rhoip)
        fpair = jnp.where(inside, -psip / r, 0.0)
        f = jnp.sum(d * fpair[:, :, None], axis=1)

        evdwl = None
        virial = None
        if eflag:
            e_embed = jnp.sum(jnp.where(type_ > 0, 0.5 * rho * fp, 0.0))
            epair = jnp.where(inside, phi - q0i * q0j * coul, 0.0)
            evdwl = e_embed + 0.5 * jnp.sum(epair)
        if vflag:
            virial = 0.5 * jnp.stack([
                jnp.sum(fpair * d[:, :, 0] * d[:, :, 0]),
                jnp.sum(fpair * d[:, :, 1] * d[:, :, 1]),
                jnp.sum(fpair * d[:, :, 2] * d[:, :, 2]),
                jnp.sum(fpair * d[:, :, 0] * d[:, :, 1]),
                jnp.sum(fpair * d[:, :, 0] * d[:, :, 2]),
                jnp.sum(fpair * d[:, :, 1] * d[:, :, 2]),
            ])
        return f, evdwl, None, virial
