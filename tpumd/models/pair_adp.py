"""pair_style adp — angular-dependent potential (ADP), an EAM extension
with dipole and quadrupole density terms (src/MANYBODY/pair_adp.cpp).

Energy:  E = sum_i F_i(rho_i) + 1/2 sum_ij phi(r_ij)
           + sum_i [ 1/2 |mu_i|^2 + 1/2 sum_a lam_aa^2
                     + sum_{a<b} lam_ab^2 - 1/6 (tr lam)^2 ]
with mu_i = sum_j u(r_ij) d_ij and lam_i = sum_j w(r_ij) d_ij (x) d_ij
(pair_adp.cpp:269-280 embedding tally).  Forces follow the reference's
explicit pairwise expressions (pair_adp.cpp:283-390) on the i-centric
full neighbor matrix: the per-pair force is antisymmetric under i<->j,
so the ordered-pair sum reproduces the half-list + Newton tally exactly.

File format: setfl header + frho/rhor per element + z2r, then u2r and
w2r lower-triangle nr-vectors appended (PairADP::read_file,
src/MANYBODY/pair_adp.cpp:540-607).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpumd.core.state import minimum_image
from tpumd.models.pair_eam import PairEAMAlloy, _Setfl, _interpolate
from tpumd.models.registry import register_pair


class _SetflADP(_Setfl):
    """setfl tables + u2r/w2r lower-triangle blocks."""

    def __init__(self, path: str):
        super().__init__(path)
        # re-tokenize to find where _Setfl stopped: frho/rhor per elem,
        # then ne*(ne+1)/2 z2r vectors; u2r and w2r follow
        with open(path) as fh:
            toks = " ".join(fh.read().split("\n")[3:]).split()
        ne = len(self.elements)
        p = 1 + ne + 5
        p += ne * (4 + self.nrho + self.nr)
        p += (ne * (ne + 1) // 2) * self.nr
        self.u2r = np.zeros((ne, ne, self.nr + 1))
        self.w2r = np.zeros((ne, ne, self.nr + 1))
        for arr in (self.u2r, self.w2r):
            for i in range(ne):
                for j in range(i + 1):
                    arr[i, j, 1:] = [float(v) for v in toks[p:p + self.nr]]
                    arr[j, i] = arr[i, j]
                    p += self.nr


@register_pair("adp")
class PairADP(PairEAMAlloy):
    name = "adp"

    def coeff(self, ilo, ihi, jlo, jhi, filename, *elems):
        f = _SetflADP(str(filename))
        self._setfl = f
        elems = [str(e) for e in elems]
        if len(elems) != self.ntypes:
            raise ValueError("adp needs one element name per type")
        self._typemap = np.zeros(self.ntypes + 1, dtype=np.int32)
        for t, e in enumerate(elems, start=1):
            if e not in f.elements:
                raise ValueError(f"element {e} not in adp file")
            self._typemap[t] = f.elements.index(e)
            self.mass[t] = f.mass[self._typemap[t]]
            self._setflag[t, t] = True

    def _init_cellgrid_tables(self):
        # matrix engine only (the dense-block path has no mu/lambda pass)
        self.supports_cellgrid = False

    def init(self):
        super().init()
        f = self._setfl
        ne = len(f.elements)
        self.u2r_spline = np.stack(
            [_interpolate(f.nr, f.dr, f.u2r[i, j])
             for i in range(ne) for j in range(ne)])
        self.w2r_spline = np.stack(
            [_interpolate(f.nr, f.dr, f.w2r[i, j])
             for i in range(ne) for j in range(ne)])
        # same (elem_i, elem_j) flat indexing as type2z2r
        self.type2u2r = self.type2z2r

    def compute(self, x, type_, box, idx, sbits, special_lj, special_coul,
                eflag: bool, vflag: bool, q=None, ext=None):
        assert ext is None, "adp: small-box multi-image mode not supported"
        dtype = x.dtype
        n, k = idx.shape
        self_idx = jnp.arange(n, dtype=idx.dtype)[:, None]
        mask = idx != self_idx
        d = minimum_image(x[:, None, :] - x[idx], box)   # d = x_i - x_j
        r2 = jnp.sum(d * d, axis=-1)
        inside = mask & (r2 < self.cutforcesq)
        r = jnp.sqrt(jnp.where(inside, r2, 1.0))
        m, p = self._r_index(r, dtype)

        itype = type_[:, None]
        jtype = type_[idx]
        t2rhor = jnp.asarray(self.type2rhor)
        t2pair = jnp.asarray(self.type2z2r)
        rhor = jnp.asarray(self.rhor_spline, dtype=dtype)
        z2r = jnp.asarray(self.z2r_spline, dtype=dtype)
        u2r = jnp.asarray(self.u2r_spline, dtype=dtype)
        w2r = jnp.asarray(self.w2r_spline, dtype=dtype)

        ins = inside.astype(dtype)
        # density pass: rho, dipole mu, quadrupole lambda
        c_ji = rhor[t2rhor[jtype, itype], m]
        rho = jnp.sum(jnp.where(inside, self._val(c_ji, p), 0.0), axis=1)
        cu = u2r[t2pair[itype, jtype], m]
        u2 = self._val(cu, p) * ins
        mu = jnp.sum(u2[:, :, None] * d, axis=1)            # (N, 3)
        cw = w2r[t2pair[itype, jtype], m]
        w2 = self._val(cw, p) * ins
        # Voigt xx yy zz yz xz xy (reference lambda[0..5])
        lam = jnp.stack([
            jnp.sum(w2 * d[:, :, 0] * d[:, :, 0], axis=1),
            jnp.sum(w2 * d[:, :, 1] * d[:, :, 1], axis=1),
            jnp.sum(w2 * d[:, :, 2] * d[:, :, 2], axis=1),
            jnp.sum(w2 * d[:, :, 1] * d[:, :, 2], axis=1),
            jnp.sum(w2 * d[:, :, 0] * d[:, :, 2], axis=1),
            jnp.sum(w2 * d[:, :, 0] * d[:, :, 1], axis=1),
        ], axis=1)                                          # (N, 6)

        frho = jnp.asarray(self.frho_spline, dtype=dtype)
        t2f = jnp.asarray(self.type2frho)
        mrho, prho = self._rho_index(rho, dtype)
        cf = frho[t2f[type_], mrho]
        fp = self._der(cf, prho)
        e_embed = None
        if eflag:
            live = type_ > 0
            phi_e = self._val(cf, prho)
            phi_e = phi_e + jnp.where(rho > self.rhomax,
                                      fp * (rho - self.rhomax), 0.0)
            phi_e = phi_e + 0.5 * jnp.sum(mu * mu, axis=1)
            phi_e = phi_e + 0.5 * jnp.sum(lam[:, :3] * lam[:, :3], axis=1)
            phi_e = phi_e + jnp.sum(lam[:, 3:] * lam[:, 3:], axis=1)
            tr = lam[:, 0] + lam[:, 1] + lam[:, 2]
            phi_e = phi_e - (1.0 / 6.0) * tr * tr
            e_embed = jnp.sum(jnp.where(live, phi_e, 0.0))

        # force pass (pair_adp.cpp:283-390)
        c_ij = rhor[t2rhor[itype, jtype], m]
        rhoip = self._der(c_ij, p)
        rhojp = self._der(c_ji, p)
        cz = z2r[t2pair[itype, jtype], m]
        z2p = self._der(cz, p)
        z2 = self._val(cz, p)
        u2p = self._der(cu, p)
        w2p = self._der(cw, p)
        recip = 1.0 / r
        phi = z2 * recip
        phip = z2p * recip - phi * recip
        psip = fp[:, None] * rhojp + fp[idx] * rhoip + phip
        fpair = jnp.where(inside, -psip * recip, 0.0)

        delmu = mu[:, None, :] - mu[idx]                    # (N, K, 3)
        trdelmu = jnp.sum(delmu * d, axis=-1)
        sumlam = lam[:, None, :] + lam[idx]                 # (N, K, 6)
        dx, dy, dz = d[:, :, 0], d[:, :, 1], d[:, :, 2]
        tradellam = (sumlam[..., 0] * dx * dx + sumlam[..., 1] * dy * dy
                     + sumlam[..., 2] * dz * dz
                     + 2.0 * sumlam[..., 5] * dx * dy
                     + 2.0 * sumlam[..., 4] * dx * dz
                     + 2.0 * sumlam[..., 3] * dy * dz)
        nu = sumlam[..., 0] + sumlam[..., 1] + sumlam[..., 2]
        lamdot = jnp.stack([
            sumlam[..., 0] * dx + sumlam[..., 5] * dy + sumlam[..., 4] * dz,
            sumlam[..., 5] * dx + sumlam[..., 1] * dy + sumlam[..., 3] * dz,
            sumlam[..., 4] * dx + sumlam[..., 3] * dy + sumlam[..., 2] * dz,
        ], axis=-1)
        adp = -(delmu * u2[..., None]
                + (trdelmu * u2p * recip)[..., None] * d
                + 2.0 * w2[..., None] * lamdot
                + (w2p * recip * tradellam)[..., None] * d
                - (1.0 / 3.0) * (nu * (w2p * r + 2.0 * w2))[..., None] * d)
        adp = jnp.where(inside[..., None], adp, 0.0)
        fpw = d * fpair[..., None] + adp                    # per-pair force
        f = jnp.sum(fpw, axis=1)

        evdwl = None
        virial = None
        if eflag:
            evdwl = e_embed + 0.5 * jnp.sum(jnp.where(inside, phi, 0.0))
        if vflag:
            virial = 0.5 * jnp.stack([
                jnp.sum(dx * fpw[..., 0]), jnp.sum(dy * fpw[..., 1]),
                jnp.sum(dz * fpw[..., 2]), jnp.sum(dx * fpw[..., 1]),
                jnp.sum(dx * fpw[..., 2]), jnp.sum(dy * fpw[..., 2]),
            ])
        return f, evdwl, None, virial
