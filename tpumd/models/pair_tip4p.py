"""TIP4P water: lj/cut/tip4p/long + pppm/tip4p support machinery.

Reimplements src/KSPACE/pair_lj_cut_tip4p_long.cpp: the oxygen charge
lives on a massless M site displaced along the H-O-H bisector,
xM = xO + alpha/2 ((xH1-xO) + (xH2-xO)) with
alpha = qdist / (cos(theta0/2) b0)  (init_style :458-486).

TPU-first formulation: the M site is an affine function of atom
positions, so the coulomb part is evaluated with the STANDARD coul/long
machinery on a transformed coordinate array xq (charge sites), and the
fictitious-site force is partitioned back with the exact chain rule
fO = (1-alpha) fM, fH = alpha/2 fM (Feenstra 1999; :287-323) as two
scatter-adds — no per-pair branching.  The LJ part runs on the raw
coordinates.  Virials are strain-derivative site virials (the same
pressure as the reference's ev_tally_tip4p distribution).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpumd.models.pair_misc import PairLJCutCoulCut, PairLJCutCoulLong
from tpumd.models.registry import register_pair
from tpumd.ops.pairwise import pair_sums


@register_pair("lj/cut/tip4p/long")
class PairLJCutTIP4PLong(PairLJCutCoulLong):
    name = "lj/cut/tip4p/long"
    supports_cellgrid = False
    supports_image_ext = False
    is_tip4p = True

    def settings(self, otype, htype, btype, atype, qdist,
                 cut_lj, cut_coul=None):
        self.typeO = int(otype)
        self.typeH = int(htype)
        self.typeB = int(btype)
        self.typeA = int(atype)
        self.qdist = float(qdist)
        super().settings(cut_lj, cut_coul)
        self.alpha = 0.0
        self._h1 = self._h2 = None   # (N,) row indices (self for non-O)

    @property
    def max_cutoff(self):
        # list must reach charge-site pairs: cut_coul + 2 qdist
        # (cut_coulsqplus, :123)
        return max(float(self.cut[1:, 1:].max()),
                   self.cut_coul + 2.0 * self.qdist)

    def setup_tip4p(self, sim, row_of_tag):
        """Resolve alpha from the bond/angle equilibrium geometry and the
        H-partner rows of every O from the bond topology (the reference
        walks tag+1/tag+2; topology is equivalent and more general)."""
        theta0 = b0 = None
        for b in sim.bonded:
            if b.kind == "bond" and hasattr(b, "equilibrium_distance"):
                b0 = b.equilibrium_distance(self.typeB)
            if b.kind == "angle" and hasattr(b, "equilibrium_angle"):
                theta0 = b.equilibrium_angle(self.typeA)
        if theta0 is None or b0 is None:
            raise ValueError("tip4p pair style needs bond and angle styles"
                             " with equilibrium geometry")
        self.alpha = self.qdist / (np.cos(0.5 * theta0) * b0)
        n = sim.natoms
        typ = np.asarray(jax.device_get(sim.state.type))
        tags = np.asarray(jax.device_get(sim.state.tag))
        h1 = np.arange(n, dtype=np.int64)
        h2 = np.arange(n, dtype=np.int64)
        bonds = sim.topology.get("bond")
        if bonds is None:
            raise ValueError("tip4p pair style requires bond topology")
        fill = np.zeros(n, np.int8)
        for bt, t1, t2 in np.asarray(bonds):
            if bt != self.typeB:
                continue
            r1, r2_ = row_of_tag[t1], row_of_tag[t2]
            for o, h in ((r1, r2_), (r2_, r1)):
                if typ[o] == self.typeO and typ[h] == self.typeH:
                    if fill[o] == 0:
                        h1[o] = h
                    else:
                        h2[o] = h
                    fill[o] += 1
        if not ((fill[typ == self.typeO] == 2).all()):
            raise ValueError("TIP4P hydrogen is missing")
        self._h1 = jnp.asarray(h1, jnp.int32)
        self._h2 = jnp.asarray(h2, jnp.int32)
        self._is_o = jnp.asarray(typ == self.typeO)

    # ------------------------------------------------------------- sites
    def charge_sites(self, x, box):
        """xq: O rows move to the M site (compute_newsite :576-590 with
        closest-image H displacements)."""
        from tpumd.core.state import minimum_image
        d1 = minimum_image(x[self._h1] - x, box)
        d2 = minimum_image(x[self._h2] - x, box)
        xm = x + (0.5 * self.alpha) * (d1 + d2)
        return jnp.where(self._is_o[:, None], xm, x)

    def distribute_site_forces(self, fq):
        """Chain rule of the site map: O keeps (1-alpha), each H gains
        alpha/2 of its O's fictitious force."""
        a = self.alpha
        fo = jnp.where(self._is_o[:, None], fq, 0.0)
        f = jnp.where(self._is_o[:, None], (1.0 - a) * fq, fq)
        f = f.at[self._h1].add(0.5 * a * fo)
        f = f.at[self._h2].add(0.5 * a * fo)
        return f

    # ------------------------------------------------------------ compute
    def _lj_fn(self, r2, it, jt):
        fpair, e, _, _ = PairLJCutCoulCut.pair_fn_ex(
            self, r2, it, jt, 1.0, 1.0, None, None)
        return fpair, e, None, None

    def _coul_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        from tpumd.models.pair_charmm import A1, A2, A3, A4, A5, \
            EWALD_F, EWALD_P
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

    def compute(self, x, type_, box, idx, sbits, special_lj, special_coul,
                eflag: bool, vflag: bool, q=None, ext=None):
        assert ext is None, "tip4p: small-box multi-image unsupported"
        # LJ on atom coordinates
        f, evdwl, _, vir1 = pair_sums(
            x, type_, box, idx, sbits, self._lj_fn,
            special_lj, None, eflag, vflag, q=None)
        # coulomb on charge-site coordinates (same candidate list; the
        # list cutoff covers cut_coul + 2 qdist)
        xq = self.charge_sites(x, box)
        fq, _, ecoul, vir2 = pair_sums(
            xq, type_, box, idx, sbits, None,
            special_lj, special_coul, eflag, vflag, q=q,
            pair_fn_ex=self._coul_fn_ex)
        f = f + self.distribute_site_forces(fq)
        vir = (vir1 + vir2) if vflag else None
        return f, evdwl, ecoul, vir

    def compute_peratom(self, s, neigh, ctx):
        # per-atom tallies on the site decomposition (site shares)
        ex = self._coul_fn_ex
        _, ea1, va1, _ = pair_sums(
            s.x, s.type, s.box, neigh.idx, neigh.sbits, self._lj_fn,
            ctx.special_lj, None, "atom", "atom", q=None)
        xq = self.charge_sites(s.x, s.box)
        _, ea2, va2, _ = pair_sums(
            xq, s.type, s.box, neigh.idx, neigh.sbits, None,
            ctx.special_lj, ctx.special_coul, "atom", "atom", q=s.q,
            pair_fn_ex=ex)
        return ea1 + ea2, va1 + va2
