"""lj/cut pair style: 12-6 Lennard-Jones with cutoff.

Physics per the reference kernel (src/pair_lj_cut.cpp:69-140, init_one
mixing at :580-610): forcelj = r^-6 (lj1 r^-6 - lj2), fpair = forcelj/r^2,
energy = r^-6 (lj3 r^-6 - lj4) - offset.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpumd.models.base import PairStyle
from tpumd.models.registry import register_pair


@register_pair("lj/cut")
class PairLJCut(PairStyle):
    tail_flag = False  # pair_modify tail yes
    etail = 0.0
    ptail = 0.0

    name = "lj/cut"

    def __init__(self, ntypes: int):
        super().__init__(ntypes)
        shape = (ntypes + 1, ntypes + 1)
        self.epsilon = np.zeros(shape)
        self.sigma = np.zeros(shape)
        self.cut = np.zeros(shape)
        self.cut_global = 0.0
        self._tables = None

    def settings(self, cut_global):
        self.cut_global = float(cut_global)

    def coeff(self, ilo, ihi, jlo, jhi, epsilon, sigma, cut=None):
        cut = self.cut_global if cut is None else float(cut)
        for i in range(ilo, ihi + 1):
            for j in range(max(jlo, i), jhi + 1):
                self.epsilon[i, j] = epsilon
                self.sigma[i, j] = sigma
                self.cut[i, j] = cut
                self._setflag[i, j] = True

    def init(self):
        nt = self.ntypes
        for i in range(1, nt + 1):
            for j in range(i, nt + 1):
                if not self._setflag[i, j]:
                    if not (self._setflag[i, i] and self._setflag[j, j]):
                        if getattr(self, "allow_unset", False):
                            continue
                        raise ValueError(f"All pair coeffs are not set ({i},{j})")
                    self.epsilon[i, j] = self.mix_energy(
                        self.epsilon[i, i], self.epsilon[j, j],
                        self.sigma[i, i], self.sigma[j, j])
                    self.sigma[i, j] = self.mix_distance(
                        self.sigma[i, i], self.sigma[j, j])
                    self.cut[i, j] = self.mix_distance(
                        self.cut[i, i], self.cut[j, j])
                # symmetrize
                for arr in (self.epsilon, self.sigma, self.cut):
                    arr[j, i] = arr[i, j]

        eps, sig, cut = self.epsilon, self.sigma, self.cut
        with np.errstate(divide="ignore", invalid="ignore"):
            sr6 = np.where(cut > 0, (sig / np.where(cut > 0, cut, 1)) ** 6, 0.0)
        self.lj1 = 48.0 * eps * sig**12
        self.lj2 = 24.0 * eps * sig**6
        self.lj3 = 4.0 * eps * sig**12
        self.lj4 = 4.0 * eps * sig**6
        if self.shift:
            self.offset = np.where(cut > 0, 4.0 * eps * (sr6 * sr6 - sr6), 0.0)
        else:
            self.offset = np.zeros_like(eps)
        self.cutsq = cut * cut
        self._tables = None

    @property
    def max_cutoff(self) -> float:
        return float(self.cut[1:, 1:].max())

    def _get_tables(self, dtype):
        # constants lifted at trace time; never cache device arrays on self
        # (caching would leak tracers across jit traces)
        return tuple(
            jnp.asarray(a, dtype=dtype)
            for a in (self.lj1, self.lj2, self.lj3, self.lj4,
                      self.offset, self.cutsq)
        )


    def compute_tails(self, type_counts):
        """Analytic LJ tail corrections (PairLJCut::init_one tail block):
        etail_ij = 8 pi Ni Nj eps sig^6 (sig^6 - 3 rc^6) / (9 rc^9);
        i != j pairs count twice (Pair::init, src/pair.cpp:278-284)."""
        import numpy as np
        self.etail = self.ptail = 0.0
        if not self.tail_flag:
            return
        for i in range(1, self.ntypes + 1):
            for j in range(i, self.ntypes + 1):
                sig6 = self.sigma[i, j] ** 6
                rc3 = self.cut[i, j] ** 3
                rc6 = rc3 * rc3
                rc9 = rc3 * rc6
                pref = (8.0 * np.pi * type_counts[i] * type_counts[j]
                        * self.epsilon[i, j] * sig6 / (9.0 * rc9))
                e_ij = pref * (sig6 - 3.0 * rc6)
                p_ij = 2.0 * pref * (2.0 * sig6 - 3.0 * rc6)
                mult = 2.0 if i != j else 1.0
                self.etail += mult * e_ij
                self.ptail += mult * p_ij

    def compute_cellgrid(self, x, type_, valid, box, cfg,
                         eflag: bool, vflag: bool, q=None, special=None,
                         bond=None):
        # fused Pallas kernel for the force-only hot path (single element,
        # no special weighting, f32, TPU backend); energy/virial output
        # steps and everything else take the XLA cell-grid path
        import jax as _jax
        on_tpu_f32 = (not eflag and not vflag
                      and self.ntypes == 1 and x.dtype == jnp.float32
                      and cfg.nz >= 3 and cfg.ny >= 3 and cfg.nx >= 3
                      and _jax.default_backend() == "tpu")
        if on_tpu_f32 and special is None and bond is None:
            from tpumd.ops.pallas_lj import lj_cellgrid_forces_pallas
            f = lj_cellgrid_forces_pallas(
                x, valid, box, cfg,
                float(self.lj1[1, 1]), float(self.lj2[1, 1]),
                float(self.cutsq[1, 1]))
            return f, None, None, None
        if (on_tpu_f32 and special is None and bond is not None
                and bond[4] and bond[0].shape[1] <= 2):
            # chain fast path: LJ + in-kernel FENE, single bond type,
            # special pass collapsed into the bond hit
            btags, btypes, bond_fn, atag, _ = bond
            style = getattr(bond_fn, "__self__", None)
            if (style is not None and style.name == "fene"
                    and len(style.k) == 2):
                from tpumd.ops.pallas_lj import \
                    lj_fene_cellgrid_forces_pallas
                b0 = btags[:, 0]
                b1 = (btags[:, 1] if btags.shape[1] == 2
                      else jnp.zeros_like(b0))
                fene = (float(style.k[1]), float(style.r0[1] ** 2),
                        float(style.epsilon[1]),
                        float(style.sigma[1] ** 2))
                f = lj_fene_cellgrid_forces_pallas(
                    x, valid, atag, b0, b1, box, cfg,
                    float(self.lj1[1, 1]), float(self.lj2[1, 1]),
                    float(self.cutsq[1, 1]), fene)
                return f, None, None, None, None
        return super().compute_cellgrid(x, type_, valid, box, cfg,
                                        eflag, vflag, q=q, special=special,
                                        bond=bond)

    def pair_fn(self, r2, itype, jtype):
        if self.ntypes == 1:
            # scalar coefficients: no table gathers in the hot loop
            c1, c2_, c3, c4 = (float(self.lj1[1, 1]), float(self.lj2[1, 1]),
                               float(self.lj3[1, 1]), float(self.lj4[1, 1]))
            off = float(self.offset[1, 1])
            inside = r2 < float(self.cutsq[1, 1])
            r2inv = jnp.where(inside, 1.0, 0.0) / jnp.where(inside, r2, 1.0)
            r6inv = r2inv * r2inv * r2inv
            fpair = r6inv * (c1 * r6inv - c2_) * r2inv
            evdwl = jnp.where(inside, r6inv * (c3 * r6inv - c4) - off, 0.0)
            return fpair, evdwl, None, None
        dt_ = r2.dtype
        c2 = self.coef(self.cutsq, itype, jtype, dt_)
        lj1 = self.coef(self.lj1, itype, jtype, dt_)
        lj2 = self.coef(self.lj2, itype, jtype, dt_)
        lj3 = self.coef(self.lj3, itype, jtype, dt_)
        lj4 = self.coef(self.lj4, itype, jtype, dt_)
        off = self.coef(self.offset, itype, jtype, dt_)
        inside = r2 < c2
        r2inv = jnp.where(inside, 1.0 / r2, 0.0)
        r6inv = r2inv * r2inv * r2inv
        forcelj = r6inv * (lj1 * r6inv - lj2)
        fpair = forcelj * r2inv
        evdwl = jnp.where(inside, r6inv * (lj3 * r6inv - lj4) - off, 0.0)
        return fpair, evdwl, None, None
