"""Granular Hookean contact with shear history (pair gran/hooke/history).

Reimplements PairGranHookeHistory::compute
(src/GRANULAR/pair_gran_hooke_history.cpp:169-380) on the i-centric full
neighbor matrix: normal Hookean repulsion + velocity damping, tangential
spring force integrated from per-contact shear displacement history, and
Coulomb friction rescaling.  All pairwise terms are antisymmetric from
either endpoint's row (shear accumulates with opposite sign on the two
directed slots), so each atom sums its own force AND torque from its own
row — the history-carrying analog of the newton-off loops, with no
scatter.

The (N, K, 3) shear history rides the neighbor state and is remapped by
neighbor-tag matching at every rebuild (reference: FixNeighHistory's
paged copy in pre_exchange, src/fix_neigh_history.cpp).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpumd.core.state import minimum_image


from tpumd.models.registry import register_pair


@register_pair("gran/hooke/history")
class PairGranHookeHistory:
    name = "gran/hooke/history"
    supports_cellgrid = False
    is_granular = True
    size_history = 3

    def __init__(self, ntypes):
        self.ntypes = ntypes
        self.freeze_group_bit = 0  # set by fix freeze (reference init_style)
        self._max_radius = 0.5

    def settings(self, kn, kt, gamman, gammat, xmu, dampflag, *extra):
        self.kn = float(kn)
        self.kt = self.kn * 2.0 / 7.0 if kt == "NULL" else float(kt)
        self.gamman = float(gamman)
        self.gammat = (0.5 * self.gamman if gammat == "NULL"
                       else float(gammat))
        self.xmu = float(xmu)
        self.dampflag = int(dampflag)
        if self.dampflag == 0:
            self.gammat = 0.0
        self.limit_damping = bool(extra) and extra[0] == "limit_damping"

    # pair_coeff * *  (no per-type coefficients)
    def coeff(self, ilo, ihi, jlo, jhi, *rest):
        pass

    def init(self):
        pass

    def set_max_radius(self, r):
        self._max_radius = float(r)

    @property
    def max_cutoff(self):
        # neighbor cutoff = max radsum (PairGranHookeHistory::init_one)
        return 2.0 * self._max_radius

    def compute_gran(self, s, idx, shear, dt, shearupdate: bool):
        """Returns (f, torque, shear_new).

        idx: (N, K) neighbor matrix (self-index padding); shear: (N, K, 3).
        """
        x, v, omega = s.x, s.v, s.omega
        radius, rmass, gmask = s.radius, s.rmass, s.gmask
        n, k = idx.shape
        dtype = x.dtype
        self_idx = jnp.arange(n, dtype=idx.dtype)[:, None]
        mask = idx != self_idx

        d = x[:, None, :] - x[idx]                  # (N, K, 3) = del
        d = minimum_image(d, s.box)
        rsq = jnp.sum(d * d, axis=-1)
        radi = radius[:, None]
        radj = radius[idx]
        radsum = radi + radj
        touching = mask & (rsq < radsum * radsum)
        rsq_safe = jnp.where(touching, rsq, jnp.ones_like(rsq))
        r = jnp.sqrt(rsq_safe)
        rinv = 1.0 / r
        rsqinv = 1.0 / rsq_safe

        # relative translational velocity
        vr = v[:, None, :] - v[idx]
        vnnr = jnp.sum(vr * d, axis=-1)             # (N, K)
        vn = d * (vnnr * rsqinv)[..., None]
        vt = vr - vn

        # relative rotational velocity
        wr = (radi[..., None] * omega[:, None, :]
              + radj[..., None] * omega[idx]) * rinv[..., None]

        # effective mass; frozen atoms act as infinite mass
        mi = rmass[:, None]
        mj = rmass[idx]
        meff = mi * mj / (mi + mj)
        if self.freeze_group_bit:
            fi = (gmask[:, None] & self.freeze_group_bit) > 0
            fj = (gmask[idx] & self.freeze_group_bit) > 0
            meff = jnp.where(fi, mj, meff)
            meff = jnp.where(fj, mi, meff)

        # normal force = Hookean contact + normal velocity damping
        damp = meff * self.gamman * vnnr * rsqinv
        ccel = self.kn * (radsum - r) * rinv - damp
        if self.limit_damping:
            ccel = jnp.maximum(ccel, 0.0)

        # tangential relative velocity at contact:
        # vtr1 = vt1 - (delz*wr2 - dely*wr3) = vt + (d x wr)
        vtr = vt + jnp.cross(d, wr)

        # shear history: accumulate, project out the normal component
        shear_t = jnp.where(touching[..., None], shear, 0.0)
        if shearupdate:
            shear_t = shear_t + jnp.where(
                touching[..., None], vtr * dt, 0.0)
        shrmag = jnp.sqrt(jnp.sum(shear_t * shear_t, axis=-1))
        if shearupdate:
            rsht = jnp.sum(shear_t * d, axis=-1) * rsqinv
            shear_t = shear_t - d * rsht[..., None]

        # tangential force = shear spring + tangential damping
        gt = meff * self.gammat
        fs_vec = -(self.kt * shear_t + gt[..., None] * vtr)
        fs = jnp.sqrt(jnp.sum(fs_vec * fs_vec, axis=-1))
        fn = self.xmu * jnp.abs(ccel * r)

        # Coulomb rescale of shear and force when slipping
        slip = touching & (fs > fn)
        ratio = fn / jnp.where(fs > 0, fs, 1.0)
        damp_t = gt[..., None] * vtr / self.kt if self.kt else 0.0 * vtr
        shear_res = ratio[..., None] * (shear_t + damp_t) - damp_t
        nonzero = shrmag != 0.0
        shear_t = jnp.where((slip & nonzero)[..., None], shear_res, shear_t)
        fs_vec = jnp.where(slip[..., None],
                           jnp.where(nonzero[..., None],
                                     fs_vec * ratio[..., None], 0.0),
                           fs_vec)

        fpair = d * ccel[..., None] + fs_vec
        fpair = jnp.where(touching[..., None], fpair, 0.0)
        f = jnp.sum(fpair, axis=1)

        # torque_i -= rad_i * rinv * (d x fs)
        tor = jnp.cross(d, fs_vec) * rinv[..., None]
        tor = jnp.where(touching[..., None], tor, 0.0)
        torque = -jnp.sum(radi[..., None] * tor, axis=1)

        shear_new = jnp.where(touching[..., None], shear_t, 0.0)
        return f, torque, shear_new

    def mean_neighbors(self, density, cutneigh):
        return density * 4.0 / 3.0 * np.pi * cutneigh**3
