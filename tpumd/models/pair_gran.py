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

from tpumd.core.state import minimum_image_c


from tpumd.models.registry import register_pair


@register_pair("gran/hooke/history")
class PairGranHookeHistory:
    name = "gran/hooke/history"
    supports_cellgrid = False
    is_granular = True
    size_history = 3
    is_hertz = False   # Hertzian sqrt(delta*Reff) stiffness scaling

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

        # ONE packed j-gather: TPU gather cost is per-ROW, so fetching
        # x/v/omega/radius/rmass/gmask as a single (N, 12) table is ~6x
        # cheaper than six separate gathers
        packed = jnp.concatenate(
            [x, v, omega, radius[:, None], rmass[:, None],
             gmask.astype(dtype)[:, None]], axis=1)
        pj = packed[idx]                            # (N, K, 12)
        xj, vj, omegaj = pj[..., 0:3], pj[..., 3:6], pj[..., 6:9]
        radj, mj = pj[..., 9], pj[..., 10]
        gj = pj[..., 11].astype(jnp.int32)

        # all pairwise math on per-component (N, K) arrays — a trailing
        # dim of 3 would tile the VPU at 3/128 lane utilization
        d = [x[:, c:c + 1] - xj[..., c] for c in range(3)]
        d = [minimum_image_c(d[c], s.box, c) for c in range(3)]
        rsq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        radi = radius[:, None]
        radsum = radi + radj
        touching = mask & (rsq < radsum * radsum)
        rsq_safe = jnp.where(touching, rsq, jnp.ones_like(rsq))
        r = jnp.sqrt(rsq_safe)
        rinv = 1.0 / r
        rsqinv = 1.0 / rsq_safe

        # relative translational velocity + normal/tangential split
        vr = [v[:, c:c + 1] - vj[..., c] for c in range(3)]
        vnnr = vr[0] * d[0] + vr[1] * d[1] + vr[2] * d[2]
        vt = [vr[c] - d[c] * (vnnr * rsqinv) for c in range(3)]

        # relative rotational velocity
        wr = [(radi * omega[:, c:c + 1] + radj * omegaj[..., c]) * rinv
              for c in range(3)]

        # effective mass; frozen atoms act as infinite mass
        mi = rmass[:, None]
        meff = mi * mj / (mi + mj)
        if self.freeze_group_bit:
            fi = (gmask[:, None] & self.freeze_group_bit) > 0
            fj = (gj & self.freeze_group_bit) > 0
            meff = jnp.where(fi, mj, meff)
            meff = jnp.where(fj, mi, meff)

        # normal force = Hookean contact + normal velocity damping
        damp = meff * self.gamman * vnnr * rsqinv
        ccel = self.kn * (radsum - r) * rinv - damp
        poly = None
        if self.is_hertz:
            # PairGranHertzHistory::compute: polyhertz scales both the
            # normal and tangential stiffness
            # (src/GRANULAR/pair_gran_hertz_history.cpp:186-189)
            poly = jnp.sqrt(jnp.where(
                touching, (radsum - r) * radi * radj / radsum, 0.0))
            ccel = ccel * poly
        if self.limit_damping:
            ccel = jnp.maximum(ccel, 0.0)

        # tangential relative velocity at contact:
        # vtr1 = vt1 - (delz*wr2 - dely*wr3) = vt + (d x wr)
        vtr = [vt[0] + (d[1] * wr[2] - d[2] * wr[1]),
               vt[1] + (d[2] * wr[0] - d[0] * wr[2]),
               vt[2] + (d[0] * wr[1] - d[1] * wr[0])]

        # shear history: accumulate, project out the normal component
        sh = [jnp.where(touching, shear[..., c], 0.0) for c in range(3)]
        if shearupdate:
            sh = [jnp.where(touching, sh[c] + vtr[c] * dt, sh[c])
                  for c in range(3)]
        shrmag = jnp.sqrt(sh[0] * sh[0] + sh[1] * sh[1] + sh[2] * sh[2])
        if shearupdate:
            rsht = (sh[0] * d[0] + sh[1] * d[1] + sh[2] * d[2]) * rsqinv
            sh = [sh[c] - d[c] * rsht for c in range(3)]

        # tangential force = shear spring + tangential damping
        gt = meff * self.gammat
        fs_v = [-(self.kt * sh[c] + gt * vtr[c]) for c in range(3)]
        if poly is not None:
            fs_v = [poly * fc for fc in fs_v]
        fs = jnp.sqrt(fs_v[0] ** 2 + fs_v[1] ** 2 + fs_v[2] ** 2)
        fn = self.xmu * jnp.abs(ccel * r)

        # Coulomb rescale of shear and force when slipping
        slip = touching & (fs > fn)
        ratio = fn / jnp.where(fs > 0, fs, 1.0)
        nonzero = shrmag != 0.0
        resc = slip & nonzero
        for c in range(3):
            damp_t = gt * vtr[c] / self.kt if self.kt else 0.0 * vtr[c]
            sh[c] = jnp.where(resc, ratio * (sh[c] + damp_t) - damp_t, sh[c])
            fs_v[c] = jnp.where(slip,
                                jnp.where(nonzero, fs_v[c] * ratio, 0.0),
                                fs_v[c])

        fpc = [jnp.where(touching, d[c] * ccel + fs_v[c], 0.0)
               for c in range(3)]
        f = jnp.stack([jnp.sum(fpc[c], axis=1) for c in range(3)], axis=1)

        # torque_i -= rad_i * rinv * (d x fs)
        tor = [(d[1] * fs_v[2] - d[2] * fs_v[1]) * rinv,
               (d[2] * fs_v[0] - d[0] * fs_v[2]) * rinv,
               (d[0] * fs_v[1] - d[1] * fs_v[0]) * rinv]
        torque = jnp.stack(
            [-jnp.sum(jnp.where(touching, radi * tor[c], 0.0), axis=1)
             for c in range(3)], axis=1)

        shear_new = jnp.stack(
            [jnp.where(touching, sh[c], 0.0) for c in range(3)], axis=-1)
        return f, torque, shear_new

    def mean_neighbors(self, density, cutneigh):
        return density * 4.0 / 3.0 * np.pi * cutneigh**3

    # ---------------- cell-grid path (dense candidate shear history) ----
    def gran_params(self, exclude_bits=()):
        return dict(kn=self.kn, kt=self.kt, gamman=self.gamman,
                    gammat=self.gammat, xmu=self.xmu,
                    limit_damping=self.limit_damping,
                    freeze_bit=self.freeze_group_bit,
                    exclude_bits=tuple(exclude_bits),
                    hertz=self.is_hertz)

    def compute_gran_cellgrid(self, s, valid, shear_tags, shear, cfg, dt,
                              shearupdate: bool, exclude_bits=()):
        """Rolled-block granular sweep with compact tag-keyed history:
        the fused pallas kernel on TPU/f32 in-step (VMEM-resident pair
        blocks), the XLA path elsewhere (CPU parity, energy evals)."""
        import jax as _jax
        planes = (s.v[:, 0], s.v[:, 1], s.v[:, 2],
                  s.omega[:, 0], s.omega[:, 1], s.omega[:, 2],
                  s.radius, jnp.where(s.rmass > 0, s.rmass, 1.0),
                  s.gmask.astype(s.x.dtype))
        if (shearupdate and s.x.dtype == jnp.float32
                and not self.is_hertz
                and _jax.default_backend() == "tpu"
                and 3 * cfg.cap < 128 and cfg.nz >= 3
                and cfg.ny >= 2 and cfg.nx >= 2):
            from tpumd.ops.pallas_gran import gran_cellgrid_forces_pallas
            params_t = (self.kn, self.kt, self.gamman, self.gammat,
                        self.xmu, self.limit_damping,
                        self.freeze_group_bit, tuple(exclude_bits))
            return gran_cellgrid_forces_pallas(
                s.x, s.tag, valid, shear_tags, shear, s.box, cfg,
                params_t, dt, planes)
        from tpumd.ops.cellgrid_gran import gran_compact_sums
        f, tq, st, sh = gran_compact_sums(
            s.x, s.tag, valid, shear_tags, shear, s.box, cfg,
            self.gran_params(exclude_bits), planes, dt, shearupdate)
        return f, tq, st, sh


@register_pair("gran/hertz/history")
class PairGranHertzHistory(PairGranHookeHistory):
    """Hertzian contact with shear history (pair gran/hertz/history).

    Identical to gran/hooke/history except both the normal and the
    tangential force are scaled by polyhertz =
    sqrt((radsum - r) * radi * radj / radsum)
    (src/GRANULAR/pair_gran_hertz_history.cpp:169-230; settings are
    shared with the hooke parent, :262-289)."""

    name = "gran/hertz/history"
    is_hertz = True


@register_pair("gran/hooke")
class PairGranHooke(PairGranHookeHistory):
    """History-free Hookean contact (pair gran/hooke).

    Tangential force is pure velocity damping capped by Coulomb
    friction: ft = min(xmu*|ccel*r|, meff*gammat*vrel)/vrel
    (src/GRANULAR/pair_gran_hooke.cpp:85-160)."""

    name = "gran/hooke"
    size_history = 0

    def compute_gran(self, s, idx, shear, dt, shearupdate: bool):
        x, v, omega = s.x, s.v, s.omega
        radius, rmass, gmask = s.radius, s.rmass, s.gmask
        n, k = idx.shape
        dtype = x.dtype
        self_idx = jnp.arange(n, dtype=idx.dtype)[:, None]
        mask = idx != self_idx

        packed = jnp.concatenate(
            [x, v, omega, radius[:, None], rmass[:, None],
             gmask.astype(dtype)[:, None]], axis=1)
        pj = packed[idx]
        xj, vj, omegaj = pj[..., 0:3], pj[..., 3:6], pj[..., 6:9]
        radj, mj = pj[..., 9], pj[..., 10]
        gj = pj[..., 11].astype(jnp.int32)

        d = [x[:, c:c + 1] - xj[..., c] for c in range(3)]
        d = [minimum_image_c(d[c], s.box, c) for c in range(3)]
        rsq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        radi = radius[:, None]
        radsum = radi + radj
        touching = mask & (rsq < radsum * radsum)
        rsq_safe = jnp.where(touching, rsq, jnp.ones_like(rsq))
        r = jnp.sqrt(rsq_safe)
        rinv = 1.0 / r
        rsqinv = 1.0 / rsq_safe

        vr = [v[:, c:c + 1] - vj[..., c] for c in range(3)]
        vnnr = vr[0] * d[0] + vr[1] * d[1] + vr[2] * d[2]
        vt = [vr[c] - d[c] * (vnnr * rsqinv) for c in range(3)]
        wr = [(radi * omega[:, c:c + 1] + radj * omegaj[..., c]) * rinv
              for c in range(3)]

        mi = rmass[:, None]
        meff = mi * mj / (mi + mj)
        if self.freeze_group_bit:
            fi = (gmask[:, None] & self.freeze_group_bit) > 0
            fj = (gj & self.freeze_group_bit) > 0
            meff = jnp.where(fi, mj, meff)
            meff = jnp.where(fj, mi, meff)

        damp = meff * self.gamman * vnnr * rsqinv
        ccel = self.kn * (radsum - r) * rinv - damp
        if self.limit_damping:
            ccel = jnp.maximum(ccel, 0.0)

        vtr = [vt[0] + (d[1] * wr[2] - d[2] * wr[1]),
               vt[1] + (d[2] * wr[0] - d[0] * wr[2]),
               vt[2] + (d[0] * wr[1] - d[1] * wr[0])]
        vrel = jnp.sqrt(vtr[0] ** 2 + vtr[1] ** 2 + vtr[2] ** 2)

        fn = self.xmu * jnp.abs(ccel * r)
        fs = meff * self.gammat * vrel
        ft = jnp.where(vrel != 0.0, jnp.minimum(fn, fs)
                       / jnp.where(vrel != 0.0, vrel, 1.0), 0.0)
        fs_v = [-ft * vtr[c] for c in range(3)]

        fpc = [jnp.where(touching, d[c] * ccel + fs_v[c], 0.0)
               for c in range(3)]
        f = jnp.stack([jnp.sum(fpc[c], axis=1) for c in range(3)], axis=1)
        tor = [(d[1] * fs_v[2] - d[2] * fs_v[1]) * rinv,
               (d[2] * fs_v[0] - d[0] * fs_v[2]) * rinv,
               (d[0] * fs_v[1] - d[1] * fs_v[0]) * rinv]
        torque = jnp.stack(
            [-jnp.sum(jnp.where(touching, radi * tor[c], 0.0), axis=1)
             for c in range(3)], axis=1)
        return f, torque, shear

    def compute_gran_cellgrid(self, *a, **kw):
        raise NotImplementedError(
            "pair gran/hooke runs on the matrix neighbor engine")
