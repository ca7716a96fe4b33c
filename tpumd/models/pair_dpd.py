"""DPD pair styles: dpd and dpd/tstat.

Reimplements PairDPD / PairDPDTstat (src/DPD-BASIC/pair_dpd.cpp:71-182,
pair_dpd_tstat.cpp): conservative soft repulsion a0*(1 - r/rc), pairwise
dissipative drag -gamma*wd^2*(v_ij . e_ij) and the matched stochastic
kick sigma*wd*theta/sqrt(dt) with sigma = sqrt(2 kB T gamma)
(fluctuation-dissipation).

TPU-native RNG: the reference draws one serial RanMars gaussian per
half-pair per step — inherently sequential and rank-count-dependent, so
(exactly like fix langevin's device path) the trajectory is an ENSEMBLE
match, not bitwise.  Here the per-pair standard normal is a stateless
counter-based hash: murmur3 finalizers over (tag_lo, tag_hi, step, seed)
feed a Box-Muller transform.  Symmetric in (i, j) by construction, so
Newton's third law holds exactly with zero communication; independent
across pairs and steps to murmur3 avalanche quality.

The conservative part (gamma = 0) is deterministic and golden-testable
against the reference binary.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpumd.models.base import PairStyle
from tpumd.models.registry import register_pair
from tpumd.core.state import minimum_image_c


def _murmur_fmix(h):
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    return h ^ (h >> 16)


def pair_gaussian(tagi, tagj, step, seed):
    """(N, K) standard normals, symmetric under i<->j."""
    lo = jnp.minimum(tagi, tagj).astype(jnp.uint32)
    hi = jnp.maximum(tagi, tagj).astype(jnp.uint32)
    stepu = jnp.asarray(step).astype(jnp.uint32)
    base = (lo * jnp.uint32(0x9E3779B1)
            ^ hi * jnp.uint32(0x85EBCA77)
            ^ (stepu * jnp.uint32(0xC2B2AE3D))
            ^ jnp.uint32(seed))
    u1 = _murmur_fmix(base)
    u2 = _murmur_fmix(base ^ jnp.uint32(0x5BD1E995))
    # uniforms in (0, 1]; 2^-32 scale, +1 ulp to avoid log(0)
    f1 = (u1.astype(jnp.float32) + 1.0) * jnp.float32(2.3283064e-10)
    f2 = u2.astype(jnp.float32) * jnp.float32(2.3283064e-10)
    r = jnp.sqrt(-2.0 * jnp.log(f1))
    return r * jnp.cos(2.0 * np.pi * f2)


@register_pair("dpd")
class PairDPD(PairStyle):
    name = "dpd"
    needs_velocities = True
    supports_cellgrid = False
    tstat_only = False

    def __init__(self, ntypes: int):
        super().__init__(ntypes)
        shape = (ntypes + 1, ntypes + 1)
        self.a0 = np.zeros(shape)
        self.gamma = np.zeros(shape)
        self.cut = np.zeros(shape)

    def settings(self, temperature, cut_global, seed):
        self.temperature = float(temperature)
        self.t_start = self.t_stop = self.temperature
        self.cut_global = float(cut_global)
        self.seed = int(seed) % (2**31)

    def coeff(self, ilo, ihi, jlo, jhi, a0, gamma, cut=None):
        cut = self.cut_global if cut is None else float(cut)
        for i in range(ilo, ihi + 1):
            for j in range(max(jlo, i), jhi + 1):
                self.a0[i, j] = float(a0)
                self.gamma[i, j] = float(gamma)
                self.cut[i, j] = cut
                self._setflag[i, j] = True

    def init(self):
        nt = self.ntypes
        for i in range(1, nt + 1):
            for j in range(i, nt + 1):
                if not self._setflag[i, j]:
                    if not (self._setflag[i, i] and self._setflag[j, j]):
                        raise ValueError(
                            f"All pair coeffs are not set ({i},{j})")
                    # PairDPD::init_one mixes nothing: unset i-j requires
                    # explicit coeffs in the reference; be permissive and
                    # mix geometrically like Pair defaults
                    self.a0[i, j] = 0.5 * (self.a0[i, i] + self.a0[j, j])
                    self.gamma[i, j] = 0.5 * (self.gamma[i, i]
                                              + self.gamma[j, j])
                    self.cut[i, j] = 0.5 * (self.cut[i, i]
                                            + self.cut[j, j])
                for arr in (self.a0, self.gamma, self.cut):
                    arr[j, i] = arr[i, j]
        self.cutsq = self.cut * self.cut

    @property
    def max_cutoff(self) -> float:
        return float(self.cut[1:, 1:].max())

    def _sigma(self, ctx):
        # sigma = sqrt(2 kB T gamma) recomputed per eval so tstat ramps
        # (PairDPDTstat::compute :60-70) are honored
        return np.sqrt(2.0 * 1.0 * self.temperature) * np.sqrt(self.gamma)

    def compute_vel(self, s, neigh, ctx, eflag, vflag, istep):
        idx, sbits = neigh.idx, neigh.sbits
        x, v, type_, tag = s.x, s.v, s.type, s.tag
        dt_ = x.dtype
        n, k = idx.shape
        self_idx = jnp.arange(n, dtype=idx.dtype)[:, None]
        mask = idx != self_idx

        packed = jnp.concatenate(
            [x, v, tag.astype(dt_)[:, None]], axis=1)
        pj = packed[idx]
        xj, vj = pj[..., 0:3], pj[..., 3:6]
        tagj = pj[..., 6].astype(jnp.int32)
        tj = type_[idx]
        ti = type_[:, None]

        d = [x[:, c:c + 1] - xj[..., c] for c in range(3)]
        d = [minimum_image_c(d[c], s.box, c) for c in range(3)]
        rsq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        cutsq = self.coef(self.cutsq, ti, tj, dt_)
        inrange = mask & (rsq < cutsq) & (rsq > 1e-24)
        rsq_safe = jnp.where(inrange, rsq, jnp.ones_like(rsq))
        r = jnp.sqrt(rsq_safe)
        rinv = 1.0 / r

        cut = self.coef(self.cut, ti, tj, dt_)
        wd = 1.0 - r / cut
        dv = [v[:, c:c + 1] - vj[..., c] for c in range(3)]
        dot = dv[0] * d[0] + dv[1] * d[1] + dv[2] * d[2]

        kBT = self.temperature * ctx.units.boltz
        gamma = self.coef(self.gamma, ti, tj, dt_)
        sigma = jnp.sqrt(2.0 * kBT * gamma)
        dtinvsqrt = 1.0 / jnp.sqrt(jnp.asarray(ctx.dt, dt_))
        randnum = pair_gaussian(tag[:, None], tagj, istep,
                                self.seed).astype(dt_)

        # special-bond weighting: DPD uses the LJ special factors
        w = jnp.ones_like(rsq)
        if ctx.special_lj is not None:
            for code, fac in ((1, ctx.special_lj[0]),
                              (2, ctx.special_lj[1]),
                              (3, ctx.special_lj[2])):
                w = jnp.where(sbits == code, jnp.asarray(fac, dt_), w)

        fpair = jnp.zeros_like(rsq)
        if not self.tstat_only:
            a0 = self.coef(self.a0, ti, tj, dt_)
            fpair = a0 * wd
        fpair = fpair - gamma * wd * wd * dot * rinv
        fpair = fpair + sigma * wd * randnum * dtinvsqrt
        fpair = jnp.where(inrange, w * fpair * rinv, 0.0)

        f = jnp.stack([jnp.sum(fpair * d[c], axis=1) for c in range(3)],
                      axis=1)
        evdwl = jnp.zeros((), dt_)
        if eflag and not self.tstat_only:
            a0 = self.coef(self.a0, ti, tj, dt_)
            e = 0.5 * a0 * cut * wd * wd
            evdwl = 0.5 * jnp.sum(jnp.where(inrange, w * e, 0.0))
        virial = None
        if vflag:
            # half per-pair virial from each directed slot
            fv = [fpair * d[c] for c in range(3)]
            virial = 0.5 * jnp.stack([
                jnp.sum(d[0] * fv[0]), jnp.sum(d[1] * fv[1]),
                jnp.sum(d[2] * fv[2]), jnp.sum(d[0] * fv[1]),
                jnp.sum(d[0] * fv[2]), jnp.sum(d[1] * fv[2])])
        return f, evdwl, virial


@register_pair("dpd/tstat")
class PairDPDTstat(PairDPD):
    """pair dpd/tstat: DPD thermostat only (no conservative force),
    temperature ramped t_start -> t_stop over the run
    (src/DPD-BASIC/pair_dpd_tstat.cpp)."""

    name = "dpd/tstat"
    tstat_only = True

    def settings(self, t_start, t_stop, cut_global, seed):
        self.t_start = float(t_start)
        self.t_stop = float(t_stop)
        self.temperature = self.t_start
        self.cut_global = float(cut_global)
        self.seed = int(seed) % (2**31)

    def coeff(self, ilo, ihi, jlo, jhi, gamma, cut=None):
        cut = self.cut_global if cut is None else float(cut)
        for i in range(ilo, ihi + 1):
            for j in range(max(jlo, i), jhi + 1):
                self.a0[i, j] = 0.0
                self.gamma[i, j] = float(gamma)
                self.cut[i, j] = cut
                self._setflag[i, j] = True
