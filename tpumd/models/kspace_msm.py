"""MSM: multilevel summation method (kspace_style msm) + pair
lj/cut/coul/msm.

Reimplements src/KSPACE/msm.cpp (Hardy/Stone/Schulten multilevel
splitting): the coulomb kernel splits into a short-range part handled by
the pair style through the gamma() polynomial taper and a hierarchy of
grid levels, each evaluating a LOCAL direct convolution with weights
g_direct[n] = gamma(rho)/(2^n a) - gamma(rho/2)/(2^(n+1) a), connected
by order-p restriction/prolongation stencils.

TPU-first mapping: every grid-level direct sum is a PERIODIC convolution
-> evaluated exactly as an FFT product with the circulant-folded weight
kernel (batched fftn, MXU/VPU-friendly); restriction/prolongation are
separable odd-tap convolutions done as roll-sums with 2x down/upsampling.
Identical arithmetic content to the reference's nested loops, summed in
a different (Fourier) order — parity to ~1e-12 on the golden deck.

Scalar-pressure mode (the reference's MSM default, kspace_modify
pressure/scalar yes) sets the virial diagonal to e_long/3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpumd.models.pair_misc import PairLJCutCoulCut
from tpumd.models.registry import register_pair

# KSpace::KSpace gcons/dgcons tables (src/kspace.cpp:101-148)
GCONS = {
    2: [15.0 / 8.0, -5.0 / 4.0, 3.0 / 8.0],
    3: [35.0 / 16.0, -35.0 / 16.0, 21.0 / 16.0, -5.0 / 16.0],
    4: [315.0 / 128.0, -105.0 / 32.0, 189.0 / 64.0, -45.0 / 32.0,
        35.0 / 128.0],
    5: [693.0 / 256.0, -1155.0 / 256.0, 693.0 / 128.0, -495.0 / 128.0,
        385.0 / 256.0, -63.0 / 256.0],
}
DGCONS = {
    2: [-5.0 / 2.0, 3.0 / 2.0],
    3: [-35.0 / 8.0, 21.0 / 4.0, -15.0 / 8.0],
    4: [-105.0 / 16.0, 189.0 / 16.0, -135.0 / 16.0, 35.0 / 16.0],
    5: [-1155.0 / 128.0, 693.0 / 32.0, -1485.0 / 64.0, 385.0 / 32.0,
        -315.0 / 128.0],
}


def gamma_np(rho, order):
    """KSpace::gamma (src/kspace.h:147): even polynomial taper."""
    rho = np.asarray(rho, np.float64)
    so = order // 2
    c = GCONS[so]
    rho2 = rho * rho
    g = np.full_like(rho, c[0])
    rn = rho2.copy()
    for n in range(1, so + 1):
        g = g + c[n] * rn
        rn = rn * rho2
    return np.where(rho <= 1.0, g, 1.0 / np.where(rho > 1.0, rho, 1.0))


def gamma_jnp(rho, order, dtype):
    so = order // 2
    c = GCONS[so]
    rho2 = rho * rho
    g = jnp.full_like(rho, c[0])
    rn = rho2
    for n in range(1, so + 1):
        g = g + c[n] * rn
        rn = rn * rho2
    safe = jnp.where(rho > 1.0, rho, 1.0)
    return jnp.where(rho <= 1.0, g, 1.0 / safe)


def dgamma_jnp(rho, order):
    so = order // 2
    c = DGCONS[so]
    rho2 = rho * rho
    dg = c[0] * rho
    rn = rho * rho2
    for n in range(1, so):
        dg = dg + c[n] * rn
        rn = rn * rho2
    safe = jnp.where(rho > 1.0, rho, 1.0)
    return jnp.where(rho <= 1.0, dg, -1.0 / (safe * safe))


def compute_phi_np(xi, order):
    """MSM::compute_phi (:2909): the order-p interpolation basis."""
    a = np.abs(np.asarray(xi, np.float64))
    x2 = a * a
    if order == 4:
        phi = np.where(
            a <= 1, (1.0 - a) * (1.0 + a - 1.5 * x2),
            np.where(a <= 2, -0.5 * (a - 1.0) * (2.0 - a) * (2.0 - a),
                     0.0))
    elif order == 6:
        phi = np.where(
            a <= 1, (1.0 - x2) * (2.0 - a) * (6.0 + 3.0 * a
                                              - 5.0 * x2) / 12.0,
            np.where(a <= 2, -(a - 1.0) * (2.0 - a) * (3.0 - a)
                     * (4.0 + 9.0 * a - 5.0 * x2) / 24.0,
                     np.where(a <= 3, (a - 1.0) * (a - 2.0) * (3.0 - a)
                              * (3.0 - a) * (4.0 - a) / 24.0, 0.0)))
    elif order == 8:
        phi = np.where(
            a <= 1, (1.0 - x2) * (4.0 - x2) * (3.0 - a)
            * (12.0 + 4.0 * a - 7.0 * x2) / 144.0,
            np.where(a <= 2, -(x2 - 1.0) * (2.0 - a) * (3.0 - a)
                     * (4.0 - a) * (10.0 + 12.0 * a - 7.0 * x2) / 240.0,
                     np.where(a <= 3, (a - 1.0) * (a - 2.0) * (3.0 - a)
                              * (4.0 - a) * (5.0 - a)
                              * (6.0 + 20.0 * a - 7.0 * x2) / 720.0,
                              np.where(a <= 4, -(a - 1.0) * (a - 2.0)
                                       * (a - 3.0) * (4.0 - a) * (4.0 - a)
                                       * (5.0 - a) * (6.0 - a) / 720.0,
                                       0.0))))
    elif order == 10:
        phi = np.where(
            a <= 1, (1.0 - x2) * (4.0 - x2) * (9.0 - x2) * (4.0 - a)
            * (20.0 + 5.0 * a - 9.0 * x2) / 2880.0,
            np.where(
                a <= 2, -(x2 - 1.0) * (4.0 - x2) * (3.0 - a) * (4.0 - a)
                * (5.0 - a) * (6.0 + 5.0 * a - 3.0 * x2) / 1440.0,
                np.where(
                    a <= 3, (x2 - 1.0) * (a - 2.0) * (3.0 - a) * (4.0 - a)
                    * (5.0 - a) * (6.0 - a)
                    * (14.0 + 25.0 * a - 9.0 * x2) / 10080.0,
                    np.where(
                        a <= 4, -(a - 1.0) * (a - 2.0) * (a - 3.0)
                        * (4.0 - a) * (5.0 - a) * (6.0 - a) * (7.0 - a)
                        * (8.0 + 35.0 * a - 9.0 * x2) / 40320.0,
                        np.where(
                            a <= 5, (a - 1.0) * (a - 2.0) * (a - 3.0)
                            * (a - 4.0) * (5.0 - a) * (5.0 - a)
                            * (6.0 - a) * (7.0 - a) * (8.0 - a) / 40320.0,
                            0.0)))))
    else:
        raise ValueError("MSM order must be 4, 6, 8, or 10")
    return phi


class MSM:
    """kspace_style msm accuracy (src/KSPACE/msm.cpp)."""

    order = 10
    scalar_pressure = True

    def __init__(self, accuracy_relative):
        self.accuracy_relative = float(accuracy_relative)
        self.gewald_override = None

    # ------------------------------------------------------- grid setup
    def _estimate_1d_error(self, h, prd):
        a = self.cutoff
        p = self.order - 1
        table = {3: (9, 1 / 6, 0.39189561),
                 5: (825, 1 / 30, 0.150829428),
                 7: (130095, 1 / 140, 0.049632967),
                 9: (34096545, 1 / 630, 0.013520855)}
        Mp, cprime, scaling = table[p]
        C_p = 4.0 * cprime * Mp / 3.0 * scaling
        err = C_p * h ** (p - 1) / a ** (p + 1)
        return err * self.q2 * a / (prd * np.sqrt(self.natoms))

    def init(self, sim):
        u = sim.units
        self.units = u
        self.qqrd2e = u.qqr2e
        q = np.asarray(jax.device_get(sim.state.q), np.float64)
        self.qsum = float(q.sum())
        self.qsqsum = float((q * q).sum())
        self.q2 = self.qsqsum * self.qqrd2e
        self.natoms = sim.natoms
        self.accuracy = self.accuracy_relative * u.qqr2e
        self.cutoff = sim.pair.cut_coul
        lo = np.asarray(jax.device_get(sim.state.box.lo), np.float64)
        hi = np.asarray(jax.device_get(sim.state.box.hi), np.float64)
        self.boxlo = lo
        prd = hi - lo
        self.prd = prd

        # set_grid_global (:950) DEFAULT branch (adjust_cutoff_flag on,
        # src/kspace.cpp:77): cost-optimal grid spacing from Hardy's
        # thesis, then ADJUST the coulomb cutoff to hit the accuracy
        p = self.order - 1
        hmin = (3072.0 * (p + 1) / (p - 1)
                / (448.0 * np.pi + 56.0 * np.pi * self.order / 2
                   + 1701.0)) ** (1.0 / 6.0) \
            * (np.prod(prd) / self.natoms) ** (1.0 / 3.0)
        nmax = []
        nlev = []
        for d in range(3):
            n = max(int(prd[d] / hmin), 2)
            # boost until a power of two, rounding to the nearest
            while (n & (n - 1)) != 0:
                k = np.log(n) / np.log(2.0)
                n = n + 1 if (k - np.floor(k)) > 0.5 else n - 1
            nmax.append(n)
            nlev.append(int(np.round(np.log2(n))) + 1)
        # adjust Coulombic cutoff for the requested error (:1056-1078)
        table = {3: (9, 1 / 6, 0.39189561), 5: (825, 1 / 30, 0.150829428),
                 7: (130095, 1 / 140, 0.049632967),
                 9: (34096545, 1 / 630, 0.013520855)}
        Mp, cprime, scaling = table[p]
        C_p = 4.0 * cprime * Mp / 3.0 * scaling
        h = prd / np.asarray(nmax, np.float64)
        kfac = self.q2 * C_p / self.accuracy / np.sqrt(self.natoms)
        ssum = float(np.sum(h ** (2.0 * p - 2.0) / prd ** 2))
        self.cutoff = (kfac * kfac * ssum / 3.0) ** (1.0 / (2.0 * p))
        sim.pair.cut_coul = self.cutoff
        sim.pair.cut_coulsq = self.cutoff ** 2
        self.levels = max(nlev) - 1        # periodic: top level omitted
        if self.levels < 1:
            self.levels = 1
        self.ngrids = []
        for n in range(self.levels):
            self.ngrids.append(tuple(
                max(int(2 ** (nlev[d] - n - 1)), 1) for d in range(3)))
        # particle stencil bounds (:1189)
        self.nlower = -(self.order - 1) // 2
        self.nupper = self.order // 2
        self._setup_kernels()
        # inform the pair style (gamma taper shares order + cutoff)
        sim.pair.msm_order = self.order
        self.dynamic_box = False

    def _setup_kernels(self):
        """Per-level circulant direct-sum kernels (get_g_direct :3106),
        folded modulo the level grid so coarse-level wraparound sums the
        aliased images exactly like the reference's ghost sweep."""
        a = self.cutoff
        prd = self.prd
        self.kernels = []
        # direct range in CELLS is set by the level-0 spacing and reused
        # at every level (setup :340: nxhi_direct from delxinv[0]) — the
        # physical reach doubles per level, tracking where the level-n
        # kernel difference is nonzero
        delinv0 = np.asarray(self.ngrids[0]) / prd
        hi_d0 = (2.0 * a * delinv0).astype(int)
        for n, (nx, ny, nz) in enumerate(self.ngrids):
            delinv = np.array([nx, ny, nz]) / prd
            hi_d = hi_d0
            two_n = 2.0 ** n
            ker = np.zeros((nz, ny, nx))
            iz = np.arange(-hi_d[2], hi_d[2] + 1)
            iy = np.arange(-hi_d[1], hi_d[1] + 1)
            ix = np.arange(-hi_d[0], hi_d[0] + 1)
            dz = iz / delinv[2]
            dy = iy / delinv[1]
            dx = ix / delinv[0]
            r = np.sqrt(dx[None, None, :] ** 2 + dy[None, :, None] ** 2
                        + dz[:, None, None] ** 2)
            rho = r / (two_n * a)
            g = (gamma_np(rho, self.order) / (two_n * a)
                 - gamma_np(rho / 2.0, self.order) / (2.0 * two_n * a))
            np.add.at(ker, (iz[:, None, None] % nz, iy[None, :, None] % ny,
                            ix[None, None, :] % nx),
                      g)
            self.kernels.append(jnp.asarray(np.fft.fftn(ker)))
        # restriction/prolongation taps at odd offsets (:2250-2270)
        p = self.order - 1
        taps = [nu for nu in range(-p, p + 1) if nu % 2 != 0 or nu == 0]
        self.rp_offsets = taps
        self.rp_weights = [float(compute_phi_np(nu / 2.0, self.order))
                           for nu in taps]

    # ---------------------------------------------------------- compute
    def compute(self, s, eflag: bool, vflag: bool):
        dt_ = s.x.dtype
        q = s.q
        n = q.shape[0]
        nx, ny, nz = self.ngrids[0]
        lo = jnp.asarray(self.boxlo, dt_)
        delinv = jnp.asarray(np.array(self.ngrids[0]) / self.prd, dt_)

        gx = (s.x - lo) * delinv
        base = jnp.floor(gx).astype(jnp.int32)
        d = base.astype(dt_) - gx                     # in (-1, 0]
        # stencil weights per dim
        order_n = self.nupper - self.nlower + 1
        phis = []
        dphis = []
        for l in range(self.nlower, self.nupper + 1):
            xi = d + l
            phis.append(_phi_traced(xi, self.order))
            dphis.append(_dphi_traced(xi, self.order))
        w = jnp.stack(phis, axis=1)       # (N, order, 3)
        dw = jnp.stack(dphis, axis=1)

        offs = self.nlower + np.arange(order_n)
        gzi = (base[:, 2][:, None] + offs[None, :]) % nz
        gyi = (base[:, 1][:, None] + offs[None, :]) % ny
        gxi = (base[:, 0][:, None] + offs[None, :]) % nx
        wz = w[:, :, 2][:, :, None, None]
        wy = w[:, :, 1][:, None, :, None]
        wx = w[:, :, 0][:, None, None, :]
        wq = (q[:, None, None, None] * wz * wy * wx).reshape(-1)
        iz = jnp.broadcast_to(gzi[:, :, None, None],
                              (n, order_n, order_n, order_n)).reshape(-1)
        iy = jnp.broadcast_to(gyi[:, None, :, None],
                              (n, order_n, order_n, order_n)).reshape(-1)
        ix = jnp.broadcast_to(gxi[:, None, None, :],
                              (n, order_n, order_n, order_n)).reshape(-1)
        qgrid = jnp.zeros((nz, ny, nx), dt_).at[iz, iy, ix].add(wq)

        # level sweep: restrict down, direct-convolve each level (FFT),
        # prolongate back up
        cdtype = jnp.complex128 if dt_ == jnp.float64 else jnp.complex64
        qgrids = [qgrid]
        for lev in range(self.levels - 1):
            qgrids.append(self._restrict(qgrids[-1], lev))
        egrid = None
        for lev in range(self.levels - 1, -1, -1):
            e_lev = jnp.real(jnp.fft.ifftn(
                jnp.fft.fftn(qgrids[lev].astype(cdtype))
                * self.kernels[lev].astype(cdtype))).astype(dt_)
            if egrid is None:
                egrid = e_lev
            else:
                egrid = e_lev + self._prolong(egrid, lev)
        # field gather + force
        erow = egrid[(iz, iy, ix)].reshape(n, order_n, order_n, order_n)
        dwz = dw[:, :, 2][:, :, None, None]
        dwy = dw[:, :, 1][:, None, :, None]
        dwx = dw[:, :, 0][:, None, None, :]
        ekx = jnp.sum(erow * wz * wy * dwx, axis=(1, 2, 3)) * delinv[0]
        eky = jnp.sum(erow * wz * dwy * wx, axis=(1, 2, 3)) * delinv[1]
        ekz = jnp.sum(erow * dwz * wy * wx, axis=(1, 2, 3)) * delinv[2]
        qscale = self.qqrd2e
        f = qscale * q[:, None] * jnp.stack([ekx, eky, ekz], axis=1)

        ek = None
        virial = None
        if eflag or vflag:
            phi_i = jnp.sum(erow * wz * wy * wx, axis=(1, 2, 3))
            e_self = self.qsqsum * float(
                gamma_np(0.0, self.order)) / self.cutoff
            ek = 0.5 * qscale * (jnp.sum(q * phi_i) - e_self)
        if vflag:
            # MSM default: kspace_modify pressure/scalar yes (:560)
            virial = jnp.concatenate([jnp.full((3,), ek / 3.0, dt_),
                                      jnp.zeros((3,), dt_)])
        return f, ek, virial

    def _restrict(self, g, lev):
        """Separable odd-tap restriction (:2250): coarse = downsample of
        tap-convolved fine grid."""
        out = g
        for axis in range(3):
            acc = None
            for nu, wgt in zip(self.rp_offsets, self.rp_weights):
                t = jnp.roll(out, -nu, axis=axis) * wgt
                acc = t if acc is None else acc + t
            out = acc
        return out[::2, ::2, ::2]

    def _prolong(self, e_coarse, lev):
        """Transpose of restriction: zero-stuff then tap-convolve."""
        nzc, nyc, nxc = e_coarse.shape
        nx, ny, nz = self.ngrids[lev]
        up = jnp.zeros((nz, ny, nx), e_coarse.dtype)
        up = up.at[::2, ::2, ::2].set(e_coarse)
        out = up
        for axis in range(3):
            acc = None
            for nu, wgt in zip(self.rp_offsets, self.rp_weights):
                t = jnp.roll(out, nu, axis=axis) * wgt
                acc = t if acc is None else acc + t
            out = acc
        return out


def _phi_traced(xi, order):
    """compute_phi with jnp (same piecewise polynomials)."""
    a = jnp.abs(xi)
    x2 = a * a
    if order == 4:
        return jnp.where(
            a <= 1, (1.0 - a) * (1.0 + a - 1.5 * x2),
            jnp.where(a <= 2,
                      -0.5 * (a - 1.0) * (2.0 - a) * (2.0 - a), 0.0))
    if order == 6:
        return jnp.where(
            a <= 1, (1.0 - x2) * (2.0 - a)
            * (6.0 + 3.0 * a - 5.0 * x2) / 12.0,
            jnp.where(a <= 2, -(a - 1.0) * (2.0 - a) * (3.0 - a)
                      * (4.0 + 9.0 * a - 5.0 * x2) / 24.0,
                      jnp.where(a <= 3, (a - 1.0) * (a - 2.0) * (3.0 - a)
                                * (3.0 - a) * (4.0 - a) / 24.0, 0.0)))
    if order == 8:
        return jnp.where(
            a <= 1, (1.0 - x2) * (4.0 - x2) * (3.0 - a)
            * (12.0 + 4.0 * a - 7.0 * x2) / 144.0,
            jnp.where(a <= 2, -(x2 - 1.0) * (2.0 - a) * (3.0 - a)
                      * (4.0 - a) * (10.0 + 12.0 * a - 7.0 * x2) / 240.0,
                      jnp.where(a <= 3, (a - 1.0) * (a - 2.0) * (3.0 - a)
                                * (4.0 - a) * (5.0 - a)
                                * (6.0 + 20.0 * a - 7.0 * x2) / 720.0,
                                jnp.where(a <= 4, -(a - 1.0) * (a - 2.0)
                                          * (a - 3.0) * (4.0 - a)
                                          * (4.0 - a) * (5.0 - a)
                                          * (6.0 - a) / 720.0, 0.0))))
    # order 10
    return jnp.where(
        a <= 1, (1.0 - x2) * (4.0 - x2) * (9.0 - x2) * (4.0 - a)
        * (20.0 + 5.0 * a - 9.0 * x2) / 2880.0,
        jnp.where(
            a <= 2, -(x2 - 1.0) * (4.0 - x2) * (3.0 - a) * (4.0 - a)
            * (5.0 - a) * (6.0 + 5.0 * a - 3.0 * x2) / 1440.0,
            jnp.where(
                a <= 3, (x2 - 1.0) * (a - 2.0) * (3.0 - a) * (4.0 - a)
                * (5.0 - a) * (6.0 - a)
                * (14.0 + 25.0 * a - 9.0 * x2) / 10080.0,
                jnp.where(
                    a <= 4, -(a - 1.0) * (a - 2.0) * (a - 3.0)
                    * (4.0 - a) * (5.0 - a) * (6.0 - a) * (7.0 - a)
                    * (8.0 + 35.0 * a - 9.0 * x2) / 40320.0,
                    jnp.where(
                        a <= 5, (a - 1.0) * (a - 2.0) * (a - 3.0)
                        * (a - 4.0) * (5.0 - a) * (5.0 - a) * (6.0 - a)
                        * (7.0 - a) * (8.0 - a) / 40320.0, 0.0)))))


def _dphi_traced(xi, order):
    """d(phi)/dxi via jax.grad of the traced polynomial (exact, not a
    finite difference: grad of the piecewise jnp.where chain)."""
    g = jax.grad(lambda t: _phi_traced(t, order))
    for _ in range(xi.ndim):
        g = jax.vmap(g)
    return g(xi)


@register_pair("lj/cut/coul/msm")
class PairLJCutCoulMSM(PairLJCutCoulCut):
    """LJ + MSM short-range coulomb: the gamma() taper replaces erfc
    (src/KSPACE/pair_lj_cut_coul_msm.cpp:120-200)."""

    name = "lj/cut/coul/msm"
    msm_order = 10

    def _lj_fn(self, r2, it, jt):
        fpair, e, _, _ = PairLJCutCoulCut.pair_fn_ex(
            self, r2, it, jt, 1.0, 1.0, None, None)
        return fpair, e, None, None

    def _coul_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        z = jnp.zeros_like(r2)
        _, _, ec, fcoul = self.pair_fn_ex(r2, it, jt, z, w_coul, qi, qj)
        return z, z, ec, fcoul

    def compute(self, x, type_, box, idx, sbits, special_lj, special_coul,
                eflag: bool, vflag: bool, q=None, ext=None):
        """Scalar-pressure convention (compute :154-226): the coulomb
        forces are NOT fdotr-tallied — the pair virial is the LJ virial
        plus eng_coul/3 on each diagonal (the MSM analog of an isotropic
        coulomb pressure)."""
        from tpumd.ops.pairwise import pair_sums
        f1, evdwl, _, vir_lj = pair_sums(
            x, type_, box, idx, sbits, self._lj_fn, special_lj, None,
            eflag, vflag, q=None, ext=ext)
        need_e = bool(eflag) or bool(vflag)
        f2, _, ecoul, _ = pair_sums(
            x, type_, box, idx, sbits, None, special_lj, special_coul,
            need_e, False, q=q, pair_fn_ex=self._coul_fn_ex, ext=ext)
        f = f1 + f2
        vir = None
        if vflag:
            vir = vir_lj + jnp.concatenate(
                [jnp.full((3,), ecoul / 3.0, x.dtype),
                 jnp.zeros((3,), x.dtype)])
        return (f, evdwl if eflag else None,
                ecoul if eflag else None, vir)

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        dt_ = r2.dtype
        in_lj = r2 < self.coef(self.cutsq, it, jt, dt_)
        r2inv = 1.0 / r2
        r6inv = r2inv ** 3
        lj1 = self.coef(self.lj1, it, jt, dt_)
        lj2 = self.coef(self.lj2, it, jt, dt_)
        lj3 = self.coef(self.lj3, it, jt, dt_)
        lj4 = self.coef(self.lj4, it, jt, dt_)
        forcelj = r6inv * (lj1 * r6inv - lj2)
        fpair = jnp.where(in_lj, w_lj * forcelj * r2inv, 0.0)
        e = jnp.where(in_lj, w_lj * r6inv * (lj3 * r6inv - lj4), 0.0)
        in_c = r2 < self.cut_coulsq
        r = jnp.sqrt(r2)
        rho = r / np.sqrt(self.cut_coulsq)
        egamma = 1.0 - rho * gamma_jnp(rho, self.msm_order, dt_)
        fgamma = 1.0 + (r2 / self.cut_coulsq) \
            * dgamma_jnp(rho, self.msm_order)
        prefactor = self.units.qqr2e * qi * qj / r
        forcecoul = prefactor * fgamma - (1.0 - w_coul) * prefactor
        ec = jnp.where(in_c, prefactor * egamma
                       - (1.0 - w_coul) * prefactor, 0.0)
        fcoul = jnp.where(in_c, forcecoul * r2inv, 0.0)
        return fpair, e, ec, fcoul


@register_pair("lj/long/coul/long")
class PairLJLongCoulLong(PairLJCutCoulCut):
    """pair lj/long/coul/long flag_lj flag_coul cut_lj [cut_coul]
    (src/KSPACE/pair_lj_long_coul_long.cpp): Ewald-split coulomb AND
    (optionally) Ewald-split geometric dispersion — the real-space
    complement of ewald/disp.  Series (non-tabulated) branch."""

    name = "lj/long/coul/long"
    supports_image_ext = False
    g_ewald = 0.0
    g_ewald_6 = 0.0

    def settings(self, flag_lj, flag_coul, cut_lj, cut_coul=None):
        if str(flag_lj) != "long" or str(flag_coul) != "long":
            raise ValueError(
                "pair lj/long/coul/long: only 'long long' supported")
        super().settings(cut_lj, cut_coul)

    def derive(self):
        eps, sig = self.params
        self.lj1 = 48.0 * eps * sig ** 12
        self.lj2 = 24.0 * eps * sig ** 6
        self.lj3 = 4.0 * eps * sig ** 12
        self.lj4 = 4.0 * eps * sig ** 6
        self.cut_coulsq = self.cut_coul ** 2

    def pair_fn_ex(self, r2, it, jt, w_lj, w_coul, qi, qj):
        from tpumd.models.pair_charmm import A1, A2, A3, A4, A5, \
            EWALD_F, EWALD_P
        dt_ = r2.dtype
        r2inv = 1.0 / r2
        # coulomb: standard erfc split with the special-case subtraction
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
        fcoul = jnp.where(in_c, forcecoul * r2inv, 0.0)
        # dispersion: long-range split (compute :79-93 series branch):
        # repulsion stays real-space, -C/r^6 splits via g_ewald_6
        in_lj = r2 < self.coef(self.cutsq, it, jt, dt_)
        lj1 = self.coef(self.lj1, it, jt, dt_)
        lj2 = self.coef(self.lj2, it, jt, dt_)
        lj3 = self.coef(self.lj3, it, jt, dt_)
        lj4 = self.coef(self.lj4, it, jt, dt_)
        g2 = self.g_ewald_6 ** 2
        g6 = g2 ** 3
        g8 = g6 * g2
        rn = r2inv * r2inv * r2inv                 # r^-6
        x2e = g2 * r2
        a2 = 1.0 / x2e
        x2 = a2 * jnp.exp(-x2e) * lj4
        tspec = rn * (1.0 - w_lj)
        force_lj = w_lj * rn * rn * lj1 \
            - g8 * (((6.0 * a2 + 6.0) * a2 + 3.0) * a2 + 1.0) * x2 * r2 \
            + tspec * lj2
        e = w_lj * rn * rn * lj3 \
            - g6 * ((a2 + 1.0) * a2 + 0.5) * x2 + tspec * lj4
        fpair = jnp.where(in_lj, force_lj * r2inv, 0.0)
        e = jnp.where(in_lj, e, 0.0)
        return fpair, e, ec, fcoul
