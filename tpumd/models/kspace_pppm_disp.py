"""pppm/disp — PPPM for Coulomb AND geometric-mixing 1/r^6 dispersion.

Reimplements the reference's PPPMDisp (src/KSPACE/pppm_disp.cpp) on the
same TPU-native grid pipeline as ``kspace_pppm.PPPM``: scatter-add
B-spline assignment, ``jnp.fft.fftn`` Poisson solves, transpose gather.

Parameter model matched to the reference:
- Coulomb: qopt-based grid sizing (set_grid_global :2650, h *= 0.95
  loop over compute_qopt_ik :2959) + Newton g_ewald refinement
  (adjust_gewald :2818, f() :2844) and the alias-free Green's function
  of PPPMDisp::compute_gf (:3691) — note this differs from plain PPPM,
  which alias-sums compute_gf_ik.
- Dispersion (geometric mixing, function[1]): B_i = sqrt(|lj4_ii|)
  (init_coeffs :1409), csum/csumi/csumij moments (calc_csum :3351),
  bisection initial g_ewald_6 (set_init_g6 :3529), qopt_6 grid sizing
  (set_n_pppm_6 :3594, compute_qopt_6_ik :3139), Newton refinement
  (adjust_gewald_6 :3462), dispersion Green's function with the
  erfc-split kernel (compute_gf_6 :3891), vg_6 virial coefficients
  (setup :751-791), and the self/volume energy corrections
  (compute :1211-1232).

Arithmetic mixing (7 structure factors) and `mixflag none` are not
implemented — geometric covers the lj/long pair family shipped here.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import erfc as _erfc

from tpumd.models.kspace_pppm import (PPPM, MY_PIS, _factorable, _fft_safe,
                                       _rho_coeff)

SMALL = 0.00001
MY_PI = np.pi


class PPPMDisp(PPPM):
    style = "pppm/disp"

    def __init__(self, accuracy_relative: float, order: int = 5,
                 order_6: int = 5):
        super().__init__(accuracy_relative, order)
        self.order_6 = order_6
        self.g_ewald_6 = 1.0
        # kspace_modify knobs (parser-set)
        self.disp_auto = False
        self.mesh6_override = None
        self.gewald6_override = None

    # ------------------------------------------------------------- init
    def init(self, sim):
        pair = sim.pair
        if not hasattr(pair, "lj4") or "lj/long" not in getattr(
                pair, "name", ""):
            raise ValueError(
                "kspace pppm/disp requires an lj/long pair style")
        if (not self.mesh6_override and not self.gewald6_override
                and not self.disp_auto):
            raise ValueError(
                "PPPMDisp used but no parameters set: use "
                "kspace_modify disp/auto yes (pppm_disp.cpp:352-358)")
        self.cutoff_lj = float(getattr(pair, "cut_lj", None)
                               or pair.cut_global)

        # geometric-mixing B coefficients and the csum moments
        lj4 = np.asarray(pair.lj4, dtype=np.float64)
        nt = lj4.shape[0] - 1
        B = np.zeros(nt + 1)
        for i in range(1, nt + 1):
            B[i] = np.sqrt(abs(lj4[i, i]))
        typ = np.asarray(jax.device_get(sim.state.type))
        neach = np.bincount(np.clip(typ, 0, nt), minlength=nt + 1)
        neach[0] = 0
        self.Bq = np.where(typ > 0, B[np.clip(typ, 0, nt)], 0.0)
        self.cii = B * B
        self.csum = float(np.sum(neach * B * B))
        self.csumi = B * float(np.sum(neach * B))       # per-type
        self.csumij = float(np.sum(neach * B)) ** 2

        # coulomb part: base init but with the qopt grid model plugged
        # in via the overridden _set_grid_global/_df_kspace below
        super().init(sim)

        # dispersion part
        if self.gewald6_override:
            self.g_ewald_6 = float(self.gewald6_override)
        else:
            self._set_init_g6()
        if self.mesh6_override:
            n6 = list(self.mesh6_override)
            for d in range(3):
                if not _factorable(n6[d]):
                    raise ValueError("kspace_modify mesh/disp not factorable")
                n6[d] = _fft_safe(n6[d])
            self.n6 = n6
        else:
            self._set_n_pppm_6()
            for d in range(3):
                while not _factorable(self.n6[d]):
                    self.n6[d] += 1
                self.n6[d] = _fft_safe(self.n6[d])
        if not self.gewald6_override:
            self._adjust_gewald_6()
        self._setup_coeffs_6()
        pair.g_ewald_6 = self.g_ewald_6
        if self.dynamic_box:
            raise ValueError(
                "pppm/disp under a barostat: device-side dual-grid "
                "recompute not implemented")

    # --------------------------------------------- coulomb grid (qopt)
    def _compute_qopt_ik(self):
        """compute_qopt_ik (pppm_disp.cpp:2959) vectorized over the grid."""
        nx, ny, nz = self.nx, self.ny, self.nz
        return _qopt_generic(
            (nx, ny, nz), self.prd, self.order,
            sfac=lambda q: np.exp(-0.25 * (q / self.g_ewald) ** 2),
            kind="coul")

    def _df_kspace(self):
        xprd, yprd, zprd = self.prd
        qopt = self._compute_qopt_ik()
        return np.sqrt(qopt / self.natoms) * self.q2 / (xprd * yprd * zprd)

    def _set_grid_global(self, keep_gewald=False):
        # PPPMDisp::set_grid_global (:2650): same initial g estimate,
        # then the h *= 0.95 qopt loop regardless of ik/ad mode
        xprd, yprd, zprd = self.prd
        acc = self.accuracy
        if not keep_gewald:
            g = acc * np.sqrt(self.natoms * self.cutoff * xprd * yprd
                              * zprd) / (2.0 * self.q2)
            if g >= 1.0:
                raise ValueError(
                    "KSpace accuracy too large to estimate G vector")
            self.g_ewald = np.sqrt(-np.log(g)) / self.cutoff

        if getattr(self, "mesh_override", None):
            n = list(self.mesh_override)
            for d in range(3):
                if not _factorable(n[d]):
                    raise ValueError("kspace_modify mesh not factorable")
                n[d] = _fft_safe(n[d])
            self.nx, self.ny, self.nz = n
            self.h = [p / ni for p, ni in zip(self.prd, n)]
            return

        hh = 4.0 / self.g_ewald
        for _ in range(500):
            n = [max(int(p / hh), 2) for p in self.prd]
            self.nx, self.ny, self.nz = n
            self.h = [p / ni for p, ni in zip(self.prd, n)]
            if self._df_kspace() <= acc:
                break
            hh *= 0.95
        else:
            raise RuntimeError("Could not compute grid size")
        for d in range(3):
            while not _factorable(n[d]):
                n[d] += 1
            n[d] = _fft_safe(n[d])
        self.nx, self.ny, self.nz = n
        self.h = [p / ni for p, ni in zip(self.prd, n)]

    def _setup_coeffs(self):
        super()._setup_coeffs()
        # replace the alias-summed ik Green's fn with PPPMDisp::compute_gf
        # (:3691): G = 4 pi/k^2 * s * W^2 / denom, no alias images
        nx, ny, nz = self.nx, self.ny, self.nz
        xprd, yprd, zprd = self.prd
        g = self.g_ewald
        kx, ky, kz = self._kx, self._ky, self._kz
        unitk = 2.0 * np.pi / np.array([xprd, yprd, zprd])
        qx, qy, qz = unitk[0] * kx, unitk[1] * ky, unitk[2] * kz
        sqk = qx * qx + qy * qy + qz * qz
        s3 = np.exp(-0.25 * ((qx / g) ** 2 + (qy / g) ** 2
                             + (qz / g) ** 2))
        wxyz2 = self._wx[0] * self._wy[0] * self._wz[0]
        with np.errstate(divide="ignore", invalid="ignore"):
            self.greensfn = np.where(
                sqk != 0.0,
                (4.0 * np.pi / np.where(sqk == 0, 1.0, sqk))
                * s3 * wxyz2 / self._denom, 0.0)

    # ------------------------------------------- dispersion parameters
    def _lj_rspace_error(self):
        """lj_rspace_error (pppm_disp.cpp:3674)."""
        xprd, yprd, zprd = self.prd
        g6 = self.g_ewald_6
        rgs = (self.cutoff_lj * g6) ** 2
        rgs_inv = 1.0 / rgs
        return (self.csum
                / np.sqrt(self.natoms * xprd * yprd * zprd
                          * self.cutoff_lj)
                * np.sqrt(MY_PI) * g6 ** 5 * np.exp(-rgs)
                * (1 + rgs_inv * (3 + rgs_inv * (6 + rgs_inv * 6))))

    def _set_init_g6(self):
        """set_init_g6 (:3529): doubling/halving bracket + bisection on
        the real-space dispersion error."""
        acc = self.accuracy
        g_old = self.g_ewald_6 = 1.0 / self.cutoff_lj
        df = self._lj_rspace_error() - acc
        counter = 0
        if df > 0:
            while df > 0 and counter < 10000:
                counter += 1
                g_old = self.g_ewald_6
                self.g_ewald_6 *= 2
                df = self._lj_rspace_error() - acc
        if df < 0:
            while df < 0 and counter < 10000:
                counter += 1
                g_old = self.g_ewald_6
                self.g_ewald_6 *= 0.5
                df = self._lj_rspace_error() - acc
        if counter >= 9999:
            raise RuntimeError("Cannot compute initial g_ewald_disp")
        gmin, gmax = (min(self.g_ewald_6, g_old), max(self.g_ewald_6, g_old))
        self.g_ewald_6 = gmin + 0.5 * (gmax - gmin)
        counter = 0
        while gmax - gmin > SMALL and counter < 10000:
            counter += 1
            df = self._lj_rspace_error() - acc
            if df < 0:
                gmax = self.g_ewald_6
            else:
                gmin = self.g_ewald_6
            self.g_ewald_6 = gmin + 0.5 * (gmax - gmin)

    def _compute_qopt_6(self):
        g6 = self.g_ewald_6
        inv2ew = 1.0 / (2.0 * g6)
        return _qopt_generic(
            tuple(self.n6), self.prd, self.order_6,
            sfac=lambda q: np.exp(-(q * inv2ew) ** 2),
            kind="disp", g6=g6, inv2ew=inv2ew)

    def _df_kspace_6(self):
        xprd, yprd, zprd = self.prd
        qopt = self._compute_qopt_6()
        return (np.sqrt(qopt / self.natoms) * self.csum
                / (xprd * yprd * zprd))

    def _set_n_pppm_6(self):
        """set_n_pppm_6 (:3594): shrink uniform h until qopt_6 meets the
        (kspace) accuracy target."""
        hh = 4.0 / self.g_ewald_6
        for _ in range(500):
            self.n6 = [max(int(p / hh), 2) for p in self.prd]
            if self._df_kspace_6() <= self.accuracy:
                return
            hh *= 0.95
        raise RuntimeError("Could not compute grid size for Dispersion")

    def _adjust_gewald_6(self):
        """adjust_gewald_6 (:3462): Newton on f_6 = rspace - kspace err."""
        def f6():
            return self._lj_rspace_error() - self._df_kspace_6()

        for _ in range(10000):
            f1 = f6()
            h = 0.000001
            g0 = self.g_ewald_6
            self.g_ewald_6 = g0 + h
            f2 = f6()
            self.g_ewald_6 = g0
            self.g_ewald_6 -= f1 / ((f2 - f1) / h)
            if abs(f6()) < SMALL:
                return
        raise RuntimeError("Could not adjust g_ewald_6")

    def _setup_coeffs_6(self):
        order = self.order_6
        nx, ny, nz = self.n6
        xprd, yprd, zprd = self.prd
        g6 = self.g_ewald_6
        inv2ew = 1.0 / (2.0 * g6)
        rtpi = np.sqrt(MY_PI)

        # gf_b_6 (compute_gf_denom with order_6)
        gf_b = np.zeros(order)
        gf_b[0] = 1.0
        for m in range(1, order):
            for l in range(m, 0, -1):
                gf_b[l] = 4.0 * (gf_b[l] * (l - m) * (l - m - 0.5)
                                 - gf_b[l - 1] * (l - m - 1) * (l - m - 1))
            gf_b[0] = 4.0 * (gf_b[0] * (0 - m) * (0 - m - 0.5))
        ifact = 1
        for k in range(1, 2 * order):
            ifact *= k
        gf_b /= ifact

        def pers(n):
            k = np.arange(n)
            return k - n * (2 * k // n)

        kx = pers(nx)[None, None, :]
        ky = pers(ny)[None, :, None]
        kz = pers(nz)[:, None, None]
        unitk = 2.0 * np.pi / np.array([xprd, yprd, zprd])
        fkx, fky, fkz = unitk[0] * kx, unitk[1] * ky, unitk[2] * kz
        self.fk6 = (fkx, fky, fkz)
        sqk = fkx ** 2 + fky ** 2 + fkz ** 2

        def powsinxx(arg, n_):
            with np.errstate(divide="ignore", invalid="ignore"):
                s = np.where(arg == 0.0, 1.0,
                             np.sin(arg) / np.where(arg == 0, 1, arg))
            return s ** n_

        snx = np.sin(0.5 * unitk[0] * kx * xprd / nx) ** 2
        sny = np.sin(0.5 * unitk[1] * ky * yprd / ny) ** 2
        snz = np.sin(0.5 * unitk[2] * kz * zprd / nz) ** 2
        px = py = pz = 0.0
        for l in range(order - 1, -1, -1):
            px = gf_b[l] + px * snx
            py = gf_b[l] + py * sny
            pz = gf_b[l] + pz * snz
        denom = (px * py * pz) ** 2

        wx = powsinxx(0.5 * fkx * xprd / nx, order) ** 2
        wy = powsinxx(0.5 * fky * yprd / ny, order) ** 2
        wz = powsinxx(0.5 * fkz * zprd / nz, order) ** 2
        s3 = np.exp(-(fkx * inv2ew) ** 2) * np.exp(-(fky * inv2ew) ** 2) \
            * np.exp(-(fkz * inv2ew) ** 2)
        rtsqk = np.sqrt(sqk)
        term = ((1.0 - 2.0 * sqk * inv2ew * inv2ew) * s3
                + 2.0 * sqk * rtsqk * inv2ew ** 3 * rtpi
                * _erfc(rtsqk * inv2ew))
        numerator = -MY_PI * rtpi * g6 ** 3 / 3.0
        with np.errstate(divide="ignore", invalid="ignore"):
            self.greensfn_6 = np.where(
                sqk != 0.0, numerator * term * wx * wy * wz / denom, 0.0)

        # vg_6 (setup :751-791)
        b = 0.5 * rtsqk / g6
        bs = b * b
        with np.errstate(divide="ignore", invalid="ignore"):
            erft = 2.0 * bs * b * rtpi * _erfc(b)
            expt = np.exp(-bs)
            nom = erft - 2.0 * bs * expt
            den = nom + expt
            vterm = np.where(den == 0, 3.0 / np.where(sqk == 0, 1, sqk),
                             3.0 * nom / (np.where(sqk == 0, 1, sqk)
                                          * np.where(den == 0, 1, den)))
        z = sqk != 0.0
        self.vg_6 = np.stack([
            np.where(z, 1.0 + vterm * fkx * fkx, 0.0),
            np.where(z, 1.0 + vterm * fky * fky, 0.0),
            np.where(z, 1.0 + vterm * fkz * fkz, 0.0),
            np.where(z, vterm * fkx * fky, 0.0),
            np.where(z, vterm * fkx * fkz, 0.0),
            np.where(z, vterm * fky * fkz, 0.0),
        ])

        rho6, _ = _rho_coeff(order)
        self.rho_c6 = rho6
        self.nlower_6 = (1 - order) // 2
        self.shiftone_6 = 0.0 if order % 2 else 0.5

    # ----------------------------------------------------------- compute
    def compute(self, s, eflag: bool, vflag: bool):
        f, elong, virial = super().compute(s, eflag, vflag)
        f6, e6, v6 = self._compute_disp(s, eflag, vflag)
        f = f + f6
        if eflag:
            elong = elong + e6
        if vflag:
            virial = virial + v6
        return f, elong, virial

    def _compute_disp(self, s, eflag: bool, vflag: bool):
        dt_ = s.x.dtype
        nx, ny, nz = self.n6
        order = self.order_6
        lo = s.box.lo
        ell = s.box.lengths
        volume = ell[0] * ell[1] * ell[2]
        delinv = jnp.array([nx, ny, nz], dtype=dt_) / ell
        Bq = jnp.asarray(self.Bq, dt_)

        gx = (s.x - lo) * delinv
        shift = 0.5 if order % 2 else 0.0
        base = jnp.floor(gx + shift).astype(jnp.int32)
        dxyz = base.astype(dt_) + self.shiftone_6 - gx

        rho_c = jnp.asarray(self.rho_c6, dt_)
        pts = []
        for pt in range(order):
            acc = jnp.zeros_like(dxyz)
            for l in range(order - 1, -1, -1):
                acc = rho_c[l, pt] + acc * dxyz
            pts.append(acc)
        w = jnp.stack(pts, axis=1)                      # (N, order, 3)

        offs = self.nlower_6 + np.arange(order)
        n = Bq.shape[0]
        gz = (base[:, 2][:, None] + offs[None, :]) % nz
        gy = (base[:, 1][:, None] + offs[None, :]) % ny
        gx_ = (base[:, 0][:, None] + offs[None, :]) % nx
        wz = w[:, :, 2][:, :, None, None]
        wy = w[:, :, 1][:, None, :, None]
        wx = w[:, :, 0][:, None, None, :]
        wq = (Bq[:, None, None, None] * wz * wy * wx).reshape(-1)
        iz = jnp.broadcast_to(
            gz[:, :, None, None], (n, order, order, order)).reshape(-1)
        iy = jnp.broadcast_to(
            gy[:, None, :, None], (n, order, order, order)).reshape(-1)
        ix = jnp.broadcast_to(
            gx_[:, None, None, :], (n, order, order, order)).reshape(-1)
        grid = jnp.zeros((nz, ny, nx), dt_).at[iz, iy, ix].add(wq)

        rho_k = jnp.fft.fftn(grid.astype(
            jnp.complex128 if dt_ == jnp.float64 else jnp.complex64))
        greens = jnp.asarray(self.greensfn_6, dt_)
        fkx = jnp.asarray(self.fk6[0], dt_)
        fky = jnp.asarray(self.fk6[1], dt_)
        fkz = jnp.asarray(self.fk6[2], dt_)
        phi_k = rho_k * greens
        imag = jnp.asarray(1j, phi_k.dtype)
        ex = jnp.fft.ifftn(-imag * fkx * phi_k).real
        ey = jnp.fft.ifftn(-imag * fky * phi_k).real
        ez = jnp.fft.ifftn(-imag * fkz * phi_k).real

        efield = jnp.stack([ex, ey, ez], axis=-1)
        evals = efield[iz, iy, ix].reshape(n, order, order, order, 3)
        w3 = (wz * wy * wx).reshape(n, order, order, order)
        delvol = (ell[0] / nx) * (ell[1] / ny) * (ell[2] / nz)
        pref = Bq * (1.0 / delvol)
        f = jnp.stack(
            [jnp.sum(evals[..., c] * w3, axis=(1, 2, 3)) for c in range(3)],
            axis=1) * pref[:, None]

        elong = None
        virial = None
        if eflag or vflag:
            rk2 = jnp.abs(rho_k) ** 2
            g6 = self.g_ewald_6
            a_corr = MY_PI * MY_PIS / (6.0 * volume) * g6 ** 3 * self.csumij
            if eflag:
                e = 0.5 * jnp.sum(greens * rk2) / volume
                elong = e - a_corr + g6 ** 6 * self.csum / 12.0
            if vflag:
                vg = jnp.asarray(self.vg_6, dt_)
                virial = 0.5 * jnp.stack(
                    [jnp.sum(vg[i] * greens * rk2) for i in range(6)]
                ) / volume
                virial = virial - a_corr * jnp.asarray(
                    [1.0, 1.0, 1.0, 0.0, 0.0, 0.0], dt_)
        return f, elong, virial


def _qopt_generic(nxyz, prd, order, sfac, kind, g6=None, inv2ew=None):
    """Shared 5^3-alias qopt sweep: compute_qopt_ik (pppm_disp.cpp:2959)
    and compute_qopt_6_ik (:3139), vectorized over the whole grid."""
    nx, ny, nz = nxyz
    xprd, yprd, zprd = prd

    def pers(n):
        k = np.arange(n)
        return k - n * (2 * k // n)

    kper = pers(nx)[None, None, :]
    lper = pers(ny)[None, :, None]
    mper = pers(nz)[:, None, None]
    unitk = 2 * np.pi / np.array([xprd, yprd, zprd])
    sqk = ((unitk[0] * kper) ** 2 + (unitk[1] * lper) ** 2
           + (unitk[2] * mper) ** 2)

    def powsinxx(arg, n_):
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.where(arg == 0.0, 1.0,
                         np.sin(arg) / np.where(arg == 0, 1, arg))
        return s ** n_

    rtpi = np.sqrt(MY_PI)
    sum1 = np.zeros((nz, ny, nx))
    sum2 = np.zeros((nz, ny, nx))
    sum3 = np.zeros((nz, ny, nx))
    four_pi = 4.0 * MY_PI
    for ox in range(-2, 3):
        qx = unitk[0] * (kper + nx * ox)
        sx = sfac(qx)
        wx = powsinxx(0.5 * qx * xprd / nx, order)
        for oy in range(-2, 3):
            qy = unitk[1] * (lper + ny * oy)
            sy = sfac(qy)
            wy = powsinxx(0.5 * qy * yprd / ny, order)
            for oz in range(-2, 3):
                qz = unitk[2] * (mper + nz * oz)
                sz = sfac(qz)
                wz = powsinxx(0.5 * qz * zprd / nz, order)
                dot1 = (unitk[0] * kper * qx + unitk[1] * lper * qy
                        + unitk[2] * mper * qz)
                dot2 = qx * qx + qy * qy + qz * qz
                u2 = (wx * wy * wz) ** 2
                s3 = sx * sy * sz
                with np.errstate(divide="ignore", invalid="ignore"):
                    if kind == "coul":
                        safe = np.where(dot2 == 0, 1.0, dot2)
                        sum1 += np.where(dot2 > 0,
                                         s3 * s3 / safe * four_pi
                                         * four_pi, 0.0)
                        sum2 += np.where(dot2 > 0,
                                         u2 * s3 * four_pi / safe
                                         * dot1, 0.0)
                    else:
                        rtdot2 = np.sqrt(dot2)
                        term = ((1 - 2 * dot2 * inv2ew * inv2ew) * s3
                                + 2 * dot2 * rtdot2 * inv2ew ** 3
                                * rtpi * _erfc(rtdot2 * inv2ew))
                        term = term * g6 ** 3
                        sum1 += term * term * MY_PI ** 3 / 9.0 * dot2
                        sum2 += -u2 * term * MY_PI * rtpi / 3.0 * dot1
                sum3 += u2
    nonzero = sqk != 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        qopt = np.where(nonzero,
                        sum1 - sum2 * sum2
                        / np.where(nonzero, sum3 * sum3 * sqk, 1.0), 0.0)
    return float(qopt.sum())
