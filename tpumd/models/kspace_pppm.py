"""PPPM long-range Coulomb solver (particle-particle particle-mesh).

Reimplements the reference's PPPM (src/KSPACE/pppm.cpp) with the same
parameter model — g_ewald estimation + Newton refinement
(set_grid_global:980, adjust_gewald), per-dimension ik error
(estimate_ik_error with the acons table), factorable FFT mesh sizes,
order-p B-spline charge assignment (compute_rho_coeff/compute_rho1d), the
ik-differentiated Poisson solve with the hockney-eastwood Green's function
(compute_gf_ik, gf_denom), and the self/neutralization energy
corrections — so mesh sizes and energies match the reference.

TPU redesign: the distributed brick->pencil remaps and FFTW calls
(brick2fft, remap.cpp, fft3d.cpp) collapse into ``jnp.fft.fftn`` on a
device-resident grid — under a sharded mesh XLA decomposes the FFT and
inserts the all-to-alls over ICI.  Charge spreading is a scatter-add of
the (N, order^3) stencil; field gather is its transpose.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

MY_PIS = 1.77245385090551602729  # sqrt(pi)


def _dot(a, b):
    """Full-f32 matmul: TPU's default matmul precision is bfloat16
    passes, which costs ~1e-3 relative on the assignment/interpolation
    contractions — far above the 1e-4 step-0 energy gate."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
EPS_HOC = 1.0e-7

_ACONS = np.zeros((8, 7))
_ACONS[1][0] = 2.0 / 3.0
_ACONS[2][:2] = [1.0 / 50.0, 5.0 / 294.0]
_ACONS[3][:3] = [1.0 / 588.0, 7.0 / 1440.0, 21.0 / 3872.0]
_ACONS[4][:4] = [1.0 / 4320.0, 3.0 / 1936.0, 7601.0 / 2271360.0,
                 143.0 / 28800.0]
_ACONS[5][:5] = [1.0 / 23232.0, 7601.0 / 13628160.0, 143.0 / 69120.0,
                 517231.0 / 106536960.0, 106640677.0 / 11737571328.0]
_ACONS[6][:6] = [691.0 / 68140800.0, 13.0 / 57600.0, 47021.0 / 35512320.0,
                 9694607.0 / 2095994880.0, 733191589.0 / 59609088000.0,
                 326190917.0 / 11700633600.0]
_ACONS[7][:7] = [1.0 / 345600.0, 3617.0 / 35512320.0, 745739.0 / 838397952.0,
                 56399353.0 / 12773376000.0, 25091609.0 / 1560084480.0,
                 1755948832039.0 / 36229939200000.0,
                 4887769399.0 / 37838389248.0]


def _factorable(n: int) -> bool:
    for f in (2, 3, 5):
        while n % f == 0:
            n //= f
    return n == 1


def _fft_safe(n: int) -> int:
    """FFT-safe grid dim for the active backend.

    The reference accepts any 2/3/5-factorable mesh (src/KSPACE/pppm.cpp
    factorable()), and so does XLA:CPU.  The TPU FFT, however,
    mis-evaluates odd-radix sizes: 27^3 grids produce NaN field values
    and 27x27x54 faults the TPU worker outright (observed on v5e).  On
    TPU we therefore snap every grid dim UP to the next power of two —
    a finer mesh only increases kspace accuracy, and pow2 FFTs are the
    fast path on the hardware anyway."""
    import jax as _jax
    if _jax.default_backend() == "cpu":
        return n
    p = 1
    while p < n:
        p *= 2
    return p


def _rho_coeff(order: int):
    """compute_rho_coeff (src/KSPACE/pppm.cpp): returns (rho (order, order),
    drho (order, order)) coefficient tables indexed [l][kidx]."""
    a = np.zeros((order, 2 * order + 1))  # a[l][k+order]

    def A(l, k):
        return a[l][k + order]

    a[0][0 + order] = 1.0
    for j in range(1, order):
        for k in range(-j, j + 1, 2):
            s = 0.0
            for l in range(j):
                a[l + 1][k + order] = (A(l, k + 1) - A(l, k - 1)) / (l + 1)
                s += (0.5 ** (l + 1)) * (A(l, k - 1)
                                         + ((-1.0) ** l) * A(l, k + 1)) / (l + 1)
            a[0][k + order] = s

    rho = np.zeros((order, order))
    drho = np.zeros((order, order))
    m = 0
    for k in range(-(order - 1), order, 2):
        for l in range(order):
            rho[l][m] = A(l, k)
        for l in range(1, order):
            drho[l - 1][m] = l * A(l, k)
        m += 1
    return rho, drho


# gf_b2[order][l]: rational coefficients of the staggered-grid Green's
# function denominator polynomial (src/KSPACE/pppm_stagger.cpp:59-87);
# gf_denom2(c) = (sum_l b2[l] * c^(2l+1))^2 per dimension.
_GF_B2 = {
    1: [1.0],
    2: [5.0 / 6.0, 1.0 / 6.0],
    3: [61.0 / 120.0, 29.0 / 60.0, 1.0 / 120.0],
    4: [277.0 / 1008.0, 1037.0 / 1680.0, 181.0 / 1680.0, 1.0 / 5040.0],
    5: [50521.0 / 362880.0, 7367.0 / 12960.0, 16861.0 / 60480.0,
        1229.0 / 90720.0, 1.0 / 362880.0],
    6: [540553.0 / 7983360.0, 17460701.0 / 39916800.0,
        8444893.0 / 19958400.0, 1409633.0 / 19958400.0,
        44281.0 / 39916800.0, 1.0 / 39916800.0],
    7: [199360981.0 / 6227020800.0, 103867703.0 / 345945600.0,
        66714163.0 / 138378240.0, 54085121.0 / 311351040.0,
        1640063.0 / 138378240.0, 671.0 / 10483200.0, 1.0 / 6227020800.0],
}


def _compute_gf_b(order):
    """gf_b denominator coefficients (PPPM::compute_gf_denom,
    src/KSPACE/pppm.cpp)."""
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
    return gf_b / ifact


class PPPM:
    style = "pppm"
    mode = "ik"   # differentiation: "ik" (3 inverse FFTs) or "ad"
    stagger_flag = False  # pppm/stagger: 2 interlaced assignment passes

    def __init__(self, accuracy_relative: float, order: int = 5):
        self.accuracy_relative = float(accuracy_relative)
        self.order = order
        self.g_ewald = 0.0
        self.energy_corr = 0.0
        # recompute box-dependent coefficients (Green's fn, fk, vg) from
        # the carried box inside the compiled step — the analog of the
        # reference's kspace->setup() call on every NPT box remap
        # (src/fix_nh.cpp:877, src/KSPACE/pppm.cpp setup()).  Enabled at
        # init when a barostat is present.
        self.dynamic_box = False

    # ---------------------------------------------------------------- init
    def init(self, sim):
        u = sim.units
        self.units = u
        self.qqrd2e = u.qqr2e
        q = np.asarray(jax.device_get(sim.state.q), dtype=np.float64)
        self.qsum = float(q.sum())
        self.qsqsum = float((q * q).sum())
        self.q2 = self.qsqsum * self.qqrd2e
        self.natoms = sim.natoms
        # two_charge_force (src/kspace.cpp:167)
        two_charge_force = u.qqr2e
        self.accuracy = self.accuracy_relative * two_charge_force

        self.cutoff = sim.pair.cut_coul  # real-space coulomb cutoff
        lo = np.asarray(jax.device_get(sim.state.box.lo), dtype=np.float64)
        hi = np.asarray(jax.device_get(sim.state.box.hi), dtype=np.float64)
        self.prd = hi - lo
        if getattr(self, "gewald_override", None):
            # kspace_modify gewald (KSpace::modify_params gewaldflag)
            self.g_ewald = float(self.gewald_override)
            self._set_grid_global(keep_gewald=True)
        else:
            self._set_grid_global()
            self._adjust_gewald()
        self._setup_coeffs()
        sim.pair.g_ewald = self.g_ewald
        self.dynamic_box = any(getattr(fx, "pstat", False)
                               for fx in sim.fixes)
        if self.dynamic_box and self.mode == "ad":
            raise ValueError(
                "pppm/ad under a barostat: device-side gf_ad recompute "
                "not implemented; use kspace_style pppm (ik)")

    def _estimate_ik_error(self, h, prd):
        acons = _ACONS[self.order]
        hg = h * self.g_ewald
        ssum = sum(acons[m] * hg ** (2 * m) for m in range(self.order))
        return (self.q2 * hg ** self.order
                * np.sqrt(self.g_ewald * prd * np.sqrt(2 * np.pi)
                          * ssum / self.natoms) / (prd * prd))

    def _compute_qopt(self):
        """compute_qopt (src/KSPACE/pppm.cpp) — the ad-mode kspace error
        functional, vectorized over the whole FFT grid."""
        nx, ny, nz = self.nx, self.ny, self.nz
        xprd, yprd, zprd = self.prd
        g = self.g_ewald
        order2 = 2 * self.order

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

        sum1 = np.zeros((nz, ny, nx))
        sum2 = np.zeros((nz, ny, nx))
        sum3 = np.zeros((nz, ny, nx))
        sum4 = np.zeros((nz, ny, nx))
        four_pi = 4.0 * np.pi
        for ox in range(-2, 3):
            qx = unitk[0] * (kper + nx * ox)
            sx = np.exp(-0.25 * (qx / g) ** 2)
            wx = powsinxx(0.5 * qx * xprd / nx, order2)
            qx2 = qx * qx
            for oy in range(-2, 3):
                qy = unitk[1] * (lper + ny * oy)
                sy = np.exp(-0.25 * (qy / g) ** 2)
                wy = powsinxx(0.5 * qy * yprd / ny, order2)
                qy2 = qy * qy
                for oz in range(-2, 3):
                    qz = unitk[2] * (mper + nz * oz)
                    sz = np.exp(-0.25 * (qz / g) ** 2)
                    wz = powsinxx(0.5 * qz * zprd / nz, order2)
                    qz2 = qz * qz
                    dot2 = qx2 + qy2 + qz2
                    u1 = sx * sy * sz
                    u2 = wx * wy * wz
                    with np.errstate(divide="ignore", invalid="ignore"):
                        t1 = np.where(dot2 > 0, u1 * u1
                                      / np.where(dot2 == 0, 1, dot2)
                                      * four_pi * four_pi, 0.0)
                    sum1 += t1
                    sum2 += u1 * u2 * four_pi
                    sum3 += u2
                    sum4 += dot2 * u2
        nonzero = sqk != 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            qopt = np.where(nonzero,
                            sum1 - sum2 * sum2
                            / np.where(nonzero, sum3 * sum4, 1.0), 0.0)
        return float(qopt.sum())

    def _compute_qopt_stagger(self):
        """PPPMStagger::compute_qopt (src/KSPACE/pppm_stagger.cpp:
        273-372): the staggered-mesh error functional with the averaged
        gf_denom/gf_denom2 denominator, vectorized over the grid."""
        nx, ny, nz = self.nx, self.ny, self.nz
        xprd, yprd, zprd = self.prd
        g = self.g_ewald
        order = self.order
        order2 = 2 * order

        def pers(n):
            k = np.arange(n)
            return k - n * (2 * k // n)

        kper = pers(nx)[None, None, :]
        lper = pers(ny)[None, :, None]
        mper = pers(nz)[:, None, None]
        unitk = 2 * np.pi / np.array([xprd, yprd, zprd])
        fkx, fky, fkz = unitk[0] * kper, unitk[1] * lper, unitk[2] * mper
        sqk = fkx**2 + fky**2 + fkz**2

        def powsinxx(arg, n_):
            with np.errstate(divide="ignore", invalid="ignore"):
                s = np.where(arg == 0.0, 1.0,
                             np.sin(arg) / np.where(arg == 0, 1, arg))
            return s ** n_

        gf_b = _compute_gf_b(order)
        snx = np.sin(0.5 * unitk[0] * kper * xprd / nx) ** 2
        sny = np.sin(0.5 * unitk[1] * lper * yprd / ny) ** 2
        snz = np.sin(0.5 * unitk[2] * mper * zprd / nz) ** 2
        px = py = pz = 0.0
        for l in range(order - 1, -1, -1):
            px = gf_b[l] + px * snx
            py = gf_b[l] + py * sny
            pz = gf_b[l] + pz * snz
        denom1 = (px * py * pz) ** 2

        b2 = _GF_B2[order]
        cnx = np.cos(0.5 * unitk[0] * kper * xprd / nx)
        cny = np.cos(0.5 * unitk[1] * lper * yprd / ny)
        cnz = np.cos(0.5 * unitk[2] * mper * zprd / nz)
        qx_ = qy_ = qz_ = 0.0
        xl, yl, zl = cnx, cny, cnz
        for l in range(order):
            qx_ = qx_ + b2[l] * xl
            qy_ = qy_ + b2[l] * yl
            qz_ = qz_ + b2[l] * zl
            xl = xl * cnx * cnx
            yl = yl * cny * cny
            zl = zl * cnz * cnz
        denom2 = (qx_ * qy_ * qz_) ** 2
        denom = 0.5 * (denom1 + denom2)

        nonzero = sqk != 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            numerator = np.where(nonzero, 4.0 * np.pi
                                 / np.where(nonzero, sqk, 1.0), 0.0)
        sum1 = np.zeros((nz, ny, nx))
        sum2 = np.zeros((nz, ny, nx))
        four_pi = 4.0 * np.pi
        for ox in range(-2, 3):
            qx = unitk[0] * (kper + nx * ox)
            sx = np.exp(-0.25 * (qx / g) ** 2)
            wx = powsinxx(0.5 * qx * xprd / nx, order2)
            for oy in range(-2, 3):
                qy = unitk[1] * (lper + ny * oy)
                sy = np.exp(-0.25 * (qy / g) ** 2)
                wy = powsinxx(0.5 * qy * yprd / ny, order2)
                for oz in range(-2, 3):
                    qz = unitk[2] * (mper + nz * oz)
                    sz = np.exp(-0.25 * (qz / g) ** 2)
                    wz = powsinxx(0.5 * qz * zprd / nz, order2)
                    dot1 = fkx * qx + fky * qy + fkz * qz
                    dot2 = qx * qx + qy * qy + qz * qz
                    u1 = sx * sy * sz
                    u2 = wx * wy * wz
                    u3 = numerator * u1 * u2 * dot1
                    with np.errstate(divide="ignore",
                                     invalid="ignore"):
                        safe = np.where(dot2 == 0, 1.0, dot2)
                        sum1 += np.where(dot2 > 0,
                                         u1 * u1 * four_pi * four_pi
                                         / safe, 0.0)
                        sum2 += np.where(dot2 > 0, u3 * u3 / safe, 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            qopt = np.where(nonzero,
                            sum1 - sum2 / np.where(nonzero, denom, 1.0),
                            0.0)
        return float(qopt.sum())

    def _df_kspace(self):
        if self.stagger_flag:
            # stagger uses the qopt functional for both grid selection
            # and the final error estimate (pppm.cpp:1015,1150 gate on
            # differentiation_flag == 1 || stagger_flag)
            xprd, yprd, zprd = self.prd
            qopt = self._compute_qopt_stagger()
            return (np.sqrt(qopt / self.natoms) * self.q2
                    / (xprd * yprd * zprd))
        if self.mode == "ad":
            xprd, yprd, zprd = self.prd
            qopt = self._compute_qopt()
            return (np.sqrt(qopt / self.natoms) * self.q2
                    / (xprd * yprd * zprd))
        lprx = self._estimate_ik_error(self.h[0], self.prd[0])
        lpry = self._estimate_ik_error(self.h[1], self.prd[1])
        lprz = self._estimate_ik_error(self.h[2], self.prd[2])
        return np.sqrt(lprx**2 + lpry**2 + lprz**2) / np.sqrt(3.0)

    def _set_grid_global(self, keep_gewald=False):
        xprd, yprd, zprd = self.prd
        acc = self.accuracy
        if not keep_gewald:
            g = acc * np.sqrt(self.natoms * self.cutoff * xprd * yprd
                              * zprd) / (2.0 * self.q2)
            if g >= 1.0:
                g = (1.35 - 0.15 * np.log(acc)) / self.cutoff
            else:
                g = np.sqrt(-np.log(g)) / self.cutoff
            self.g_ewald = g
        g = self.g_ewald

        if getattr(self, "mesh_override", None):
            # kspace_modify mesh (gridflag)
            n = list(self.mesh_override)
            for d in range(3):
                if not _factorable(n[d]):
                    raise ValueError("kspace_modify mesh not factorable")
                n[d] = _fft_safe(n[d])
            self.nx, self.ny, self.nz = n
            self.h = [p / ni for p, ni in zip(self.prd, n)]
            return

        n = [0, 0, 0]
        if self.mode == "ad" or self.stagger_flag:
            # set_grid_global qopt branch (pppm.cpp:1015-1044, taken for
            # ad AND stagger): shrink a uniform h until the qopt error
            # meets the target
            hh = 4.0 / g
            for _ in range(500):
                n = [max(int(p / hh), 2) for p in self.prd]
                self.nx, self.ny, self.nz = n
                self.h = [p / ni for p, ni in zip(self.prd, n)]
                if self._df_kspace() <= acc:
                    break
                hh *= 0.95
            else:
                raise RuntimeError("Could not compute grid size")
            h = list(self.h)
        else:
            h = [1.0 / g] * 3
            for d, prd in enumerate(self.prd):
                n[d] = int(prd / h[d]) + 1
                h[d] = prd / n[d]
                err = self._estimate_ik_error(h[d], prd)
                while err > acc:
                    err = self._estimate_ik_error(h[d], prd)
                    n[d] += 1
                    h[d] = prd / n[d]
        for d in range(3):
            while not _factorable(n[d]):
                n[d] += 1
            n[d] = _fft_safe(n[d])
            h[d] = self.prd[d] / n[d]
        self.nx, self.ny, self.nz = n
        self.h = h

    def _newton_f(self):
        df_r = (2.0 * self.q2
                * np.exp(-self.g_ewald**2 * self.cutoff**2)
                / np.sqrt(self.natoms * self.cutoff
                          * self.prd[0] * self.prd[1] * self.prd[2]))
        return df_r - self._df_kspace()

    def _adjust_gewald(self):
        # literal replication of PPPM::adjust_gewald/derivf: absolute
        # forward-difference h and the same stopping tolerance, so g_ewald
        # matches the reference bit-for-bit
        for _ in range(10000):
            f = self._newton_f()
            h = 0.000001
            g0 = self.g_ewald
            self.g_ewald = g0 + h
            f2 = self._newton_f()
            self.g_ewald = g0
            deriv = (f2 - f) / h
            self.g_ewald -= f / deriv
            if abs(self._newton_f()) < 0.00001:
                return
        raise RuntimeError("Could not compute g_ewald")

    def _setup_coeffs(self):
        order = self.order
        nx, ny, nz = self.nx, self.ny, self.nz
        xprd, yprd, zprd = self.prd

        gf_b = _compute_gf_b(order)
        self.gf_b = gf_b

        # wavevectors with aliasing wrap (kper)
        def pers(n):
            k = np.arange(n)
            return k - n * (2 * k // n)

        kx = pers(nx)[None, None, :]
        ky = pers(ny)[None, :, None]
        kz = pers(nz)[:, None, :][:, :, None] if False else pers(nz)[:, None, None]
        unitkx = 2 * np.pi / xprd
        unitky = 2 * np.pi / yprd
        unitkz = 2 * np.pi / zprd
        fkx = unitkx * kx
        fky = unitky * ky
        fkz = unitkz * kz
        self.fkx, self.fky, self.fkz = fkx, fky, fkz

        # Green's function (compute_gf_ik), grid ordered [z][y][x]
        def powsinxx(arg, n):
            with np.errstate(divide="ignore", invalid="ignore"):
                s = np.where(arg == 0.0, 1.0, np.sin(arg) / np.where(arg == 0, 1, arg))
            return s ** n

        def gf_denom(sx, sy, sz):
            px = py = pz = 0.0
            for l in range(order - 1, -1, -1):
                px = gf_b[l] + px * sx
                py = gf_b[l] + py * sy
                pz = gf_b[l] + pz * sz
            s = px * py * pz
            return s * s

        nbx = int((self.g_ewald * xprd / (np.pi * nx))
                  * (-np.log(EPS_HOC)) ** 0.25)
        nby = int((self.g_ewald * yprd / (np.pi * ny))
                  * (-np.log(EPS_HOC)) ** 0.25)
        nbz = int((self.g_ewald * zprd / (np.pi * nz))
                  * (-np.log(EPS_HOC)) ** 0.25)
        snx = np.sin(0.5 * unitkx * kx * xprd / nx) ** 2
        sny = np.sin(0.5 * unitky * ky * yprd / ny) ** 2
        snz = np.sin(0.5 * unitkz * kz * zprd / nz) ** 2
        sqk = fkx**2 + fky**2 + fkz**2  # (nz, ny, nx)

        denom = gf_denom(snx, sny, snz)
        if self.stagger_flag:
            # staggered denominator: average the standard gf_denom with
            # gf_denom2 built from cos(k h/2) odd powers
            # (src/KSPACE/pppm_stagger.cpp:488-575 compute_gf_ik)
            b2 = _GF_B2[order]

            def gf_denom2(cx, cy, cz):
                px = py = pz = 0.0
                xl, yl, zl = cx, cy, cz
                for l in range(order):
                    px = px + b2[l] * xl
                    py = py + b2[l] * yl
                    pz = pz + b2[l] * zl
                    xl = xl * cx * cx
                    yl = yl * cy * cy
                    zl = zl * cz * cz
                s = px * py * pz
                return s * s

            cnx = np.cos(0.5 * unitkx * kx * xprd / nx)
            cny = np.cos(0.5 * unitky * ky * yprd / ny)
            cnz = np.cos(0.5 * unitkz * kz * zprd / nz)
            denom = 0.5 * (denom + gf_denom2(cnx, cny, cnz))
        sum1 = np.zeros((nz, ny, nx))
        two_ord = 2 * order
        for ox in range(-nbx, nbx + 1):
            qx = unitkx * (kx + nx * ox)
            sx = np.exp(-0.25 * (qx / self.g_ewald) ** 2)
            wx = powsinxx(0.5 * qx * xprd / nx, two_ord)
            for oy in range(-nby, nby + 1):
                qy = unitky * (ky + ny * oy)
                sy = np.exp(-0.25 * (qy / self.g_ewald) ** 2)
                wy = powsinxx(0.5 * qy * yprd / ny, two_ord)
                for oz in range(-nbz, nbz + 1):
                    qz = unitkz * (kz + nz * oz)
                    sz = np.exp(-0.25 * (qz / self.g_ewald) ** 2)
                    wz = powsinxx(0.5 * qz * zprd / nz, two_ord)
                    dot1 = fkx * qx + fky * qy + fkz * qz
                    dot2 = qx * qx + qy * qy + qz * qz
                    with np.errstate(divide="ignore", invalid="ignore"):
                        term = np.where(dot2 > 0, dot1 / np.where(dot2 == 0, 1, dot2), 0.0)
                    sum1 += term * sx * sy * sz * wx * wy * wz
        with np.errstate(divide="ignore", invalid="ignore"):
            greens = np.where(sqk != 0.0,
                              (4 * np.pi / np.where(sqk == 0, 1, sqk))
                              * sum1 / denom, 0.0)
        self.greensfn = greens

        # virial coefficients vg (pppm.cpp:452-465)
        with np.errstate(divide="ignore", invalid="ignore"):
            vterm = np.where(sqk != 0,
                             -2.0 * (1.0 / np.where(sqk == 0, 1, sqk)
                                     + 0.25 / (self.g_ewald**2)), 0.0)
        self.vg = np.stack([
            np.where(sqk != 0, 1.0 + vterm * fkx * fkx, 0.0),
            np.where(sqk != 0, 1.0 + vterm * fky * fky, 0.0),
            np.where(sqk != 0, 1.0 + vterm * fkz * fkz, 0.0),
            np.where(sqk != 0, vterm * fkx * fky, 0.0),
            np.where(sqk != 0, vterm * fkx * fkz, 0.0),
            np.where(sqk != 0, vterm * fky * fkz, 0.0),
        ])

        rho, drho = _rho_coeff(order)
        self.rho_c = rho        # (order coeffs, order points)
        self.drho_c = drho
        self.nlower = (1 - order) // 2
        self.shiftone = 0.0 if order % 2 else 0.5

        # box-INdependent pieces for the device-side recompute under NPT:
        # alias-window weights w(o) = powsinxx(pi*(k + n*o)/n, 2*order) and
        # the integer wavevectors only involve k/n ratios
        self._kx, self._ky, self._kz = kx, ky, kz
        self._denom = denom
        self._nb = (nbx, nby, nbz)
        self._wx = {ox: powsinxx(np.pi * (kx + nx * ox) / nx, two_ord)
                    for ox in range(-nbx, nbx + 1)}
        self._wy = {oy: powsinxx(np.pi * (ky + ny * oy) / ny, two_ord)
                    for oy in range(-nby, nby + 1)}
        self._wz = {oz: powsinxx(np.pi * (kz + nz * oz) / nz, two_ord)
                    for oz in range(-nbz, nbz + 1)}

        if self.mode == "ad":
            self._setup_ad(powsinxx, sqk, denom)

    def _setup_ad(self, powsinxx, sqk, denom):
        """compute_gf_ad + compute_sf_precoeff (src/KSPACE/pppm.cpp:
        1620-1712): the ad Green's function has no alias sum, and the
        self-force correction coefficients come from 5-image alias sums
        of the assignment-window transforms (factorized per dimension)."""
        order = self.order
        nx, ny, nz = self.nx, self.ny, self.nz
        xprd, yprd, zprd = self.prd
        g = self.g_ewald
        kx, ky, kz = self._kx, self._ky, self._kz
        unitkx = 2 * np.pi / xprd
        unitky = 2 * np.pi / yprd
        unitkz = 2 * np.pi / zprd
        qx, qy, qz = unitkx * kx, unitky * ky, unitkz * kz
        sx = np.exp(-0.25 * (qx / g) ** 2)
        sy = np.exp(-0.25 * (qy / g) ** 2)
        sz = np.exp(-0.25 * (qz / g) ** 2)
        wxyz = self._wx[0] * self._wy[0] * self._wz[0]
        with np.errstate(divide="ignore", invalid="ignore"):
            self.greensfn = np.where(
                sqk != 0.0,
                (4.0 * np.pi / np.where(sqk == 0, 1.0, sqk))
                * sx * sy * sz * wxyz / denom, 0.0)

        # per-dim 5-image window sums (note: order, not 2*order)
        def wdim(kper, n, off):
            return [powsinxx(np.pi * (kper + n * (i - 2 + off)) / n, order)
                    for i in range(5)]

        wx0 = wdim(kx, nx, 0)
        wx1 = wdim(kx, nx, 1)
        wx2 = wdim(kx, nx, 2)
        wy0 = wdim(ky, ny, 0)
        wy1 = wdim(ky, ny, 1)
        wy2 = wdim(ky, ny, 2)
        wz0 = wdim(kz, nz, 0)
        wz1 = wdim(kz, nz, 1)
        wz2 = wdim(kz, nz, 2)
        sx0 = sum(w * w for w in wx0)
        sy0 = sum(w * w for w in wy0)
        sz0 = sum(w * w for w in wz0)
        sx01 = sum(a * b for a, b in zip(wx0, wx1))
        sx02 = sum(a * b for a, b in zip(wx0, wx2))
        sy01 = sum(a * b for a, b in zip(wy0, wy1))
        sy02 = sum(a * b for a, b in zip(wy0, wy2))
        sz01 = sum(a * b for a, b in zip(wz0, wz1))
        sz02 = sum(a * b for a, b in zip(wz0, wz2))
        pre = [sx01 * sy0 * sz0, sx02 * sy0 * sz0,
               sx0 * sy01 * sz0, sx0 * sy02 * sz0,
               sx0 * sy0 * sz01, sx0 * sy0 * sz02]
        volume = xprd * yprd * zprd
        prex = np.pi / volume * nx / xprd
        prey = np.pi / volume * ny / yprd
        prez = np.pi / volume * nz / zprd
        scale = [prex, 2 * prex, prey, 2 * prey, prez, 2 * prez]
        self.sf_coeff = [float(np.sum(p * self.greensfn)) * sc
                         for p, sc in zip(pre, scale)]

    def _coeffs_device(self, ell, dt_):
        """Box-dependent coefficients (greens, vg, fkx/fky/fkz) as traced
        functions of the carried box lengths — PPPM::setup() +
        compute_gf_ik() evaluated on device so NPT box remaps see exact
        long-range coefficients every step."""
        nx, ny, nz = self.nx, self.ny, self.nz
        nbx, nby, nbz = self._nb
        g = self.g_ewald
        unit = 2.0 * np.pi / ell  # (3,) traced
        kx = jnp.asarray(self._kx, dt_)
        ky = jnp.asarray(self._ky, dt_)
        kz = jnp.asarray(self._kz, dt_)
        fkx = unit[0] * kx
        fky = unit[1] * ky
        fkz = unit[2] * kz
        sqk = fkx * fkx + fky * fky + fkz * fkz
        denom = jnp.asarray(self._denom, dt_)

        sum1 = jnp.zeros((nz, ny, nx), dt_)
        for ox in range(-nbx, nbx + 1):
            qx = unit[0] * (kx + nx * ox)
            sxwx = jnp.exp(-0.25 * (qx / g) ** 2) * jnp.asarray(
                self._wx[ox], dt_)
            for oy in range(-nby, nby + 1):
                qy = unit[1] * (ky + ny * oy)
                sywy = jnp.exp(-0.25 * (qy / g) ** 2) * jnp.asarray(
                    self._wy[oy], dt_)
                for oz in range(-nbz, nbz + 1):
                    qz = unit[2] * (kz + nz * oz)
                    szwz = jnp.exp(-0.25 * (qz / g) ** 2) * jnp.asarray(
                        self._wz[oz], dt_)
                    dot1 = fkx * qx + fky * qy + fkz * qz
                    dot2 = qx * qx + qy * qy + qz * qz
                    term = jnp.where(dot2 > 0,
                                     dot1 / jnp.where(dot2 == 0, 1.0, dot2),
                                     0.0)
                    sum1 = sum1 + term * sxwx * sywy * szwz
        nonzero = sqk != 0.0
        greens = jnp.where(
            nonzero,
            (4.0 * np.pi / jnp.where(nonzero, sqk, 1.0)) * sum1 / denom, 0.0)
        vterm = jnp.where(
            nonzero,
            -2.0 * (1.0 / jnp.where(nonzero, sqk, 1.0)
                    + 0.25 / (g * g)), 0.0)
        vg = jnp.stack([
            jnp.where(nonzero, 1.0 + vterm * fkx * fkx, 0.0),
            jnp.where(nonzero, 1.0 + vterm * fky * fky, 0.0),
            jnp.where(nonzero, 1.0 + vterm * fkz * fkz, 0.0),
            jnp.where(nonzero, vterm * fkx * fky, 0.0),
            jnp.where(nonzero, vterm * fkx * fkz, 0.0),
            jnp.where(nonzero, vterm * fky * fkz, 0.0),
        ])
        return greens, vg, fkx, fky, fkz

    # -------------------------------------------------------------- compute
    def compute(self, s, eflag: bool, vflag: bool):
        if not self.stagger_flag:
            return self._compute_one(s, eflag, vflag)
        # pppm/stagger (src/KSPACE/pppm_stagger.cpp:118-235): two full
        # assignment/poisson/interpolation passes with the grid offset by
        # 0 and half a cell; forces/energy/virial are pass averages
        # (qfactor and energy carry the 1/nstagger there; the self/
        # neutralization constants appear once in each pass's energy, so
        # the average preserves them exactly).
        f0, e0, v0 = self._compute_one(s, eflag, vflag, stag=0.0)
        f1, e1, v1 = self._compute_one(s, eflag, vflag, stag=0.5)
        f = 0.5 * (f0 + f1)
        elong = None if e0 is None else 0.5 * (e0 + e1)
        virial = None if v0 is None else 0.5 * (v0 + v1)
        return f, elong, virial

    def _compute_one(self, s, eflag: bool, vflag: bool, stag: float = 0.0):
        dt_ = s.x.dtype
        nx, ny, nz = self.nx, self.ny, self.nz
        order = self.order
        lo = s.box.lo
        ell = s.box.lengths
        delinv = jnp.array([nx, ny, nz], dtype=dt_) / ell
        q = s.q

        # particle_map: for odd order, nearest grid point (shift 0.5);
        # stag is the pppm/stagger half-cell grid offset
        # (pppm_stagger.cpp:696-698,746-748: the offset rides the grid
        # coordinate in both the map and the fractional distances)
        gx = (s.x - lo) * delinv + stag
        shift = 0.5 if order % 2 else 0.0
        base = jnp.floor(gx + shift).astype(jnp.int32)
        # rho1d weights per dim: dx = base + shiftone - gx
        dxyz = base.astype(dt_) + self.shiftone - gx  # (N, 3)

        rho_c = jnp.asarray(self.rho_c, dt_)
        pts = []
        for pt in range(order):
            acc = jnp.zeros_like(dxyz)
            for l in range(order - 1, -1, -1):
                acc = rho_c[l, pt] + acc * dxyz
            pts.append(acc)
        w = jnp.stack(pts, axis=1)  # (N, order, 3)

        # charge assignment (make_rho, src/KSPACE/pppm.cpp): the B-spline
        # stencil is SEPARABLE — rho(z,y,x) = sum_i q_i Wz_i(z) Wy_i(y)
        # Wx_i(x) — so on TPU the scatter becomes a matmul onto the MXU:
        # grid = Wz^T @ M with M = (q*Wy) (x) Wx as a dense (N, ny*nx)
        # plane table, and the field gather is the transpose contraction
        # (E @ M^T reduced against Wz).  No row-scatters at all; the
        # whole assignment/interpolation pipeline is 4 matmuls + one
        # elementwise table.  Tiny grids (n < order: wrap overlap in the
        # dense weight lines) keep the point-scatter path.
        offs = self.nlower + np.arange(order)
        n = q.shape[0]
        line_mode = min(nx, ny, nz) >= order
        gz = (base[:, 2][:, None] + offs[None, :]) % nz  # (N, order)
        gy = (base[:, 1][:, None] + offs[None, :]) % ny
        if line_mode:
            def wline(dim, ngrid):
                # dense weight line: W[i, p] = w_k at p=(base+off_k)%n
                p = jnp.arange(ngrid, dtype=jnp.int32)[None, :]
                start = (base[:, dim] + self.nlower)[:, None] % ngrid
                rel = (p - start) % ngrid                # (N, ngrid)
                acc = jnp.zeros((n, ngrid), dt_)
                for k in range(order):
                    acc = acc + jnp.where(rel == k, w[:, k, dim:dim + 1],
                                          0.0)
                return acc

            wx_line = wline(0, nx)
            wy_line = wline(1, ny)
            wz_line = wline(2, nz)
            m_plane = ((q[:, None] * wy_line)[:, :, None]
                       * wx_line[:, None, :]).reshape(n, ny * nx)
            # TPU matmuls default to bfloat16 passes; charge assignment
            # needs full f32 (0.4% step-0 E_pair error otherwise)
            grid = _dot(wz_line.T, m_plane).reshape(nz, ny, nx)
        else:
            gx_ = (base[:, 0][:, None] + offs[None, :]) % nx
            wz = w[:, :, 2][:, :, None, None]
            wy = w[:, :, 1][:, None, :, None]
            wx = w[:, :, 0][:, None, None, :]
            wq = (q[:, None, None, None] * wz * wy * wx).reshape(-1)
            iz = jnp.broadcast_to(
                gz[:, :, None, None], (n, order, order, order)).reshape(-1)
            iy = jnp.broadcast_to(
                gy[:, None, :, None], (n, order, order, order)).reshape(-1)
            ix = jnp.broadcast_to(
                gx_[:, None, None, :], (n, order, order, order)).reshape(-1)
            grid = jnp.zeros((nz, ny, nx), dt_).at[iz, iy, ix].add(wq)

        # poisson (ik): phi(k) = G(k) rho(k); E = -ik phi
        rho_k = jnp.fft.fftn(grid.astype(jnp.complex128
                                         if dt_ == jnp.float64
                                         else jnp.complex64))
        if self.dynamic_box:
            greens, vg_dyn, fkx, fky, fkz = self._coeffs_device(ell, dt_)
        else:
            greens = jnp.asarray(self.greensfn, dt_)
            vg_dyn = None
            fkx = jnp.asarray(self.fkx, dt_)
            fky = jnp.asarray(self.fky, dt_)
            fkz = jnp.asarray(self.fkz, dt_)
        # density was accumulated per cell; the inverse cell volume folds
        # into the field prefactor below
        delvol = (ell[0] / nx) * (ell[1] / ny) * (ell[2] / nz)
        phi_k = rho_k * greens
        qscale = self.qqrd2e  # * scale(=1)
        volume = ell[0] * ell[1] * ell[2]

        if self.mode == "ad":
            # poisson_ad + fieldforce_ad (pppm.cpp:2150-,2430-): ONE
            # inverse FFT of the potential; E at atoms from derivative
            # assignment weights; analytic self-force correction
            u = jnp.fft.ifftn(phi_k).real            # (nz, ny, nx)
            drho_c = jnp.asarray(self.drho_c, dt_)
            dpts = []
            for pt in range(order):
                acc = jnp.zeros_like(dxyz)
                for l in range(order - 2, -1, -1):
                    acc = drho_c[l, pt] + acc * dxyz
                dpts.append(acc)
            dw = jnp.stack(dpts, axis=1)             # (N, order, 3)
            hinv = delinv                            # n/L per dim
            if line_mode:
                def dwline(dim, ngrid):
                    p = jnp.arange(ngrid, dtype=jnp.int32)[None, :]
                    start = (base[:, dim] + self.nlower)[:, None] % ngrid
                    rel = (p - start) % ngrid
                    acc = jnp.zeros((n, ngrid), dt_)
                    for k in range(order):
                        acc = acc + jnp.where(
                            rel == k, dw[:, k, dim:dim + 1], 0.0)
                    return acc

                dwx_line = dwline(0, nx)
                dwy_line = dwline(1, ny)
                dwz_line = dwline(2, nz)
                # separable gather: 3 plane tables against the potential
                p0 = (wy_line[:, :, None]
                      * wx_line[:, None, :]).reshape(n, ny * nx)
                px = (wy_line[:, :, None]
                      * dwx_line[:, None, :]).reshape(n, ny * nx)
                py = (dwy_line[:, :, None]
                      * wx_line[:, None, :]).reshape(n, ny * nx)
                ur = u.reshape(nz, ny * nx)
                ekx = jnp.sum(wz_line.T * _dot(ur, px.T), axis=0)
                eky = jnp.sum(wz_line.T * _dot(ur, py.T), axis=0)
                ekz = jnp.sum(dwz_line.T * _dot(ur, p0.T), axis=0)
            else:
                uvals = u[iz, iy, ix].reshape(n, order, order, order)
                dwz = dw[:, :, 2][:, :, None, None]
                dwy = dw[:, :, 1][:, None, :, None]
                dwx = dw[:, :, 0][:, None, None, :]
                ekx = jnp.sum(uvals * (wz * wy * dwx), axis=(1, 2, 3))
                eky = jnp.sum(uvals * (wz * dwy * wx), axis=(1, 2, 3))
                ekz = jnp.sum(uvals * (dwz * wy * wx), axis=(1, 2, 3))
            ek = jnp.stack([ekx, eky, ekz], axis=1) * hinv[None, :]
            f = (q * (qscale / delvol))[:, None] * ek
            # self-force correction: sf_coeff * sin(2pi m s), s = x*h_inv
            # (+ the stagger offset, pppm_stagger.cpp:892-894)
            sf = jnp.asarray(self.sf_coeff, dt_)
            s_abs = s.x * hinv[None, :] + stag
            two_pi = 2.0 * np.pi
            sfv = jnp.stack([
                sf[0] * jnp.sin(two_pi * s_abs[:, 0])
                + sf[1] * jnp.sin(2 * two_pi * s_abs[:, 0]),
                sf[2] * jnp.sin(two_pi * s_abs[:, 1])
                + sf[3] * jnp.sin(2 * two_pi * s_abs[:, 1]),
                sf[4] * jnp.sin(two_pi * s_abs[:, 2])
                + sf[5] * jnp.sin(2 * two_pi * s_abs[:, 2]),
            ], axis=1)
            f = f - qscale * 2.0 * (q * q)[:, None] * sfv

            elong = None
            virial = None
            if eflag or vflag:
                rk2 = jnp.abs(rho_k) ** 2
                if eflag:
                    e = 0.5 * jnp.sum(greens * rk2) / volume
                    e = e - self.g_ewald * self.qsqsum / MY_PIS \
                        - 0.5 * np.pi * self.qsum**2 \
                        / (self.g_ewald**2 * volume)
                    elong = qscale * e
                if vflag:
                    vg = (vg_dyn if vg_dyn is not None
                          else jnp.asarray(self.vg, dt_))
                    virial = 0.5 * qscale * jnp.stack([
                        jnp.sum(vg[i] * greens * rk2) for i in range(6)
                    ]) / volume
            return f, elong, virial

        imag = jnp.asarray(1j, phi_k.dtype)
        ex = jnp.fft.ifftn(-imag * fkx * phi_k).real
        ey = jnp.fft.ifftn(-imag * fky * phi_k).real
        ez = jnp.fft.ifftn(-imag * fkz * phi_k).real

        # fieldforce_ik: the same separable contraction in reverse —
        # E_c @ M^T collapses the (y,x) plane on the MXU, the z reduction
        # rides the dense Wz lines.  M carries q, so the result is
        # already q_i * E(x_i).
        if line_mode:
            gx_ = jnp.sum(wz_line.T * _dot(ex.reshape(nz, ny * nx),
                                           m_plane.T), axis=0)
            gy_ = jnp.sum(wz_line.T * _dot(ey.reshape(nz, ny * nx),
                                           m_plane.T), axis=0)
            gz_ = jnp.sum(wz_line.T * _dot(ez.reshape(nz, ny * nx),
                                           m_plane.T), axis=0)

            def gather(comp):
                return (gx_, gy_, gz_)[comp]
        else:
            efield = jnp.stack([ex, ey, ez], axis=-1)   # (nz, ny, nx, 3)
            evals = efield[iz, iy, ix].reshape(n, order, order, order, 3)
            w3 = (wz * wy * wx).reshape(n, order, order, order)

            def gather(comp):
                return jnp.sum(evals[..., comp] * w3, axis=(1, 2, 3))

        # normalization: the reference stores charge *density* (q/delvol)
        # and uses unnormalized FFTs with one 1/ngrid factor; with numpy
        # conventions the field gather needs 1/delvol and the energy/virial
        # sums reduce to 1/volume (constants verified against the
        # reference's poisson_ik / fieldforce_ik chain)
        pref = ((qscale / delvol) * jnp.ones_like(q) if line_mode
                else q * (qscale / delvol))
        f = jnp.stack([gather(0), gather(1), gather(2)], axis=1)
        f = f * pref[:, None]

        elong = None
        virial = None
        if eflag or vflag:
            rk2 = jnp.abs(rho_k) ** 2
            if eflag:
                e = 0.5 * jnp.sum(greens * rk2) / volume
                e = e - self.g_ewald * self.qsqsum / MY_PIS \
                    - 0.5 * np.pi * self.qsum**2 \
                    / (self.g_ewald**2 * volume)
                elong = qscale * e
            if vflag:
                vg = (vg_dyn if vg_dyn is not None
                      else jnp.asarray(self.vg, dt_))
                virial = 0.5 * qscale * jnp.stack([
                    jnp.sum(vg[i] * greens * rk2) for i in range(6)
                ]) / volume
        return f, elong, virial


class PPPMAD(PPPM):
    """kspace_style pppm/ad — analytic-differentiation PPPM
    (src/KSPACE/pppm.cpp differentiation_flag==1): qopt grid selection,
    ad Green's function, ONE inverse FFT of the potential, forces from
    derivative assignment weights + analytic self-force correction."""

    style = "pppm/ad"
    mode = "ad"


class PPPMStagger(PPPM):
    """kspace_style pppm/stagger (src/KSPACE/pppm_stagger.cpp): two
    interlaced charge-assignment grids offset by half a cell, with the
    Green's function denominator averaged between the standard sin-power
    series and the cos-series gf_denom2; errors cancel between the two
    staggered meshes, giving ~one-order-higher effective accuracy."""

    style = "pppm/stagger"
    stagger_flag = True

    def init(self, sim):
        if self.mode == "ad":
            raise ValueError("pppm/stagger with kspace_modify diff ad "
                             "not supported; use the default ik")
        super().init(sim)


class PPPMCG(PPPM):
    """kspace_style pppm/cg — identical physics to pppm
    (src/KSPACE/pppm_cg.cpp): the reference skips zero-charge atoms in
    the scatter/gather loops; the TPU path is dense and vectorized, so
    q=0 rows already contribute nothing at full throughput.  Accepts and
    ignores the optional smallq threshold."""

    style = "pppm/cg"

    def __init__(self, accuracy_relative, smallq=None, order=5):
        super().__init__(accuracy_relative, order=order)


class PPPMTIP4P(PPPM):
    """pppm/tip4p (src/KSPACE/pppm_tip4p.cpp): charge assignment and
    field gather at the M charge sites; the k-space force on each
    fictitious site is partitioned back onto O/H with the same chain
    rule the pair style uses (particle_map/make_rho/fieldforce site
    overrides collapse into one coordinate transform here)."""

    def init(self, sim):
        super().init(sim)
        if not getattr(sim.pair, "is_tip4p", False):
            raise ValueError("kspace pppm/tip4p requires a tip4p pair style")
        self._pair = sim.pair

    def compute(self, s, eflag: bool, vflag: bool):
        pair = self._pair
        xq = pair.charge_sites(s.x, s.box)
        fk, ek, vir = super().compute(s.replace(x=xq), eflag, vflag)
        return pair.distribute_site_forces(fk), ek, vir
