"""EXTRA-MOLECULE bonded styles (reference: src/EXTRA-MOLECULE/*.cpp):

bonds   : fene/nm, gaussian, harmonic/shift, harmonic/shift/cut
angles  : cosine/delta, cosine/shift, cosine/shift/exp, fourier,
          fourier/simple, gaussian
dihedral: fourier, helix, nharmonic, quadratic, cosine/shift/exp
improper: cossq, fourier, ring, distance

Each style states the reference's per-tuple ENERGY exactly; forces for
the 3- and 4-body styles come from -grad (the same autodiff pattern as
the CLASS2 family — XLA fuses the reverse pass into the same kernel).
Bond styles stay on the analytic bond_fn path (two-body derivatives are
one-liners)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpumd.models.bonded import (AngleStyle, BondStyle, DihedralStyle,
                                 ImproperStyle, _mi, register_bonded)
from tpumd.models.bonded_class2 import _cos_angle, _grad_terms, _safe_r

_EPS = 1e-12
DEG2RAD = np.pi / 180.0


def _signed_phi(vb1, vb2, vb3, r2):
    """Signed dihedral angle matching the reference's acos(c) with the
    (vb1 x vb2).vb3 sign flip (dihedral_helix.cpp:121-124 and the
    charmm-geometry s), smooth for autodiff via atan2."""
    n1 = jnp.cross(-vb1, vb2)
    n2 = jnp.cross(vb2, vb3)
    sy = jnp.sum(n1 * vb3, -1) * r2
    cy = jnp.sum(n1 * n2, -1)
    deg = (jnp.abs(sy) + jnp.abs(cy)) < 1e-20
    return jnp.arctan2(jnp.where(deg, 0.0, sy), jnp.where(deg, 1.0, cy))


# ------------------------------------------------------------------ bonds
@register_bonded("bond", "fene/nm")
class BondFENENM(BondStyle):
    """FENE backbone + generalized n-m repulsive core
    (src/EXTRA-MOLECULE/bond_fene_nm.cpp:60-110)."""

    name = "fene/nm"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        z = lambda: np.zeros(ntypes + 1)
        self.k, self.r0, self.epsilon, self.sigma = z(), z(), z(), z()
        self.nn, self.mm = z() + 2, z() + 1

    def coeff(self, btype, k, r0, eps, sigma, n, m):
        self.k[btype], self.r0[btype] = k, r0
        self.epsilon[btype], self.sigma[btype] = eps, sigma
        self.nn[btype], self.mm[btype] = n, m

    def equilibrium_distance(self, btype):
        return 0.97 * float(self.sigma[btype])

    def bond_fn(self, r2, btype):
        dt_ = r2.dtype
        P = lambda t: jnp.asarray(t, dt_)[btype]
        k, r0, eps, sig = P(self.k), P(self.r0), P(self.epsilon), \
            P(self.sigma)
        nn, mm = P(self.nn), P(self.mm)
        r0sq = r0 * r0
        rlog = jnp.maximum(1.0 - r2 / r0sq, 0.02)
        fbond = -k / rlog
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))
        inside = r2 < sig * sig
        sr = jnp.where(inside, sig / r, 1.0)
        srn = sr ** nn
        srm = sr ** mm
        fbond = fbond + jnp.where(
            inside, eps * (nn * mm / (nn - mm)) * (srn - srm) / r2, 0.0)
        e = -0.5 * k * r0sq * jnp.log(rlog)
        e = e + jnp.where(inside,
                          (eps / (nn - mm)) * (mm * srn - nn * srm), 0.0)
        return fbond, e


@register_bonded("bond", "gaussian")
class BondGaussian(BondStyle):
    """Multi-gaussian inverse-Boltzmann bond
    (src/EXTRA-MOLECULE/bond_gaussian.cpp:61-120):
    E = -kB T ln sum_i [A_i/(w_i sqrt(pi/2)) exp(-2 (r-r_i)^2/w_i^2)]."""

    name = "gaussian"
    BOLTZ_REAL = None  # set from units at init

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.temp = np.zeros(ntypes + 1)
        self.terms = {}   # btype -> (alpha[], width[], r0[]) arrays
        self._packed = None

    def coeff(self, btype, temp, n, *rest):
        n = int(n)
        vals = np.asarray(rest[:3 * n], np.float64).reshape(n, 3)
        self.temp[btype] = temp
        self.terms[btype] = vals
        self._packed = None

    def equilibrium_distance(self, btype):
        v = self.terms[btype]
        return float(v[np.argmax(v[:, 0]), 2])

    def _pack(self):
        nmax = max(v.shape[0] for v in self.terms.values())
        nt = self.temp.shape[0]
        alpha = np.zeros((nt, nmax))
        width = np.ones((nt, nmax))
        r0 = np.zeros((nt, nmax))
        for t, v in self.terms.items():
            alpha[t, :len(v)] = v[:, 0]
            width[t, :len(v)] = v[:, 1]
            r0[t, :len(v)] = v[:, 2]
        self._packed = (alpha, width, r0)

    def bond_fn(self, r2, btype):
        if self._packed is None:
            self._pack()
        dt_ = r2.dtype
        alpha, width, r0 = (jnp.asarray(a, dt_)[btype]
                            for a in self._packed)
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))[..., None]
        dr = r - r0
        pref = alpha / (width * np.sqrt(np.pi / 2.0))
        g = pref * jnp.exp(-2.0 * dr * dr / (width * width))
        sum_g = jnp.sum(g, -1)
        sum_num = jnp.sum(g * dr / (width * width), -1)
        sum_g = jnp.maximum(sum_g, jnp.abs(sum_num) * 1e-10 + 1e-300)
        kT = self._boltz * jnp.asarray(self.temp, dt_)[btype]
        fbond = -4.0 * kT * (sum_num / sum_g) / r[..., 0]
        e = -kT * jnp.log(sum_g)
        return fbond, e

    def init(self):
        u = getattr(self, "units", None)
        self._boltz = u.boltz if u is not None else 1.0


@register_bonded("bond", "harmonic/shift")
class BondHarmonicShift(BondStyle):
    """E = Umin/(r0-rc)^2 [(r-r0)^2 - (rc-r0)^2]
    (src/EXTRA-MOLECULE/bond_harmonic_shift.cpp; k = Umin/(r0-rc)^2)."""

    name = "harmonic/shift"
    _cut = False

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.r0 = np.zeros(ntypes + 1)
        self.r1 = np.ones(ntypes + 1)

    def coeff(self, btype, umin, r0, rc):
        self.k[btype] = umin / ((r0 - rc) * (r0 - rc))
        self.r0[btype] = r0
        self.r1[btype] = rc

    def equilibrium_distance(self, btype):
        return float(self.r0[btype])

    def bond_fn(self, r2, btype):
        dt_ = r2.dtype
        k = jnp.asarray(self.k, dt_)[btype]
        r0 = jnp.asarray(self.r0, dt_)[btype]
        r1 = jnp.asarray(self.r1, dt_)[btype]
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))
        dr = r - r0
        live = (r <= r1) if self._cut else jnp.ones_like(r, bool)
        fbond = jnp.where(live, -2.0 * k * dr / r, 0.0)
        e = jnp.where(live, k * (dr * dr - (r0 - r1) * (r0 - r1)), 0.0)
        return fbond, e


@register_bonded("bond", "harmonic/shift/cut")
class BondHarmonicShiftCut(BondHarmonicShift):
    """harmonic/shift with the interaction cut at rc
    (src/EXTRA-MOLECULE/bond_harmonic_shift_cut.cpp:76)."""

    name = "harmonic/shift/cut"
    _cut = True


# ----------------------------------------------------------------- angles
class _EnergyAngle(AngleStyle):
    """Angle via exact energy + autodiff forces."""

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        f1, f2, f3 = _grad_terms(lambda xs_: self._energy(xs_, ttype, box),
                                 xs)
        ed = ({self.energy_key: self._energy(xs, ttype, box)}
              if eflag else None)
        vp = None
        if vflag:
            d1 = _mi(xs[0] - xs[1], box)
            d2 = _mi(xs[2] - xs[1], box)
            vp = [(d1, f1), (d2, f3)]
        return [f1, f2, f3], ed, vp, None

    def _cs(self, xs, box):
        d1 = _mi(xs[0] - xs[1], box)
        d2 = _mi(xs[2] - xs[1], box)
        r1, r2 = _safe_r(d1), _safe_r(d2)
        c = _cos_angle(d1, d2, r1, r2)
        s = jnp.sqrt(jnp.maximum(1.0 - c * c, 1e-24))
        return c, s


@register_bonded("angle", "cosine/delta")
class AngleCosineDelta(_EnergyAngle):
    """E = K [1 - cos(theta - theta0)]
    (src/EXTRA-MOLECULE/angle_cosine_delta.cpp)."""

    name = "cosine/delta"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.theta0 = np.zeros(ntypes + 1)

    def coeff(self, atype, k, theta0):
        self.k[atype] = k
        self.theta0[atype] = theta0 * DEG2RAD

    def equilibrium_angle(self, atype):
        return float(self.theta0[atype])

    def _energy(self, xs, ttype, box):
        dt_ = xs[0].dtype
        c, s = self._cs(xs, box)
        th = jnp.arccos(c)
        k = jnp.asarray(self.k, dt_)[ttype]
        t0 = jnp.asarray(self.theta0, dt_)[ttype]
        return k * (1.0 - jnp.cos(th - t0))

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        # the reference force is NOT the exact gradient: its `cot`
        # is computed AFTER s was inverted (angle_cosine_delta.cpp:
        # 90-94, cot = c*sin(theta)) — replicate verbatim
        dt_ = xs[0].dtype
        d1 = _mi(xs[0] - xs[1], box)
        d2 = _mi(xs[2] - xs[1], box)
        rsq1 = jnp.sum(d1 * d1, -1)
        rsq2 = jnp.sum(d2 * d2, -1)
        r1, r2 = _safe_r(d1), _safe_r(d2)
        c = _cos_angle(d1, d2, r1, r2)
        sv = jnp.sqrt(jnp.maximum(1.0 - c * c, 1e-24))
        cot = c * sv
        k = jnp.asarray(self.k, dt_)[ttype]
        t0 = jnp.asarray(self.theta0, dt_)[ttype]
        a = -k
        a11 = a * c / rsq1
        a12 = -a / (r1 * r2)
        a22 = a * c / rsq2
        b11 = -a * c * cot / rsq1
        b12 = a * cot / (r1 * r2)
        b22 = -a * c * cot / rsq2
        c0 = jnp.cos(t0)
        s0 = jnp.sin(t0)
        f1 = ((a11 * c0 + b11 * s0)[..., None] * d1
              + (a12 * c0 + b12 * s0)[..., None] * d2)
        f3 = ((a22 * c0 + b22 * s0)[..., None] * d2
              + (a12 * c0 + b12 * s0)[..., None] * d1)
        f2 = -(f1 + f3)
        e = k * (1.0 - jnp.cos(jnp.arccos(c) - t0))
        ed = {self.energy_key: e} if eflag else None
        vp = [(d1, f1), (d2, f3)] if vflag else None
        return [f1, f2, f3], ed, vp, None


@register_bonded("angle", "cosine/shift")
class AngleCosineShift(_EnergyAngle):
    """E = -Umin/2 [1 + cos(theta - theta0)]
    (src/EXTRA-MOLECULE/angle_cosine_shift.cpp: kcos/ksin split)."""

    name = "cosine/shift"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        z = lambda: np.zeros(ntypes + 1)
        self.khalf, self.kcos, self.ksin, self.theta0 = z(), z(), z(), z()

    def coeff(self, atype, umin, theta0):
        self.khalf[atype] = umin / 2.0
        self.kcos[atype] = umin / 2.0 * np.cos(theta0 * DEG2RAD)
        self.ksin[atype] = umin / 2.0 * np.sin(theta0 * DEG2RAD)
        self.theta0[atype] = theta0 * DEG2RAD

    def equilibrium_angle(self, atype):
        return float(self.theta0[atype])

    def _energy(self, xs, ttype, box):
        dt_ = xs[0].dtype
        c, s = self._cs(xs, box)
        P = lambda t: jnp.asarray(t, dt_)[ttype]
        return -P(self.khalf) - P(self.kcos) * c - P(self.ksin) * s


@register_bonded("angle", "cosine/shift/exp")
class AngleCosineShiftExp(_EnergyAngle):
    """E = -Umin [e^{-a U} - 1]/[e^a - 1], U = -0.5(1+cos(theta-theta0)),
    with the |a|<0.001 series branch taken VERBATIM
    (src/EXTRA-MOLECULE/angle_cosine_shift_exp.cpp:128-140,215)."""

    name = "cosine/shift/exp"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        z = lambda: np.zeros(ntypes + 1)
        self.umin, self.a, self.cost, self.sint, self.theta0 = (
            z(), z(), z(), z(), z())
        self.opt1 = z()
        self.do_exp = np.ones(ntypes + 1, bool)

    def coeff(self, atype, umin, theta0, a):
        self.umin[atype], self.a[atype] = umin, a
        self.cost[atype] = np.cos(theta0 * DEG2RAD)
        self.sint[atype] = np.sin(theta0 * DEG2RAD)
        self.theta0[atype] = theta0 * DEG2RAD
        self.do_exp[atype] = abs(a) < 0.001
        if not self.do_exp[atype]:
            self.opt1[atype] = umin / (np.exp(a) - 1.0)

    def equilibrium_angle(self, atype):
        return float(self.theta0[atype])

    def _energy(self, xs, ttype, box):
        dt_ = xs[0].dtype
        c, s = self._cs(xs, box)
        P = lambda t: jnp.asarray(t, dt_)[ttype]
        ccc = c * P(self.cost) + s * P(self.sint)
        aa, uumin = P(self.a), P(self.umin)
        e_series = -0.125 * (1 + ccc) * (4 + aa * (ccc - 1)) * uumin
        exp2 = jnp.exp(0.5 * aa * (1 + ccc))
        e_exp = P(self.opt1) * (1 - exp2)
        return jnp.where(jnp.asarray(self.do_exp)[ttype], e_series, e_exp)


@register_bonded("angle", "fourier")
class AngleFourier(_EnergyAngle):
    """E = K [C0 + C1 cos(theta) + C2 cos(2 theta)]
    (src/EXTRA-MOLECULE/angle_fourier.cpp)."""

    name = "fourier"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        z = lambda: np.zeros(ntypes + 1)
        self.k, self.c0, self.c1, self.c2 = z(), z(), z(), z()

    def coeff(self, atype, k, c0, c1, c2):
        self.k[atype], self.c0[atype] = k, c0
        self.c1[atype], self.c2[atype] = c1, c2

    def _energy(self, xs, ttype, box):
        dt_ = xs[0].dtype
        c, s = self._cs(xs, box)
        P = lambda t: jnp.asarray(t, dt_)[ttype]
        return P(self.k) * (P(self.c0) + P(self.c1) * c
                            + P(self.c2) * (2.0 * c * c - 1.0))


@register_bonded("angle", "fourier/simple")
class AngleFourierSimple(_EnergyAngle):
    """E = K [1 + C cos(N theta)]
    (src/EXTRA-MOLECULE/angle_fourier_simple.cpp)."""

    name = "fourier/simple"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        z = lambda: np.zeros(ntypes + 1)
        self.k, self.C, self.N = z(), z(), z()

    def coeff(self, atype, k, c, n):
        self.k[atype], self.C[atype], self.N[atype] = k, c, n

    def _energy(self, xs, ttype, box):
        dt_ = xs[0].dtype
        c, s = self._cs(xs, box)
        th = jnp.arccos(c)
        P = lambda t: jnp.asarray(t, dt_)[ttype]
        return P(self.k) * (1.0 + P(self.C) * jnp.cos(P(self.N) * th))


@register_bonded("angle", "gaussian")
class AngleGaussian(_EnergyAngle):
    """E = -kB T ln sum_i [A_i/(w_i sqrt(pi/2)) exp(-2 dth^2/w_i^2)]
    (src/EXTRA-MOLECULE/angle_gaussian.cpp)."""

    name = "gaussian"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.temp = np.zeros(ntypes + 1)
        self.terms = {}
        self._packed = None
        self._boltz = 1.0

    def init(self):
        u = getattr(self, "units", None)
        self._boltz = u.boltz if u is not None else 1.0

    def coeff(self, atype, temp, n, *rest):
        n = int(n)
        vals = np.asarray(rest[:3 * n], np.float64).reshape(n, 3)
        vals[:, 2] *= DEG2RAD
        self.temp[atype] = temp
        self.terms[atype] = vals
        self._packed = None

    def equilibrium_angle(self, atype):
        v = self.terms[atype]
        return float(v[np.argmax(v[:, 0]), 2])

    def _energy(self, xs, ttype, box):
        if self._packed is None:
            nmax = max(v.shape[0] for v in self.terms.values())
            nt = self.temp.shape[0]
            alpha = np.zeros((nt, nmax))
            width = np.ones((nt, nmax))
            t0 = np.zeros((nt, nmax))
            for t, v in self.terms.items():
                alpha[t, :len(v)] = v[:, 0]
                width[t, :len(v)] = v[:, 1]
                t0[t, :len(v)] = v[:, 2]
            self._packed = (alpha, width, t0)
        dt_ = xs[0].dtype
        c, s = self._cs(xs, box)
        th = jnp.arccos(c)[..., None]
        alpha, width, t0 = (jnp.asarray(a, dt_)[ttype]
                            for a in self._packed)
        dth = th - t0
        pref = alpha / (width * np.sqrt(np.pi / 2.0))
        g = pref * jnp.exp(-2.0 * dth * dth / (width * width))
        sum_g = jnp.maximum(jnp.sum(g, -1), 1e-300)
        kT = self._boltz * jnp.asarray(self.temp, dt_)[ttype]
        return -kT * jnp.log(sum_g)


# -------------------------------------------------------------- dihedrals
class _EnergyDihedral(DihedralStyle):
    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        fs = _grad_terms(lambda xs_: self._energy(xs_, ttype, box), xs)
        ed = ({self.energy_key: self._energy(xs, ttype, box)}
              if eflag else None)
        vp = None
        if vflag:
            vb1 = _mi(xs[0] - xs[1], box)
            vb2 = _mi(xs[2] - xs[1], box)
            vb3 = _mi(xs[3] - xs[2], box)
            vp = [(vb1, fs[0]), (vb2, fs[2]), (vb3 + vb2, fs[3])]
        return fs, ed, vp, None

    def _phi(self, xs, box):
        vb1 = _mi(xs[0] - xs[1], box)
        vb2 = _mi(xs[2] - xs[1], box)
        vb3 = _mi(xs[3] - xs[2], box)
        return _signed_phi(vb1, vb2, vb3, _safe_r(vb2))


@register_bonded("dihedral", "fourier")
class DihedralFourier(_EnergyDihedral):
    """E = sum_j K_j [1 + cos(n_j phi - d_j)]
    (src/EXTRA-MOLECULE/dihedral_fourier.cpp)."""

    name = "fourier"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.terms = {}
        self._packed = None

    def coeff(self, dtype_, m, *rest):
        m = int(m)
        vals = np.asarray(rest[:3 * m], np.float64).reshape(m, 3)
        self.terms[dtype_] = vals
        self._packed = None

    def _energy(self, xs, ttype, box):
        if self._packed is None:
            nmax = max(v.shape[0] for v in self.terms.values())
            nt = max(self.terms) + 1 if self.terms else 1
            nt = max(nt, self.ntypes + 1)
            K = np.zeros((nt, nmax))
            N = np.zeros((nt, nmax))
            D = np.zeros((nt, nmax))
            for t, v in self.terms.items():
                K[t, :len(v)] = v[:, 0]
                N[t, :len(v)] = v[:, 1]
                D[t, :len(v)] = v[:, 2] * DEG2RAD
            self._packed = (K, N, D)
        dt_ = xs[0].dtype
        phi = self._phi(xs, box)[..., None]
        K, N, D = (jnp.asarray(a, dt_)[ttype] for a in self._packed)
        return jnp.sum(K * (1.0 + jnp.cos(N * phi - D)), -1)


@register_bonded("dihedral", "helix")
class DihedralHelix(_EnergyDihedral):
    """E = A(1-cos phi) + B(1+cos 3phi) + C(1+cos(phi+pi/4))
    (src/EXTRA-MOLECULE/dihedral_helix.cpp:130-133)."""

    name = "helix"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        z = lambda: np.zeros(ntypes + 1)
        self.aphi, self.bphi, self.cphi = z(), z(), z()

    def coeff(self, dtype_, a, b, c):
        self.aphi[dtype_], self.bphi[dtype_], self.cphi[dtype_] = a, b, c

    def _energy(self, xs, ttype, box):
        dt_ = xs[0].dtype
        phi = self._phi(xs, box)
        P = lambda t: jnp.asarray(t, dt_)[ttype]
        return (P(self.aphi) * (1.0 - jnp.cos(phi))
                + P(self.bphi) * (1.0 + jnp.cos(3.0 * phi))
                + P(self.cphi) * (1.0 + jnp.cos(phi + np.pi / 4.0)))


@register_bonded("dihedral", "nharmonic")
class DihedralNHarmonic(_EnergyDihedral):
    """E = sum_n A_n cos^{n-1}(phi)
    (src/EXTRA-MOLECULE/dihedral_nharmonic.cpp)."""

    name = "nharmonic"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.terms = {}
        self._packed = None

    def coeff(self, dtype_, n, *rest):
        self.terms[dtype_] = np.asarray(rest[:int(n)], np.float64)
        self._packed = None

    def _energy(self, xs, ttype, box):
        if self._packed is None:
            nmax = max(len(v) for v in self.terms.values())
            A = np.zeros((self.ntypes + 1, nmax))
            for t, v in self.terms.items():
                A[t, :len(v)] = v
            self._packed = A
        dt_ = xs[0].dtype
        phi = self._phi(xs, box)
        c = jnp.cos(phi)[..., None]
        A = jnp.asarray(self._packed, dt_)[ttype]
        pows = c ** jnp.arange(A.shape[-1], dtype=dt_)
        return jnp.sum(A * pows, -1)


@register_bonded("dihedral", "quadratic")
class DihedralQuadratic(_EnergyDihedral):
    """E = K (phi - phi0)^2 with dphi wrapped into (-pi, pi]
    (src/EXTRA-MOLECULE/dihedral_quadratic.cpp:126-133)."""

    name = "quadratic"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.phi0 = np.zeros(ntypes + 1)

    def coeff(self, dtype_, k, phi0):
        self.k[dtype_] = k
        self.phi0[dtype_] = phi0 * DEG2RAD

    def _energy(self, xs, ttype, box):
        dt_ = xs[0].dtype
        phi = self._phi(xs, box)
        dphi = phi - jnp.asarray(self.phi0, dt_)[ttype]
        dphi = jnp.where(dphi > np.pi, dphi - 2 * np.pi, dphi)
        dphi = jnp.where(dphi < -np.pi, dphi + 2 * np.pi, dphi)
        return jnp.asarray(self.k, dt_)[ttype] * dphi * dphi


@register_bonded("dihedral", "cosine/shift/exp")
class DihedralCosineShiftExp(_EnergyDihedral):
    """E = -Umin [e^{-a U} - 1]/[e^a - 1], U = -0.5(1+cos(phi-theta0))
    (src/EXTRA-MOLECULE/dihedral_cosine_shift_exp.cpp:150-160)."""

    name = "cosine/shift/exp"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        z = lambda: np.zeros(ntypes + 1)
        self.umin, self.a, self.cost, self.sint, self.opt1 = (
            z(), z(), z(), z(), z())
        self.do_exp = np.ones(ntypes + 1, bool)

    def coeff(self, dtype_, umin, theta0, a):
        self.umin[dtype_], self.a[dtype_] = umin, a
        self.cost[dtype_] = np.cos(theta0 * DEG2RAD)
        self.sint[dtype_] = np.sin(theta0 * DEG2RAD)
        self.do_exp[dtype_] = abs(a) < 0.001
        if not self.do_exp[dtype_]:
            self.opt1[dtype_] = umin / (np.exp(a) - 1.0)

    def _energy(self, xs, ttype, box):
        dt_ = xs[0].dtype
        phi = self._phi(xs, box)
        c, s = jnp.cos(phi), jnp.sin(phi)
        P = lambda t: jnp.asarray(t, dt_)[ttype]
        ccc = c * P(self.cost) + s * P(self.sint)
        aa, uumin = P(self.a), P(self.umin)
        e_series = -0.125 * (1 + ccc) * (4 + aa * (ccc - 1)) * uumin
        exp2 = jnp.exp(0.5 * aa * (1 + ccc))
        e_exp = P(self.opt1) * (1 - exp2)
        return jnp.where(jnp.asarray(self.do_exp)[ttype], e_series, e_exp)


# -------------------------------------------------------------- impropers
class _EnergyImproper(ImproperStyle):
    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        fs = _grad_terms(lambda xs_: self._energy(xs_, ttype, box), xs)
        ed = ({self.energy_key: self._energy(xs, ttype, box)}
              if eflag else None)
        vp = None
        if vflag:
            d1 = _mi(xs[0] - xs[1], box)
            d2 = _mi(xs[2] - xs[1], box)
            d3 = _mi(xs[3] - xs[1], box)
            vp = [(d1, fs[0]), (d2, fs[2]), (d3, fs[3])]
        return fs, ed, vp, None


@register_bonded("improper", "cossq")
class ImproperCossq(_EnergyImproper):
    """E = 0.5 K cos^2(tau - chi0), tau the angle between bond 1->2 and
    bond 3->4 (src/EXTRA-MOLECULE/improper_cossq.cpp:100-130)."""

    name = "cossq"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.chi = np.zeros(ntypes + 1)

    def coeff(self, itype, k, chi):
        self.k[itype] = k
        self.chi[itype] = chi * DEG2RAD

    def _energy(self, xs, ttype, box):
        dt_ = xs[0].dtype
        vb1 = _mi(xs[1] - xs[0], box)
        vb3 = _mi(xs[3] - xs[2], box)
        c = _cos_angle(vb1, vb3, _safe_r(vb1), _safe_r(vb3))
        tau = jnp.arccos(c)
        P = lambda t: jnp.asarray(t, dt_)[ttype]
        cc = jnp.cos(tau - P(self.chi))
        return 0.5 * P(self.k) * cc * cc

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        # the reference force is NOT the exact gradient for chi != 0:
        # angfac = -K cos(tau - chi) multiplies d(cos tau)/dx with no
        # acos chain factor (improper_cossq.cpp:150-200) — verbatim
        dt_ = xs[0].dtype
        vb1 = _mi(xs[1] - xs[0], box)
        vb2 = _mi(xs[2] - xs[1], box)
        vb3 = _mi(xs[3] - xs[2], box)
        rjisq = jnp.maximum(jnp.sum(vb1 * vb1, -1), 1e-30)
        rlksq = jnp.maximum(jnp.sum(vb3 * vb3, -1), 1e-30)
        clkji = jnp.sum(vb3 * vb1, -1)
        c = jnp.clip(clkji / jnp.sqrt(rjisq * rlksq),
                     -1.0 + _EPS, 1.0 - _EPS)
        tau = jnp.arccos(c)
        P = lambda t: jnp.asarray(t, dt_)[ttype]
        cc = jnp.cos(tau - P(self.chi))
        e = 0.5 * P(self.k) * cc * cc
        angfac = -P(self.k) * cc
        cfact1 = angfac / jnp.sqrt(rlksq * rjisq)
        cfact2 = clkji / rlksq
        cfact3 = clkji / rjisq
        f1 = cfact1[..., None] * (-vb3 + cfact3[..., None] * vb1)
        f2 = -f1
        f3 = cfact1[..., None] * (cfact2[..., None] * vb3 - vb1)
        f4 = -f3
        ed = {self.energy_key: e} if eflag else None
        vp = None
        if vflag:
            d1 = _mi(xs[0] - xs[1], box)
            d2 = _mi(xs[2] - xs[1], box)
            d3 = _mi(xs[3] - xs[1], box)
            vp = [(d1, f1), (d2, f3), (d3, f4)]
        return [f1, f2, f3, f4], ed, vp, None


@register_bonded("improper", "fourier")
class ImproperFourier(_EnergyImproper):
    """E = K [C0 + C1 cos(omega) + C2 cos(2 omega)], omega between the
    IL axis and the IJK plane; `all` adds the two permuted terms
    (src/EXTRA-MOLECULE/improper_fourier.cpp addone)."""

    name = "fourier"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        z = lambda: np.zeros(ntypes + 1)
        self.k, self.c0, self.c1, self.c2 = z(), z(), z(), z()
        self.all = np.zeros(ntypes + 1, np.int32)

    def coeff(self, itype, k, c0, c1, c2, all_flag=0):
        self.k[itype], self.c0[itype] = k, c0
        self.c1[itype], self.c2[itype] = c1, c2
        self.all[itype] = int(all_flag)

    def _one(self, vb1, vb2, vb3, ttype, dt_):
        # c is vs the IJK-plane NORMAL; the energy uses cos(omega) =
        # sin(acos(c)) = s (improper_fourier.cpp addone: E = K(C0 +
        # C1 s + C2 (2 s^2 - 1)))
        a = jnp.cross(vb1, vb2)
        ra = jnp.sqrt(jnp.maximum(jnp.sum(a * a, -1), 1e-24))
        rh = jnp.sqrt(jnp.maximum(jnp.sum(vb3 * vb3, -1), 1e-24))
        c = jnp.clip(jnp.sum(a * vb3, -1) / (ra * rh),
                     -1.0 + _EPS, 1.0 - _EPS)
        s = jnp.sqrt(jnp.maximum(1.0 - c * c, 1e-24))
        # sign of s flips when IL projects positively onto IJ+IK
        # (improper_fourier.cpp addone: projhfg > 0 -> s = -s)
        proj = (jnp.sum(vb3 * vb1, -1)
                / jnp.sqrt(jnp.maximum(jnp.sum(vb1 * vb1, -1), 1e-30))
                + jnp.sum(vb3 * vb2, -1)
                / jnp.sqrt(jnp.maximum(jnp.sum(vb2 * vb2, -1), 1e-30)))
        s = jnp.where(proj > 0.0, -s, s)
        P = lambda t: jnp.asarray(t, dt_)[ttype]
        return P(self.k) * (P(self.c0) + P(self.c1) * s
                            + P(self.c2) * (2.0 * s * s - 1.0))

    def _energy(self, xs, ttype, box):
        dt_ = xs[0].dtype
        vb1 = _mi(xs[1] - xs[0], box)
        vb2 = _mi(xs[2] - xs[0], box)
        vb3 = _mi(xs[3] - xs[0], box)
        e = self._one(vb1, vb2, vb3, ttype, dt_)
        allf = jnp.asarray(self.all)[ttype] > 0
        e2 = self._one(vb3, vb1, vb2, ttype, dt_)
        e3 = self._one(vb2, vb3, vb1, ttype, dt_)
        return e + jnp.where(allf, e2 + e3, 0.0)


@register_bonded("improper", "ring")
class ImproperRing(_EnergyImproper):
    """E = K/6 [sum_{3 triads} (cos theta_i - cos chi0)]^6, triads
    (1,2,4),(1,2,3),(4,2,3) with cos of CONSECUTIVE bond vectors
    (src/EXTRA-MOLECULE/improper_ring.cpp:60-95)."""

    name = "ring"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.chi = np.zeros(ntypes + 1)  # stores cos(chi0)

    def coeff(self, itype, k, chi):
        self.k[itype] = k
        self.chi[itype] = np.cos(chi * DEG2RAD)

    def _energy(self, xs, ttype, box):
        dt_ = xs[0].dtype
        x1, x2, x3, x4 = xs
        P = lambda t: jnp.asarray(t, dt_)[ttype]

        def bend(a, b, c):
            b1 = _mi(b - a, box)
            b2 = _mi(c - b, box)
            return jnp.clip(jnp.sum(b1 * b2, -1)
                            / (_safe_r(b1) * _safe_r(b2)),
                            -1.0 + _EPS, 1.0 - _EPS)

        summ = (bend(x1, x2, x4) + bend(x1, x2, x3) + bend(x4, x2, x3)
                - 3.0 * P(self.chi))
        return (1.0 / 6.0) * P(self.k) * summ ** 6


@register_bonded("improper", "distance")
class ImproperDistance(_EnergyImproper):
    """E = K2 d^2 + K4 d^4, d the distance of atom 1 from the plane of
    atoms 2-3-4 (src/EXTRA-MOLECULE/improper_distance.cpp:80-120)."""

    name = "distance"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.chi = np.zeros(ntypes + 1)  # K4 (named chi in the ref)

    def coeff(self, itype, k2, k4):
        self.k[itype] = k2
        self.chi[itype] = k4

    def _energy(self, xs, ttype, box):
        dt_ = xs[0].dtype
        x1, x2, x3, x4 = xs
        ab = _mi(x2 - x1, box)
        bc = _mi(x3 - x2, box)
        bd = _mi(x4 - x2, box)
        n = jnp.cross(bc, bd)
        n = n / jnp.sqrt(jnp.maximum(jnp.sum(n * n, -1), 1e-30)
                         )[..., None]
        da = jnp.sum(n * ab, -1)
        P = lambda t: jnp.asarray(t, dt_)[ttype]
        return P(self.k) * da * da + P(self.chi) * da ** 4
