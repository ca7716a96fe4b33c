"""CLASS2 (COMPASS) bonded styles: bond/angle/dihedral/improper class2
(reference: src/CLASS2/bond_class2.cpp, angle_class2.cpp,
dihedral_class2.cpp, improper_class2.cpp).

TPU-first design: the class2 cross-term FORCE expressions in the
reference run to hundreds of lines of hand-derived chain rule per style
(dihedral_class2.cpp alone carries dcosphidr/dthetadr/dbonddr tensors).
Here each style states its per-tuple ENERGY exactly as the reference
defines it and takes forces as -grad via jax.grad — XLA fuses the
forward and reverse passes into the same kernel, so this costs one
extra elementwise sweep, not a second gather.  Energies are written
with guarded sqrt/clip so reverse-mode stays NaN-free on masked
(padded) tuples.

Angle conventions (all verified against the reference binary goldens):
- theta terms use acos(clip(c)) with c = d1.d2/(r1 r2)
- the dihedral angle is SIGNED: phi = -acos(c) when (vb1 x vb2).vb3 > 0
  (dihedral_class2.cpp:131-139), expressed smoothly here as
  atan2(((x2-x1) x vb2).vb3 * r2, n1.n2)
- improper chi is the mean of three asin Wilson angles
  (improper_class2.cpp:150-165)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpumd.models.bonded import (AngleStyle, BondStyle, DihedralStyle,
                                 ImproperStyle, _mi, register_bonded)

_EPS = 1e-12


def _safe_r(d):
    return jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-30))


def _cos_angle(d1, d2, r1, r2):
    return jnp.clip(jnp.sum(d1 * d2, -1) / (r1 * r2),
                    -1.0 + _EPS, 1.0 - _EPS)


def _grad_terms(efn, xs):
    """Forces from -grad of the summed per-tuple energy.  Because every
    tuple's energy depends only on its own member coordinates, the grad
    of the sum IS the per-tuple force set."""
    def etot(*xs_):
        return jnp.sum(efn(list(xs_)))
    grads = jax.grad(etot, argnums=tuple(range(len(xs))))(*xs)
    return [-g for g in grads]


@register_bonded("bond", "class2")
class BondClass2(BondStyle):
    """E = K2 dr^2 + K3 dr^3 + K4 dr^4 (src/CLASS2/bond_class2.cpp)."""

    name = "class2"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.r0 = np.zeros(ntypes + 1)
        self.k2 = np.zeros(ntypes + 1)
        self.k3 = np.zeros(ntypes + 1)
        self.k4 = np.zeros(ntypes + 1)

    def coeff(self, btype, r0, k2, k3, k4):
        self.r0[btype] = r0
        self.k2[btype] = k2
        self.k3[btype] = k3
        self.k4[btype] = k4

    def equilibrium_distance(self, btype):
        return float(self.r0[btype])

    def bond_fn(self, r2, btype):
        dt_ = r2.dtype
        r0 = jnp.asarray(self.r0, dt_)[btype]
        k2 = jnp.asarray(self.k2, dt_)[btype]
        k3 = jnp.asarray(self.k3, dt_)[btype]
        k4 = jnp.asarray(self.k4, dt_)[btype]
        r = jnp.sqrt(r2)
        dr = r - r0
        de = 2.0 * k2 * dr + 3.0 * k3 * dr * dr + 4.0 * k4 * dr * dr * dr
        fbond = jnp.where(r > 0, -de / jnp.maximum(r, 1e-30), 0.0)
        e = (k2 + (k3 + k4 * dr) * dr) * dr * dr
        return fbond, e


@register_bonded("angle", "class2")
class AngleClass2(AngleStyle):
    """Quartic angle + BondBond + BondAngle cross terms
    (src/CLASS2/angle_class2.cpp:110-215):
      E = K2 dt^2 + K3 dt^3 + K4 dt^4
        + M (r1-bb_r1)(r2-bb_r2)
        + [N1 (r1-ba_r1) + N2 (r2-ba_r2)] dt
    Sub-coeffs via `angle_coeff N bb M r1 r2` / `angle_coeff N ba ...`
    or the BondBond/BondAngle Coeffs data sections."""

    name = "class2"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        z = lambda: np.zeros(ntypes + 1)
        self.theta0, self.k2, self.k3, self.k4 = z(), z(), z(), z()
        self.bb_k, self.bb_r1, self.bb_r2 = z(), z(), z()
        self.ba_k1, self.ba_k2, self.ba_r1, self.ba_r2 = z(), z(), z(), z()

    def coeff(self, atype, *a):
        if a and a[0] == "bb":
            self.bb_k[atype], self.bb_r1[atype], self.bb_r2[atype] = a[1:4]
        elif a and a[0] == "ba":
            (self.ba_k1[atype], self.ba_k2[atype],
             self.ba_r1[atype], self.ba_r2[atype]) = a[1:5]
        else:
            self.theta0[atype] = a[0] * np.pi / 180.0
            self.k2[atype], self.k3[atype], self.k4[atype] = a[1:4]

    def equilibrium_angle(self, atype):
        return float(self.theta0[atype])

    def _energy(self, xs, ttype, box):
        dt_ = xs[0].dtype
        x1, x2, x3 = xs
        d1 = _mi(x1 - x2, box)
        d2 = _mi(x3 - x2, box)
        r1, r2 = _safe_r(d1), _safe_r(d2)
        c = _cos_angle(d1, d2, r1, r2)
        P = lambda t: jnp.asarray(t, dt_)[ttype]
        dt = jnp.arccos(c) - P(self.theta0)
        e = (P(self.k2) + (P(self.k3) + P(self.k4) * dt) * dt) * dt * dt
        e = e + P(self.bb_k) * (r1 - P(self.bb_r1)) * (r2 - P(self.bb_r2))
        e = e + (P(self.ba_k1) * (r1 - P(self.ba_r1))
                 + P(self.ba_k2) * (r2 - P(self.ba_r2))) * dt
        return e

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


@register_bonded("dihedral", "class2")
class DihedralClass2(DihedralStyle):
    """Triple-cosine torsion + mbt/ebt/at/aat/bb13 cross terms
    (src/CLASS2/dihedral_class2.cpp:170-540):
      E = sum_n K_n (1 - cos(n phi - phi_n))
        + (r2 - mbt_r0)      sum_n mbt_fn   cos(n phi)
        + (r1 - ebt_r0_1)    sum_n ebt_fn_1 cos(n phi)
        + (r3 - ebt_r0_2)    sum_n ebt_fn_2 cos(n phi)
        + (th12 - at_th0_1)  sum_n at_fn_1  cos(n phi)
        + (th23 - at_th0_2)  sum_n at_fn_2  cos(n phi)
        + aat_k (th12 - aat_th1)(th23 - aat_th2) cos(phi)
        + bb13_k (r1 - r10)(r3 - r30)
    with r1=|x1-x2|, r2=|x3-x2|, r3=|x4-x3| and the SIGNED phi."""

    name = "class2"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        z = lambda: np.zeros(ntypes + 1)
        self.k1, self.k2, self.k3 = z(), z(), z()
        self.phi1, self.phi2, self.phi3 = z(), z(), z()
        self.mbt_f1, self.mbt_f2, self.mbt_f3, self.mbt_r0 = (z(), z(),
                                                              z(), z())
        (self.ebt_f1_1, self.ebt_f2_1, self.ebt_f3_1, self.ebt_f1_2,
         self.ebt_f2_2, self.ebt_f3_2, self.ebt_r0_1,
         self.ebt_r0_2) = (z() for _ in range(8))
        (self.at_f1_1, self.at_f2_1, self.at_f3_1, self.at_f1_2,
         self.at_f2_2, self.at_f3_2, self.at_theta0_1,
         self.at_theta0_2) = (z() for _ in range(8))
        self.aat_k, self.aat_theta0_1, self.aat_theta0_2 = z(), z(), z()
        self.bb13t_k, self.bb13t_r10, self.bb13t_r30 = z(), z(), z()

    def coeff(self, dt, *a):
        rad = np.pi / 180.0
        if a and a[0] == "mbt":
            (self.mbt_f1[dt], self.mbt_f2[dt], self.mbt_f3[dt],
             self.mbt_r0[dt]) = a[1:5]
        elif a and a[0] == "ebt":
            (self.ebt_f1_1[dt], self.ebt_f2_1[dt], self.ebt_f3_1[dt],
             self.ebt_f1_2[dt], self.ebt_f2_2[dt], self.ebt_f3_2[dt],
             self.ebt_r0_1[dt], self.ebt_r0_2[dt]) = a[1:9]
        elif a and a[0] == "at":
            (self.at_f1_1[dt], self.at_f2_1[dt], self.at_f3_1[dt],
             self.at_f1_2[dt], self.at_f2_2[dt],
             self.at_f3_2[dt]) = a[1:7]
            self.at_theta0_1[dt] = a[7] * rad
            self.at_theta0_2[dt] = a[8] * rad
        elif a and a[0] == "aat":
            self.aat_k[dt] = a[1]
            self.aat_theta0_1[dt] = a[2] * rad
            self.aat_theta0_2[dt] = a[3] * rad
        elif a and a[0] == "bb13":
            (self.bb13t_k[dt], self.bb13t_r10[dt],
             self.bb13t_r30[dt]) = a[1:4]
        else:
            self.k1[dt], self.k2[dt], self.k3[dt] = a[0], a[2], a[4]
            self.phi1[dt] = a[1] * rad
            self.phi2[dt] = a[3] * rad
            self.phi3[dt] = a[5] * rad

    def _energy(self, xs, ttype, box):
        dt_ = xs[0].dtype
        x1, x2, x3, x4 = xs
        vb1 = _mi(x1 - x2, box)
        vb2 = _mi(x3 - x2, box)
        vb3 = _mi(x4 - x3, box)
        r1, r2, r3 = _safe_r(vb1), _safe_r(vb2), _safe_r(vb3)
        th12 = jnp.arccos(_cos_angle(vb1, vb2, r1, r2))
        th23 = jnp.arccos(_cos_angle(-vb2, vb3, r2, r3))
        # signed phi (see module docstring); n1 = (x2-x1) x vb2
        n1 = jnp.cross(-vb1, vb2)
        n2 = jnp.cross(vb2, vb3)
        sy = jnp.sum(n1 * vb3, -1) * r2
        cy = jnp.sum(n1 * n2, -1)
        deg = (jnp.abs(sy) + jnp.abs(cy)) < 1e-20
        phi = jnp.arctan2(jnp.where(deg, 0.0, sy), jnp.where(deg, 1.0, cy))
        c1, c2, c3 = jnp.cos(phi), jnp.cos(2 * phi), jnp.cos(3 * phi)

        P = lambda t: jnp.asarray(t, dt_)[ttype]
        e = (P(self.k1) * (1.0 - jnp.cos(phi - P(self.phi1)))
             + P(self.k2) * (1.0 - jnp.cos(2.0 * phi - P(self.phi2)))
             + P(self.k3) * (1.0 - jnp.cos(3.0 * phi - P(self.phi3))))
        e = e + (r2 - P(self.mbt_r0)) * (P(self.mbt_f1) * c1
                                         + P(self.mbt_f2) * c2
                                         + P(self.mbt_f3) * c3)
        e = e + (r1 - P(self.ebt_r0_1)) * (P(self.ebt_f1_1) * c1
                                           + P(self.ebt_f2_1) * c2
                                           + P(self.ebt_f3_1) * c3)
        e = e + (r3 - P(self.ebt_r0_2)) * (P(self.ebt_f1_2) * c1
                                           + P(self.ebt_f2_2) * c2
                                           + P(self.ebt_f3_2) * c3)
        e = e + (th12 - P(self.at_theta0_1)) * (P(self.at_f1_1) * c1
                                                + P(self.at_f2_1) * c2
                                                + P(self.at_f3_1) * c3)
        e = e + (th23 - P(self.at_theta0_2)) * (P(self.at_f1_2) * c1
                                                + P(self.at_f2_2) * c2
                                                + P(self.at_f3_2) * c3)
        e = e + (P(self.aat_k) * (th12 - P(self.aat_theta0_1))
                 * (th23 - P(self.aat_theta0_2)) * c1)
        e = e + (P(self.bb13t_k) * (r1 - P(self.bb13t_r10))
                 * (r3 - P(self.bb13t_r30)))
        return e

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


@register_bonded("improper", "class2")
class ImproperClass2(ImproperStyle):
    """Wilson out-of-plane chi average + AngleAngle cross term
    (src/CLASS2/improper_class2.cpp:100-210 and angleangle :360-460):
      E = K (chi_bar - chi0)^2,
        chi_bar = [asin(s_ABCD) + asin(s_CBDA) + asin(s_DBAC)] / 3
      E_aa = M2 dthABC dthABD + M1 dthABC dthCBD + M3 dthABD dthCBD
    with AB = x1-x2, CB = x3-x2, DB = x4-x2 (atom 2 is the center)."""

    name = "class2"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        z = lambda: np.zeros(ntypes + 1)
        self.k0, self.chi0 = z(), z()
        self.aa_k1, self.aa_k2, self.aa_k3 = z(), z(), z()
        self.aa_theta0_1, self.aa_theta0_2, self.aa_theta0_3 = z(), z(), z()

    def coeff(self, itype, *a):
        rad = np.pi / 180.0
        if a and a[0] == "aa":
            self.aa_k1[itype], self.aa_k2[itype], self.aa_k3[itype] = a[1:4]
            self.aa_theta0_1[itype] = a[4] * rad
            self.aa_theta0_2[itype] = a[5] * rad
            self.aa_theta0_3[itype] = a[6] * rad
        else:
            self.k0[itype] = a[0]
            self.chi0[itype] = a[1] * rad

    def _energy(self, xs, ttype, box):
        dt_ = xs[0].dtype
        x1, x2, x3, x4 = xs
        ab = _mi(x1 - x2, box)
        cb = _mi(x3 - x2, box)
        db = _mi(x4 - x2, box)
        rab, rcb, rdb = _safe_r(ab), _safe_r(cb), _safe_r(db)
        P = lambda t: jnp.asarray(t, dt_)[ttype]

        # chi term: theta[0]=angle(AB,CB), theta[1]=angle(CB,DB),
        # theta[2]=angle(AB,DB); each chi normalizes by the OPPOSITE
        # angle's sine (improper_class2.cpp:150-160)
        s0 = jnp.sqrt(jnp.maximum(
            1.0 - _cos_angle(ab, cb, rab, rcb) ** 2, 1e-16))
        s1 = jnp.sqrt(jnp.maximum(
            1.0 - _cos_angle(cb, db, rcb, rdb) ** 2, 1e-16))
        s2 = jnp.sqrt(jnp.maximum(
            1.0 - _cos_angle(ab, db, rab, rdb) ** 2, 1e-16))
        inv3r = 1.0 / (rab * rcb * rdb)
        asin_c = lambda v: jnp.arcsin(
            jnp.clip(v, -1.0 + _EPS, 1.0 - _EPS))
        chi_abcd = asin_c(jnp.sum(jnp.cross(cb, db) * ab, -1) * inv3r / s1)
        chi_cbda = asin_c(jnp.sum(jnp.cross(db, ab) * cb, -1) * inv3r / s2)
        chi_dbac = asin_c(jnp.sum(jnp.cross(ab, cb) * db, -1) * inv3r / s0)
        dchi = (chi_abcd + chi_cbda + chi_dbac) / 3.0 - P(self.chi0)
        k0 = P(self.k0)
        e = jnp.where(k0 != 0.0, k0 * dchi * dchi, 0.0)

        # angle-angle term (angleangle(): BC == CB, BD == DB)
        th_abc = jnp.arccos(_cos_angle(ab, cb, rab, rcb))
        th_abd = jnp.arccos(_cos_angle(ab, db, rab, rdb))
        th_cbd = jnp.arccos(_cos_angle(cb, db, rcb, rdb))
        d1 = th_abc - P(self.aa_theta0_1)
        d2 = th_abd - P(self.aa_theta0_2)
        d3 = th_cbd - P(self.aa_theta0_3)
        e = e + (P(self.aa_k2) * d1 * d2 + P(self.aa_k1) * d1 * d3
                 + P(self.aa_k3) * d2 * d3)
        return e

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        fs = _grad_terms(lambda xs_: self._energy(xs_, ttype, box), xs)
        ed = ({self.energy_key: self._energy(xs, ttype, box)}
              if eflag else None)
        vp = None
        if vflag:
            ab = _mi(xs[0] - xs[1], box)
            cb = _mi(xs[2] - xs[1], box)
            db = _mi(xs[3] - xs[1], box)
            vp = [(ab, fs[0]), (cb, fs[2]), (db, fs[3])]
        return fs, ed, vp, None
