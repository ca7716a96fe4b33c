"""Bonded interactions: bond/angle/dihedral/improper styles.

TPU-native redesign of the reference's NTopo tuple-list loops
(src/ntopo.h, src/bond_harmonic.cpp, src/MOLECULE/bond_fene.cpp,
angle_charmm.cpp, dihedral_charmm.cpp, improper_harmonic.cpp): instead of
distributed per-step tuple lists with scatter-adds, each atom carries a
static padded per-atom incidence list built once at setup (topology is
fixed).  Every bonded term is evaluated once per incident atom (2x for
bonds, 3x for angles, ...) and only that atom's force contribution is
accumulated — scatter-free i-centric accumulation, same trick as the pair
drivers.  Energy/virial take a 1/n_incident factor.

Atom order is static in matrix neighbor mode (molecular systems), so the
incidence lists index atom rows directly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpumd.models.registry import register_bonded
from tpumd.ops.pairwise import minimum_image


def build_incidence(n: int, tuples: np.ndarray, arity: int,
                    row_of_tag=None, min_width: int = 0):
    """Per-atom padded incidence lists.

    tuples: (M, 1+arity) int array: [type, atom tags...] (1-based tags).
    row_of_tag maps tag -> atom row (identity - 1 if None).
    min_width: pad P up to at least this many slots (dynamic-topology
    fixes keep P static across mid-run rebuilds so the compiled segment
    never retraces).
    Returns (idx (N, P, arity) int32 zero-based partner rows padded with
    self, ttype (N, P) int32 0-padded, role (N, P) int8 — which position
    this atom holds in the tuple, mask (N, P) bool).
    """
    per_atom: list[list] = [[] for _ in range(n)]
    for row in tuples:
        ttype = int(row[0])
        if row_of_tag is None:
            atoms = [int(a) - 1 for a in row[1:1 + arity]]
        else:
            atoms = [int(row_of_tag[int(a)]) for a in row[1:1 + arity]]
        for role, a in enumerate(atoms):
            per_atom[a].append((ttype, role, atoms))
    pmax = max(1, max(len(v) for v in per_atom), int(min_width))
    idx = np.zeros((n, pmax, arity), dtype=np.int32)
    typ = np.zeros((n, pmax), dtype=np.int32)
    role = np.zeros((n, pmax), dtype=np.int8)
    mask = np.zeros((n, pmax), dtype=bool)
    for a, items in enumerate(per_atom):
        idx[a, :, :] = a
        for p, (t, r, atoms) in enumerate(items):
            idx[a, p] = atoms
            typ[a, p] = t
            role[a, p] = r
            mask[a, p] = True
    return idx, typ, role, mask


class BondedStyle:
    energy_key = "ebond"
    kind = "bond"

    def __init__(self, ntypes: int):
        self.ntypes = ntypes
        self._incidence = None
        self._dev_inc = None

    def coeff(self, *args):
        raise NotImplementedError

    def init(self):
        pass

    def set_topology(self, n: int, tuples: np.ndarray, row_of_tag=None):
        self._tuples = np.asarray(tuples)
        self._n = n
        self._incidence = build_incidence(n, self._tuples, self.arity,
                                          row_of_tag)
        self._dev_inc = None

    def device_incidence(self):
        """Incidence arrays as device arrays, built once — passed into
        compiled step functions as traced arguments so large topologies
        are not baked into the jit graphs as constants."""
        if self._incidence is None:
            return None
        if self._dev_inc is None:
            idx, typ, role, mask = self._incidence
            self._dev_inc = (jnp.asarray(idx), jnp.asarray(typ),
                             jnp.asarray(role), jnp.asarray(mask))
        return self._dev_inc

    def compute(self, s, ctx, eflag: bool, vflag: bool, consts=None):
        """Returns (f (N,3), {energy_key: scalar} or None, virial6 or None)."""
        raise NotImplementedError


class BondStyle(BondedStyle):
    arity = 2
    energy_key = "ebond"
    kind = "bond"

    def bond_fn(self, r2, btype):
        """Return (fbond, ebond): f_on_atom1 = fbond * (x1 - x2)."""
        raise NotImplementedError

    def compute(self, s, ctx, eflag: bool, vflag: bool, consts=None):
        inc = consts if consts is not None else self.device_incidence()
        if inc is None:
            # no static bonds (pure fix bond/create deck): zero-width
            # incidence so the dynamic-slot path below still runs
            n = s.x.shape[0]
            inc = (jnp.zeros((n, 0, 2), jnp.int32),
                   jnp.zeros((n, 0), jnp.int32),
                   jnp.zeros((n, 0), jnp.int8),
                   jnp.zeros((n, 0), bool))
        idx, typ_j, role_j, mask_j = inc
        # dynamic topology (fix bond/break): a carried per-incidence
        # alive mask in state extras overrides the static one
        alive = s.extras.get("mc_bond_alive")
        if alive is not None:
            mask_j = mask_j & (alive > 0.5)
        # partner of each incidence: the other atom of the bond
        partner = jnp.where(role_j[..., None] == 0, idx[:, :, 1:2],
                            idx[:, :, 0:1])[..., 0]
        d = s.x[:, None, :] - s.x[partner]
        d = minimum_image(d, s.box)
        r2 = jnp.sum(d * d, axis=-1)
        r2 = jnp.where(mask_j, r2, jnp.ones_like(r2))
        fbond, ebond = self.bond_fn(r2, typ_j)
        fbond = jnp.where(mask_j, fbond, 0)
        if "mc_new_pidx" in s.extras:
            # fix bond/create: dynamically created bonds live in padded
            # per-atom extras slots (partner row, type, live), stored
            # symmetrically on both endpoints — same 1/2-share tallies
            npidx = s.extras["mc_new_pidx"].astype(jnp.int32)
            ntyp = s.extras["mc_new_typ"].astype(jnp.int32)
            nlive = s.extras["mc_new_live"] > 0.5
            dn = minimum_image(s.x[:, None, :] - s.x[npidx], s.box)
            rn2 = jnp.where(nlive, jnp.sum(dn * dn, -1), 1.0)
            fn_, en_ = self.bond_fn(rn2, ntyp)
            fn_ = jnp.where(nlive, fn_, 0)
            en_ = jnp.where(nlive, en_, 0)
            d = jnp.concatenate([d, dn], axis=1)
            fbond = jnp.concatenate([fbond, fn_], axis=1)
            ebond = jnp.concatenate([ebond, en_], axis=1)
            mask_j = jnp.concatenate([mask_j, nlive], axis=1)
        if eflag == "atom":
            # per-atom tallies: each endpoint gets a half share
            eatom = 0.5 * jnp.sum(jnp.where(mask_j, ebond, 0), axis=1)
            vatom = 0.5 * jnp.stack([
                jnp.sum(fbond * d[:, :, 0] * d[:, :, 0], axis=1),
                jnp.sum(fbond * d[:, :, 1] * d[:, :, 1], axis=1),
                jnp.sum(fbond * d[:, :, 2] * d[:, :, 2], axis=1),
                jnp.sum(fbond * d[:, :, 0] * d[:, :, 1], axis=1),
                jnp.sum(fbond * d[:, :, 0] * d[:, :, 2], axis=1),
                jnp.sum(fbond * d[:, :, 1] * d[:, :, 2], axis=1),
            ], axis=1)
            return None, eatom, vatom
        f = jnp.sum(d * fbond[:, :, None], axis=1)
        e = None
        virial = None
        if eflag:
            e = {self.energy_key: 0.5 * jnp.sum(jnp.where(mask_j, ebond, 0))}
        if vflag:
            virial = 0.5 * jnp.stack([
                jnp.sum(fbond * d[:, :, 0] * d[:, :, 0]),
                jnp.sum(fbond * d[:, :, 1] * d[:, :, 1]),
                jnp.sum(fbond * d[:, :, 2] * d[:, :, 2]),
                jnp.sum(fbond * d[:, :, 0] * d[:, :, 1]),
                jnp.sum(fbond * d[:, :, 0] * d[:, :, 2]),
                jnp.sum(fbond * d[:, :, 1] * d[:, :, 2]),
            ])
        return f, e, virial

    def reduce_from_xs(self, xs, typ_j, role_j, mask_j, box, ctx,
                       eflag, vflag, s=None, idx=None,
                       member_type=None, member_q=None):
        """Grid tag-matched path: tally from member positions (the
        incidence-free twin of compute(); same 1/2 shares)."""
        if s is not None and "mc_bond_alive" in getattr(s, "extras", {}):
            raise NotImplementedError(
                "fix bond/break requires the matrix neighbor engine")
        d = minimum_image(xs[0] - xs[1], box)
        r2 = jnp.sum(d * d, axis=-1)
        r2 = jnp.where(mask_j, r2, jnp.ones_like(r2))
        fbond, ebond = self.bond_fn(r2, typ_j)
        fbond = jnp.where(mask_j, fbond, 0)
        sign = jnp.where(role_j == 0, 1.0, -1.0).astype(d.dtype)
        f = jnp.sum(d * (sign * fbond)[:, :, None], axis=1)
        e = None
        virial = None
        if eflag:
            e = {self.energy_key:
                 0.5 * jnp.sum(jnp.where(mask_j, ebond, 0))}
        if vflag:
            virial = 0.5 * jnp.stack([
                jnp.sum(fbond * d[:, :, 0] * d[:, :, 0]),
                jnp.sum(fbond * d[:, :, 1] * d[:, :, 1]),
                jnp.sum(fbond * d[:, :, 2] * d[:, :, 2]),
                jnp.sum(fbond * d[:, :, 0] * d[:, :, 1]),
                jnp.sum(fbond * d[:, :, 0] * d[:, :, 2]),
                jnp.sum(fbond * d[:, :, 1] * d[:, :, 2]),
            ])
        return f, e, virial


@register_bonded("bond", "harmonic")
class BondHarmonic(BondStyle):
    """E = K (r - r0)^2 (src/MOLECULE/bond_harmonic.cpp)."""

    name = "harmonic"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.r0 = np.zeros(ntypes + 1)

    def coeff(self, btype, k, r0):
        self.k[btype] = k
        self.r0[btype] = r0

    def equilibrium_distance(self, btype):
        # Bond::equilibrium_distance for tip4p geometry resolution
        return float(self.r0[btype])

    def bond_fn(self, r2, btype):
        k = jnp.asarray(self.k, r2.dtype)[btype]
        r0 = jnp.asarray(self.r0, r2.dtype)[btype]
        r = jnp.sqrt(r2)
        dr = r - r0
        rk = k * dr
        fbond = jnp.where(r > 0, -2.0 * rk / r, 0.0)
        return fbond, rk * dr


@register_bonded("bond", "fene")
class BondFENE(BondStyle):
    """FENE + shifted-LJ repulsion (src/MOLECULE/bond_fene.cpp:53-120).

    E = -0.5 K R0^2 ln(1-(r/R0)^2) + [4 eps((s/r)^12-(s/r)^6) + eps]
    with the LJ part active below 2^(1/6) sigma.
    """

    name = "fene"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.r0 = np.zeros(ntypes + 1)
        self.epsilon = np.zeros(ntypes + 1)
        self.sigma = np.zeros(ntypes + 1)

    def coeff(self, btype, k, r0, epsilon, sigma):
        self.k[btype] = k
        self.r0[btype] = r0
        self.epsilon[btype] = epsilon
        self.sigma[btype] = sigma

    def bond_fn(self, r2, btype):
        dt = r2.dtype
        k = jnp.asarray(self.k, dt)[btype]
        r0 = jnp.asarray(self.r0, dt)[btype]
        eps = jnp.asarray(self.epsilon, dt)[btype]
        sig = jnp.asarray(self.sigma, dt)[btype]
        r0sq = r0 * r0
        rlogarg = 1.0 - r2 / r0sq
        # reference clamps rlogarg < 0.1 to 0.1 after a warning ("FENE bond
        # too long"); keep the clamp for numerical survival
        rlogarg = jnp.maximum(rlogarg, 0.1)
        fbond = -k / rlogarg
        ebond = -0.5 * k * r0sq * jnp.log(rlogarg)
        # repulsive shifted LJ below 2^(1/6) sigma
        sr2 = sig * sig / r2
        sr6 = sr2 * sr2 * sr2
        inside = r2 < jnp.power(2.0, 1.0 / 3.0) * sig * sig
        fbond = fbond + jnp.where(inside, 48.0 * eps * sr6 * (sr6 - 0.5) / r2, 0.0)
        ebond = ebond + jnp.where(inside, 4.0 * eps * sr6 * (sr6 - 1.0) + eps, 0.0)
        return fbond, ebond

    @property
    def kernel_reach(self) -> float:
        """FENE bonds cannot stretch past R0 (the log diverges), so when
        max R0 <= cutneigh every bond partner is guaranteed inside the
        27-cell stencil and the bond can ride the grid kernel."""
        return float(np.max(self.r0[1:])) if len(self.r0) > 1 else 0.0

    def kernel_bond_fn(self, r2, btype):
        """bond_fn with select-based coefficients for the grid kernel
        (a table gather over ~1e8-element pair blocks would dominate)."""
        dt = r2.dtype
        nt = len(self.k) - 1

        def sel(table):
            if nt == 1:
                return jnp.asarray(float(table[1]), dt)
            out = jnp.zeros((), dt)
            for t in range(1, nt + 1):
                out = out + jnp.where(btype == t,
                                      jnp.asarray(float(table[t]), dt), 0.0)
            return out

        k, r0 = sel(self.k), sel(self.r0)
        eps, sig = sel(self.epsilon), sel(self.sigma)
        r0sq = r0 * r0
        rlogarg = jnp.maximum(1.0 - r2 / r0sq, 0.1)
        fbond = -k / rlogarg
        ebond = -0.5 * k * r0sq * jnp.log(rlogarg)
        sr2 = sig * sig / r2
        sr6 = sr2 * sr2 * sr2
        inside = r2 < jnp.power(2.0, 1.0 / 3.0) * sig * sig
        fbond = fbond + jnp.where(inside,
                                  48.0 * eps * sr6 * (sr6 - 0.5) / r2, 0.0)
        ebond = ebond + jnp.where(inside,
                                  4.0 * eps * sr6 * (sr6 - 1.0) + eps, 0.0)
        return fbond, ebond


def _mi(d, box):
    return minimum_image(d, box)


def _virial6(pairs):
    """Sum of outer-product terms: pairs = [(rvec (N,P,3), fvec (N,P,3)), ...]
    each already masked. Returns (6,)."""
    acc = None
    for r, f in pairs:
        v = jnp.stack([
            jnp.sum(r[..., 0] * f[..., 0]), jnp.sum(r[..., 1] * f[..., 1]),
            jnp.sum(r[..., 2] * f[..., 2]), jnp.sum(r[..., 0] * f[..., 1]),
            jnp.sum(r[..., 0] * f[..., 2]), jnp.sum(r[..., 1] * f[..., 2]),
        ])
        acc = v if acc is None else acc + v
    return acc


class TupleStyle(BondedStyle):
    """Shared i-centric driver for angle/dihedral/improper styles.

    Each tuple is evaluated once per member atom (energy/virial scaled by
    1/arity); only the member's own force lands in its row — scatter-free.
    """

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, **kw):
        """xs: list of arity (N,P,3) member positions.
        Returns (forces [arity x (N,P,3)], edict_per_tuple or None,
        virial_pairs or None, extra (f_extra, edict_extra) or None)."""
        raise NotImplementedError

    def compute(self, s, ctx, eflag: bool, vflag: bool, consts=None):
        inc = consts if consts is not None else self.device_incidence()
        idx_j, typ_j, role_j, mask_j = inc
        xs = [s.x[idx_j[:, :, r]] for r in range(self.arity)]
        return self.reduce_from_xs(xs, typ_j, role_j, mask_j, s.box, ctx,
                                   eflag, vflag, s=s, idx=idx_j)

    def reduce_from_xs(self, xs, typ_j, role_j, mask_j, box, ctx,
                       eflag, vflag, s=None, idx=None,
                       member_type=None, member_q=None):
        """Tally from member positions directly — shared by the
        incidence-gather path and the grid tag-matched path (which has
        no global indices: member_type/member_q replace s.type[idx])."""
        flist, ed, vpairs, extra = self.tuple_terms(
            xs, typ_j, box, ctx, eflag, vflag, s=s, idx=idx, mask=mask_j,
            role=role_j, member_type=member_type, member_q=member_q)
        # select this atom's own force by role
        f_own = jnp.zeros_like(xs[0])
        for r in range(self.arity):
            f_own = jnp.where((role_j == r)[..., None], flist[r], f_own)
        f_own = jnp.where(mask_j[..., None], f_own, 0)
        f = jnp.sum(f_own, axis=1)
        inv = 1.0 / self.arity
        if eflag == "atom":
            etup = sum(ed.values()) if ed else jnp.zeros_like(typ_j, xs[0].dtype)
            eatom = inv * jnp.sum(jnp.where(mask_j, etup, 0), axis=1)
            vatom = jnp.zeros(xs[0].shape[:1] + (6,), xs[0].dtype)
            if vpairs is not None:
                m3 = mask_j[..., None]
                for rvec, fvec in vpairs:
                    rv = jnp.where(m3, rvec, 0)
                    fv = jnp.where(m3, fvec, 0)
                    vatom = vatom + inv * jnp.stack([
                        jnp.sum(rv[..., 0] * fv[..., 0], axis=1),
                        jnp.sum(rv[..., 1] * fv[..., 1], axis=1),
                        jnp.sum(rv[..., 2] * fv[..., 2], axis=1),
                        jnp.sum(rv[..., 0] * fv[..., 1], axis=1),
                        jnp.sum(rv[..., 0] * fv[..., 2], axis=1),
                        jnp.sum(rv[..., 1] * fv[..., 2], axis=1),
                    ], axis=1)
            return None, eatom, vatom
        edict = None
        if eflag and ed is not None:
            edict = {k: inv * jnp.sum(jnp.where(mask_j, v, 0))
                     for k, v in ed.items()}
        virial = None
        if vflag and vpairs is not None:
            m3 = mask_j[..., None]
            virial = inv * _virial6(
                [(jnp.where(m3, r, 0), jnp.where(m3, fv, 0))
                 for r, fv in vpairs])
        if extra is not None:
            fx, ex, vx = extra
            f = f + fx
            if eflag and ex:
                edict = {**(edict or {}), **ex}
            if vflag and vx is not None:
                virial = (virial if virial is not None else 0) + vx
        return f, edict, virial


class AngleStyle(TupleStyle):
    arity = 3
    kind = "angle"
    energy_key = "eangle"


@register_bonded("angle", "harmonic")
class AngleHarmonic(AngleStyle):
    """E = K (theta - theta0)^2 (src/angle_harmonic.cpp)."""

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.theta0 = np.zeros(ntypes + 1)  # stored in radians

    def coeff(self, atype, k, theta0_deg):
        self.k[atype] = k
        self.theta0[atype] = theta0_deg * np.pi / 180.0

    def equilibrium_angle(self, atype):
        # Angle::equilibrium_angle (radians) for tip4p geometry
        return float(self.theta0[atype])

    k_ub = None

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        dt_ = xs[0].dtype
        x1, x2, x3 = xs
        d1 = _mi(x1 - x2, box)
        d2 = _mi(x3 - x2, box)
        rsq1 = jnp.sum(d1 * d1, -1)
        rsq2 = jnp.sum(d2 * d2, -1)
        r1 = jnp.sqrt(jnp.maximum(rsq1, 1e-30))
        r2 = jnp.sqrt(jnp.maximum(rsq2, 1e-30))
        k = jnp.asarray(self.k, dt_)[ttype]
        th0 = jnp.asarray(self.theta0, dt_)[ttype]
        c = jnp.sum(d1 * d2, -1) / (r1 * r2)
        c = jnp.clip(c, -1.0, 1.0)
        SMALL = 0.001
        sinv = 1.0 / jnp.maximum(jnp.sqrt(1.0 - c * c), SMALL)
        dtheta = jnp.arccos(c) - th0
        tk = k * dtheta
        e = tk * dtheta
        a = -2.0 * tk * sinv
        a11 = a * c / rsq1
        a12 = -a / (r1 * r2)
        a22 = a * c / rsq2
        f1 = a11[..., None] * d1 + a12[..., None] * d2
        f3 = a22[..., None] * d2 + a12[..., None] * d1
        # optional Urey-Bradley 1-3 term (angle charmm)
        if self.k_ub is not None:
            dub = _mi(x3 - x1, box)
            rub = jnp.sqrt(jnp.maximum(jnp.sum(dub * dub, -1), 1e-30))
            kub = jnp.asarray(self.k_ub, dt_)[ttype]
            rub0 = jnp.asarray(self.r_ub, dt_)[ttype]
            drub = rub - rub0
            rkub = kub * drub
            forceUB = -2.0 * rkub / rub
            e = e + rkub * drub
            f1 = f1 - dub * forceUB[..., None]
            f3 = f3 + dub * forceUB[..., None]
        f2 = -(f1 + f3)
        ed = {self.energy_key: e} if eflag else None
        vp = [(d1, f1), (d2, f3)] if vflag else None
        return [f1, f2, f3], ed, vp, None


@register_bonded("angle", "charmm")
class AngleCharmm(AngleHarmonic):
    """CHARMM angle: harmonic + Urey-Bradley 1-3 spring
    (src/MOLECULE/angle_charmm.cpp)."""

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k_ub = np.zeros(ntypes + 1)
        self.r_ub = np.zeros(ntypes + 1)

    def coeff(self, atype, k, theta0_deg, k_ub=0.0, r_ub=0.0):
        super().coeff(atype, k, theta0_deg)
        self.k_ub[atype] = k_ub
        self.r_ub[atype] = r_ub


class DihedralStyle(TupleStyle):
    arity = 4
    kind = "dihedral"
    energy_key = "edihed"


def _dihedral_geometry(xs, box):
    """Shared CHARMM/harmonic dihedral geometry (dihedral_charmm.cpp)."""
    x1, x2, x3, x4 = xs
    vb1 = _mi(x1 - x2, box)
    vb2 = _mi(x3 - x2, box)
    vb2m = -vb2
    vb3 = _mi(x4 - x3, box)
    a = jnp.cross(vb1, vb2m)
    b = jnp.cross(vb3, vb2m)
    rasq = jnp.sum(a * a, -1)
    rbsq = jnp.sum(b * b, -1)
    rgsq = jnp.sum(vb2m * vb2m, -1)
    rg = jnp.sqrt(rgsq)
    rginv = jnp.where(rg > 0, 1.0 / jnp.maximum(rg, 1e-30), 0.0)
    ra2inv = jnp.where(rasq > 0, 1.0 / jnp.maximum(rasq, 1e-30), 0.0)
    rb2inv = jnp.where(rbsq > 0, 1.0 / jnp.maximum(rbsq, 1e-30), 0.0)
    rabinv = jnp.sqrt(ra2inv * rb2inv)
    c = jnp.clip(jnp.sum(a * b, -1) * rabinv, -1.0, 1.0)
    s = rg * rabinv * jnp.sum(a * vb3, -1)
    return vb1, vb2, vb2m, vb3, a, b, rg, rginv, ra2inv, rb2inv, c, s


def _dihedral_forces(vb1, vb2m, vb3, a, b, rg, rginv, ra2inv, rb2inv, df):
    fg = jnp.sum(vb1 * vb2m, -1)
    hg = jnp.sum(vb3 * vb2m, -1)
    fga = fg * ra2inv * rginv
    hgb = hg * rb2inv * rginv
    gaa = -ra2inv * rg
    gbb = rb2inv * rg
    dtf = gaa[..., None] * a
    dtg = fga[..., None] * a - hgb[..., None] * b
    dth = gbb[..., None] * b
    f1 = df[..., None] * dtf
    s2 = df[..., None] * dtg
    f2 = s2 - f1
    f4 = df[..., None] * dth
    f3 = -s2 - f4
    return f1, f2, f3, f4


@register_bonded("dihedral", "harmonic")
class DihedralHarmonic(DihedralStyle):
    """E = K[1 + d cos(n phi)] (src/dihedral_harmonic.cpp)."""

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.sign = np.zeros(ntypes + 1)
        self.mult = np.zeros(ntypes + 1, dtype=np.int32)

    def coeff(self, dtype_, k, d, n):
        self.k[dtype_] = k
        self.sign[dtype_] = d
        self.mult[dtype_] = int(n)

    def _shifts(self):
        # cos_shift/sin_shift: for harmonic, shift angle is 0 or pi by sign
        cos_shift = np.where(self.sign >= 0, 1.0, -1.0)
        sin_shift = np.zeros_like(cos_shift)
        return cos_shift, sin_shift

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        dt_ = xs[0].dtype
        (vb1, vb2, vb2m, vb3, a, b, rg, rginv,
         ra2inv, rb2inv, c, sv) = _dihedral_geometry(xs, box)
        kk = jnp.asarray(self.k, dt_)[ttype]
        cos_sh, sin_sh = self._shifts()
        cos_sh = jnp.asarray(cos_sh, dt_)[ttype]
        sin_sh = jnp.asarray(sin_sh, dt_)[ttype]
        mult = jnp.asarray(self.mult)[ttype]

        mmax = int(self.mult.max()) if self.mult.size else 0
        p = jnp.ones_like(c)
        df1 = jnp.zeros_like(c)
        ddf1 = jnp.zeros_like(c)
        for i in range(mmax):
            do = i < mult
            ddf1_n = p * c - df1 * sv
            df1_n = p * sv + df1 * c
            ddf1 = jnp.where(do, ddf1_n, ddf1)
            df1 = jnp.where(do, df1_n, df1)
            p = jnp.where(do, ddf1_n, p)
        p_out = p * cos_sh + df1 * sin_sh
        df_out = (df1 * cos_sh - ddf1 * sin_sh) * (-mult)
        p_out = p_out + 1.0
        zero_m = mult == 0
        p_out = jnp.where(zero_m, 1.0 + cos_sh, p_out)
        df_out = jnp.where(zero_m, 0.0, df_out)

        e = kk * p_out
        df = -kk * df_out
        f1, f2, f3, f4 = _dihedral_forces(vb1, vb2m, vb3, a, b, rg, rginv,
                                          ra2inv, rb2inv, df)
        ed = {self.energy_key: e} if eflag else None
        vp = None
        if vflag:
            vp = [(vb1, f1), (vb2, f3), (vb3 + vb2, f4)]
        return [f1, f2, f3, f4], ed, vp, None


@register_bonded("dihedral", "charmm")
class DihedralCharmm(DihedralHarmonic):
    """CHARMM dihedral: K[1+cos(n phi - d)] + weighted 1-4 LJ/Coulomb
    (src/MOLECULE/dihedral_charmm.cpp).  The 1-4 pair energies/virial are
    tallied as PAIR energies, exactly as the reference does."""

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.weight = np.zeros(ntypes + 1)
        self.shift_deg = np.zeros(ntypes + 1)

    def coeff(self, dtype_, k, n, d_deg, weight):
        self.k[dtype_] = k
        self.mult[dtype_] = int(n)
        self.shift_deg[dtype_] = d_deg
        self.weight[dtype_] = weight

    def _shifts(self):
        rad = self.shift_deg * np.pi / 180.0
        return np.cos(rad), np.sin(rad)

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        flist, ed, vp, _ = super().tuple_terms(
            xs, ttype, box, ctx, eflag, vflag, s=s, idx=idx, mask=mask)
        # ---- 1-4 nonbonded term between atoms 1 and 4 -------------------
        dt_ = xs[0].dtype
        w = jnp.asarray(self.weight, dt_)[ttype]
        pair = ctx.pair
        lj14_1 = jnp.asarray(pair.lj14_1, dt_)
        lj14_2 = jnp.asarray(pair.lj14_2, dt_)
        lj14_3 = jnp.asarray(pair.lj14_3, dt_)
        lj14_4 = jnp.asarray(pair.lj14_4, dt_)
        mt = kw.get("member_type")
        mq = kw.get("member_q")
        if mt is not None:
            # grid tag-matched path: member type/charge matched alongside
            # positions (no global indices exist)
            it, jt = mt[:, :, 0], mt[:, :, 3]
            q1, q4 = mq[:, :, 0], mq[:, :, 3]
        else:
            it = s.type[idx[:, :, 0]]
            jt = s.type[idx[:, :, 3]]
            q1 = s.q[idx[:, :, 0]]
            q4 = s.q[idx[:, :, 3]]
        d14 = _mi(xs[0] - xs[3], box)
        rsq = jnp.sum(d14 * d14, -1)
        r2inv = 1.0 / jnp.maximum(rsq, 1e-30)
        r6inv = r2inv * r2inv * r2inv
        qqrd2e = ctx.units.qqr2e
        forcecoul = qqrd2e * q1 * q4 * jnp.sqrt(r2inv)
        forcelj = r6inv * (lj14_1[it, jt] * r6inv - lj14_2[it, jt])
        act = (w > 0) & mask
        fpair = jnp.where(act, w * (forcelj + forcecoul) * r2inv, 0.0)
        # only the tuple-member's own share: i gets +, l gets -; each tuple
        # is seen arity(4) times, so scale by 1/4... but only roles 0 and 3
        # receive force; replicate by masking role outside — here we add the
        # full pair force once per tuple with 1/arity weighting via role
        # selection in the caller is NOT applied to `extra`, so divide by
        # the number of times each (role0/role3) row sees this tuple: each
        # tuple appears in exactly 4 rows, roles 0..3; rows with role 0 add
        # +f, role 3 add -f, others 0 => no double counting.
        sign = jnp.where(role == 0, 1.0, jnp.where(role == 3, -1.0, 0.0))
        fx = jnp.sum(sign[..., None] * fpair[..., None] * d14, axis=1)
        exd = None
        vx = None
        if eflag:
            ecoul14 = jnp.where(act, w * qqrd2e * q1 * q4 * jnp.sqrt(r2inv), 0)
            evdwl14 = jnp.where(
                act, w * r6inv * (lj14_3[it, jt] * r6inv - lj14_4[it, jt]), 0)
            exd = {"ecoul": 0.25 * jnp.sum(ecoul14),
                   "evdwl": 0.25 * jnp.sum(evdwl14)}
        if vflag:
            m3 = jnp.broadcast_to(fpair[..., None] != 0, d14.shape)
            fv = fpair[..., None] * d14
            vx = 0.25 * _virial6([(d14, fv)])
        return flist, ed, vp, (fx, exd, vx)


class ImproperStyle(TupleStyle):
    arity = 4
    kind = "improper"
    energy_key = "eimp"


@register_bonded("improper", "harmonic")
class ImproperHarmonic(ImproperStyle):
    """E = K (chi - chi0)^2 (src/MOLECULE/improper_harmonic.cpp)."""

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.chi = np.zeros(ntypes + 1)

    def coeff(self, itype, k, chi_deg):
        self.k[itype] = k
        self.chi[itype] = chi_deg * np.pi / 180.0

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        dt_ = xs[0].dtype
        x1, x2, x3, x4 = xs
        vb1 = _mi(x1 - x2, box)
        vb2 = _mi(x3 - x2, box)
        vb3 = _mi(x4 - x3, box)
        ss1 = 1.0 / jnp.maximum(jnp.sum(vb1 * vb1, -1), 1e-30)
        ss2 = 1.0 / jnp.maximum(jnp.sum(vb2 * vb2, -1), 1e-30)
        ss3 = 1.0 / jnp.maximum(jnp.sum(vb3 * vb3, -1), 1e-30)
        r1 = jnp.sqrt(ss1)
        r2 = jnp.sqrt(ss2)
        r3 = jnp.sqrt(ss3)
        c0 = jnp.sum(vb1 * vb3, -1) * r1 * r3
        c1 = jnp.sum(vb1 * vb2, -1) * r1 * r2
        c2 = -jnp.sum(vb3 * vb2, -1) * r3 * r2
        SMALL = 0.001
        s1 = 1.0 / jnp.maximum(1.0 - c1 * c1, SMALL)
        s2 = 1.0 / jnp.maximum(1.0 - c2 * c2, SMALL)
        s12 = jnp.sqrt(s1 * s2)
        c = jnp.clip((c1 * c2 + c0) * s12, -1.0, 1.0)
        sth = jnp.maximum(jnp.sqrt(1.0 - c * c), SMALL)
        kk = jnp.asarray(self.k, dt_)[ttype]
        chi0 = jnp.asarray(self.chi, dt_)[ttype]
        domega = jnp.arccos(c) - chi0
        aa = kk * domega
        e = aa * domega
        aa = -aa * 2.0 / sth
        cc = c * aa
        s12a = s12 * aa
        a11 = cc * ss1 * s1
        a22 = -ss2 * (2.0 * c0 * s12a - cc * (s1 + s2))
        a33 = cc * ss3 * s2
        a12 = -r1 * r2 * (c1 * cc * s1 + c2 * s12a)
        a13 = -r1 * r3 * s12a
        a23 = r2 * r3 * (c2 * cc * s2 + c1 * s12a)
        sx2 = (a22[..., None] * vb2 + a23[..., None] * vb3
               + a12[..., None] * vb1)
        f1 = (a12[..., None] * vb2 + a13[..., None] * vb3
              + a11[..., None] * vb1)
        f2 = -sx2 - f1
        f4 = (a23[..., None] * vb2 + a33[..., None] * vb3
              + a13[..., None] * vb3 * 0 + a13[..., None] * vb1 * 0
              + a13[..., None] * vb3 * 0)
        # reference: f4 = a23*vb2 + a33*vb3 + a13*vb1
        f4 = (a23[..., None] * vb2 + a33[..., None] * vb3
              + a13[..., None] * vb1)
        f3 = sx2 - f4
        ed = {self.energy_key: e} if eflag else None
        vp = [(vb1, f1), (vb2, f3), (vb3 + vb2, f4)] if vflag else None
        return [f1, f2, f3, f4], ed, vp, None


@register_bonded("bond", "morse")
class BondMorse(BondStyle):
    """E = D (1 - exp(-a(r-r0)))^2 (src/MOLECULE/bond_morse.cpp)."""

    name = "morse"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.d0 = np.zeros(ntypes + 1)
        self.alpha = np.zeros(ntypes + 1)
        self.r0 = np.zeros(ntypes + 1)

    def coeff(self, btype, d0, alpha, r0):
        self.d0[btype] = d0
        self.alpha[btype] = alpha
        self.r0[btype] = r0

    def bond_fn(self, r2, btype):
        dt = r2.dtype
        d0 = jnp.asarray(self.d0, dt)[btype]
        al = jnp.asarray(self.alpha, dt)[btype]
        r0 = jnp.asarray(self.r0, dt)[btype]
        r = jnp.sqrt(r2)
        ralpha = jnp.exp(-al * (r - r0))
        fbond = jnp.where(r > 0, -2.0 * d0 * al * (1 - ralpha) * ralpha / r,
                          0.0)
        return fbond, d0 * (1 - ralpha) ** 2


@register_bonded("bond", "gromos")
class BondGromos(BondStyle):
    """E = 0.25 K (r^2 - r0^2)^2 (src/MOLECULE/bond_gromos.cpp)."""

    name = "gromos"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.r0 = np.zeros(ntypes + 1)

    def coeff(self, btype, k, r0):
        self.k[btype] = k
        self.r0[btype] = r0

    def bond_fn(self, r2, btype):
        dt = r2.dtype
        k = jnp.asarray(self.k, dt)[btype]
        r0 = jnp.asarray(self.r0, dt)[btype]
        dr = r2 - r0 * r0
        return -2.0 * k * dr, 0.25 * k * dr * dr


@register_bonded("angle", "cosine/squared")
class AngleCosineSquared(AngleStyle):
    """E = K (cos theta - cos theta0)^2
    (src/MOLECULE/angle_cosine_squared.cpp)."""

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.theta0 = np.zeros(ntypes + 1)

    def coeff(self, atype, k, theta0_deg):
        self.k[atype] = k
        self.theta0[atype] = theta0_deg * np.pi / 180.0

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        dt_ = xs[0].dtype
        x1, x2, x3 = xs
        d1 = _mi(x1 - x2, box)
        d2 = _mi(x3 - x2, box)
        rsq1 = jnp.sum(d1 * d1, -1)
        rsq2 = jnp.sum(d2 * d2, -1)
        r1 = jnp.sqrt(jnp.maximum(rsq1, 1e-30))
        r2 = jnp.sqrt(jnp.maximum(rsq2, 1e-30))
        k = jnp.asarray(self.k, dt_)[ttype]
        th0 = jnp.asarray(self.theta0, dt_)[ttype]
        c = jnp.clip(jnp.sum(d1 * d2, -1) / (r1 * r2), -1.0, 1.0)
        dcostheta = c - jnp.cos(th0)
        tk = k * dcostheta
        e = tk * dcostheta
        a = 2.0 * tk
        a11 = a * c / rsq1
        a12 = -a / (r1 * r2)
        a22 = a * c / rsq2
        f1 = a11[..., None] * d1 + a12[..., None] * d2
        f3 = a22[..., None] * d2 + a12[..., None] * d1
        f2 = -(f1 + f3)
        ed = {self.energy_key: e} if eflag else None
        vp = [(d1, f1), (d2, f3)] if vflag else None
        return [f1, f2, f3], ed, vp, None


@register_bonded("bond", "fene/expand")
class BondFENEExpand(BondStyle):
    """FENE with a shift delta: the spring and LJ act on r - delta
    (src/MOLECULE/bond_fene_expand.cpp)."""

    name = "fene/expand"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.r0 = np.zeros(ntypes + 1)
        self.epsilon = np.zeros(ntypes + 1)
        self.sigma = np.zeros(ntypes + 1)
        self.shift = np.zeros(ntypes + 1)

    def coeff(self, btype, k, r0, epsilon, sigma, shift):
        self.k[btype] = k
        self.r0[btype] = r0
        self.epsilon[btype] = epsilon
        self.sigma[btype] = sigma
        self.shift[btype] = shift

    def bond_fn(self, r2, btype):
        dt = r2.dtype
        k = jnp.asarray(self.k, dt)[btype]
        r0 = jnp.asarray(self.r0, dt)[btype]
        eps = jnp.asarray(self.epsilon, dt)[btype]
        sig = jnp.asarray(self.sigma, dt)[btype]
        sh = jnp.asarray(self.shift, dt)[btype]
        r = jnp.sqrt(r2)
        rshift = r - sh
        rshiftsq = rshift * rshift
        r0sq = r0 * r0
        rlogarg = jnp.maximum(1.0 - rshiftsq / r0sq, 0.1)
        rs = jnp.maximum(r, 1e-30)
        fbond = -k * rshift / rlogarg / rs
        ebond = -0.5 * k * r0sq * jnp.log(rlogarg)
        sr2 = sig * sig / jnp.maximum(rshiftsq, 1e-30)
        sr6 = sr2 * sr2 * sr2
        inside = rshiftsq < jnp.power(2.0, 1.0 / 3.0) * sig * sig
        fbond = fbond + jnp.where(
            inside, 48.0 * eps * sr6 * (sr6 - 0.5)
            / jnp.where(rshift == 0, 1.0, rshift) / rs, 0.0)
        ebond = ebond + jnp.where(
            inside, 4.0 * eps * sr6 * (sr6 - 1.0) + eps, 0.0)
        return fbond, ebond


@register_bonded("bond", "zero")
class BondZero(BondStyle):
    """Topology-only placeholder (src/bond_zero.cpp)."""

    name = "zero"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.r0 = np.zeros(ntypes + 1)  # for shake compatibility

    def coeff(self, btype, *vals):
        if vals:
            self.r0[btype] = vals[0]

    def bond_fn(self, r2, btype):
        z = jnp.zeros_like(r2)
        return z, z


@register_bonded("angle", "zero")
class AngleZero(AngleStyle):
    """Topology-only placeholder (src/angle_zero.cpp)."""

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.theta0 = np.zeros(ntypes + 1)

    def coeff(self, atype, *vals):
        if vals:
            self.theta0[atype] = float(vals[0]) * np.pi / 180.0

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        z3 = [jnp.zeros_like(xs[0])] * 3
        e = jnp.zeros(xs[0].shape[:-1], xs[0].dtype)
        ed = {self.energy_key: e} if eflag else None
        vp = [(xs[0], z3[0])] if vflag else None
        return z3, ed, vp, None


# ------------------------------------------------------------------ sbs
# the reference's second dihedral formulation (opls/multi-harmonic/cvff):
# two bond angles (c1mag, c2mag) + their sines, assembled via a11..a23
# (src/MOLECULE/dihedral_opls.cpp:120-210)

_SBS_SMALL = 0.001


def _sbs_geometry(xs, box):
    x1, x2, x3, x4 = xs
    vb1 = _mi(x1 - x2, box)
    vb2 = _mi(x3 - x2, box)
    vb2m = -vb2
    vb3 = _mi(x4 - x3, box)
    dot = lambda a, b: jnp.sum(a * b, -1)  # noqa: E731
    sb1 = 1.0 / jnp.maximum(dot(vb1, vb1), 1e-30)
    sb2 = 1.0 / jnp.maximum(dot(vb2, vb2), 1e-30)
    sb3 = 1.0 / jnp.maximum(dot(vb3, vb3), 1e-30)
    rb1 = jnp.sqrt(sb1)
    rb3 = jnp.sqrt(sb3)
    c0 = dot(vb1, vb3) * rb1 * rb3
    b1mag = jnp.sqrt(dot(vb1, vb1))
    b2mag = jnp.sqrt(dot(vb2, vb2))
    b3mag = jnp.sqrt(dot(vb3, vb3))
    r12c1 = 1.0 / jnp.maximum(b1mag * b2mag, 1e-30)
    c1mag = dot(vb1, vb2) * r12c1
    r12c2 = 1.0 / jnp.maximum(b2mag * b3mag, 1e-30)
    c2mag = dot(vb2m, vb3) * r12c2
    sc1 = jnp.sqrt(jnp.maximum(1.0 - c1mag * c1mag, 0.0))
    sc1 = 1.0 / jnp.maximum(sc1, _SBS_SMALL)
    sc2 = jnp.sqrt(jnp.maximum(1.0 - c2mag * c2mag, 0.0))
    sc2 = 1.0 / jnp.maximum(sc2, _SBS_SMALL)
    s1 = sc1 * sc1
    s2 = sc2 * sc2
    s12 = sc1 * sc2
    c = jnp.clip((c0 + c1mag * c2mag) * s12, -1.0, 1.0)
    return (vb1, vb2, vb2m, vb3, sb1, sb2, sb3, rb1, rb3, c0,
            r12c1, r12c2, c1mag, c2mag, s1, s2, s12, c)


def _sbs_forces(geo, a):
    """Force assembly given a = dE/dc (dihedral_opls.cpp:183-210)."""
    (vb1, vb2, vb2m, vb3, sb1, sb2, sb3, rb1, rb3, c0,
     r12c1, r12c2, c1mag, c2mag, s1, s2, s12, c) = geo
    c = c * a
    s12 = s12 * a
    a11 = c * sb1 * s1
    a22 = -sb2 * (2.0 * c0 * s12 - c * (s1 + s2))
    a33 = c * sb3 * s2
    a12 = -r12c1 * (c1mag * c * s1 + c2mag * s12)
    a13 = -rb1 * rb3 * s12
    a23 = r12c2 * (c2mag * c * s2 + c1mag * s12)
    sx2 = (a12[..., None] * vb1 + a22[..., None] * vb2
           + a23[..., None] * vb3)
    f1 = a11[..., None] * vb1 + a12[..., None] * vb2 + a13[..., None] * vb3
    f2 = -sx2 - f1
    f4 = a13[..., None] * vb1 + a23[..., None] * vb2 + a33[..., None] * vb3
    f3 = sx2 - f4
    return f1, f2, f3, f4


@register_bonded("dihedral", "opls")
class DihedralOPLS(DihedralStyle):
    """OPLS: E = 1/2[K1(1+cos p) + K2(1-cos 2p) + K3(1+cos 3p)
    + K4(1-cos 4p)] (src/MOLECULE/dihedral_opls.cpp; the 1/2 is folded
    into the stored coefficients per coeff :282)."""

    _SMALLER = 0.00001

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros((4, ntypes + 1))

    def coeff(self, dtype_, k1, k2, k3, k4):
        self.k[:, dtype_] = 0.5 * np.array([k1, k2, k3, k4])

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        dt_ = xs[0].dtype
        geo = _sbs_geometry(xs, box)
        c = geo[-1]
        k1 = jnp.asarray(self.k[0], dt_)[ttype]
        k2 = jnp.asarray(self.k[1], dt_)[ttype]
        k3 = jnp.asarray(self.k[2], dt_)[ttype]
        k4 = jnp.asarray(self.k[3], dt_)[ttype]
        phi = jnp.arccos(c)
        si = jnp.sin(phi)
        si = jnp.where(jnp.abs(si) < self._SMALLER, self._SMALLER, si)
        siinv = 1.0 / si
        p = (k1 * (1.0 + c) + k2 * (1.0 - jnp.cos(2.0 * phi))
             + k3 * (1.0 + jnp.cos(3.0 * phi))
             + k4 * (1.0 - jnp.cos(4.0 * phi)))
        pd = (k1 - 2.0 * k2 * jnp.sin(2.0 * phi) * siinv
              + 3.0 * k3 * jnp.sin(3.0 * phi) * siinv
              - 4.0 * k4 * jnp.sin(4.0 * phi) * siinv)
        f1, f2, f3, f4 = _sbs_forces(geo, pd)
        vb1, vb2, vb3 = geo[0], geo[1], geo[3]
        ed = {self.energy_key: p} if eflag else None
        vp = [(vb1, f1), (vb2, f3), (vb3 + vb2, f4)] if vflag else None
        return [f1, f2, f3, f4], ed, vp, None


@register_bonded("dihedral", "multi/harmonic")
class DihedralMultiHarmonic(DihedralStyle):
    """E = sum_{n=1..5} A_n cos^{n-1}(phi)
    (src/MOLECULE/dihedral_multi_harmonic.cpp:160-178)."""

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.a = np.zeros((5, ntypes + 1))

    def coeff(self, dtype_, a1, a2, a3, a4, a5):
        self.a[:, dtype_] = (a1, a2, a3, a4, a5)

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        dt_ = xs[0].dtype
        geo = _sbs_geometry(xs, box)
        c = geo[-1]
        a1 = jnp.asarray(self.a[0], dt_)[ttype]
        a2 = jnp.asarray(self.a[1], dt_)[ttype]
        a3 = jnp.asarray(self.a[2], dt_)[ttype]
        a4 = jnp.asarray(self.a[3], dt_)[ttype]
        a5 = jnp.asarray(self.a[4], dt_)[ttype]
        p = a1 + c * (a2 + c * (a3 + c * (a4 + c * a5)))
        pd = a2 + c * (2.0 * a3 + c * (3.0 * a4 + c * 4.0 * a5))
        f1, f2, f3, f4 = _sbs_forces(geo, pd)
        vb1, vb2, vb3 = geo[0], geo[1], geo[3]
        ed = {self.energy_key: p} if eflag else None
        vp = [(vb1, f1), (vb2, f3), (vb3 + vb2, f4)] if vflag else None
        return [f1, f2, f3, f4], ed, vp, None


@register_bonded("dihedral", "zero")
class DihedralZero(DihedralStyle):
    """Topology-only placeholder (src/dihedral_zero.cpp)."""

    def coeff(self, dtype_, *vals):
        pass

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        z = [jnp.zeros_like(xs[0])] * 4
        e = jnp.zeros(xs[0].shape[:-1], xs[0].dtype)
        ed = {self.energy_key: e} if eflag else None
        vp = [(xs[0], z[0])] if vflag else None
        return z, ed, vp, None


@register_bonded("improper", "cvff")
class ImproperCVFF(ImproperStyle):
    """E = K[1 + d cos(n omega)] on the dihedral-like improper angle
    (src/MOLECULE/improper_cvff.cpp:155-230)."""

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.sign = np.zeros(ntypes + 1)
        self.mult = np.zeros(ntypes + 1, dtype=np.int32)

    def coeff(self, itype, k, d, n):
        self.k[itype] = k
        self.sign[itype] = d
        self.mult[itype] = int(n)

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        dt_ = xs[0].dtype
        geo = _sbs_geometry(xs, box)
        c = geo[-1]
        k = jnp.asarray(self.k, dt_)[ttype]
        sign = jnp.asarray(self.sign, dt_)[ttype]
        m = jnp.asarray(self.mult)[ttype]
        rc2 = c * c
        # p = 1 +/- cos(n*omega), pd = dp/dc / 2, per multiplicity
        p_tab = [2.0 * jnp.ones_like(c),                       # m=0
                 c + 1.0,                                      # m=1
                 2.0 * rc2,                                    # m=2
                 (4.0 * rc2 - 3.0) * c + 1.0,                  # m=3
                 8.0 * (rc2 - 1.0) * rc2 + 2.0,                # m=4
                 ((16.0 * rc2 - 20.0) * rc2 + 5.0) * c + 1.0,  # m=5
                 ((32.0 * rc2 - 48.0) * rc2 + 18.0) * rc2]     # m=6
        pd_tab = [jnp.zeros_like(c),
                  0.5 * jnp.ones_like(c),
                  2.0 * c,
                  6.0 * rc2 - 1.5,
                  (16.0 * rc2 - 8.0) * c,
                  (40.0 * rc2 - 30.0) * rc2 + 2.5,
                  (96.0 * (rc2 - 1.0) * rc2 + 18.0) * c]
        p = jnp.zeros_like(c)
        pd = jnp.zeros_like(c)
        for mm in range(7):
            p = jnp.where(m == mm, p_tab[mm], p)
            pd = jnp.where(m == mm, pd_tab[mm], pd)
        neg = sign < 0
        p = jnp.where(neg, 2.0 - p, p)
        pd = jnp.where(neg, -pd, pd)
        e = k * p
        f1, f2, f3, f4 = _sbs_forces(geo, 2.0 * k * pd)
        vb1, vb2, vb3 = geo[0], geo[1], geo[3]
        ed = {self.energy_key: e} if eflag else None
        vp = [(vb1, f1), (vb2, f3), (vb3 + vb2, f4)] if vflag else None
        return [f1, f2, f3, f4], ed, vp, None


@register_bonded("improper", "umbrella")
class ImproperUmbrella(ImproperStyle):
    """Wilson out-of-plane umbrella (DREIDING inversion),
    src/MOLECULE/improper_umbrella.cpp:40-240.  Atom 1 is the center;
    E = K(1-cos w) for w0=0 else 0.5 C (cos w - cos w0)^2."""

    _SMALL = 0.001

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.kw = np.zeros(ntypes + 1)
        self.w0 = np.zeros(ntypes + 1)
        self.C = np.zeros(ntypes + 1)

    def coeff(self, itype, k, w0_deg):
        w = w0_deg * np.pi / 180.0
        self.kw[itype] = k
        self.w0[itype] = w
        # C = k/sin(w0)^2 (coeff :269)
        self.C[itype] = k / (np.sin(w) ** 2) if w != 0.0 else k

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        dt_ = xs[0].dtype
        x1, x2, x3, x4 = xs
        vb1 = _mi(x2 - x1, box)
        vb2 = _mi(x3 - x1, box)
        vb3 = _mi(x4 - x1, box)
        dot = lambda a, b: jnp.sum(a * b, -1)  # noqa: E731
        a_v = jnp.cross(vb1, vb2)
        ra = jnp.maximum(jnp.sqrt(dot(a_v, a_v)), self._SMALL)
        rh = jnp.maximum(jnp.sqrt(dot(vb3, vb3)), self._SMALL)
        ar = a_v / ra[..., None]
        hr = vb3 / rh[..., None]
        c = jnp.clip(dot(ar, hr), -1.0, 1.0)
        sv = jnp.maximum(jnp.sqrt(1.0 - c * c), self._SMALL)
        cotphi = c / sv
        projhfg = (dot(vb3, vb1) / jnp.maximum(jnp.sqrt(dot(vb1, vb1)),
                                               1e-30)
                   + dot(vb3, vb2) / jnp.maximum(jnp.sqrt(dot(vb2, vb2)),
                                                 1e-30))
        flip = projhfg > 0.0
        sv = jnp.where(flip, -sv, sv)
        cotphi = jnp.where(flip, -cotphi, cotphi)

        kw = jnp.asarray(self.kw, dt_)[ttype]
        w0 = jnp.asarray(self.w0, dt_)[ttype]
        cc = jnp.asarray(self.C, dt_)[ttype]
        is_flat = w0 == 0.0
        domega = sv - jnp.cos(w0)
        a_half = 0.5 * cc * domega
        e = jnp.where(is_flat, kw * (1.0 - sv), a_half * domega)
        a = jnp.where(is_flat, -kw, 2.0 * a_half) * cotphi

        dha = hr - c[..., None] * ar
        dah = ar - c[..., None] * hr
        rar = (1.0 / ra)[..., None]
        rhr = (1.0 / rh)[..., None]
        f2 = jnp.cross(dha, vb1) * rar * a[..., None]
        f3 = -jnp.cross(dha, vb2) * rar * a[..., None]
        f4 = dah * rhr * a[..., None]
        f1 = -(f2 + f3 + f4)
        ed = {self.energy_key: e} if eflag else None
        # NOTE the reference applies f3 to atom i2 and f2 to atom i3
        # (:196-215) and tallies the virial on RE-computed standard
        # dihedral bond vectors with (f1, f2, f4) (:218-233)
        vp = None
        if vflag:
            vb1s = _mi(x1 - x2, box)
            vb2s = _mi(x3 - x2, box)
            vb3s = _mi(x4 - x3, box)
            vp = [(vb1s, f1), (vb2s, f2), (vb3s + vb2s, f4)]
        return [f1, f3, f2, f4], ed, vp, None


@register_bonded("improper", "zero")
class ImproperZero(ImproperStyle):
    """Topology-only placeholder (src/improper_zero.cpp)."""

    def coeff(self, itype, *vals):
        pass

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        z = [jnp.zeros_like(xs[0])] * 4
        e = jnp.zeros(xs[0].shape[:-1], xs[0].dtype)
        ed = {self.energy_key: e} if eflag else None
        vp = [(xs[0], z[0])] if vflag else None
        return z, ed, vp, None


# ------------------------------------------------------------------ hybrid
# per-kind hybrid multiplexers (src/bond_hybrid.cpp, angle_hybrid.cpp,
# dihedral_hybrid.cpp, improper_hybrid.cpp): each bonded type maps to one
# sub-style; coeff lines route by sub-style name.  Sub-styles evaluate on
# the full tuple set with a per-type activation mask (masked selects, the
# same trick as pair hybrid).

class _BondedHybridMixin:
    def _init_hybrid(self, ntypes, sub_names):
        from tpumd.models.registry import create_bonded_style
        self.sub_names = list(sub_names)
        self.subs = [create_bonded_style(self.kind, n, ntypes)
                     for n in self.sub_names]
        self.type_map = np.full(ntypes + 1, -1, dtype=np.int32)

    def coeff(self, btype, subname, *vals):
        subname = str(subname)
        if subname == "none":
            self.type_map[btype] = -1
            return
        k = self.sub_names.index(subname)
        self.type_map[btype] = k
        self.subs[k].coeff(btype, *[float(v) for v in vals])

    def init(self):
        for s in self.subs:
            s.units = getattr(self, "units", None)
            s.init()


@register_bonded("bond", "hybrid")
class BondHybrid(_BondedHybridMixin, BondStyle):
    """bond_style hybrid s1 s2 ... (src/bond_hybrid.cpp)."""

    name = "hybrid"

    def __init__(self, ntypes, sub_names=()):
        BondStyle.__init__(self, ntypes)
        self._init_hybrid(ntypes, sub_names)

    @property
    def r0(self):
        """Equilibrium distances merged from sub-styles (for shake)."""
        out = np.zeros(self.type_map.shape[0])
        for t, k in enumerate(self.type_map):
            if k >= 0 and hasattr(self.subs[k], "r0"):
                out[t] = self.subs[k].r0[t]
        return out

    def bond_fn(self, r2, btype):
        tm = jnp.asarray(self.type_map)[btype]
        fb = jnp.zeros_like(r2)
        eb = jnp.zeros_like(r2)
        for k, s in enumerate(self.subs):
            f_k, e_k = s.bond_fn(r2, btype)
            sel = tm == k
            fb = jnp.where(sel, f_k, fb)
            eb = jnp.where(sel, e_k, eb)
        return fb, eb


class _TupleHybrid(_BondedHybridMixin):
    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        tm = jnp.asarray(self.type_map)[ttype]
        fl = None
        ed_acc = None
        vp_acc = []
        extra = None
        for k, sub in enumerate(self.subs):
            sel = (tm == k)
            sel3 = sel[..., None]
            flist, ed, vp, ex = sub.tuple_terms(
                xs, ttype, box, ctx, eflag, vflag, s=s, idx=idx,
                mask=mask if mask is None else (mask & sel), role=role)
            flist = [jnp.where(sel3, f, 0.0) for f in flist]
            if fl is None:
                fl = flist
            else:
                fl = [a + b for a, b in zip(fl, flist)]
            if eflag and ed is not None:
                if ed_acc is None:
                    ed_acc = {}
                for key, v in ed.items():
                    v = jnp.where(sel, v, 0.0)
                    ed_acc[key] = ed_acc.get(key, 0.0) + v
            if vflag and vp is not None:
                vp_acc.extend((r, jnp.where(sel3, f, 0.0)) for r, f in vp)
            if ex is not None:
                extra = ex  # only charmm produces extras; rare in hybrids
        return fl, ed_acc, (vp_acc if vflag else None), extra


@register_bonded("angle", "hybrid")
class AngleHybrid(_TupleHybrid, AngleStyle):
    name = "hybrid"

    def __init__(self, ntypes, sub_names=()):
        AngleStyle.__init__(self, ntypes)
        self._init_hybrid(ntypes, sub_names)

    @property
    def theta0(self):
        out = np.zeros(self.type_map.shape[0])
        for t, k in enumerate(self.type_map):
            if k >= 0 and hasattr(self.subs[k], "theta0"):
                out[t] = self.subs[k].theta0[t]
        return out


@register_bonded("dihedral", "hybrid")
class DihedralHybrid(_TupleHybrid, DihedralStyle):
    name = "hybrid"

    def __init__(self, ntypes, sub_names=()):
        DihedralStyle.__init__(self, ntypes)
        self._init_hybrid(ntypes, sub_names)


@register_bonded("improper", "hybrid")
class ImproperHybrid(_TupleHybrid, ImproperStyle):
    name = "hybrid"

    def __init__(self, ntypes, sub_names=()):
        ImproperStyle.__init__(self, ntypes)
        self._init_hybrid(ntypes, sub_names)


@register_bonded("bond", "nonlinear")
class BondNonlinear(BondStyle):
    """E = eps dr^2 / (lambda^2 - dr^2)
    (src/EXTRA-MOLECULE/bond_nonlinear.cpp)."""

    name = "nonlinear"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.epsilon = np.zeros(ntypes + 1)
        self.r0 = np.zeros(ntypes + 1)
        self.lamda = np.zeros(ntypes + 1)

    def coeff(self, btype, epsilon, r0, lamda):
        self.epsilon[btype] = epsilon
        self.r0[btype] = r0
        self.lamda[btype] = lamda

    def equilibrium_distance(self, btype):
        return float(self.r0[btype])

    def bond_fn(self, r2, btype):
        dt = r2.dtype
        eps = jnp.asarray(self.epsilon, dt)[btype]
        r0 = jnp.asarray(self.r0, dt)[btype]
        lam = jnp.asarray(self.lamda, dt)[btype]
        r = jnp.sqrt(r2)
        dr = r - r0
        drsq = dr * dr
        lamsq = lam * lam
        denom = jnp.maximum(lamsq - drsq, 1e-30)
        fbond = -eps / jnp.maximum(r, 1e-30) * 2.0 * dr * lamsq \
            / (denom * denom)
        return fbond, eps * drsq / denom


@register_bonded("angle", "cosine")
class AngleCosine(AngleStyle):
    """E = K (1 + cos theta) (src/MOLECULE/angle_cosine.cpp)."""

    name = "cosine"
    k_ub = None

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)

    def coeff(self, atype, k):
        self.k[atype] = k

    def equilibrium_angle(self, atype):
        return np.pi

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        dt_ = xs[0].dtype
        x1, x2, x3 = xs
        d1 = _mi(x1 - x2, box)
        d2 = _mi(x3 - x2, box)
        rsq1 = jnp.sum(d1 * d1, -1)
        rsq2 = jnp.sum(d2 * d2, -1)
        r1 = jnp.sqrt(jnp.maximum(rsq1, 1e-30))
        r2 = jnp.sqrt(jnp.maximum(rsq2, 1e-30))
        k = jnp.asarray(self.k, dt_)[ttype]
        c = jnp.clip(jnp.sum(d1 * d2, -1) / (r1 * r2), -1.0, 1.0)
        e = k * (1.0 + c)
        a = k
        a11 = a * c / rsq1
        a12 = -a / (r1 * r2)
        a22 = a * c / rsq2
        f1 = a11[..., None] * d1 + a12[..., None] * d2
        f3 = a22[..., None] * d2 + a12[..., None] * d1
        f2 = -(f1 + f3)
        ed = {self.energy_key: e} if eflag else None
        vp = [(d1, f1), (d2, f3)] if vflag else None
        return [f1, f2, f3], ed, vp, None


@register_bonded("angle", "cosine/periodic")
class AngleCosinePeriodic(AngleStyle):
    """DREIDING periodic cosine: E = C [1 - B (-1)^n cos(n theta)]
    via Chebyshev recurrences (src/EXTRA-MOLECULE/
    angle_cosine_periodic.cpp:106-140; k = C / n^2)."""

    name = "cosine/periodic"
    k_ub = None

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.b = np.zeros(ntypes + 1)
        self.mult = np.zeros(ntypes + 1, np.int64)

    def coeff(self, atype, c, b, n):
        n = int(n)
        self.k[atype] = c / (n * n)
        self.b[atype] = b
        self.mult[atype] = n

    def equilibrium_angle(self, atype):
        b = self.b[atype]
        return np.pi * (1.0 - (0.0 if b > 0 else 1.0 / self.mult[atype]))

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        dt_ = xs[0].dtype
        x1, x2, x3 = xs
        d1 = _mi(x1 - x2, box)
        d2 = _mi(x3 - x2, box)
        rsq1 = jnp.sum(d1 * d1, -1)
        rsq2 = jnp.sum(d2 * d2, -1)
        r1 = jnp.sqrt(jnp.maximum(rsq1, 1e-30))
        r2 = jnp.sqrt(jnp.maximum(rsq2, 1e-30))
        k = jnp.asarray(self.k, dt_)[ttype]
        b = jnp.asarray(self.b, dt_)[ttype]
        mm = jnp.asarray(self.mult)[ttype]
        c = jnp.clip(jnp.sum(d1 * d2, -1) / (r1 * r2), -1.0, 1.0)
        # T_m(c) and the reference's scaled-U recurrence, selected per
        # type by multiplicity — VERBATIM semantics incl. the m=1
        # special case (angle_cosine_periodic.cpp:117-140)
        mmax = int(self.mult.max()) if self.mult.max() > 0 else 1
        tn_1, tn_2 = c, jnp.ones_like(c)       # T_1, T_0
        un_1 = jnp.full_like(c, 2.0)
        un_2 = jnp.zeros_like(c)
        tsel = jnp.where(mm == 1, tn_1, 0.0)
        usel = jnp.where(mm == 1, 1.0, 0.0)
        for m in range(2, mmax + 1):
            tn = 2.0 * c * tn_1 - tn_2
            tn_2, tn_1 = tn_1, tn
            un = 2.0 * c * un_1 - un_2
            un_2, un_1 = un_1, un
            tsel = tsel + jnp.where(mm == m, tn, 0.0)
            usel = usel + jnp.where(mm == m, un, 0.0)
        sign = jnp.where(mm % 2 == 0, 1.0, -1.0)
        tn = b * sign * tsel
        un = b * sign * mm.astype(dt_) * usel
        e = 2.0 * k * (1.0 - tn)
        a = -k * un
        a11 = a * c / rsq1
        a12 = -a / (r1 * r2)
        a22 = a * c / rsq2
        f1 = a11[..., None] * d1 + a12[..., None] * d2
        f3 = a22[..., None] * d2 + a12[..., None] * d1
        f2 = -(f1 + f3)
        ed = {self.energy_key: e} if eflag else None
        vp = [(d1, f1), (d2, f3)] if vflag else None
        return [f1, f2, f3], ed, vp, None


@register_bonded("angle", "quartic")
class AngleQuartic(AngleStyle):
    """E = K2 dt^2 + K3 dt^3 + K4 dt^4
    (src/EXTRA-MOLECULE/angle_quartic.cpp)."""

    name = "quartic"
    k_ub = None

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.theta0 = np.zeros(ntypes + 1)
        self.k2 = np.zeros(ntypes + 1)
        self.k3 = np.zeros(ntypes + 1)
        self.k4 = np.zeros(ntypes + 1)

    def coeff(self, atype, theta0_deg, k2, k3, k4):
        self.theta0[atype] = theta0_deg * np.pi / 180.0
        self.k2[atype] = k2
        self.k3[atype] = k3
        self.k4[atype] = k4

    def equilibrium_angle(self, atype):
        return float(self.theta0[atype])

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        dt_ = xs[0].dtype
        x1, x2, x3 = xs
        d1 = _mi(x1 - x2, box)
        d2 = _mi(x3 - x2, box)
        rsq1 = jnp.sum(d1 * d1, -1)
        rsq2 = jnp.sum(d2 * d2, -1)
        r1 = jnp.sqrt(jnp.maximum(rsq1, 1e-30))
        r2 = jnp.sqrt(jnp.maximum(rsq2, 1e-30))
        th0 = jnp.asarray(self.theta0, dt_)[ttype]
        k2 = jnp.asarray(self.k2, dt_)[ttype]
        k3 = jnp.asarray(self.k3, dt_)[ttype]
        k4 = jnp.asarray(self.k4, dt_)[ttype]
        c = jnp.clip(jnp.sum(d1 * d2, -1) / (r1 * r2), -1.0, 1.0)
        SMALL = 0.001
        sinv = 1.0 / jnp.maximum(jnp.sqrt(1.0 - c * c), SMALL)
        dth = jnp.arccos(c) - th0
        dth2 = dth * dth
        dth3 = dth2 * dth
        tk = 2.0 * k2 * dth + 3.0 * k3 * dth2 + 4.0 * k4 * dth3
        e = k2 * dth2 + k3 * dth3 + k4 * dth3 * dth
        a = -tk * sinv
        a11 = a * c / rsq1
        a12 = -a / (r1 * r2)
        a22 = a * c / rsq2
        f1 = a11[..., None] * d1 + a12[..., None] * d2
        f3 = a22[..., None] * d2 + a12[..., None] * d1
        f2 = -(f1 + f3)
        ed = {self.energy_key: e} if eflag else None
        vp = [(d1, f1), (d2, f3)] if vflag else None
        return [f1, f2, f3], ed, vp, None


@register_bonded("bond", "quartic")
class BondQuartic(BondStyle):
    """Breakable quartic bond (src/MOLECULE/bond_quartic.cpp:60-180):
      E = K (r-Rc)^2 (r-Rc-B1)(r-Rc-B2) + U0
        + [4 sr6 (sr6-1) + 1]            for r^2 < 2^(1/3)  (WCA core)
        - E_pair(r)                      (pair->single, factors 1,1)
    The bond BREAKS permanently when r > Rc.  Requires
    special_bonds 1 1 1 (the pair term is computed in full and the
    intact bond subtracts it).  The alive state rides
    state.extras["bq_alive"] as a per-incidence (N,P) mask, updated by
    the built-in FixBondBreakMask before each force evaluation; it
    permutes with atoms and round-trips through restarts."""

    name = "quartic"
    dynamic_mask_key = "bq_alive"

    def __init__(self, ntypes):
        super().__init__(ntypes)
        self.k = np.zeros(ntypes + 1)
        self.b1 = np.zeros(ntypes + 1)
        self.b2 = np.zeros(ntypes + 1)
        self.rc = np.zeros(ntypes + 1)
        self.u0 = np.zeros(ntypes + 1)

    def coeff(self, btype, k, b1, b2, rc, u0):
        self.k[btype] = k
        self.b1[btype] = b1
        self.b2[btype] = b2
        self.rc[btype] = rc
        self.u0[btype] = u0

    def equilibrium_distance(self, btype):
        return 0.97  # Bond::equilibrium_distance for quartic (bond_quartic.cpp:292)

    def _terms(self, s, r2, d, typ_j, ctx, partner_type):
        """(fbond, ebond_bond, e_pair_sub): quartic+WCA force/energy plus
        the pair-interaction subtraction of the bonded pair."""
        dt_ = r2.dtype
        P = lambda t: jnp.asarray(t, dt_)[typ_j]
        k, b1, b2, rc, u0 = (P(self.k), P(self.b1), P(self.b2),
                             P(self.rc), P(self.u0))
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))
        dr = r - rc
        ra = dr - b1
        rb = dr - b2
        fbond = -k / r * (dr * dr * (ra + rb) + 2.0 * dr * ra * rb)
        eb = k * dr * dr * ra * rb + u0
        wca = r2 < 2.0 ** (1.0 / 3.0)
        sr2 = jnp.where(wca, 1.0, 0.0) / jnp.where(wca, r2, 1.0)
        sr6 = sr2 * sr2 * sr2
        fbond = fbond + 48.0 * sr6 * (sr6 - 0.5) * sr2
        eb = eb + jnp.where(wca, 4.0 * sr6 * (sr6 - 1.0) + 1.0, 0.0)
        # subtract the pair interaction of the intact bonded pair
        fp, ev, ec, _ = ctx.pair.pair_fn(r2, partner_type[0],
                                         partner_type[1])
        esub = ev + (ec if ec is not None else 0.0)
        return fbond - fp, eb, esub

    def compute(self, s, ctx, eflag: bool, vflag: bool, consts=None):
        inc = consts if consts is not None else self.device_incidence()
        idx, typ_j, role_j, mask_j = inc
        alive = s.extras.get(self.dynamic_mask_key)
        live = mask_j if alive is None else (mask_j & (alive > 0.5))
        partner = jnp.where(role_j[..., None] == 0, idx[:, :, 1:2],
                            idx[:, :, 0:1])[..., 0]
        d = minimum_image(s.x[:, None, :] - s.x[partner], s.box)
        r2 = jnp.sum(d * d, axis=-1)
        r2 = jnp.where(live, r2, jnp.ones_like(r2))
        fbond, eb, esub = self._terms(
            s, r2, d, typ_j, ctx, (s.type[:, None], s.type[partner]))
        fbond = jnp.where(live, fbond, 0)
        if eflag == "atom":
            eatom = 0.5 * jnp.sum(jnp.where(live, eb - esub, 0), axis=1)
            vatom = 0.5 * jnp.stack([
                jnp.sum(fbond * d[:, :, 0] * d[:, :, 0], axis=1),
                jnp.sum(fbond * d[:, :, 1] * d[:, :, 1], axis=1),
                jnp.sum(fbond * d[:, :, 2] * d[:, :, 2], axis=1),
                jnp.sum(fbond * d[:, :, 0] * d[:, :, 1], axis=1),
                jnp.sum(fbond * d[:, :, 0] * d[:, :, 2], axis=1),
                jnp.sum(fbond * d[:, :, 1] * d[:, :, 2], axis=1),
            ], axis=1)
            return None, eatom, vatom
        f = jnp.sum(d * fbond[:, :, None], axis=1)
        e = None
        virial = None
        if eflag:
            # quartic+WCA tallies as bond energy, the subtraction as
            # PAIR energy — matching the reference's evdwl tally
            e = {self.energy_key:
                 0.5 * jnp.sum(jnp.where(live, eb, 0)),
                 "evdwl": -0.5 * jnp.sum(jnp.where(live, esub, 0))}
        if vflag:
            virial = 0.5 * jnp.stack([
                jnp.sum(fbond * d[:, :, 0] * d[:, :, 0]),
                jnp.sum(fbond * d[:, :, 1] * d[:, :, 1]),
                jnp.sum(fbond * d[:, :, 2] * d[:, :, 2]),
                jnp.sum(fbond * d[:, :, 0] * d[:, :, 1]),
                jnp.sum(fbond * d[:, :, 0] * d[:, :, 2]),
                jnp.sum(fbond * d[:, :, 1] * d[:, :, 2]),
            ])
        return f, e, virial
