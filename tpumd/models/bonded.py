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
                    row_of_tag=None):
    """Per-atom padded incidence lists.

    tuples: (M, 1+arity) int array: [type, atom tags...] (1-based tags).
    row_of_tag maps tag -> atom row (identity - 1 if None).
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
    pmax = max(1, max(len(v) for v in per_atom))
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

    def coeff(self, *args):
        raise NotImplementedError

    def init(self):
        pass

    def set_topology(self, n: int, tuples: np.ndarray, row_of_tag=None):
        self._tuples = np.asarray(tuples)
        self._n = n
        self._incidence = build_incidence(n, self._tuples, self.arity,
                                          row_of_tag)

    def compute(self, s, eflag: bool, vflag: bool):
        raise NotImplementedError


class BondStyle(BondedStyle):
    arity = 2
    energy_key = "ebond"
    kind = "bond"

    def bond_fn(self, r2, btype):
        """Return (fbond, ebond): f_on_atom1 = fbond * (x1 - x2)."""
        raise NotImplementedError

    def compute(self, s, eflag: bool, vflag: bool):
        idx, typ, role, mask = self._incidence
        idx = jnp.asarray(idx)
        typ_j = jnp.asarray(typ)
        mask_j = jnp.asarray(mask)
        role_j = jnp.asarray(role)
        # partner of each incidence: the other atom of the bond
        partner = jnp.where(role_j[..., None] == 0, idx[:, :, 1:2],
                            idx[:, :, 0:1])[..., 0]
        d = s.x[:, None, :] - s.x[partner]
        d = minimum_image(d, s.box)
        r2 = jnp.sum(d * d, axis=-1)
        r2 = jnp.where(mask_j, r2, jnp.ones_like(r2))
        fbond, ebond = self.bond_fn(r2, typ_j)
        fbond = jnp.where(mask_j, fbond, 0)
        f = jnp.sum(d * fbond[:, :, None], axis=1)
        e = None
        virial = None
        if eflag:
            e = 0.5 * jnp.sum(jnp.where(mask_j, ebond, 0))
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
