"""Atom insertion/deletion fixes: deposit, evaporate (host-scheduled).

References: src/fix_deposit.cpp, src/MC/fix_evaporate.cpp.  Changing the
atom count changes array shapes, so these run host-side at their
scheduled steps and invalidate the compiled step context (the next
segment re-setups with the new capacity — insertion cadences are long in
practice, so the recompat cost amortizes).  Atomic systems only (no
molecule templates yet)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpumd.md.fixes import Fix
from tpumd.utils.ranpark import RanPark


def _add_atoms(sim, xnew, types, vnew, q=None, molecule=None):
    from tpumd.core.state import PER_ATOM_FIELDS
    s = sim.state
    n_add = len(xnew)
    tag0 = int(np.asarray(jax.device_get(s.tag)).max())
    updates = {}
    for name in PER_ATOM_FIELDS:
        a = getattr(s, name)
        if a is None:
            continue
        host = np.asarray(jax.device_get(a))
        if name == "x":
            ext = np.asarray(xnew)
        elif name == "v":
            ext = np.asarray(vnew)
        elif name == "type":
            ext = np.asarray(types, host.dtype)
        elif name == "tag":
            ext = np.arange(tag0 + 1, tag0 + 1 + n_add, dtype=host.dtype)
        elif name == "gmask":
            ext = np.ones(n_add, dtype=host.dtype)
        elif name == "q" and q is not None:
            ext = np.asarray(q, host.dtype)
        elif name == "molecule" and molecule is not None:
            ext = np.asarray(molecule, host.dtype)
        else:
            ext = np.zeros((n_add,) + host.shape[1:], dtype=host.dtype)
        updates[name] = jnp.asarray(np.concatenate([host, ext]),
                                    dtype=a.dtype)
    sim.state = s.replace(nlocal=s.nlocal + n_add, **updates)
    sim._natoms = None
    return tag0


def _add_molecule_topology(sim, mol, tag0):
    """Append the template's bonds/angles/... (tags offset by tag0) and
    regrow the 1-2/1-3/1-4 special lists (Atom::add_molecule_atom +
    special rebuild in the reference)."""
    for kind, arr in (("bond", mol.bonds), ("angle", mol.angles),
                      ("dihedral", mol.dihedrals),
                      ("improper", mol.impropers)):
        if not len(arr):
            continue
        rows = arr.copy()
        rows[:, 1:] += tag0
        old = sim.topology.get(kind)
        sim.topology[kind] = (rows if old is None or not len(old)
                              else np.concatenate([old, rows]))
    if len(mol.bonds) and sim.special_lj is not None:
        from tpumd.io.read_data import build_special
        tags, codes = build_special(
            sim.natoms, sim.topology["bond"],
            sim.topology.get("angle"), sim.topology.get("dihedral"))
        # sim.special_* rows align with state rows, not tag order
        tag_np = np.asarray(jax.device_get(sim.state.tag))
        sim.special_tags = tags[tag_np - 1]
        sim.special_codes = codes[tag_np - 1]


def _remove_atoms(sim, rows):
    from tpumd.core.state import map_per_atom
    keep = np.ones(sim.state.x.shape[0], dtype=bool)
    keep[rows] = False
    idx = jnp.asarray(np.nonzero(keep)[0])
    s = map_per_atom(sim.state, lambda a: jnp.take(a, idx, axis=0))
    sim.state = s.replace(nlocal=jnp.asarray(int(keep.sum()), jnp.int32))
    sim._natoms = None


class FixDeposit(Fix):
    """fix deposit Ntotal type M seed region R [vx lo hi] [vy ..] [vz ..]
    [near R]: insert one atom every M steps at a random point in the
    region (RanPark stream), rejecting points closer than `near` to any
    atom."""

    name = "deposit"

    def __init__(self, ntotal, itype, nevery, seed, region, vx=(0, 0),
                 vy=(0, 0), vz=(0, 0), near=0.0, maxattempt=10, mol=None):
        self.ntotal = int(ntotal)
        self.itype = int(itype)
        self.host_every = max(int(nevery), 1)
        self.region = region
        self.vx, self.vy, self.vz = vx, vy, vz
        self.near = float(near)
        self.maxattempt = int(maxattempt)
        self.mol = mol               # MoleculeTemplate or None
        self._rng = RanPark(int(seed))
        self.ninserted = 0

    def host_end_of_step(self, sim):
        if self.ninserted >= self.ntotal or sim.step % self.host_every:
            return
        lo, hi = self.region.bounding_box()
        x = np.asarray(jax.device_get(sim.state.x), np.float64)
        tag = np.asarray(jax.device_get(sim.state.tag))
        xv = x[tag > 0]
        for _ in range(self.maxattempt):
            pt = np.array([lo[d] + self._rng.uniform() * (hi[d] - lo[d])
                           for d in range(3)])
            if not self.region.inside(pt[None, :])[0]:
                continue
            if self.mol is not None:
                # RNG draw order per fix_deposit.cpp:420-441: molfrac
                # pick, rotation axis, rotation angle
                self._rng.uniform()
                r = np.array([self._rng.uniform() - 0.5 for _ in range(3)])
                theta = self._rng.uniform() * 2.0 * np.pi
                from tpumd.io.molecule import (axisangle_to_quat,
                                               quat_to_mat_np)
                r /= np.linalg.norm(r)
                rotmat = quat_to_mat_np(axisangle_to_quat(r, theta))
                coords = self.mol.dx @ rotmat.T + pt
            else:
                coords = pt[None, :]
            if self.near > 0 and len(xv):
                d = xv[None, :, :] - coords[:, None, :]
                if (np.linalg.norm(d, axis=-1) < self.near).any():
                    continue
            break
        else:
            sim._log(f"WARNING: fix deposit failed to insert at step "
                     f"{sim.step}")
            return
        v = np.array([r_[0] + self._rng.uniform() * (r_[1] - r_[0])
                      for r_ in (self.vx, self.vy, self.vz)])
        # invalidate FIRST: it restores sim.state from the carry
        sim.invalidate_ctx()
        if self.mol is not None:
            m = self.mol
            molid = int(np.asarray(
                jax.device_get(sim.state.molecule)).max()) + 1 \
                if sim.state.molecule is not None else 0
            tag0 = _add_atoms(
                sim, coords, self.itype + m.types,
                np.tile(v, (m.natoms, 1)),
                q=m.q if m.q is not None else None,
                molecule=np.full(m.natoms, molid))
            _add_molecule_topology(sim, m, tag0)
        else:
            _add_atoms(sim, coords, [self.itype], v[None, :])
        self.ninserted += 1


class FixEvaporate(Fix):
    """fix evaporate N M region R seed: delete up to M group atoms inside
    the region every N steps."""

    name = "evaporate"

    def __init__(self, nevery, nflux, region, seed):
        self.host_every = max(int(nevery), 1)
        self.nflux = int(nflux)
        self.region = region
        self._rng = RanPark(int(seed))
        self.ndeleted = 0

    def host_end_of_step(self, sim):
        if sim.step % self.host_every:
            return
        x = np.asarray(jax.device_get(sim.state.x), np.float64)
        tag = np.asarray(jax.device_get(sim.state.tag))
        gm = np.asarray(jax.device_get(sim.state.gmask))
        cand = np.nonzero((tag > 0) & ((gm & self.groupbit) > 0)
                          & self.region.inside(x))[0]
        if len(cand) == 0:
            return
        ndel = min(self.nflux, len(cand))
        rows = []
        pool = list(cand)
        for _ in range(ndel):
            k = int(self._rng.uniform() * len(pool)) % len(pool)
            rows.append(pool.pop(k))
        sim.invalidate_ctx()
        # candidate rows were computed on the carried state; recompute
        x = np.asarray(jax.device_get(sim.state.x), np.float64)
        tag = np.asarray(jax.device_get(sim.state.tag))
        gm = np.asarray(jax.device_get(sim.state.gmask))
        cand = np.nonzero((tag > 0) & ((gm & self.groupbit) > 0)
                          & self.region.inside(x))[0]
        ndel = min(self.nflux, len(cand))
        if ndel == 0:
            return
        rows = []
        pool = list(cand)
        for _ in range(ndel):
            k = int(self._rng.uniform() * len(pool)) % len(pool)
            rows.append(pool.pop(k))
        _remove_atoms(sim, rows)
        self.ndeleted += ndel
