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


def _add_atoms(sim, xnew, types, vnew):
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
        else:
            ext = np.zeros((n_add,) + host.shape[1:], dtype=host.dtype)
        updates[name] = jnp.asarray(np.concatenate([host, ext]),
                                    dtype=a.dtype)
    sim.state = s.replace(nlocal=s.nlocal + n_add, **updates)
    sim._natoms = None


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
                 vy=(0, 0), vz=(0, 0), near=0.0, maxattempt=10):
        self.ntotal = int(ntotal)
        self.itype = int(itype)
        self.host_every = max(int(nevery), 1)
        self.region = region
        self.vx, self.vy, self.vz = vx, vy, vz
        self.near = float(near)
        self.maxattempt = int(maxattempt)
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
            if self.near > 0 and len(xv):
                if (np.linalg.norm(xv - pt, axis=1) < self.near).any():
                    continue
            break
        else:
            sim._log(f"WARNING: fix deposit failed to insert at step "
                     f"{sim.step}")
            return
        v = np.array([r[0] + self._rng.uniform() * (r[1] - r[0])
                      for r in (self.vx, self.vy, self.vz)])
        # invalidate FIRST: it restores sim.state from the carry
        sim.invalidate_ctx()
        _add_atoms(sim, pt[None, :], [self.itype], v[None, :])
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
