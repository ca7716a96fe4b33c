"""Local (per-bond / per-angle / per-pair) computes for dump local.

Reimplements compute property/local (src/compute_property_local.cpp),
compute bond/local (src/compute_bond_local.cpp) and compute angle/local
(src/compute_angle_local.cpp).  Local data is host-side tabulation at
output steps: tuple lists come straight from the topology arrays (tag
indexed), per-bond energies/forces reuse each bond style's bond_fn, and
pair rows come from the current neighbor table — there is no reason to
keep any of this device-resident, it exists only to be written out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpumd.md.compute_styles import Compute


def _tag_positions(sim):
    """x indexed by tag-1, plus the periodic min-image helper."""
    s = sim.state
    tag = np.asarray(jax.device_get(s.tag))
    x = np.asarray(jax.device_get(s.x), np.float64)
    valid = tag > 0
    n = sim.natoms
    xt = np.zeros((n, 3))
    xt[tag[valid] - 1] = x[valid]
    ell = np.asarray(jax.device_get(s.box.lengths), np.float64)
    per = np.asarray(s.box.periodic)

    def mimg(d):
        return d - np.where(per, np.round(d / ell) * ell, 0.0)
    return xt, mimg


_TUPLE_COLS = {
    "batom1": ("bond", 1), "batom2": ("bond", 2), "btype": ("bond", 0),
    "aatom1": ("angle", 1), "aatom2": ("angle", 2), "aatom3": ("angle", 3),
    "atype": ("angle", 0),
    "datom1": ("dihedral", 1), "datom2": ("dihedral", 2),
    "datom3": ("dihedral", 3), "datom4": ("dihedral", 4),
    "dtype": ("dihedral", 0),
    "iatom1": ("improper", 1), "iatom2": ("improper", 2),
    "iatom3": ("improper", 3), "iatom4": ("improper", 4),
    "itype": ("improper", 0),
}


class ComputePropertyLocal(Compute):
    """compute ID group property/local btype batom1 ... | patom1 patom2
    (src/compute_property_local.cpp)."""

    style = "property/local"
    scalar = False
    is_local = True

    def __init__(self, cid, group, args):
        super().__init__(cid, group)
        self.cols = list(args)
        kinds = set()
        for c in self.cols:
            if c in _TUPLE_COLS:
                kinds.add(_TUPLE_COLS[c][0])
            elif c in ("patom1", "patom2", "ptype1", "ptype2"):
                kinds.add("pair")
            else:
                raise ValueError(f"property/local column {c!r} unknown")
        if len(kinds) != 1:
            raise ValueError("property/local columns must reference one "
                             "tuple kind")
        self.kind = kinds.pop()

    def evaluate(self, sim):
        if self.kind == "pair":
            rows = _pair_rows(sim)
            out = {"patom1": rows[:, 0], "patom2": rows[:, 1],
                   "ptype1": rows[:, 2], "ptype2": rows[:, 3]}
            return np.column_stack([out[c] for c in self.cols])
        arr = sim.topology.get(self.kind)
        if arr is None:
            return np.zeros((0, len(self.cols)))
        return np.column_stack(
            [arr[:, _TUPLE_COLS[c][1]] for c in self.cols]).astype(
                np.float64)


def _pair_rows(sim):
    """(npairs, 4) [tag_i, tag_j, type_i, type_j] rows with i < j within
    the force cutoff, from the current neighbor table."""
    s, neigh = sim._carry[0], sim._carry[1]
    tag = np.asarray(jax.device_get(s.tag))
    typ = np.asarray(jax.device_get(s.type))
    x = np.asarray(jax.device_get(s.x), np.float64)
    idx = np.asarray(jax.device_get(neigh.idx))
    ell = np.asarray(jax.device_get(s.box.lengths), np.float64)
    per = np.asarray(s.box.periodic)
    cut = sim.pair.max_cutoff()
    npad = idx.shape[0]
    ii = np.repeat(np.arange(npad), idx.shape[1])
    jj = idx.reshape(-1)
    ok = jj >= 0
    ii, jj = ii[ok], jj[ok]
    jb = jj % npad   # small-box image copies map back to the base atom
    d = x[ii] - x[jb]
    d = d - np.where(per, np.round(d / ell) * ell, 0.0)
    r2 = (d * d).sum(1)
    keep = (r2 < cut * cut) & (tag[ii] > 0) & (tag[jb] > 0) \
        & (tag[ii] < tag[jb])
    ti, tj = tag[ii[keep]], tag[jb[keep]]
    yi, yj = typ[ii[keep]], typ[jb[keep]]
    return np.column_stack([ti, tj, yi, yj]).astype(np.float64)


class ComputeBondLocal(Compute):
    """compute ID group bond/local dist engpot force
    (src/compute_bond_local.cpp)."""

    style = "bond/local"
    scalar = False
    is_local = True

    def __init__(self, cid, group, args):
        super().__init__(cid, group)
        self.cols = list(args)
        for c in self.cols:
            if c not in ("dist", "engpot", "force", "eng"):
                raise ValueError(f"bond/local column {c!r} unknown")

    def evaluate(self, sim):
        arr = sim.topology.get("bond")
        if arr is None:
            return np.zeros((0, len(self.cols)))
        styles = [b for b in sim.bonded if b.kind == "bond"]
        if len(styles) != 1:
            raise ValueError("bond/local needs exactly one bond style")
        b = styles[0]
        xt, mimg = _tag_positions(sim)
        d = mimg(xt[arr[:, 1] - 1] - xt[arr[:, 2] - 1])
        r2 = (d * d).sum(1)
        fbond, ebond = jax.device_get(
            b.bond_fn(jnp.asarray(r2), jnp.asarray(arr[:, 0])))
        r = np.sqrt(r2)
        cols = {"dist": r, "engpot": np.asarray(ebond),
                "eng": np.asarray(ebond),
                "force": np.asarray(fbond) * r}
        return np.column_stack([cols[c] for c in self.cols])


class ComputeAngleLocal(Compute):
    """compute ID group angle/local theta (src/compute_angle_local.cpp;
    theta in degrees)."""

    style = "angle/local"
    scalar = False
    is_local = True

    def __init__(self, cid, group, args):
        super().__init__(cid, group)
        self.cols = list(args)
        for c in self.cols:
            if c != "theta":
                raise ValueError(f"angle/local column {c!r} unsupported"
                                 " (theta only)")

    def evaluate(self, sim):
        arr = sim.topology.get("angle")
        if arr is None:
            return np.zeros((0, len(self.cols)))
        xt, mimg = _tag_positions(sim)
        d1 = mimg(xt[arr[:, 1] - 1] - xt[arr[:, 2] - 1])
        d2 = mimg(xt[arr[:, 3] - 1] - xt[arr[:, 2] - 1])
        c = (d1 * d2).sum(1) / np.sqrt((d1 * d1).sum(1) * (d2 * d2).sum(1))
        theta = np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))
        return theta[:, None]
