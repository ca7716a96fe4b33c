"""fix bond/break (src/MC/fix_bond_break.cpp): dynamic bond scission.

TPU-native design: the reference mutates bond_atom/bond_type lists and
incrementally repairs special lists inside post_integrate.  Here the
static incidence tables stay untouched and a carried per-incidence
alive mask (state.extras["mc_bond_alive"]) is updated ON DEVICE in the
post_integrate slot — the same step timing as the reference, so the
force evaluation of the event step already sees the broken bond.  The
1-2 special entries of the broken pair are zeroed device-side in the
same step; the derived 1-3/1-4 special lists are rebuilt exactly on
host at the segment boundary the event lands on (host_every == Nevery
forces one).

Matching follows the reference precisely: per atom the FARTHEST
eligible partner (r > Rmax, bond type btype, both atoms in group), a
break only when the choice is mutual.  `prob` is not supported: the
reference consumes RanMars draws only for partnered atoms, a
data-dependent stream a compiled step cannot replicate bit-for-bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpumd.md.fixes import Fix
from tpumd.ops.pairwise import minimum_image


class FixBondBreakMC(Fix):
    name = "bond/break"
    needs_bond_alive = True

    def __init__(self, group, nevery, btype, rmax, seed=None, fraction=1.0):
        self.group = group
        self.nevery = int(nevery)
        self.btype = int(btype)
        self.cutsq = float(rmax) ** 2
        if fraction < 1.0:
            raise NotImplementedError(
                "fix bond/break prob: data-dependent RanMars stream "
                "cannot be replicated inside the compiled step")
        self.host_every = self.nevery
        self.breakcount = 0

    def init_state(self, s, ctx):
        # absolute-step counter; pre_run re-seeds it each run command
        return jnp.zeros((), jnp.int32)

    def pre_run(self, fstate, begin, end):
        return jnp.asarray(begin, jnp.int32)

    def _bond_style(self, ctx):
        for b in ctx.bonded:
            if b.kind == "bond":
                return b
        raise ValueError("fix bond/break requires a bond style")

    def post_integrate(self, s, fstate, ctx):
        step = fstate + 1
        fire = (step % self.nevery) == 0
        alive = s.extras["mc_bond_alive"]
        style = self._bond_style(ctx)
        idx, typ_j, role_j, mask_j = style.device_incidence()
        n, P = typ_j.shape
        partner = jnp.where(role_j[..., None] == 0, idx[:, :, 1:2],
                            idx[:, :, 0:1])[..., 0]
        d = minimum_image(s.x[:, None, :] - s.x[partner], s.box)
        r2 = jnp.sum(d * d, axis=-1)
        grp = self.group_sel(s)
        elig = (mask_j & (alive > 0.5) & (typ_j == self.btype)
                & grp[:, None] & grp[partner] & (r2 > self.cutsq))
        dist = jnp.where(elig, r2, -1.0)
        slot = jnp.argmax(dist, axis=1)
        rows = jnp.arange(n)
        has = dist[rows, slot] > 0.0
        prow = partner[rows, slot]
        mutual = has & has[prow] & (prow[prow] == rows)
        brk = mutual & fire
        hit = brk[:, None] & (jnp.arange(P)[None, :] == slot[:, None])
        alive = alive * (~hit).astype(alive.dtype)
        # request a same-step neighbor rebuild so the pair list picks up
        # the changed special codes (next_reneighbor analog)
        reb = jnp.where(brk, 1.0, s.extras["mc_rebuild"])
        s = s.replace(extras={**s.extras, "mc_bond_alive": alive,
                              "mc_rebuild": reb.astype(alive.dtype)})
        if s.special_tags is not None:
            ptag = s.tag[prow]
            sp_hit = brk[:, None] & (s.special_tags
                                     == ptag[:, None].astype(
                                         s.special_tags.dtype))
            s = s.replace(
                special_tags=jnp.where(sp_hit, 0, s.special_tags),
                special_codes=jnp.where(sp_hit, 0, s.special_codes))
        return s, step

    # ---- segment-boundary host pass: exact 1-3/1-4 special rebuild
    def host_end_of_step(self, sim):
        s = sim._carry[0]
        if s.special_tags is None:
            return
        style = next(b for b in sim.bonded if b.kind == "bond")
        idx, typ_j, role_j, mask_j = (np.asarray(jax.device_get(a))
                                      for a in style.device_incidence())
        alive = np.asarray(jax.device_get(s.extras["mc_bond_alive"]))
        tag = np.asarray(jax.device_get(s.tag))
        own = (role_j == 0) & mask_j & (alive > 0.5)
        rows, slots = np.nonzero(own)
        partner = np.where(role_j[..., None] == 0, idx[:, :, 1:2],
                           idx[:, :, 0:1])[..., 0]
        bonds = np.stack([typ_j[rows, slots], tag[rows],
                          tag[partner[rows, slots]]], axis=1)
        nbroken = int(mask_j[role_j == 0].sum() - len(bonds))
        if nbroken == self.breakcount:
            return
        self.breakcount = nbroken
        from tpumd.io.read_data import build_special
        st, sc = build_special(sim.natoms, bonds.astype(np.int64))
        smax = s.special_tags.shape[1]
        if st.shape[1] < smax:
            pad = smax - st.shape[1]
            st = np.pad(st, ((0, 0), (0, pad)))
            sc = np.pad(sc, ((0, 0), (0, pad)))
        st = st[:, :smax][tag - 1]
        sc = sc[:, :smax][tag - 1]
        s2 = s.replace(special_tags=jnp.asarray(st, jnp.int32),
                       special_codes=jnp.asarray(sc, jnp.int32))
        sim._carry = (s2,) + tuple(sim._carry[1:])
        sim.state = s2
