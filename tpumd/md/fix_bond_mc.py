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


class FixBondCreateMC(Fix):
    """fix bond/create (src/MC/fix_bond_create.cpp): dynamic bond
    formation.  Device design: created bonds occupy padded per-atom
    extras slots ("mc_new_pidx/typ/live", written symmetrically on both
    endpoints) so the compiled step never changes shape; the matching
    runs in the post_integrate slot (reference timing): closest
    eligible partner per atom (type pair, per-type max-bond caps, not
    already 1-2 special, r < Rmin), mutual agreement, one new bond per
    atom per event.  The 1-2 special entry is inserted device-side into
    the padded special lists the same step and a same-step neighbor
    rebuild is requested; exact 1-3/1-4 special lists rebuild on host
    at the segment boundary.

    Candidate search is a dense masked distance matrix — O(N^2) on the
    event step only; fine for the molecular system sizes bond/create
    targets.  `prob` and atom-type changes (inewtype != itype) are
    unsupported, as for bond/break."""

    name = "bond/create"
    needs_new_bond_slots = True
    nslots = 4  # extras slots per atom for created bonds

    def __init__(self, group, nevery, itype, jtype, rmin, btype,
                 imaxbond=0, jmaxbond=0):
        self.group = group
        self.nevery = int(nevery)
        self.itype = int(itype)
        self.jtype = int(jtype)
        self.cutsq = float(rmin) ** 2
        self.btype = int(btype)
        self.imaxbond = int(imaxbond)
        self.jmaxbond = int(jmaxbond)
        self.host_every = self.nevery
        self._ncreated_seen = -1

    def init_state(self, s, ctx):
        return jnp.zeros((), jnp.int32)

    def pre_run(self, fstate, begin, end):
        return jnp.asarray(begin, jnp.int32)

    def _bond_style(self, ctx):
        for b in ctx.bonded:
            if b.kind == "bond":
                return b
        raise ValueError("fix bond/create requires a bond style")

    def post_integrate(self, s, fstate, ctx):
        step = fstate + 1
        fire = (step % self.nevery) == 0
        n = s.x.shape[0]
        rows = jnp.arange(n)
        style = self._bond_style(ctx)
        # per-atom count of existing bonds of btype: static alive + slots
        inc = style.device_incidence()
        if inc is not None:
            idx, typ_j, role_j, mask_j = inc
            stat = mask_j & (typ_j == self.btype)
            alive = s.extras.get("mc_bond_alive")
            if alive is not None:
                stat = stat & (alive > 0.5)
            bondcount = jnp.sum(stat, axis=1)
        else:
            bondcount = jnp.zeros(n, jnp.int32)
        nlive = s.extras["mc_new_live"] > 0.5
        ntyp = s.extras["mc_new_typ"].astype(jnp.int32)
        bondcount = bondcount + jnp.sum(nlive & (ntyp == self.btype), axis=1)

        grp = self.group_sel(s)
        t = s.type
        cap_ok_as_i = (self.imaxbond == 0) | (bondcount < self.imaxbond)
        cap_ok_as_j = (self.jmaxbond == 0) | (bondcount < self.jmaxbond)
        ok_i = grp & (t == self.itype) & cap_ok_as_i
        ok_j = grp & (t == self.jtype) & cap_ok_as_j
        # pair eligibility matrix (i as itype & j as jtype, or swapped)
        pair_ok = (ok_i[:, None] & ok_j[None, :]) | \
            (ok_j[:, None] & ok_i[None, :])
        d = minimum_image(s.x[:, None, :] - s.x[None, :, :], s.box)
        r2 = jnp.sum(d * d, axis=-1)
        # exclude self, already-1-2-bonded, and already-slot-bonded pairs
        pair_ok = pair_ok & (rows[:, None] != rows[None, :])
        if s.special_tags is not None:
            is12 = jnp.any(
                (s.special_tags[:, None, :]
                 == s.tag[None, :, None].astype(s.special_tags.dtype))
                & (s.special_codes[:, None, :] == 1), axis=-1)
            pair_ok = pair_ok & ~is12
        npidx = s.extras["mc_new_pidx"].astype(jnp.int32)
        slot_bonded = jnp.any(
            nlive[:, None, :] & (npidx[:, None, :]
                                 == rows[None, :, None]), axis=-1)
        pair_ok = pair_ok & ~slot_bonded & (r2 < self.cutsq)
        dist = jnp.where(pair_ok, r2, jnp.inf)
        pchoice = jnp.argmin(dist, axis=1)
        haspick = jnp.isfinite(dist[rows, pchoice])
        mutual = haspick & haspick[pchoice] & (pchoice[pchoice] == rows)
        make = mutual & fire
        # write into the first free slot of each endpoint
        E = nlive.shape[1]
        free_slot = jnp.argmin(nlive, axis=1)  # first False
        has_free = ~jnp.all(nlive, axis=1)
        make = make & has_free & has_free[pchoice]
        hit = make[:, None] & (jnp.arange(E)[None, :]
                               == free_slot[:, None])
        new_live = jnp.where(hit, 1.0, s.extras["mc_new_live"])
        new_pidx = jnp.where(
            hit, pchoice[:, None].astype(s.extras["mc_new_pidx"].dtype),
            s.extras["mc_new_pidx"])
        new_typ = jnp.where(
            hit, float(self.btype), s.extras["mc_new_typ"])
        reb = jnp.where(make, 1.0, s.extras["mc_rebuild"])
        s = s.replace(extras={**s.extras, "mc_new_live": new_live,
                              "mc_new_pidx": new_pidx,
                              "mc_new_typ": new_typ,
                              "mc_rebuild": reb.astype(new_live.dtype)})
        if s.special_tags is not None:
            # insert the partner tag (code 1) into the first empty
            # special slot of each endpoint
            st, sc = s.special_tags, s.special_codes
            empty = st == 0
            sslot = jnp.argmax(empty, axis=1)
            can = make & jnp.any(empty, axis=1)
            shit = can[:, None] & (jnp.arange(st.shape[1])[None, :]
                                   == sslot[:, None])
            ptag = s.tag[pchoice].astype(st.dtype)
            st = jnp.where(shit, ptag[:, None], st)
            sc = jnp.where(shit, 1, sc)
            s = s.replace(special_tags=st, special_codes=sc)
        return s, step

    def host_end_of_step(self, sim):
        """Exact 1-3/1-4 special rebuild over static + created bonds."""
        s = sim._carry[0]
        if s.special_tags is None:
            return
        nlive = np.asarray(jax.device_get(s.extras["mc_new_live"])) > 0.5
        ncreated = int(nlive.sum())
        if ncreated == self._ncreated_seen:
            return
        self._ncreated_seen = ncreated
        tag = np.asarray(jax.device_get(s.tag))
        bonds = []
        style = next(b for b in sim.bonded if b.kind == "bond")
        if style._incidence is not None:
            idx, typ_j, role_j, mask_j = (np.asarray(jax.device_get(a))
                                          for a in
                                          style.device_incidence())
            alive = s.extras.get("mc_bond_alive")
            own = (role_j == 0) & mask_j
            if alive is not None:
                own = own & (np.asarray(jax.device_get(alive)) > 0.5)
            rr, ss_ = np.nonzero(own)
            partner = np.where(role_j[..., None] == 0, idx[:, :, 1:2],
                               idx[:, :, 0:1])[..., 0]
            bonds.append(np.stack([typ_j[rr, ss_], tag[rr],
                                   tag[partner[rr, ss_]]], axis=1))
        npidx = np.asarray(jax.device_get(
            s.extras["mc_new_pidx"])).astype(np.int64)
        ntyp = np.asarray(jax.device_get(
            s.extras["mc_new_typ"])).astype(np.int64)
        rr, ss_ = np.nonzero(nlive)
        keep = tag[rr] < tag[npidx[rr, ss_]]  # each created bond once
        rr, ss_ = rr[keep], ss_[keep]
        if len(rr):
            bonds.append(np.stack([ntyp[rr, ss_], tag[rr],
                                   tag[npidx[rr, ss_]]], axis=1))
        allb = (np.concatenate(bonds, axis=0).astype(np.int64)
                if bonds else np.zeros((0, 3), np.int64))
        from tpumd.io.read_data import build_special
        st, sc = build_special(sim.natoms, allb)
        smax = s.special_tags.shape[1]
        if st.shape[1] > smax:
            raise ValueError(
                "fix bond/create: special list overflow — increase "
                "extra special headroom")
        pad = smax - st.shape[1]
        st = np.pad(st, ((0, 0), (0, pad)))[tag - 1]
        sc = np.pad(sc, ((0, 0), (0, pad)))[tag - 1]
        s2 = s.replace(special_tags=jnp.asarray(st, jnp.int32),
                       special_codes=jnp.asarray(sc, jnp.int32))
        sim._carry = (s2,) + tuple(sim._carry[1:])
        sim.state = s2
