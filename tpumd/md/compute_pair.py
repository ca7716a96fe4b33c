"""Distance-based computes: rdf, coord/atom, cluster/atom, displace/atom,
group/group, heat/flux.

References: src/compute_rdf.cpp, compute_coord_atom.cpp,
compute_cluster_atom.cpp, compute_displace_atom.cpp,
compute_group_group.cpp, compute_heat_flux.cpp.

These evaluate host-side at output steps (same contract as the rest of
the compute library): an occasional O(N^2) chunked distance pass replaces
the reference's occasional neighbor-list request — output cadences are
long, and the chunked numpy sweep stays cache-friendly at fixture scale.
"""

from __future__ import annotations

import jax
import numpy as np

from tpumd.md.compute_styles import Compute


def _host_atoms(sim):
    """(x, type, tag, gmask, special(tags, codes)) in tag order + box."""
    s = sim.state
    tag = np.asarray(jax.device_get(s.tag))
    valid = tag > 0
    order = np.nonzero(valid)[0][np.argsort(tag[valid])]
    x = np.asarray(jax.device_get(s.x), np.float64)[order]
    typ = np.asarray(jax.device_get(s.type))[order]
    gm = np.asarray(jax.device_get(s.gmask))[order]
    ell = np.asarray(jax.device_get(s.box.lengths), np.float64)
    per = s.box.periodic
    sp = None
    if s.special_tags is not None:
        sp = (np.asarray(jax.device_get(s.special_tags))[order],
              np.asarray(jax.device_get(s.special_codes))[order])
    return x, typ, tag[order], gm, ell, per, sp


def _min_image(d, ell, per):
    for c in range(3):
        if per[c]:
            d[..., c] -= ell[c] * np.round(d[..., c] / ell[c])
    return d


def _pair_sweep(x, ell, per, cutoff, chunk=2048):
    """Yield (i0, d (n,N,3), r2 (n,N)) blocks of all-pairs displacements."""
    n = len(x)
    c2 = cutoff * cutoff
    for i0 in range(0, n, chunk):
        xi = x[i0:i0 + chunk]
        d = xi[:, None, :] - x[None, :, :]
        d = _min_image(d, ell, per)
        r2 = (d * d).sum(-1)
        yield i0, d, r2, c2


class ComputeRDF(Compute):
    """compute rdf Nbin [itype1 jtype1 ...] [cutoff R]: (nbin, 1+2*npairs)
    array of bin centers, g(r), coord(r) (src/compute_rdf.cpp:263-396).
    Pairs with both special weights 0 are skipped, matching the
    reference's half-list contents."""

    style = "rdf"
    scalar = False

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        args = list(args)
        self.cutoff_user = None
        if "cutoff" in args:
            i = args.index("cutoff")
            self.cutoff_user = float(args[i + 1])
            args = args[:i] + args[i + 2:]
        self.nbin = int(args[0])
        rest = [a for a in args[1:]]
        if rest:
            self.typepairs = [(rest[k], rest[k + 1])
                              for k in range(0, len(rest), 2)]
        else:
            self.typepairs = [("*", "*")]

    def _trange(self, spec, ntypes):
        if spec == "*":
            return 1, ntypes
        if "*" in str(spec):
            lo, hi = str(spec).split("*")
            return (int(lo) if lo else 1), (int(hi) if hi else ntypes)
        return int(spec), int(spec)

    def evaluate(self, sim):
        x, typ, tag, gm, ell, per, sp = _host_atoms(sim)
        gbit = sim.groups.get(self.group, 1)
        ing = np.ones(len(x), bool) if self.group == "all" \
            else (gm & gbit) > 0
        cutoff = self.cutoff_user or sim.pair.max_cutoff
        delr = cutoff / self.nbin
        nt = sim.ntypes
        pairs = [(self._trange(a, nt), self._trange(b, nt))
                 for a, b in self.typepairs]
        npairs = len(pairs)
        hist = np.zeros((npairs, self.nbin))
        # special-excluded (w_lj == w_coul == 0) pairs never enter the
        # reference's list; build the excluded tag-pair set
        excl = set()
        if sp is not None:
            stags, scodes = sp
            wl = np.asarray(sim.special_lj)
            wc = (np.asarray(sim.special_coul)
                  if sim.special_coul is not None else wl)
            for i in range(len(x)):
                for t, c in zip(stags[i], scodes[i]):
                    if t > 0 and wl[c] == 0.0 and wc[c] == 0.0:
                        excl.add((tag[i], t))

        for i0, d, r2, c2 in _pair_sweep(x, ell, per, cutoff):
            r = np.sqrt(r2)
            ib = (r / delr).astype(np.int64)
            nblk = r.shape[0]
            rows = np.arange(i0, i0 + nblk)
            ok = (ib < self.nbin) & ing[rows][:, None] & ing[None, :]
            ok[np.arange(nblk), rows] = False  # self
            if excl:
                for (ti, tj) in excl:
                    ii = ti - 1 - i0
                    if 0 <= ii < nblk:
                        ok[ii, tj - 1] = False
            for m, ((il, ih), (jl, jh)) in enumerate(pairs):
                # an ordered full sweep reproduces the reference's
                # half-list ipair+jpair tally exactly: nrdfpair is only
                # registered for the user's (I,J) ordering
                # (compute_rdf.cpp:114-122,347-356), so a symmetric spec
                # counts each unordered pair twice and a cross spec once
                seli = (typ[rows] >= il) & (typ[rows] <= ih)
                selj = (typ >= jl) & (typ <= jh)
                mm = ok & seli[:, None] & selj[None, :]
                np.add.at(hist[m], ib[mm], 1.0)

        vol = float(np.prod(ell))
        const = 4.0 * np.pi / (3.0 * vol)
        out = np.zeros((self.nbin, 1 + 2 * npairs))
        out[:, 0] = (np.arange(self.nbin) + 0.5) * delr
        tcount = np.array([((typ == t) & ing).sum()
                           for t in range(nt + 1)])
        for m, ((il, ih), (jl, jh)) in enumerate(pairs):
            icount = tcount[il:ih + 1].sum()
            jcount = tcount[jl:jh + 1].sum()
            dup = sum(tcount[t] for t in range(il, ih + 1)
                      if jl <= t <= jh)
            normfac = (jcount - dup / icount) if icount > 0 else 0.0
            ncoord = 0.0
            for b in range(self.nbin):
                rlo, rhi = b * delr, (b + 1) * delr
                vfrac = const * (rhi ** 3 - rlo ** 3)
                gr = (hist[m, b] / (vfrac * normfac * icount)
                      if vfrac * normfac != 0.0 else 0.0)
                if icount:
                    ncoord += gr * vfrac * normfac
                out[b, 1 + 2 * m] = gr
                out[b, 2 + 2 * m] = ncoord
        return out


class ComputeCoordAtom(Compute):
    """compute coord/atom cutoff R [type1 type2 ...]: neighbor counts
    within R per atom (src/compute_coord_atom.cpp CUTOFF style)."""

    style = "coord/atom"
    scalar = False
    peratom = True

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        args = list(args)
        if args and args[0] == "cutoff":
            args = args[1:]
        self.cutoff = float(args[0])
        self.typespecs = args[1:]

    def evaluate(self, sim):
        x, typ, tag, gm, ell, per, _ = _host_atoms(sim)
        gbit = sim.groups.get(self.group, 1)
        ing = np.ones(len(x), bool) if self.group == "all" \
            else (gm & gbit) > 0
        specs = self.typespecs or ["*"]
        ncol = len(specs)
        cols = np.zeros((len(x), ncol))
        selj = []
        for spec in specs:
            if spec == "*":
                selj.append(np.ones(len(x), bool))
            else:
                selj.append(typ == int(spec))
        for i0, d, r2, c2 in _pair_sweep(x, ell, per, self.cutoff):
            nblk = r2.shape[0]
            rows = np.arange(i0, i0 + nblk)
            ok = r2 < c2
            ok[np.arange(nblk), rows] = False
            for k, sj in enumerate(selj):
                cols[rows, k] = (ok & sj[None, :]).sum(1)
        cols[~ing] = 0.0
        return cols[:, 0] if ncol == 1 else cols


class ComputeClusterAtom(Compute):
    """compute cluster/atom cutoff: per-atom cluster ID = min atom tag in
    the connected cluster (src/compute_cluster_atom.cpp)."""

    style = "cluster/atom"
    scalar = False
    peratom = True

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.cutoff = float(args[0])

    def evaluate(self, sim):
        x, typ, tag, gm, ell, per, _ = _host_atoms(sim)
        gbit = sim.groups.get(self.group, 1)
        ing = np.ones(len(x), bool) if self.group == "all" \
            else (gm & gbit) > 0
        n = len(x)
        parent = np.arange(n)

        def find(i):
            root = i
            while parent[root] != root:
                root = parent[root]
            while parent[i] != root:
                parent[i], i = root, parent[i]
            return root

        for i0, d, r2, c2 in _pair_sweep(x, ell, per, self.cutoff):
            nblk = r2.shape[0]
            rows = np.arange(i0, i0 + nblk)
            ok = (r2 < c2) & ing[rows][:, None] & ing[None, :]
            ok[np.arange(nblk), rows] = False
            ii, jj = np.nonzero(ok)
            for a, b in zip(rows[ii], jj):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        out = np.zeros(n)
        for i in range(n):
            if ing[i]:
                out[i] = tag[find(i)]
        return out


class ComputeDisplaceAtom(Compute):
    """compute displace/atom: (N,4) dx dy dz |d| vs the positions when
    the compute was defined (src/compute_displace_atom.cpp), using
    unwrapped coordinates."""

    style = "displace/atom"
    scalar = False
    peratom = True

    def _unwrapped(self, sim):
        s = sim.state
        tag = np.asarray(jax.device_get(s.tag))
        valid = tag > 0
        order = np.nonzero(valid)[0][np.argsort(tag[valid])]
        x = np.asarray(jax.device_get(s.x), np.float64)[order]
        img = np.asarray(jax.device_get(s.image))[order]
        ell = np.asarray(jax.device_get(s.box.lengths), np.float64)
        return x + img * ell

    def prepare(self, sim):
        if self._ref is None:
            self._ref = self._unwrapped(sim)

    def evaluate(self, sim):
        self.prepare(sim)
        d = self._unwrapped(sim) - self._ref
        return np.column_stack([d, np.linalg.norm(d, axis=1)])


class ComputeGroupGroup(Compute):
    """compute group/group group2: scalar = pairwise interaction energy
    between the compute group and group2; vector = force on the compute
    group (src/compute_group_group.cpp pair term; the optional kspace
    term is not included)."""

    style = "group/group"
    extensive = True

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.group2 = args[0]
        self.vector = np.zeros(3)

    def evaluate(self, sim):
        import jax.numpy as jnp
        x, typ, tag, gm, ell, per, sp = _host_atoms(sim)
        b1 = sim.groups.get(self.group, 1)
        b2 = sim.groups.get(self.group2)
        if b2 is None:
            raise ValueError(f"undefined group {self.group2!r}")
        sel1 = np.ones(len(x), bool) if self.group == "all" \
            else (gm & b1) > 0
        sel2 = (gm & b2) > 0
        x1, x2 = x[sel1], x[sel2]
        t1, t2 = typ[sel1], typ[sel2]
        d = _min_image(x1[:, None, :] - x2[None, :, :], ell, per)
        r2 = (d * d).sum(-1)
        # exclude identical atoms (overlapping groups)
        same = tag[sel1][:, None] == tag[sel2][None, :]
        r2safe = np.where(same, 1.0, r2)
        ex = getattr(sim.pair, "pair_fn_ex", None)
        if ex is not None:
            q = np.asarray(jax.device_get(sim.state.q), np.float64)
            tagall = np.asarray(jax.device_get(sim.state.tag))
            qt = np.zeros(int(tagall.max()))
            qt[tagall[tagall > 0] - 1] = q[tagall > 0]
            qsorted = qt  # tag order
            one = jnp.ones_like(jnp.asarray(r2safe))
            fpair, e, ec, fcoul = ex(
                jnp.asarray(r2safe), jnp.asarray(t1)[:, None],
                jnp.asarray(t2)[None, :], one, one,
                jnp.asarray(qsorted[sel1])[:, None],
                jnp.asarray(qsorted[sel2])[None, :])
            if fcoul is not None:
                fpair = fpair + fcoul
            if ec is not None:
                e = e + ec
        else:
            fpair, e, ec, fcoul = sim.pair.pair_fn(
                jnp.asarray(r2safe), jnp.asarray(t1)[:, None],
                jnp.asarray(t2)[None, :])
            if ec is not None:
                e = e + ec
            if fcoul is not None:
                fpair = fpair + fcoul
        fpair = np.where(same, 0.0, np.asarray(fpair))
        e = np.where(same, 0.0, np.asarray(e))
        self.vector = (fpair[:, :, None] * d).sum((0, 1))
        return float(e.sum())


class ComputeHeatFlux(Compute):
    """compute heat/flux ke-ID pe-ID stress-ID: 6-vector (Jx Jy Jz +
    convective-only Jcx Jcy Jcz), not volume-normalized
    (src/compute_heat_flux.cpp:97-180)."""

    style = "heat/flux"
    scalar = False
    extensive = True

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.ids = list(args[:3])

    def evaluate(self, sim):
        ke = np.asarray(sim.computes[self.ids[0]].evaluate(sim))
        pe = np.asarray(sim.computes[self.ids[1]].evaluate(sim))
        st = np.asarray(sim.computes[self.ids[2]].evaluate(sim))
        s = sim.state
        tag = np.asarray(jax.device_get(s.tag))
        valid = tag > 0
        order = np.nonzero(valid)[0][np.argsort(tag[valid])]
        v = np.asarray(jax.device_get(s.v), np.float64)[order]
        gm = np.asarray(jax.device_get(s.gmask))[order]
        gbit = sim.groups.get(self.group, 1)
        sel = np.ones(len(v), bool) if self.group == "all" \
            else (gm & gbit) > 0
        eng = (ke + pe)[sel]
        vv, ss = v[sel], st[sel]
        jc = (eng[:, None] * vv).sum(0)
        jv = -np.stack([
            ss[:, 0] * vv[:, 0] + ss[:, 3] * vv[:, 1] + ss[:, 4] * vv[:, 2],
            ss[:, 3] * vv[:, 0] + ss[:, 1] * vv[:, 1] + ss[:, 5] * vv[:, 2],
            ss[:, 4] * vv[:, 0] + ss[:, 5] * vv[:, 1] + ss[:, 2] * vv[:, 2],
        ], axis=1).sum(0) / sim.units.nktv2p
        return np.concatenate([jc + jv, jc])


class ComputeEventDisplace(Compute):
    """compute event/displace Dcut: scalar is non-zero iff any atom has
    moved more than Dcut since the last stored event
    (src/REPLICA/compute_event_displace.cpp:86-140).  Inactive (0.0)
    until an accelerated-dynamics command (prd/tad/hyper) binds its
    event store; the command drives the comparison itself through
    tpumd.md.prd.EventDetector."""

    style = "event/displace"

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        dist = float(args[0])
        if dist <= 0.0:
            raise ValueError(
                "Distance must be > 0 for compute event/displace")
        self.displace_dist = dist
        self.detector = None   # bound by prd/tad/hyper

    def evaluate(self, sim):
        if self.detector is None or self.detector.xevent is None:
            return 0.0
        return 1.0 if self.detector.check(sim, sim._carry) else 0.0


class ComputeDipole(Compute):
    """compute dipole [geometry|mass]: group dipole moment, charged
    groups referenced to the (mass/geometric) center
    (src/compute_dipole.cpp)."""

    style = "dipole"
    scalar = False

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.usecenter = "mass" if not args else str(args[0])

    def _unwrapped(self, sim):
        import jax as _jax
        s = sim.state
        tag = np.asarray(_jax.device_get(s.tag))
        valid = tag > 0
        order = np.nonzero(valid)[0][np.argsort(tag[valid])]
        x = np.asarray(_jax.device_get(s.x), np.float64)[order]
        img = np.asarray(_jax.device_get(s.image))[order]
        ell = np.asarray(_jax.device_get(s.box.lengths), np.float64)
        typ = np.asarray(_jax.device_get(s.type))[order]
        q = (np.zeros(len(order)) if s.q is None
             else np.asarray(_jax.device_get(s.q), np.float64)[order])
        gm = np.asarray(_jax.device_get(s.gmask))[order]
        sel = (gm & sim.groups.get(self.group, 1)) > 0
        return x + img * ell, typ, q, sel

    def evaluate(self, sim):
        xu, typ, q, sel = self._unwrapped(sim)
        m = (sim.mass[typ] if self.usecenter == "mass"
             else np.ones(len(typ)))
        m = np.where(sel, m, 0.0)
        qs = np.where(sel, q, 0.0)
        mt = m.sum()
        com = (xu * m[:, None]).sum(0) / max(mt, 1e-300)
        mu = (xu * qs[:, None]).sum(0) - qs.sum() * com
        return np.array([mu[0], mu[1], mu[2],
                         float(np.sqrt((mu * mu).sum()))])


class ComputeDipoleChunk(ComputeDipole):
    """compute dipole/chunk chunkID [geometry|mass]
    (src/compute_dipole_chunk.cpp): per-chunk dipole vector + norm."""

    style = "dipole/chunk"

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group, args[1:])
        self.chunkid = str(args[0])

    def evaluate(self, sim):
        xu, typ, q, sel = self._unwrapped(sim)
        cchunk = sim.computes[self.chunkid]
        ids = np.asarray(cchunk.evaluate(sim)).astype(np.int64)
        n = cchunk.nchunk
        m = (sim.mass[typ] if self.usecenter == "mass"
             else np.ones(len(typ)))
        m = np.where(sel, m, 0.0)
        qs = np.where(sel, q, 0.0)
        out = np.zeros((n, 4))
        idx = np.clip(ids - 1, 0, n - 1)
        mt = np.zeros(n)
        np.add.at(mt, idx, m)
        com = np.zeros((n, 3))
        np.add.at(com, idx, xu * m[:, None])
        com /= np.maximum(mt, 1e-300)[:, None]
        qtot = np.zeros(n)
        np.add.at(qtot, idx, qs)
        mu = np.zeros((n, 3))
        np.add.at(mu, idx, xu * qs[:, None])
        mu -= qtot[:, None] * com
        out[:, :3] = mu
        out[:, 3] = np.sqrt((mu * mu).sum(1))
        return out


def _dipole_scalar(self, out):
    # c_ID without an index = |mu| (ComputeDipole::compute_scalar)
    return np.asarray(out)[3]


ComputeDipole.evaluate_scalar = _dipole_scalar


def _group_arrays(sim, group):
    import jax as _jax
    s = sim.state
    tag = np.asarray(_jax.device_get(s.tag))
    valid = tag > 0
    order = np.nonzero(valid)[0][np.argsort(tag[valid])]
    x = np.asarray(_jax.device_get(s.x), np.float64)[order]
    v = np.asarray(_jax.device_get(s.v), np.float64)[order]
    typ = np.asarray(_jax.device_get(s.type))[order]
    gm = np.asarray(_jax.device_get(s.gmask))[order]
    sel = (gm & sim.groups.get(group, 1)) > 0
    m = sim.mass[typ]
    return x, v, m, sel


class ComputeTempCOM(Compute):
    """compute temp/com: temperature with the group's center-of-mass
    velocity removed (src/compute_temp_com.cpp)."""

    style = "temp/com"

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)

    def evaluate(self, sim):
        x, v, m, sel = _group_arrays(sim, self.group)
        u = sim.units
        ms = np.where(sel, m, 0.0)
        vcm = (v * ms[:, None]).sum(0) / max(ms.sum(), 1e-300)
        vt = v - vcm
        n = int(sel.sum())
        dof = sim.dimension * n - sim.dimension \
            - sum(fx.dof_removed for fx in sim.fixes)
        ke = (ms * (vt * vt).sum(1)).sum()
        return u.mvv2e * ke / max(dof, 1) / u.boltz


class ComputeTempPartial(Compute):
    """compute temp/partial xflag yflag zflag
    (src/compute_temp_partial.cpp)."""

    style = "temp/partial"

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.flags = np.array([int(a) for a in args[:3]], np.float64)

    def evaluate(self, sim):
        x, v, m, sel = _group_arrays(sim, self.group)
        u = sim.units
        ms = np.where(sel, m, 0.0)
        n = int(sel.sum())
        nper = int(self.flags.sum())
        fix_dof = sum(fx.dof_removed for fx in sim.fixes)
        dof = nper * n - (nper / sim.dimension) * (fix_dof
                                                   + sim.dimension)
        ke = (ms * ((v * self.flags) * v).sum(1)).sum()
        return u.mvv2e * ke / max(dof, 1e-300) / u.boltz


class ComputeTempRegion(Compute):
    """compute temp/region regionID (src/compute_temp_region.cpp):
    temperature of group atoms currently inside the region; dof =
    dim*count - extra_dof."""

    style = "temp/region"

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.region = str(args[0])

    def evaluate(self, sim):
        x, v, m, sel = _group_arrays(sim, self.group)
        u = sim.units
        reg = sim.script.regions[self.region]
        inside = reg.inside(x) & sel
        n = int(inside.sum())
        dof = sim.dimension * n - sim.dimension
        ke = (np.where(inside, m, 0.0) * (v * v).sum(1)).sum()
        return u.mvv2e * ke / max(dof, 1) / u.boltz
