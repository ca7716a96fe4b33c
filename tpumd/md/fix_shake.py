"""fix shake: SHAKE bond/angle constraints.

Reimplements FixShake (src/RIGID/fix_shake.cpp): constraint clusters of
2/3/4 atoms (+ the 3-atom angle variant) built once from the bond
topology, and per-step constraint forces solved from the reference's
quadratic equations — shake() analytically, shake3/shake4/shake3angle by
the same fixed-point iteration with per-cluster convergence freezing.

TPU design: clusters are grouped by category into batched index arrays;
each category is solved vectorized (the iteration is a lax.fori_loop with
a convergence mask).  Clusters are disjoint, so the constraint-force
scatter has no collisions.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpumd.md.fixes import Fix
from tpumd.ops.pairwise import minimum_image


class FixShake(Fix):
    name = "shake"
    contributes_virial = True

    def __init__(self, tol, max_iter, output_every=0, b_types=(),
                 a_types=(), t_types=(), masses=()):
        self.tol = float(tol)
        self.max_iter = int(max_iter)
        self.b_types = set(b_types)
        self.a_types = set(a_types)
        self.t_types = set(t_types)
        self.masses = list(masses)
        self._built = False
        self._ndof_removed = 0

    @classmethod
    def parse(cls, args):
        tol = float(args[0])
        max_iter = int(args[1])
        output = int(args[2])
        b, a, t, m = [], [], [], []
        cur = None
        for tok in args[3:]:
            if tok in ("b", "a", "t", "m"):
                cur = {"b": b, "a": a, "t": t, "m": m}[tok]
            else:
                cur.append(float(tok) if cur is m else int(tok))
        return cls(tol, max_iter, output, b, a, t, m)

    @property
    def dof_removed(self):
        return self._ndof_removed

    # ------------------------------------------------------------- build
    def build_clusters(self, sim, row_of_tag):
        """Identify constraint clusters (FixShake::find_clusters).

        row_of_tag=None (cell-grid engine): cluster indices are stored in
        TAG space (tag-1) and mapped to grid slots per step in _apply —
        stable under the grid's atom re-permutations, same scheme as the
        bonded incidence lists."""
        import jax as _jax
        bonds = sim.topology.get("bond")
        if bonds is None:
            raise ValueError("fix shake requires bonds")
        self._tagspace = row_of_tag is None
        if self._tagspace:
            tags_np = np.asarray(_jax.device_get(sim.state.tag))
            row_of_tag = np.zeros(int(tags_np.max()) + 1, dtype=np.int64)
            row_of_tag[tags_np[tags_np > 0]] = np.nonzero(tags_np > 0)[0]
        angles = sim.topology.get("angle")
        mass = sim.mass
        types = np.asarray(jax.device_get(sim.state.type))
        bond_style = next(b for b in sim.bonded if b.kind == "bond")
        angle_style = next((b for b in sim.bonded if b.kind == "angle"), None)
        r0 = bond_style.r0  # equilibrium distances per bond type

        def mass_match(m):
            return any(abs(m - mv) <= 0.1 for mv in self.masses)

        # constrained bonds (atom rows); remember data-file rows so the
        # bonded styles can exclude them (the reference turns constrained
        # bond/angle types negative so NTopo skips them)
        cons = []  # (rowA, rowB, btype)
        self.excl_bond_rows = []
        for ib, (bt, t1, t2) in enumerate(bonds):
            a = int(row_of_tag[t1]); b = int(row_of_tag[t2])
            sel = (int(bt) in self.b_types
                   or int(types[a]) in self.t_types
                   or int(types[b]) in self.t_types
                   or mass_match(mass[types[a]])
                   or mass_match(mass[types[b]]))
            if sel:
                cons.append((a, b, int(bt)))
                self.excl_bond_rows.append(ib)

        # group by central atom: satellite = the lighter/selected atom
        by_center: dict[int, list] = {}
        nbonds_of = {}
        for a, b, bt in cons:
            nbonds_of[a] = nbonds_of.get(a, 0) + 1
            nbonds_of[b] = nbonds_of.get(b, 0) + 1
        for a, b, bt in cons:
            center, sat = (a, b) if nbonds_of[a] >= nbonds_of[b] else (b, a)
            if nbonds_of[a] == nbonds_of[b]:
                # tie: the heavier atom is central (H is the satellite)
                center, sat = (a, b) if mass[types[a]] >= mass[types[b]] else (b, a)
            by_center.setdefault(center, []).append((sat, bt))

        # angle-constrained clusters: central atom with 2 bonds + matching
        # angle type (water)
        angle_of_center = {}
        self.excl_angle_rows = []
        if angles is not None and self.a_types:
            th0 = angle_style.theta0
            for ia, (at, t1, t2, t3) in enumerate(angles):
                if int(at) in self.a_types:
                    angle_of_center[int(row_of_tag[t2])] = int(at)
                    self.excl_angle_rows.append(ia)

        c2, c3, c4, c3a = [], [], [], []
        ndof = 0
        for center, sats in by_center.items():
            if len(sats) == 1:
                c2.append((center, sats[0][0], sats[0][1]))
                ndof += 1
            elif len(sats) == 2:
                if center in angle_of_center:
                    c3a.append((center, sats[0][0], sats[1][0],
                                sats[0][1], sats[1][1],
                                angle_of_center[center]))
                    ndof += 3
                else:
                    c3.append((center, sats[0][0], sats[1][0],
                               sats[0][1], sats[1][1]))
                    ndof += 2
            elif len(sats) == 3:
                c4.append((center, sats[0][0], sats[1][0], sats[2][0],
                           sats[0][1], sats[1][1], sats[2][1]))
                ndof += 3
            else:
                raise ValueError(
                    f"SHAKE cluster of more than 4 atoms (center {center})")
        self._ndof_removed = ndof

        bond_dist = np.asarray(r0)
        if angle_style is not None and self.a_types:
            th0 = angle_style.theta0  # radians
        self._c2 = np.asarray(c2, dtype=np.int64).reshape(-1, 3)
        self._c3 = np.asarray(c3, dtype=np.int64).reshape(-1, 5)
        self._c4 = np.asarray(c4, dtype=np.int64).reshape(-1, 7)
        self._c3a = np.asarray(c3a, dtype=np.int64).reshape(-1, 6)
        if self._tagspace:
            # store atom columns as tag-1 (mapped to slots per step)
            for arr, nat in ((self._c2, 2), (self._c3, 3), (self._c4, 4),
                             (self._c3a, 3)):
                if len(arr):
                    arr[:, :nat] = tags_np[arr[:, :nat]] - 1
        self._bond_dist = bond_dist
        if len(c3a):
            d01 = bond_dist[self._c3a[:, 3]]
            d02 = bond_dist[self._c3a[:, 4]]
            th = th0[self._c3a[:, 5]]
            self._angle_dist = np.sqrt(
                d01 * d01 + d02 * d02 - 2.0 * d01 * d02 * np.cos(th))
        else:
            self._angle_dist = np.zeros(0)
        self._built = True
        if self._tagspace and getattr(sim, "bonded_grid", False):
            self._install_grid_tables(sim, tags_np)

    def _install_grid_tables(self, sim, tags_np):
        """Per-atom cluster tables for the tag-matched SHAKE path
        (state.extras '_shk_*': they permute with the atoms; each member
        redundantly solves its whole cluster and applies only its own
        force — scatter-free and O(halo) under the z-slab sharding)."""
        import jax.numpy as _jnp
        n = sim.natoms
        mtags = np.zeros((n, 4), np.int32)
        kind = np.zeros((n,), np.int32)
        role = np.zeros((n,), np.int32)
        dist = np.zeros((n, 4), np.float64)

        def fill(rows, nat, code, dists_of):
            for rr in rows:
                tags = [int(t) + 1 for t in rr[:nat]]   # stored tag-1
                dd = dists_of(rr)
                for ro, t in enumerate(tags):
                    a = t - 1
                    mtags[a, :nat] = tags
                    kind[a] = code
                    role[a] = ro
                    dist[a, :len(dd)] = dd

        bd = self._bond_dist
        fill(self._c2, 2, 2, lambda r: [bd[r[2]]])
        fill(self._c3, 3, 3, lambda r: [bd[r[3]], bd[r[4]]])
        fill(self._c4, 4, 4,
             lambda r: [bd[r[4]], bd[r[5]], bd[r[6]]])
        if len(self._c3a):
            ad = {tuple(r[:3]): self._angle_dist[i]
                  for i, r in enumerate(self._c3a)}
            fill(self._c3a, 3, 5,
                 lambda r: [bd[r[3]], bd[r[4]], 0.0,
                            ad[tuple(r[:3])]])
        # reorder tag-order rows into the state's current row order
        order = tags_np - 1
        sim.state = sim.state.replace(extras={
            **sim.state.extras,
            "_shk_mtags": _jnp.asarray(mtags[order]),
            "_shk_kind": _jnp.asarray(kind[order]),
            "_shk_role": _jnp.asarray(role[order]),
            "_shk_dist": _jnp.asarray(dist[order]),
        })

    # ------------------------------------------------------------- solve
    def init_state(self, s, ctx):
        return jnp.zeros((6,), s.x.dtype)  # last constraint virial

    def post_force(self, s, fstate, ctx, xin=None):
        s, virial = self._apply(s, ctx, ctx.dt * ctx.dt * ctx.units.ftm2v)
        return s, virial  # fstate := the constraint virial

    def setup_post_force(self, s, fstate, ctx, xin=None):
        # FixShake::setup = correct_coordinates + shake_end_of_step
        # (src/RIGID/fix_shake.cpp:461-503).
        dtfsq = 0.5 * ctx.dt * ctx.dt * ctx.units.ftm2v
        # correct_coordinates: with v = f = 0 the unconstrained update is
        # the identity, so the solve returns the projection of x onto the
        # constraint manifold; apply it as a position move (:3205-3272).
        # The step-0 energies stay those of the UNcorrected coordinates
        # (the reference computes forces before modify->setup) — only the
        # constraint virial and the step-1+ trajectory see the move.
        zero = jnp.zeros_like(s.f)
        s0 = s.replace(f=zero, v=zero)
        s0, _ = self._apply(s0, ctx, dtfsq)
        invm = 1.0 / ctx.mass_per_atom(s)
        s = s.replace(x=s.x + (dtfsq * invm)[:, None] * s0.f)
        # shake_end_of_step: constraint forces with the velocity-Verlet
        # HALF prefactor on the corrected coordinates
        s, virial = self._apply(s, ctx, dtfsq)
        return s, virial

    def _apply(self, s, ctx, dtfsq):
        dt_ = s.x.dtype
        u = ctx.units
        dtv = ctx.dt
        m = ctx.mass_per_atom(s)
        invm = 1.0 / m
        if getattr(self, "_tagspace", False) and ctx.bonded_grid \
                and "_shk_mtags" in s.extras:
            return self._apply_grid(s, ctx, dtfsq)
        if getattr(self, "_tagspace", False):
            # tag-1 cluster indices -> current grid slots (one small
            # scatter, same per-step map as the bonded incidence path)
            npad = s.x.shape[0]
            n = ctx.natoms
            tgt = jnp.where(s.tag > 0, s.tag - 1, n)
            slotmap = jnp.zeros((n,), jnp.int32).at[tgt].set(
                jnp.arange(npad, dtype=jnp.int32), mode="drop")
            remap = lambda a: slotmap[jnp.asarray(a)]  # noqa: E731
        else:
            remap = jnp.asarray
        # unconstrained update positions
        xshake = s.x + dtv * s.v + (dtfsq * invm)[:, None] * s.f
        f = s.f
        virial = jnp.zeros((6,), dt_)
        box = s.box

        def dvec(xa, xb):
            return minimum_image(xa - xb, box)

        def vtally(virial, lam, r):
            return virial + jnp.stack([
                jnp.sum(lam * r[:, 0] * r[:, 0]),
                jnp.sum(lam * r[:, 1] * r[:, 1]),
                jnp.sum(lam * r[:, 2] * r[:, 2]),
                jnp.sum(lam * r[:, 0] * r[:, 1]),
                jnp.sum(lam * r[:, 0] * r[:, 2]),
                jnp.sum(lam * r[:, 1] * r[:, 2]),
            ])

        # ---- 2-atom clusters (analytic) --------------------------------
        if len(self._c2):
            i0 = remap(self._c2[:, 0])
            i1 = remap(self._c2[:, 1])
            bond = jnp.asarray(self._bond_dist[self._c2[:, 2]], dt_)
            r01 = dvec(s.x[i0], s.x[i1])
            s01 = dvec(xshake[i0], xshake[i1])
            r01sq = jnp.sum(r01 * r01, -1)
            s01sq = jnp.sum(s01 * s01, -1)
            im0 = invm[i0]
            im1 = invm[i1]
            a = (im0 + im1) ** 2 * r01sq
            b = 2.0 * (im0 + im1) * jnp.sum(s01 * r01, -1)
            c = s01sq - bond * bond
            determ = jnp.maximum(b * b - 4.0 * a * c, 0.0)
            sq = jnp.sqrt(determ)
            l1 = (-b + sq) / (2.0 * a)
            l2 = (-b - sq) / (2.0 * a)
            lam = jnp.where(jnp.abs(l1) <= jnp.abs(l2), l1, l2) / dtfsq
            f = f.at[i0].add(lam[:, None] * r01)
            f = f.at[i1].add(-lam[:, None] * r01)
            virial = vtally(virial, lam, r01)

        def members(idxarr, nat):
            idx = [remap(idxarr[:, k]) for k in range(nat)]
            X = [s.x[i] for i in idx]
            XS = [xshake[i] for i in idx]
            IM = [invm[i] for i in idx]
            return idx, X, XS, IM

        # ---- 3-atom, two bonds (iterative 2x2) -------------------------
        if len(self._c3):
            idx, X, XS, IM = members(self._c3, 3)
            lamrs, deltas = self._solve3(
                X, XS, IM, dtfsq, self._bond_dist[self._c3[:, 3]],
                self._bond_dist[self._c3[:, 4]], dvec)
            for i, dlt in zip(idx, deltas):
                f = f.at[i].add(dlt)
            for lam, r in lamrs:
                virial = vtally(virial, lam, r)

        # ---- 3-atom + angle constraint (iterative 3x3) -----------------
        if len(self._c3a):
            idx, X, XS, IM = members(self._c3a, 3)
            lamrs, deltas = self._solve3angle(
                X, XS, IM, dtfsq, self._bond_dist[self._c3a[:, 3]],
                self._bond_dist[self._c3a[:, 4]], self._angle_dist, dvec)
            for i, dlt in zip(idx, deltas):
                f = f.at[i].add(dlt)
            for lam, r in lamrs:
                virial = vtally(virial, lam, r)

        # ---- 4-atom, three bonds (iterative 3x3) -----------------------
        if len(self._c4):
            idx, X, XS, IM = members(self._c4, 4)
            lamrs, deltas = self._solve4(
                X, XS, IM, dtfsq, self._bond_dist[self._c4[:, 4]],
                self._bond_dist[self._c4[:, 5]],
                self._bond_dist[self._c4[:, 6]], dvec)
            for i, dlt in zip(idx, deltas):
                f = f.at[i].add(dlt)
            for lam, r in lamrs:
                virial = vtally(virial, lam, r)

        return s.replace(f=f), virial

    def _apply_grid(self, s, ctx, dtfsq):
        """Tag-matched SHAKE (sharded cellgrid): member data found via
        the 27-stencil sweep, every member solves its cluster, only its
        own force delta lands in its row."""
        from tpumd.ops.cellgrid_tuples import match_members
        dt_ = s.x.dtype
        dtv = ctx.dt
        ex = s.extras
        mtags = ex["_shk_mtags"]
        kind = ex["_shk_kind"]
        role = ex["_shk_role"]
        dist = ex["_shk_dist"].astype(dt_)
        valid = s.tag > 0
        cols = {f"{nm}{c}": arr[:, c]
                for nm, arr in (("v", s.v), ("f", s.f)) for c in range(3)}
        mpos, mtype, _, found, mcols = match_members(
            s.x, s.tag, s.type, None, valid, s.box, ctx.neigh_cfg,
            mtags, cols=cols)
        mv = jnp.stack([jnp.stack([mcols[f"v{c}"][:, k]
                                   for c in range(3)], -1)
                        for k in range(4)], 1)        # (Np,4,3)
        mf = jnp.stack([jnp.stack([mcols[f"f{c}"][:, k]
                                   for c in range(3)], -1)
                        for k in range(4)], 1)
        invm_m = 1.0 / ctx.mass_table[mtype]          # (Np,4)
        xs_m = mpos + dtv * mv + (dtfsq * invm_m)[..., None] * mf
        box = s.box

        def dvec(xa, xb):
            return minimum_image(xa - xb, box)

        # well-conditioned stand-in members for rows of other kinds (a
        # degenerate solve would inf/NaN even though its result is
        # masked out)
        safe = jnp.stack([jnp.zeros_like(s.x),
                          jnp.zeros_like(s.x).at[:, 0].add(1.0),
                          jnp.zeros_like(s.x).at[:, 1].add(1.0),
                          jnp.zeros_like(s.x).at[:, 2].add(1.0)], 1)

        fdelta = jnp.zeros_like(s.x)
        virial = jnp.zeros((6,), dt_)

        def vmask6(lam, r, sel, w):
            lam = jnp.where(sel, lam, 0.0) * w
            return jnp.stack([
                jnp.sum(lam * r[:, 0] * r[:, 0]),
                jnp.sum(lam * r[:, 1] * r[:, 1]),
                jnp.sum(lam * r[:, 2] * r[:, 2]),
                jnp.sum(lam * r[:, 0] * r[:, 1]),
                jnp.sum(lam * r[:, 0] * r[:, 2]),
                jnp.sum(lam * r[:, 1] * r[:, 2]),
            ])

        def run_kind(code, nat, solver, dists, fdelta, virial):
            sel = kind == code
            sel3 = sel[:, None]
            X = [jnp.where(sel3, mpos[:, k], safe[:, k])
                 for k in range(nat)]
            XS = [jnp.where(sel3, xs_m[:, k], safe[:, k])
                  for k in range(nat)]
            IM = [jnp.where(sel, invm_m[:, k], 1.0) for k in range(nat)]
            dd = [jnp.where(sel, d, 1.0) for d in dists]
            lamrs, deltas = solver(X, XS, IM, dtfsq, *dd, dvec)
            own = jnp.zeros_like(s.x)
            for k in range(nat):
                own = jnp.where((role == k)[:, None], deltas[k], own)
            fdelta = fdelta + jnp.where(sel3, own, 0.0)
            for lam, r in lamrs:
                virial = virial + vmask6(lam, r, sel, 1.0 / nat)
            return fdelta, virial

        def solve2(X, XS, IM, dtfsq, bond, dvec):
            r01 = dvec(X[0], X[1])
            s01 = dvec(XS[0], XS[1])
            r01sq = jnp.sum(r01 * r01, -1)
            s01sq = jnp.sum(s01 * s01, -1)
            im0, im1 = IM[0], IM[1]
            a = (im0 + im1) ** 2 * r01sq
            b = 2.0 * (im0 + im1) * jnp.sum(s01 * r01, -1)
            c = s01sq - bond * bond
            determ = jnp.maximum(b * b - 4.0 * a * c, 0.0)
            sq = jnp.sqrt(determ)
            l1 = (-b + sq) / (2.0 * a)
            l2 = (-b - sq) / (2.0 * a)
            lam = jnp.where(jnp.abs(l1) <= jnp.abs(l2), l1, l2) / dtfsq
            return [(lam, r01)], [lam[:, None] * r01, -lam[:, None] * r01]

        fdelta, virial = run_kind(2, 2, solve2, [dist[:, 0]],
                                  fdelta, virial)
        fdelta, virial = run_kind(
            3, 3,
            lambda X, XS, IM, dq, d1, d2, dv: self._solve3(
                X, XS, IM, dq, d1, d2, dv),
            [dist[:, 0], dist[:, 1]], fdelta, virial)
        fdelta, virial = run_kind(
            5, 3,
            lambda X, XS, IM, dq, d1, d2, d12, dv: self._solve3angle(
                X, XS, IM, dq, d1, d2, d12, dv),
            [dist[:, 0], dist[:, 1], dist[:, 3]], fdelta, virial)
        fdelta, virial = run_kind(
            4, 4,
            lambda X, XS, IM, dq, d1, d2, d3, dv: self._solve4(
                X, XS, IM, dq, d1, d2, d3, dv),
            [dist[:, 0], dist[:, 1], dist[:, 2]], fdelta, virial)

        return s.replace(f=s.f + fdelta), virial

    def _iterate(self, quads, binit, ainv, nlam, dtype):
        """Shared fixed-point iteration with per-cluster freezing."""
        nc = binit[0].shape[0]

        def body(_, carry):
            lams, done = carry
            qvals = [q(lams) for q in quads]
            bs = [binit[k] - qvals[k] for k in range(nlam)]
            new = [sum(ainv[k][j] * bs[j] for j in range(nlam))
                   for k in range(nlam)]
            conv = jnp.ones((nc,), bool)
            for k in range(nlam):
                conv = conv & (jnp.abs(new[k] - lams[k]) <= self.tol)
            lams = [jnp.where(done, lams[k], new[k]) for k in range(nlam)]
            return lams, done | conv

        lams = [jnp.zeros((nc,), dtype) for _ in range(nlam)]
        done = jnp.zeros((nc,), bool)
        lams, _ = jax.lax.fori_loop(0, self.max_iter, body, (lams, done))
        return lams

    def _solve3(self, X, XS, IM, dtfsq, d1, d2, dvec):
        """Member-array 2-bond solve: X/XS/IM = per-member positions /
        unconstrained positions / inverse masses.  Returns
        ([(lam, r)...], [per-member force deltas])."""
        dt_ = X[0].dtype
        bond1 = jnp.asarray(d1, dt_); bond2 = jnp.asarray(d2, dt_)
        r01 = dvec(X[0], X[1]); r02 = dvec(X[0], X[2])
        s01 = dvec(XS[0], XS[1]); s02 = dvec(XS[0], XS[2])
        dot = lambda a, b: jnp.sum(a * b, -1)
        r01sq, r02sq = dot(r01, r01), dot(r02, r02)
        s01sq, s02sq = dot(s01, s01), dot(s02, s02)
        im0, im1, im2 = IM[0], IM[1], IM[2]
        a11 = 2.0 * (im0 + im1) * dot(s01, r01)
        a12 = 2.0 * im0 * dot(s01, r02)
        a21 = 2.0 * im0 * dot(s02, r01)
        a22 = 2.0 * (im0 + im2) * dot(s02, r02)
        det = a11 * a22 - a12 * a21
        dinv = 1.0 / det
        ainv = [[a22 * dinv, -a12 * dinv], [-a21 * dinv, a11 * dinv]]
        r0102 = dot(r01, r02)
        q1 = dict(q0101=(im0 + im1) ** 2 * r01sq, q0202=im0 * im0 * r02sq,
                  q0102=2.0 * (im0 + im1) * im0 * r0102)
        q2 = dict(q0101=im0 * im0 * r01sq, q0202=(im0 + im2) ** 2 * r02sq,
                  q0102=2.0 * (im0 + im2) * im0 * r0102)

        quads = [
            lambda l, q=q1: (q["q0101"] * l[0] * l[0]
                             + q["q0202"] * l[1] * l[1]
                             + q["q0102"] * l[0] * l[1]),
            lambda l, q=q2: (q["q0101"] * l[0] * l[0]
                             + q["q0202"] * l[1] * l[1]
                             + q["q0102"] * l[0] * l[1]),
        ]
        binit = [bond1 * bond1 - s01sq, bond2 * bond2 - s02sq]
        l01, l02 = self._iterate(quads, binit, ainv, 2, dt_)
        l01 = l01 / dtfsq
        l02 = l02 / dtfsq
        deltas = [l01[:, None] * r01 + l02[:, None] * r02,
                  -l01[:, None] * r01,
                  -l02[:, None] * r02]
        return [(l01, r01), (l02, r02)], deltas

    def _solve3angle(self, X, XS, IM, dtfsq, d1, d2, d12, dvec):
        dt_ = X[0].dtype
        bond1 = jnp.asarray(d1, dt_); bond2 = jnp.asarray(d2, dt_)
        bond12 = jnp.asarray(d12, dt_)
        r01 = dvec(X[0], X[1]); r02 = dvec(X[0], X[2])
        r12 = dvec(X[1], X[2])
        s01 = dvec(XS[0], XS[1]); s02 = dvec(XS[0], XS[2])
        s12 = dvec(XS[1], XS[2])
        dot = lambda a, b: jnp.sum(a * b, -1)
        r01sq, r02sq, r12sq = dot(r01, r01), dot(r02, r02), dot(r12, r12)
        s01sq, s02sq, s12sq = dot(s01, s01), dot(s02, s02), dot(s12, s12)
        im0, im1, im2 = IM[0], IM[1], IM[2]
        a11 = 2.0 * (im0 + im1) * dot(s01, r01)
        a12 = 2.0 * im0 * dot(s01, r02)
        a13 = -2.0 * im1 * dot(s01, r12)
        a21 = 2.0 * im0 * dot(s02, r01)
        a22 = 2.0 * (im0 + im2) * dot(s02, r02)
        a23 = 2.0 * im2 * dot(s02, r12)
        a31 = -2.0 * im1 * dot(s12, r01)
        a32 = 2.0 * im2 * dot(s12, r02)
        a33 = 2.0 * (im1 + im2) * dot(s12, r12)
        det = (a11 * a22 * a33 + a12 * a23 * a31 + a13 * a21 * a32
               - a11 * a23 * a32 - a12 * a21 * a33 - a13 * a22 * a31)
        dinv = 1.0 / det
        ainv = [
            [dinv * (a22 * a33 - a23 * a32), -dinv * (a12 * a33 - a13 * a32),
             dinv * (a12 * a23 - a13 * a22)],
            [-dinv * (a21 * a33 - a23 * a31), dinv * (a11 * a33 - a13 * a31),
             -dinv * (a11 * a23 - a13 * a21)],
            [dinv * (a21 * a32 - a22 * a31), -dinv * (a11 * a32 - a12 * a31),
             dinv * (a11 * a22 - a12 * a21)],
        ]
        r0102, r0112, r0212 = dot(r01, r02), dot(r01, r12), dot(r02, r12)
        q1 = (lambda l:
              (im0 + im1) ** 2 * r01sq * l[0] * l[0]
              + im0 * im0 * r02sq * l[1] * l[1]
              + im1 * im1 * r12sq * l[2] * l[2]
              + 2.0 * (im0 + im1) * im0 * r0102 * l[0] * l[1]
              - 2.0 * (im0 + im1) * im1 * r0112 * l[0] * l[2]
              - 2.0 * im0 * im1 * r0212 * l[1] * l[2])
        q2 = (lambda l:
              im0 * im0 * r01sq * l[0] * l[0]
              + (im0 + im2) ** 2 * r02sq * l[1] * l[1]
              + im2 * im2 * r12sq * l[2] * l[2]
              + 2.0 * (im0 + im2) * im0 * r0102 * l[0] * l[1]
              + 2.0 * im0 * im2 * r0112 * l[0] * l[2]
              + 2.0 * (im0 + im2) * im2 * r0212 * l[1] * l[2])
        q3 = (lambda l:
              im1 * im1 * r01sq * l[0] * l[0]
              + im2 * im2 * r02sq * l[1] * l[1]
              + (im1 + im2) ** 2 * r12sq * l[2] * l[2]
              - 2.0 * im1 * im2 * r0102 * l[0] * l[1]
              - 2.0 * (im1 + im2) * im1 * r0112 * l[0] * l[2]
              + 2.0 * (im1 + im2) * im2 * r0212 * l[1] * l[2])
        binit = [bond1 * bond1 - s01sq, bond2 * bond2 - s02sq,
                 bond12 * bond12 - s12sq]
        l01, l02, l12 = self._iterate([q1, q2, q3], binit, ainv, 3, dt_)
        l01 = l01 / dtfsq; l02 = l02 / dtfsq; l12 = l12 / dtfsq
        deltas = [l01[:, None] * r01 + l02[:, None] * r02,
                  -l01[:, None] * r01 + l12[:, None] * r12,
                  -l02[:, None] * r02 - l12[:, None] * r12]
        return [(l01, r01), (l02, r02), (l12, r12)], deltas

    def _solve4(self, X, XS, IM, dtfsq, d1, d2, d3, dvec):
        dt_ = X[0].dtype
        b1 = jnp.asarray(d1, dt_); b2 = jnp.asarray(d2, dt_)
        b3 = jnp.asarray(d3, dt_)
        r01 = dvec(X[0], X[1]); r02 = dvec(X[0], X[2])
        r03 = dvec(X[0], X[3])
        s01 = dvec(XS[0], XS[1]); s02 = dvec(XS[0], XS[2])
        s03 = dvec(XS[0], XS[3])
        dot = lambda a, b: jnp.sum(a * b, -1)
        im0, im1, im2, im3 = IM[0], IM[1], IM[2], IM[3]
        a11 = 2.0 * (im0 + im1) * dot(s01, r01)
        a12 = 2.0 * im0 * dot(s01, r02)
        a13 = 2.0 * im0 * dot(s01, r03)
        a21 = 2.0 * im0 * dot(s02, r01)
        a22 = 2.0 * (im0 + im2) * dot(s02, r02)
        a23 = 2.0 * im0 * dot(s02, r03)
        a31 = 2.0 * im0 * dot(s03, r01)
        a32 = 2.0 * im0 * dot(s03, r02)
        a33 = 2.0 * (im0 + im3) * dot(s03, r03)
        det = (a11 * a22 * a33 + a12 * a23 * a31 + a13 * a21 * a32
               - a11 * a23 * a32 - a12 * a21 * a33 - a13 * a22 * a31)
        dinv = 1.0 / det
        ainv = [
            [dinv * (a22 * a33 - a23 * a32), -dinv * (a12 * a33 - a13 * a32),
             dinv * (a12 * a23 - a13 * a22)],
            [-dinv * (a21 * a33 - a23 * a31), dinv * (a11 * a33 - a13 * a31),
             -dinv * (a11 * a23 - a13 * a21)],
            [dinv * (a21 * a32 - a22 * a31), -dinv * (a11 * a32 - a12 * a31),
             dinv * (a11 * a22 - a12 * a21)],
        ]
        r01sq, r02sq, r03sq = dot(r01, r01), dot(r02, r02), dot(r03, r03)
        s01sq, s02sq, s03sq = dot(s01, s01), dot(s02, s02), dot(s03, s03)
        r0102, r0103, r0203 = dot(r01, r02), dot(r01, r03), dot(r02, r03)

        q1 = (lambda l:
              (im0 + im1) ** 2 * r01sq * l[0] * l[0]
              + im0 * im0 * r02sq * l[1] * l[1]
              + im0 * im0 * r03sq * l[2] * l[2]
              + 2.0 * (im0 + im1) * im0 * r0102 * l[0] * l[1]
              + 2.0 * (im0 + im1) * im0 * r0103 * l[0] * l[2]
              + 2.0 * im0 * im0 * r0203 * l[1] * l[2])
        q2 = (lambda l:
              im0 * im0 * r01sq * l[0] * l[0]
              + (im0 + im2) ** 2 * r02sq * l[1] * l[1]
              + im0 * im0 * r03sq * l[2] * l[2]
              + 2.0 * (im0 + im2) * im0 * r0102 * l[0] * l[1]
              + 2.0 * im0 * im0 * r0103 * l[0] * l[2]
              + 2.0 * (im0 + im2) * im0 * r0203 * l[1] * l[2])
        q3 = (lambda l:
              im0 * im0 * r01sq * l[0] * l[0]
              + im0 * im0 * r02sq * l[1] * l[1]
              + (im0 + im3) ** 2 * r03sq * l[2] * l[2]
              + 2.0 * im0 * im0 * r0102 * l[0] * l[1]
              + 2.0 * (im0 + im3) * im0 * r0103 * l[0] * l[2]
              + 2.0 * (im0 + im3) * im0 * r0203 * l[1] * l[2])
        binit = [b1 * b1 - s01sq, b2 * b2 - s02sq, b3 * b3 - s03sq]
        l01, l02, l03 = self._iterate([q1, q2, q3], binit, ainv, 3, dt_)
        l01 = l01 / dtfsq; l02 = l02 / dtfsq; l03 = l03 / dtfsq
        deltas = [l01[:, None] * r01 + l02[:, None] * r02
                  + l03[:, None] * r03,
                  -l01[:, None] * r01,
                  -l02[:, None] * r02,
                  -l03[:, None] * r03]
        return [(l01, r01), (l02, r02), (l03, r03)], deltas


class FixRattle(FixShake):
    """fix rattle: SHAKE coordinate constraints + RATTLE velocity
    constraints (src/RIGID/fix_rattle.cpp).

    Hook mapping mirrors the reference's setmask (:103): the velocity
    correction runs at POST_FORCE (vrattle* on the unconstrained
    half-kick prediction vp = v + dtf*f/m, :147-175), and the SHAKE
    coordinate constraint force moves to FINAL_INTEGRATE (:213-217) so
    it lands in f *after* the integrator's final half kick — its effect
    carries into the next step's initial_integrate, while this step's
    velocities are corrected directly.  Per the reference docs, list
    `fix rattle` after the integrator fix.

    The per-cluster linear systems are solved exactly (solve2x2exactly /
    solve3x3exactly), vectorized over clusters per category.
    """

    name = "rattle"

    def post_force(self, s, fstate, ctx, xin=None):
        dtfv = 0.5 * ctx.dt * ctx.units.ftm2v
        invm = 1.0 / ctx.mass_per_atom(s)
        vp = s.v + (dtfv * invm)[:, None] * s.f
        v = s.v
        box = s.box
        remap = self._remap_fn(s, ctx)

        def dvec(xa, xb):
            return minimum_image(xa - xb, box)

        dot = lambda a, b: jnp.sum(a * b, -1)  # noqa: E731

        if len(self._c2):
            i0, i1 = remap(self._c2[:, 0]), remap(self._c2[:, 1])
            r01 = dvec(s.x[i1], s.x[i0])
            vp01 = vp[i1] - vp[i0]
            im0, im1 = invm[i0], invm[i1]
            l01 = -dot(r01, vp01) / (dot(r01, r01) * (im0 + im1))
            v = v.at[i0].add(-(im0 * l01)[:, None] * r01)
            v = v.at[i1].add((im1 * l01)[:, None] * r01)

        if len(self._c3):
            i0 = remap(self._c3[:, 0]); i1 = remap(self._c3[:, 1])
            i2 = remap(self._c3[:, 2])
            r01 = dvec(s.x[i1], s.x[i0]); r02 = dvec(s.x[i2], s.x[i0])
            vp01 = vp[i1] - vp[i0]; vp02 = vp[i2] - vp[i0]
            im0, im1, im2 = invm[i0], invm[i1], invm[i2]
            a11 = (im1 + im0) * dot(r01, r01)
            a12 = im0 * dot(r01, r02)
            a22 = (im0 + im2) * dot(r02, r02)
            c1, c2 = -dot(vp01, r01), -dot(vp02, r02)
            det = a11 * a22 - a12 * a12
            l0 = (c1 * a22 - c2 * a12) / det
            l1 = (a11 * c2 - a12 * c1) / det
            v = v.at[i0].add(-im0[:, None] * (l0[:, None] * r01
                                              + l1[:, None] * r02))
            v = v.at[i1].add(im1[:, None] * l0[:, None] * r01)
            v = v.at[i2].add(im2[:, None] * l1[:, None] * r02)

        if len(self._c3a):
            i0 = remap(self._c3a[:, 0]); i1 = remap(self._c3a[:, 1])
            i2 = remap(self._c3a[:, 2])
            r01 = dvec(s.x[i1], s.x[i0]); r02 = dvec(s.x[i2], s.x[i0])
            r12 = dvec(s.x[i2], s.x[i1])
            vp01 = vp[i1] - vp[i0]; vp02 = vp[i2] - vp[i0]
            vp12 = vp[i2] - vp[i1]
            im0, im1, im2 = invm[i0], invm[i1], invm[i2]
            a = [[(im1 + im0) * dot(r01, r01),
                  im0 * dot(r01, r02),
                  -im1 * dot(r01, r12)],
                 [None, (im0 + im2) * dot(r02, r02),
                  im2 * dot(r02, r12)],
                 [None, None, (im2 + im1) * dot(r12, r12)]]
            a[1] = [a[0][1], a[1][1], a[1][2]]
            a[2] = [a[0][2], a[1][2], a[2][2]]
            c = [-dot(vp01, r01), -dot(vp02, r02), -dot(vp12, r12)]
            l0, l1, l2 = self._cramer3(a, c)
            v = v.at[i0].add(-im0[:, None] * (l0[:, None] * r01
                                              + l1[:, None] * r02))
            v = v.at[i1].add(-im1[:, None] * (-l0[:, None] * r01
                                              + l2[:, None] * r12))
            v = v.at[i2].add(-im2[:, None] * (-l1[:, None] * r02
                                              - l2[:, None] * r12))

        if len(self._c4):
            i0 = remap(self._c4[:, 0]); i1 = remap(self._c4[:, 1])
            i2 = remap(self._c4[:, 2]); i3 = remap(self._c4[:, 3])
            r01 = dvec(s.x[i1], s.x[i0]); r02 = dvec(s.x[i2], s.x[i0])
            r03 = dvec(s.x[i3], s.x[i0])
            vp01 = vp[i1] - vp[i0]; vp02 = vp[i2] - vp[i0]
            vp03 = vp[i3] - vp[i0]
            im0, im1 = invm[i0], invm[i1]
            im2, im3 = invm[i2], invm[i3]
            a = [[(im0 + im1) * dot(r01, r01), im0 * dot(r01, r02),
                  im0 * dot(r01, r03)],
                 [None, (im0 + im2) * dot(r02, r02), im0 * dot(r02, r03)],
                 [None, None, (im0 + im3) * dot(r03, r03)]]
            a[1] = [a[0][1], a[1][1], a[1][2]]
            a[2] = [a[0][2], a[1][2], a[2][2]]
            c = [-dot(vp01, r01), -dot(vp02, r02), -dot(vp03, r03)]
            l0, l1, l2 = self._cramer3(a, c)
            v = v.at[i0].add(-im0[:, None] * (l0[:, None] * r01
                                              + l1[:, None] * r02
                                              + l2[:, None] * r03))
            v = v.at[i1].add(im1[:, None] * l0[:, None] * r01)
            v = v.at[i2].add(im2[:, None] * l1[:, None] * r02)
            v = v.at[i3].add(im3[:, None] * l2[:, None] * r03)

        return s.replace(v=v), fstate

    def final_integrate(self, s, fstate, ctx):
        """FixRattle::final_integrate — SHAKE coordinate constraint force
        (lands after the integrator's final kick; effective next step).
        RATTLE keeps the HALF dtfsq prefactor (fix_shake.cpp:485-486:
        `if (!rattle) dtfsq = dt*dt*ftm2v`): with velocities already
        corrected, the constraint force enters the next position update
        only through the drift term."""
        s, virial = self._apply(
            s, ctx, 0.5 * ctx.dt * ctx.dt * ctx.units.ftm2v)
        return s, virial

    def _remap_fn(self, s, ctx):
        if getattr(self, "_tagspace", False):
            npad = s.x.shape[0]
            n = ctx.natoms
            tgt = jnp.where(s.tag > 0, s.tag - 1, n)
            slotmap = jnp.zeros((n,), jnp.int32).at[tgt].set(
                jnp.arange(npad, dtype=jnp.int32), mode="drop")
            return lambda a: slotmap[jnp.asarray(a)]
        return jnp.asarray

    @staticmethod
    def _cramer3(a, c):
        """Exact 3x3 solve (solve3x3exactly), vectorized over clusters."""
        det = (a[0][0] * a[1][1] * a[2][2] + a[0][1] * a[1][2] * a[2][0]
               + a[0][2] * a[1][0] * a[2][1]
               - a[0][0] * a[1][2] * a[2][1] - a[0][1] * a[1][0] * a[2][2]
               - a[0][2] * a[1][1] * a[2][0])
        dinv = 1.0 / det
        ai = [
            [dinv * (a[1][1] * a[2][2] - a[1][2] * a[2][1]),
             -dinv * (a[0][1] * a[2][2] - a[0][2] * a[2][1]),
             dinv * (a[0][1] * a[1][2] - a[0][2] * a[1][1])],
            [-dinv * (a[1][0] * a[2][2] - a[1][2] * a[2][0]),
             dinv * (a[0][0] * a[2][2] - a[0][2] * a[2][0]),
             -dinv * (a[0][0] * a[1][2] - a[0][2] * a[1][0])],
            [dinv * (a[1][0] * a[2][1] - a[1][1] * a[2][0]),
             -dinv * (a[0][0] * a[2][1] - a[0][1] * a[2][0]),
             dinv * (a[0][0] * a[1][1] - a[0][1] * a[1][0])],
        ]
        return [ai[k][0] * c[0] + ai[k][1] * c[1] + ai[k][2] * c[2]
                for k in range(3)]
