"""Breadth wave of core computes (host-side, output steps).

Global style-energy computes (src/compute_pair.cpp, compute_bond.cpp,
compute_angle.cpp, compute_dihedral.cpp, compute_improper.cpp),
bias temperatures (compute_temp_ramp.cpp, compute_temp_profile.cpp,
compute_temp_sphere.cpp, compute_temp_deform.cpp), slicing/reduction
utilities (compute_slice.cpp, compute_reduce_region.cpp,
compute_chunk_spread_atom.cpp, compute_global_atom.cpp,
compute_reduce_chunk.cpp) and bond-connectivity clustering
(compute_fragment_atom.cpp, compute_aggregate_atom.cpp).
"""

from __future__ import annotations

import jax
import numpy as np

from tpumd.md.compute_styles import Compute
from tpumd.md.compute_pair import _group_arrays


def _raw_energies(sim):
    """Extensive (unnormalized) energy terms from the last force eval."""
    e = {k: float(np.asarray(jax.device_get(v)))
         for k, v in sim._last_energies.items()}
    return e


class ComputePairEnergy(Compute):
    """compute pair pstyle [evdwl|ecoul|epair]: energy of the (matching)
    pair style.  Scalar = evdwl+ecoul (tail excluded, as the reference's
    eng_vdwl/eng_coul sums); vector = [evdwl, ecoul]
    (src/compute_pair.cpp:112-139)."""

    style = "pair"
    scalar = False

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        if not args:
            raise ValueError("compute pair needs a pair style name")
        self.pstyle = args[0]
        self.which = args[1] if len(args) > 1 else "epair"

    def evaluate(self, sim):
        pname = getattr(sim.pair, "name", None)
        if pname is None:
            raise ValueError("compute pair: no pair style defined")
        if pname != self.pstyle and not str(pname).startswith("hybrid"):
            raise ValueError(
                f"compute pair style {self.pstyle!r} does not match "
                f"defined pair style {pname!r}")
        if str(pname).startswith("hybrid") and self.pstyle != pname:
            raise ValueError(
                "compute pair on individual hybrid sub-styles is not "
                "supported yet (per-sub-style energy tallies)")
        e = _raw_energies(sim)
        if self.which == "evdwl":
            return e.get("evdwl", 0.0)
        if self.which == "ecoul":
            return e.get("ecoul", 0.0)
        return np.array([e.get("evdwl", 0.0), e.get("ecoul", 0.0)])


class _ComputeBondedEnergy(Compute):
    """Scalar energy of one bonded term kind (compute_bond.cpp etc.)."""

    kind = None
    ekey = None

    def evaluate(self, sim):
        for b in sim.bonded:
            if b.kind == self.kind and hasattr(b, "subs") \
                    and hasattr(b, "type_map"):
                raise ValueError(
                    f"compute {self.kind} per-sub-style energies on a "
                    "hybrid style are not supported yet")
        e = _raw_energies(sim)
        return e.get(self.ekey, 0.0)


class ComputeBondEnergy(_ComputeBondedEnergy):
    style = "bond"
    kind, ekey = "bond", "ebond"


class ComputeAngleEnergy(_ComputeBondedEnergy):
    style = "angle"
    kind, ekey = "angle", "eangle"


class ComputeDihedralEnergy(_ComputeBondedEnergy):
    style = "dihedral"
    kind, ekey = "dihedral", "edihed"


class ComputeImproperEnergy(_ComputeBondedEnergy):
    style = "improper"
    kind, ekey = "improper", "eimp"


def _fix_dof(sim):
    return sum(fx.dof_removed for fx in sim.fixes)


class ComputeTempRamp(Compute):
    """compute temp/ramp vdim vlo vhi dim clo chi: temperature with a
    linear velocity ramp removed (src/compute_temp_ramp.cpp)."""

    style = "temp/ramp"

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.v_dim = "xyz".index(args[0].lstrip("v"))
        self.v_lo, self.v_hi = float(args[1]), float(args[2])
        self.c_dim = "xyz".index(args[3])
        self.c_lo, self.c_hi = float(args[4]), float(args[5])

    def evaluate(self, sim):
        x, v, m, sel = _group_arrays(sim, self.group)
        u = sim.units
        frac = np.clip((x[:, self.c_dim] - self.c_lo)
                       / (self.c_hi - self.c_lo), 0.0, 1.0)
        vt = v.copy()
        vt[:, self.v_dim] -= self.v_lo + frac * (self.v_hi - self.v_lo)
        ms = np.where(sel, m, 0.0)
        n = int(sel.sum())
        dof = sim.dimension * n - sim.dimension - _fix_dof(sim)
        ke = (ms * (vt * vt).sum(1)).sum()
        return u.mvv2e * ke / max(dof, 1) / u.boltz


class ComputeTempProfile(Compute):
    """compute temp/profile xflag yflag zflag bin_style args: subtract
    per-bin mean streaming velocity; dof -= nstreaming*nbins
    (src/compute_temp_profile.cpp:197-252)."""

    style = "temp/profile"

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.flags = [int(args[0]), int(args[1]), int(args[2])]
        if args[3] != "bin":
            raise ValueError("temp/profile supports binning style 'bin'")
        self.bin_dims = []
        self.nbin = []
        i = 4
        for tok in args[4]:
            self.bin_dims.append("xyz".index(tok))
        for k in range(len(self.bin_dims)):
            self.nbin.append(int(args[5 + k]))

    def _bin_ids(self, sim, x):
        lo = np.asarray(jax.device_get(sim.state.box.lo), np.float64)
        hi = np.asarray(jax.device_get(sim.state.box.hi), np.float64)
        ids = np.zeros(len(x), np.int64)
        mult = 1
        for d, nb in zip(self.bin_dims, self.nbin):
            ib = np.clip(((x[:, d] - lo[d]) / (hi[d] - lo[d]) * nb)
                         .astype(np.int64), 0, nb - 1)
            ids = ids * nb + ib
            mult *= nb
        return ids, mult

    def evaluate(self, sim):
        x, v, m, sel = _group_arrays(sim, self.group)
        u = sim.units
        ids, nbins = self._bin_ids(sim, x)
        ms = np.where(sel, m, 0.0)
        vt = v.copy()
        nstream = 0
        for d in range(3):
            if not self.flags[d]:
                continue
            nstream += 1
            wsum = np.bincount(ids, weights=ms, minlength=nbins)
            vsum = np.bincount(ids, weights=ms * v[:, d], minlength=nbins)
            vave = vsum / np.maximum(wsum, 1e-300)
            vt[:, d] -= vave[ids]
        n = int(sel.sum())
        dof = sim.dimension * n - sim.dimension - _fix_dof(sim) \
            - nstream * nbins
        ke = (ms * (vt * vt).sum(1)).sum()
        return u.mvv2e * ke / max(dof, 1) / u.boltz


class ComputeTempSphere(Compute):
    """compute temp/sphere: translational + rotational KE of finite
    spheres; dof adds 3 (2 in 2d) per finite-radius atom
    (src/compute_temp_sphere.cpp)."""

    style = "temp/sphere"

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.dof_mode = "all"
        a = list(args)
        if len(a) >= 2 and a[0] == "dof":
            self.dof_mode = a[1]

    def evaluate(self, sim):
        s = sim.state
        tag = np.asarray(jax.device_get(s.tag))
        valid = tag > 0
        order = np.nonzero(valid)[0][np.argsort(tag[valid])]
        v = np.asarray(jax.device_get(s.v), np.float64)[order]
        omega = np.asarray(jax.device_get(s.omega), np.float64)[order]
        radius = np.asarray(jax.device_get(s.radius), np.float64)[order]
        rmass = np.asarray(jax.device_get(s.rmass), np.float64)[order]
        gm = np.asarray(jax.device_get(s.gmask))[order]
        sel = (gm & sim.groups.get(self.group, 1)) > 0
        u = sim.units
        ms = np.where(sel, rmass, 0.0)
        inertia = 0.4 * ms * radius * radius
        ke = (ms * (v * v).sum(1)).sum()
        ke += (inertia * (omega * omega).sum(1)).sum()
        n = int(sel.sum())
        nfinite = int((sel & (radius > 0)).sum())
        rot_per = 3 if sim.dimension == 3 else 1
        dof = sim.dimension * n - sim.dimension - _fix_dof(sim)
        if self.dof_mode == "all":
            dof += rot_per * nfinite
        return u.mvv2e * ke / max(dof, 1) / u.boltz


class ComputeTempDeform(Compute):
    """compute temp/deform: temperature with the box-deformation
    streaming velocity removed (vstream = h_rate*lamda + h_ratelo,
    src/compute_temp_deform.cpp:120-175).  The rate comes from the
    active fix deform's linear targets over its run window."""

    style = "temp/deform"

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)

    def _rates(self, sim):
        """(h_rate diag (3,), h_ratelo (3,), tilt rate dict) from the
        active fix deform; zeros when none is defined."""
        from tpumd.md.fix_deform import FixDeform
        for i, fx in enumerate(sim.fixes):
            if isinstance(fx, FixDeform):
                return fx.current_rates(sim, sim._carry[2][i])
        return np.zeros(3), np.zeros(3), {}

    def evaluate(self, sim):
        x, v, m, sel = _group_arrays(sim, self.group)
        u = sim.units
        lo = np.asarray(jax.device_get(sim.state.box.lo), np.float64)
        hi = np.asarray(jax.device_get(sim.state.box.hi), np.float64)
        h_rate, h_ratelo, tilt = self._rates(sim)
        lam = (x - lo) / np.maximum(hi - lo, 1e-300)
        vstream = lam * h_rate + h_ratelo
        # triclinic shear streaming: vx += xy_rate * lamda_y etc.
        if tilt:
            vstream[:, 0] += tilt.get("xy", 0.0) * lam[:, 1] \
                + tilt.get("xz", 0.0) * lam[:, 2]
            vstream[:, 1] += tilt.get("yz", 0.0) * lam[:, 2]
        vt = v - vstream
        ms = np.where(sel, m, 0.0)
        n = int(sel.sum())
        dof = sim.dimension * n - sim.dimension - _fix_dof(sim)
        ke = (ms * (vt * vt).sum(1)).sum()
        return u.mvv2e * ke / max(dof, 1) / u.boltz

    def remove_bias(self, sim, v_np):
        """Thermal velocities for thermostats that scale a bias-removed
        temperature (fix nvt/sllod calls this)."""
        x, _, _, _ = _group_arrays(sim, self.group)
        lo = np.asarray(jax.device_get(sim.state.box.lo), np.float64)
        hi = np.asarray(jax.device_get(sim.state.box.hi), np.float64)
        h_rate, h_ratelo, tilt = self._rates(sim)
        lam = (x - lo) / np.maximum(hi - lo, 1e-300)
        vstream = lam * h_rate + h_ratelo
        if tilt:
            vstream[:, 0] += tilt.get("xy", 0.0) * lam[:, 1] \
                + tilt.get("xz", 0.0) * lam[:, 2]
            vstream[:, 1] += tilt.get("yz", 0.0) * lam[:, 2]
        return v_np - vstream, vstream


class ComputeERotateSphereAtom(Compute):
    """Per-atom rotational KE of spheres
    (src/compute_erotate_sphere_atom.cpp)."""

    style = "erotate/sphere/atom"
    scalar = False
    peratom = True

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)

    def evaluate(self, sim):
        s = sim.state
        tag = np.asarray(jax.device_get(s.tag))
        valid = tag > 0
        order = np.nonzero(valid)[0][np.argsort(tag[valid])]
        omega = np.asarray(jax.device_get(s.omega), np.float64)[order]
        radius = np.asarray(jax.device_get(s.radius), np.float64)[order]
        rmass = np.asarray(jax.device_get(s.rmass), np.float64)[order]
        return 0.5 * sim.units.mvv2e * 0.4 * rmass * radius * radius \
            * (omega * omega).sum(1)


class ComputeSlice(Compute):
    """compute slice Nstart Nstop Nskip input1 ...: rows of global
    vectors/arrays from c_/f_ references (src/compute_slice.cpp)."""

    style = "slice"
    scalar = False

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.start, self.stop, self.skip = (int(args[0]), int(args[1]),
                                            int(args[2]))
        self.inputs = list(args[3:])

    def _fetch(self, sim, name):
        col = None
        base = name[2:]
        if "[" in base:
            base, rest = base.split("[", 1)
            col = int(rest.rstrip("]")) - 1
        if name.startswith("c_"):
            out = np.atleast_1d(np.asarray(sim.computes[base].evaluate(sim),
                                           np.float64))
        elif name.startswith("f_"):
            fx = next(f for f in sim.fixes if getattr(f, "id", None) == base)
            out = np.atleast_1d(np.asarray(fx.output(sim), np.float64))
        else:
            raise ValueError(f"slice input {name!r} must be c_ or f_")
        if out.ndim == 2 and col is not None:
            out = out[:, col]
        return out

    def evaluate(self, sim):
        rows = slice(self.start - 1, self.stop, self.skip)
        cols = [self._fetch(sim, nm)[rows] for nm in self.inputs]
        return cols[0] if len(cols) == 1 else np.stack(cols, axis=1)


class ComputeReduceRegion(Compute):
    """compute reduce/region region-ID mode inputs
    (src/compute_reduce_region.cpp): reduce restricted to atoms inside
    the region."""

    style = "reduce/region"

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.region = args[0]
        self.mode = args[1]
        self.inputs = list(args[2:])

    def evaluate(self, sim):
        from tpumd.md.compute_styles import ComputeReduce
        from tpumd.md.peratom import _tag_order
        red = ComputeReduce(self.id, self.group,
                            [self.mode] + self.inputs)
        reg = sim.script.regions[self.region]
        order = _tag_order(sim)
        x = np.asarray(jax.device_get(sim.state.x), np.float64)[order]
        inside = np.asarray(reg.inside(x), bool)
        fn = {"sum": np.sum, "min": np.min, "max": np.max,
              "ave": np.mean, "sumsq": lambda a: np.sum(a * a)}[self.mode]
        outs = []
        for nm in self.inputs:
            col = np.asarray(red._input(sim, nm), np.float64)
            col = col[inside] if col.shape[0] == len(inside) else col
            outs.append(fn(col) if col.size else 0.0)
        out = np.array(outs)
        return out[0] if len(out) == 1 else out


class ComputeChunkSpreadAtom(Compute):
    """compute chunk/spread/atom chunkID input1 ...: spread per-chunk
    global values back onto atoms (src/compute_chunk_spread_atom.cpp)."""

    style = "chunk/spread/atom"
    scalar = False
    peratom = True

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.chunk_id = args[0]
        self.inputs = list(args[1:])

    def evaluate(self, sim):
        chunk = sim.computes[self.chunk_id]
        ids = np.asarray(chunk.evaluate(sim), np.int64)  # 1-based
        cols = []
        for nm in self.inputs:
            col = None
            base = nm[2:]
            if "[" in base:
                base, rest = base.split("[", 1)
                col = int(rest.rstrip("]")) - 1
            if nm.startswith("c_"):
                g = np.asarray(sim.computes[base].evaluate(sim), np.float64)
            elif nm.startswith("f_"):
                fx = next(f for f in sim.fixes
                          if getattr(f, "id", None) == base)
                g = np.asarray(fx.output(sim), np.float64)
            else:
                raise ValueError(f"chunk/spread/atom input {nm!r}")
            if g.ndim == 2 and col is not None:
                g = g[:, col]
            idx = np.clip(ids, 1, len(g)) - 1
            out = np.where((ids >= 1) & (ids <= len(g)), g[idx], 0.0)
            cols.append(out)
        return cols[0] if len(cols) == 1 else np.stack(cols, axis=1)


class ComputeGlobalAtom(Compute):
    """compute global/atom index_input value_inputs: per-atom indexing
    into global vectors (src/compute_global_atom.cpp)."""

    style = "global/atom"
    scalar = False
    peratom = True

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.index_in = args[0]
        self.inputs = list(args[1:])

    def _peratom(self, sim, name):
        from tpumd.md.compute_styles import ComputeReduce
        red = ComputeReduce(self.id, self.group, ["sum", name])
        return np.asarray(red._input(sim, name), np.float64)

    def evaluate(self, sim):
        idx = np.asarray(self._peratom(sim, self.index_in)).astype(np.int64)
        cols = []
        for nm in self.inputs:
            col = None
            base = nm[2:]
            if "[" in base:
                base, rest = base.split("[", 1)
                col = int(rest.rstrip("]")) - 1
            if nm.startswith("c_"):
                g = np.asarray(sim.computes[base].evaluate(sim), np.float64)
            elif nm.startswith("f_"):
                fx = next(f for f in sim.fixes
                          if getattr(f, "id", None) == base)
                g = np.asarray(fx.output(sim), np.float64)
            elif nm.startswith("v_"):
                g = np.asarray(sim.script.evaluate_variable(base),
                               np.float64)
            else:
                raise ValueError(f"global/atom input {nm!r}")
            if g.ndim == 2 and col is not None:
                g = g[:, col]
            j = np.clip(idx, 1, len(g)) - 1
            out = np.where((idx >= 1) & (idx <= len(g)), g[j], 0.0)
            cols.append(out)
        return cols[0] if len(cols) == 1 else np.stack(cols, axis=1)


class ComputeReduceChunk(Compute):
    """compute reduce/chunk chunkID mode inputs: per-chunk reduction of
    per-atom values (src/compute_reduce_chunk.cpp)."""

    style = "reduce/chunk"
    scalar = False

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.chunk_id = args[0]
        self.mode = args[1]
        self.inputs = list(args[2:])

    def evaluate(self, sim):
        from tpumd.md.compute_styles import ComputeReduce
        chunk = sim.computes[self.chunk_id]
        ids = np.asarray(chunk.evaluate(sim), np.int64)
        nchunk = int(chunk.nchunk)
        red = ComputeReduce(self.id, self.group, [self.mode] + self.inputs)
        outs = []
        init = {"sum": 0.0, "ave": 0.0,
                "min": np.inf, "max": -np.inf}[self.mode]
        for nm in self.inputs:
            col = np.asarray(red._input(sim, nm), np.float64)
            out = np.full(nchunk, init)
            valid = (ids >= 1) & (ids <= nchunk)
            ci = ids[valid] - 1
            cv = col[valid]
            if self.mode in ("sum", "ave"):
                out = np.bincount(ci, weights=cv, minlength=nchunk)
                if self.mode == "ave":
                    cnt = np.bincount(ci, minlength=nchunk)
                    out = out / np.maximum(cnt, 1)
            elif self.mode == "min":
                np.minimum.at(out, ci, cv)
            else:
                np.maximum.at(out, ci, cv)
            outs.append(out)
        return outs[0] if len(outs) == 1 else np.stack(outs, axis=1)


def _bond_clusters(sim, sel):
    """Per-atom cluster ids from bond connectivity (union-find over the
    topology bond list), restricted to selected atoms; id = smallest
    atom tag in the cluster, 0 outside the group
    (compute_fragment_atom.cpp semantics)."""
    n = int(np.asarray(jax.device_get(sim.state.tag)).max())
    parent = np.arange(n + 1)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    bonds = sim.topology.get("bond")
    if bonds is not None:
        for row in np.asarray(bonds):
            a, b = int(row[1]), int(row[2])
            if a < 1 or b < 1 or not (sel[a - 1] and sel[b - 1]):
                continue
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    out = np.zeros(n, np.float64)
    for t in range(1, n + 1):
        if sel[t - 1]:
            out[t - 1] = find(t)
    return out


class ComputeFragmentAtom(Compute):
    """compute fragment/atom: fragment ID (smallest tag in the
    bond-connected component) per atom (src/compute_fragment_atom.cpp)."""

    style = "fragment/atom"
    scalar = False
    peratom = True

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)

    def evaluate(self, sim):
        tag = np.asarray(jax.device_get(sim.state.tag))
        valid = tag > 0
        order = np.nonzero(valid)[0][np.argsort(tag[valid])]
        gm = np.asarray(jax.device_get(sim.state.gmask))[order]
        sel = (gm & sim.groups.get(self.group, 1)) > 0
        return _bond_clusters(sim, sel)


class ComputeAggregateAtom(Compute):
    """compute aggregate/atom cutoff: cluster ID where atoms are
    connected by bonds OR proximity within the cutoff
    (src/compute_aggregate_atom.cpp)."""

    style = "aggregate/atom"
    scalar = False
    peratom = True

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.cutoff = float(args[0])

    def evaluate(self, sim):
        from tpumd.md.compute_pair import ComputeClusterAtom
        # proximity clusters first (cluster/atom machinery), then merge
        # across bonds with union-find on the proximity ids
        prox = ComputeClusterAtom(self.id, self.group, [self.cutoff])
        pid = np.asarray(prox.evaluate(sim), np.int64)
        tag = np.asarray(jax.device_get(sim.state.tag))
        valid = tag > 0
        order = np.nonzero(valid)[0][np.argsort(tag[valid])]
        gm = np.asarray(jax.device_get(sim.state.gmask))[order]
        sel = (gm & sim.groups.get(self.group, 1)) > 0
        n = len(pid)
        parent = np.arange(n + 1)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        # union by shared proximity id
        first_of = {}
        for t in range(1, n + 1):
            if not sel[t - 1] or pid[t - 1] == 0:
                continue
            k = int(pid[t - 1])
            if k in first_of:
                ra, rb = find(first_of[k]), find(t)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            else:
                first_of[k] = t
        bonds = sim.topology.get("bond")
        if bonds is not None:
            for row in np.asarray(bonds):
                a, b = int(row[1]), int(row[2])
                if a < 1 or b < 1 or not (sel[a - 1] and sel[b - 1]):
                    continue
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        out = np.zeros(n, np.float64)
        for t in range(1, n + 1):
            if sel[t - 1]:
                out[t - 1] = find(t)
        return out


EXTRA_ARG_STYLES = (
    ComputePairEnergy, ComputeTempRamp, ComputeTempProfile,
    ComputeTempSphere, ComputeTempDeform, ComputeERotateSphereAtom,
    ComputeSlice, ComputeReduceRegion, ComputeChunkSpreadAtom,
    ComputeGlobalAtom, ComputeReduceChunk, ComputeFragmentAtom,
    ComputeAggregateAtom,
)
EXTRA_PLAIN_STYLES = (
    ComputeBondEnergy, ComputeAngleEnergy, ComputeDihedralEnergy,
    ComputeImproperEnergy,
)
