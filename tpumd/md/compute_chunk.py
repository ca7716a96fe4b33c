"""Per-chunk compute family (reference: src/compute_*_chunk.cpp) plus
small global computes (momentum, count/type, msd/nongauss,
gyration/shape).

Chunk computes evaluate host-side at output steps from the synced
state, like the rest of the compute library: per-chunk segment sums
over the chunk/atom ids, with COM/unwrapped-coordinate conventions
copied from the reference sources."""

from __future__ import annotations

import jax
import numpy as np

from tpumd.md.compute_styles import Compute


def _atoms(sim, groupbit=1):
    s = sim.state
    tag = np.asarray(jax.device_get(s.tag))
    valid = tag > 0
    order = np.argsort(tag[valid])
    x = np.asarray(jax.device_get(s.x), np.float64)[valid][order]
    v = np.asarray(jax.device_get(s.v), np.float64)[valid][order]
    f = np.asarray(jax.device_get(s.f), np.float64)[valid][order]
    typ = np.asarray(jax.device_get(s.type))[valid][order]
    img = np.asarray(jax.device_get(s.image))[valid][order]
    ell = np.asarray(jax.device_get(s.box.lengths), np.float64)
    if s.rmass is not None:
        m = np.asarray(jax.device_get(s.rmass), np.float64)[valid][order]
    else:
        m = sim.mass[typ]
    sel = np.ones(len(typ), bool)
    if groupbit != 1:
        gm = np.asarray(jax.device_get(s.gmask))[valid][order]
        sel = (gm & groupbit) > 0
    return x + img * ell, v, f, m, typ, sel


class _ChunkCompute(Compute):
    scalar = False

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.chunkid = str(args[0])
        self.args = list(args[1:])

    def _chunks(self, sim):
        cchunk = sim.computes[self.chunkid]
        ids = np.asarray(cchunk.evaluate(sim)).astype(np.int64)
        n = cchunk.nchunk
        return np.clip(ids - 1, 0, n - 1), n

    @staticmethod
    def _sum(n, idx, w):
        out = np.zeros((n,) + np.shape(w)[1:])
        np.add.at(out, idx, w)
        return out

    def _com(self, n, idx, xu, m):
        mt = self._sum(n, idx, m)
        com = self._sum(n, idx, xu * m[:, None]) \
            / np.maximum(mt, 1e-300)[:, None]
        return com, mt


class ComputeCOMChunk(_ChunkCompute):
    """Per-chunk center of mass, unwrapped (compute_com_chunk.cpp)."""

    style = "com/chunk"

    def evaluate(self, sim):
        xu, v, f, m, typ, sel = _atoms(sim, self.groupbit_of(sim))
        idx, n = self._chunks(sim)
        com, _ = self._com(n, idx, xu, np.where(sel, m, 0.0))
        return com

    def groupbit_of(self, sim):
        return sim.groups.get(self.group, 1)


class ComputeVCMChunk(_ChunkCompute):
    """Per-chunk center-of-mass velocity (compute_vcm_chunk.cpp)."""

    style = "vcm/chunk"

    def evaluate(self, sim):
        xu, v, f, m, typ, sel = _atoms(sim)
        idx, n = self._chunks(sim)
        m = np.where(sel, m, 0.0)
        mt = self._sum(n, idx, m)
        return self._sum(n, idx, v * m[:, None]) \
            / np.maximum(mt, 1e-300)[:, None]


class ComputeGyrationChunk(_ChunkCompute):
    """Per-chunk radius of gyration (compute_gyration_chunk.cpp)."""

    style = "gyration/chunk"
    peratom = False

    def evaluate(self, sim):
        xu, v, f, m, typ, sel = _atoms(sim)
        idx, n = self._chunks(sim)
        m = np.where(sel, m, 0.0)
        com, mt = self._com(n, idx, xu, m)
        d = xu - com[idx]
        rg2 = self._sum(n, idx, m * (d * d).sum(1))
        return np.sqrt(rg2 / np.maximum(mt, 1e-300))


class ComputeMSDChunk(_ChunkCompute):
    """Per-chunk COM mean-squared displacement from the state at first
    invocation (compute_msd_chunk.cpp): columns dx2 dy2 dz2 total."""

    style = "msd/chunk"

    def evaluate(self, sim):
        xu, v, f, m, typ, sel = _atoms(sim)
        idx, n = self._chunks(sim)
        com, _ = self._com(n, idx, xu, np.where(sel, m, 0.0))
        if self._ref is None:
            self._ref = com.copy()
        d = com - self._ref
        out = np.zeros((n, 4))
        out[:, :3] = d * d
        out[:, 3] = (d * d).sum(1)
        return out


class ComputeTempChunk(_ChunkCompute):
    """Per-chunk temperature (compute_temp_chunk.cpp, temp attribute):
    T_c = mvv2e * sum m v^2 / (3 N_c kB); `com yes` removes the chunk
    VCM first."""

    style = "temp/chunk"

    def evaluate(self, sim):
        xu, v, f, m, typ, sel = _atoms(sim)
        idx, n = self._chunks(sim)
        m = np.where(sel, m, 0.0)
        vv = v.copy()
        if "com" in self.args and \
                self.args[self.args.index("com") + 1] == "yes":
            mt = self._sum(n, idx, m)
            vcm = self._sum(n, idx, v * m[:, None]) \
                / np.maximum(mt, 1e-300)[:, None]
            vv = v - vcm[idx]
        if "temp" not in self.args:
            # no attributes: global 6-component KE tensor over chunked
            # atoms (ComputeTempChunk::compute_vector)
            pref = sim.units.mvv2e
            return pref * np.array([
                (m * vv[:, 0] * vv[:, 0]).sum(),
                (m * vv[:, 1] * vv[:, 1]).sum(),
                (m * vv[:, 2] * vv[:, 2]).sum(),
                (m * vv[:, 0] * vv[:, 1]).sum(),
                (m * vv[:, 0] * vv[:, 2]).sum(),
                (m * vv[:, 1] * vv[:, 2]).sum()])
        # `temp` attribute: per-chunk temperature, dof = dim * count
        ke = self._sum(n, idx, m * (vv * vv).sum(1))
        cnt = self._sum(n, idx, np.where(sel, 1.0, 0.0))
        dof = sim.dimension * np.maximum(cnt, 1.0)
        return sim.units.mvv2e * ke / (dof * sim.units.boltz)


class ComputeAngmomChunk(_ChunkCompute):
    """Per-chunk angular momentum about the chunk COM
    (compute_angmom_chunk.cpp)."""

    style = "angmom/chunk"

    def evaluate(self, sim):
        xu, v, f, m, typ, sel = _atoms(sim)
        idx, n = self._chunks(sim)
        m = np.where(sel, m, 0.0)
        com, _ = self._com(n, idx, xu, m)
        d = xu - com[idx]
        return self._sum(n, idx, m[:, None] * np.cross(d, v))


class ComputeTorqueChunk(_ChunkCompute):
    """Per-chunk torque about the chunk COM
    (compute_torque_chunk.cpp)."""

    style = "torque/chunk"

    def evaluate(self, sim):
        xu, v, f, m, typ, sel = _atoms(sim)
        idx, n = self._chunks(sim)
        m = np.where(sel, m, 0.0)
        com, _ = self._com(n, idx, xu, m)
        d = xu - com[idx]
        fz = np.where(sel[:, None], f, 0.0)
        return self._sum(n, idx, np.cross(d, fz))


class ComputeInertiaChunk(_ChunkCompute):
    """Per-chunk inertia tensor, 6 columns xx yy zz xy yz xz
    (compute_inertia_chunk.cpp)."""

    style = "inertia/chunk"

    def _tensor(self, sim):
        xu, v, f, m, typ, sel = _atoms(sim)
        idx, n = self._chunks(sim)
        m = np.where(sel, m, 0.0)
        com, _ = self._com(n, idx, xu, m)
        d = xu - com[idx]
        out = np.zeros((n, 6))
        np.add.at(out[:, 0], idx, m * (d[:, 1]**2 + d[:, 2]**2))
        np.add.at(out[:, 1], idx, m * (d[:, 0]**2 + d[:, 2]**2))
        np.add.at(out[:, 2], idx, m * (d[:, 0]**2 + d[:, 1]**2))
        np.add.at(out[:, 3], idx, -m * d[:, 0] * d[:, 1])
        np.add.at(out[:, 4], idx, -m * d[:, 1] * d[:, 2])
        np.add.at(out[:, 5], idx, -m * d[:, 0] * d[:, 2])
        return out

    def evaluate(self, sim):
        return self._tensor(sim)


class ComputeOmegaChunk(ComputeInertiaChunk):
    """Per-chunk angular velocity: solve I w = L per chunk
    (compute_omega_chunk.cpp)."""

    style = "omega/chunk"

    def evaluate(self, sim):
        xu, v, f, m, typ, sel = _atoms(sim)
        idx, n = self._chunks(sim)
        m = np.where(sel, m, 0.0)
        com, _ = self._com(n, idx, xu, m)
        d = xu - com[idx]
        L = self._sum(n, idx, m[:, None] * np.cross(d, v))
        it6 = self._tensor(sim)
        out = np.zeros((n, 3))
        for c in range(n):
            ione = np.array([
                [it6[c, 0], it6[c, 3], it6[c, 5]],
                [it6[c, 3], it6[c, 1], it6[c, 4]],
                [it6[c, 5], it6[c, 4], it6[c, 2]]])
            if abs(np.linalg.det(ione)) > 1e-12:
                out[c] = np.linalg.solve(ione, L[c])
        return out


class ComputePropertyChunk(_ChunkCompute):
    """compute property/chunk: count / id columns
    (compute_property_chunk.cpp)."""

    style = "property/chunk"

    def evaluate(self, sim):
        xu, v, f, m, typ, sel = _atoms(sim)
        idx, n = self._chunks(sim)
        cols = []
        for field in self.args:
            if field == "count":
                cols.append(self._sum(n, idx, np.where(sel, 1.0, 0.0)))
            elif field == "id":
                cols.append(np.arange(1, n + 1, dtype=np.float64))
            else:
                raise ValueError(
                    f"property/chunk field {field!r} not supported")
        return cols[0] if len(cols) == 1 else np.stack(cols, axis=1)


class ComputeMomentum(Compute):
    """Total group momentum vector (src/compute_momentum.cpp)."""

    style = "momentum"
    scalar = False

    def evaluate(self, sim):
        xu, v, f, m, typ, sel = _atoms(sim)
        return (m[sel, None] * v[sel]).sum(0)


class ComputeCountType(Compute):
    """Per-type atom counts (src/compute_count_type.cpp, atom mode)."""

    style = "count/type"
    scalar = False

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        if args and args[0] != "atom":
            raise ValueError("count/type: only mode 'atom' supported")

    def evaluate(self, sim):
        xu, v, f, m, typ, sel = _atoms(sim)
        return np.bincount(typ[sel], minlength=sim.ntypes + 1)[1:] \
            .astype(np.float64)


class ComputeMSDNonGauss(Compute):
    """MSD + 4th moment + non-gaussian parameter
    (src/compute_msd_nongauss.cpp): [<r^2>, <r^4>,
    3<r^4>/(5<r^2>^2) - 1]."""

    style = "msd/nongauss"
    scalar = False

    def evaluate(self, sim):
        xu, v, f, m, typ, sel = _atoms(sim)
        if self._ref is None:
            self._ref = xu.copy()
        d2 = ((xu - self._ref) ** 2).sum(1)
        msd = d2.mean()
        m4 = (d2 * d2).mean()
        ng = 3.0 * m4 / (5.0 * msd * msd) - 1.0 if msd > 0 else 0.0
        return np.array([msd, m4, ng])


class ComputeGyrationShape(Compute):
    """Gyration-tensor eigenvalues + asphericity/acylindricity/kappa^2
    (src/EXTRA-COMPUTE/compute_gyration_shape.cpp); wraps a gyration
    compute's tensor."""

    style = "gyration/shape"
    scalar = False

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.gyr_id = str(args[0]) if args else None

    def evaluate(self, sim):
        xu, v, f, m, typ, sel = _atoms(sim)
        mm = np.where(sel, m, 0.0)
        com = (mm[:, None] * xu).sum(0) / mm.sum()
        d = xu - com
        t = np.zeros((3, 3))
        for a in range(3):
            for b in range(3):
                t[a, b] = (mm * d[:, a] * d[:, b]).sum() / mm.sum()
        ev = np.sort(np.linalg.eigvalsh(t))[::-1]  # DESCENDING (ref)
        l1, l2, l3 = ev
        tr = l1 + l2 + l3
        b_ = l1 - 0.5 * (l2 + l3)
        c_ = l2 - l3
        k2 = ((b_ * b_ + 0.75 * c_ * c_) / (tr * tr)) if tr > 0 else 0.0
        return np.array([l1, l2, l3, b_, c_, k2])


CHUNK_STYLES = (ComputeCOMChunk, ComputeVCMChunk, ComputeGyrationChunk,
                ComputeMSDChunk, ComputeTempChunk, ComputeAngmomChunk,
                ComputeTorqueChunk, ComputeInertiaChunk,
                ComputeOmegaChunk, ComputePropertyChunk,
                ComputeCountType, ComputeGyrationShape)
PLAIN_STYLES = (ComputeMomentum, ComputeMSDNonGauss)
