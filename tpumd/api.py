"""Embedding API: drive tpu-md programmatically like the reference's
library interface.

Mirrors the contracts of the reference C API / ctypes wrapper
(src/library.h:123-253, python/lammps/core.py): create an instance, feed
commands, extract global/per-atom data (zero-copy numpy views of the
device arrays where possible), gather/scatter per-atom quantities in tag
order, and query thermo values.
"""

from __future__ import annotations

import jax
import numpy as np

from tpumd.script.parser import LammpsScript


class TpuMD:
    """An embedded simulation instance (analog of `lammps.lammps`)."""

    def __init__(self, dtype=None, data_dir="."):
        kwargs = {"data_dir": data_dir}
        if dtype is not None:
            kwargs["dtype"] = dtype
        self._script = LammpsScript(**kwargs)

    # ----------------------------------------------------------- commands
    def command(self, cmd: str):
        self._script.execute(cmd)

    def commands_string(self, text: str):
        self._script.run_string(text)

    def file(self, path: str):
        self._script.run_file(path)

    # ------------------------------------------------------------- simple
    @property
    def sim(self):
        return self._script.sim

    def get_natoms(self) -> int:
        return self.sim.natoms

    def get_thermo(self, name: str):
        """lammps_get_thermo: step/temp/press/pe/ke/etotal/vol/..."""
        vals = self.sim.thermo_values()
        return vals[name]

    def extract_global(self, name: str):
        sim = self.sim
        box_lo = np.asarray(jax.device_get(sim.state.box.lo))
        box_hi = np.asarray(jax.device_get(sim.state.box.hi))
        table = {
            "natoms": sim.natoms, "ntypes": sim.ntypes, "dt": sim.dt,
            "ntimestep": sim.step, "units": sim.units.name,
            "boxlo": box_lo, "boxhi": box_hi,
            "boltz": sim.units.boltz,
        }
        return table[name]

    def extract_box(self):
        sim = self.sim
        lo = np.asarray(jax.device_get(sim.state.box.lo))
        hi = np.asarray(jax.device_get(sim.state.box.hi))
        return lo, hi

    # ------------------------------------------------------------ per-atom
    _FIELDS = {"x": "x", "v": "v", "f": "f", "type": "type", "id": "tag",
               "image": "image", "q": "q", "molecule": "molecule"}

    def extract_atom(self, name: str):
        """Per-atom array in current (internal) order, numpy copy."""
        s = self.sim.state
        attr = self._FIELDS[name]
        arr = getattr(s, attr)
        if arr is None:
            return None
        return np.asarray(jax.device_get(arr))

    def gather_atoms(self, name: str):
        """Per-atom data gathered in tag order (lammps_gather_atoms)."""
        arr = self.extract_atom(name)
        tags = self.extract_atom("id")
        valid = tags > 0
        order = np.argsort(tags[valid])
        return arr[valid][order]

    def scatter_atoms(self, name: str, values: np.ndarray):
        """Set per-atom data from tag-ordered values."""
        import jax.numpy as jnp
        sim = self.sim
        s = sim.state
        tags = np.asarray(jax.device_get(s.tag))
        valid = tags > 0
        rows = np.nonzero(valid)[0][np.argsort(tags[valid])]
        attr = self._FIELDS[name]
        arr = np.asarray(jax.device_get(getattr(s, attr))).copy()
        arr[rows] = values
        dtype = getattr(s, attr).dtype
        sim.state = s.replace(**{attr: jnp.asarray(arr, dtype=dtype)})
        if sim._carry is not None:
            c = sim._carry
            sim._carry = (sim.state, c[1], c[2], c[3])
            sim.recompute_output()

    # ------------------------------------------- computes/fixes/variables
    def extract_compute(self, cid: str, style: int = 0, type: int = 0):
        """lammps_extract_compute: style 0 = global, 1 = per-atom;
        type 0 = scalar, 1 = vector, 2 = array."""
        c = self.sim.computes[cid]
        out = c.evaluate(self.sim)
        if style == 1 or getattr(c, "peratom", False) and style != 0:
            return np.asarray(jax.device_get(out))
        if type == 0:
            return float(np.asarray(out).reshape(-1)[0]) \
                if np.ndim(out) else float(out)
        if type == 1:
            vec = getattr(c, "vector", None)
            if vec is not None:
                return np.asarray(jax.device_get(vec), dtype=np.float64)
            return np.asarray(jax.device_get(out),
                              dtype=np.float64).reshape(-1)
        return np.asarray(jax.device_get(out), dtype=np.float64)

    def extract_fix(self, fid: str, style: int = 0, type: int = 0,
                    nrow: int = 0, ncol: int = 0):
        """lammps_extract_fix (global scalars/vectors: fix ave/time,
        external energy, NH energy...)."""
        for fx in self.sim.fixes:
            if getattr(fx, "id", None) == fid:
                if type == 0:
                    if hasattr(fx, "scalar"):
                        return float(fx.scalar(self.sim))
                    if hasattr(fx, "compute_scalar"):
                        return float(fx.compute_scalar(self.sim))
                    raise KeyError(f"fix {fid} has no global scalar")
                vec = getattr(fx, "vector", None)
                if callable(vec):
                    vec = vec(self.sim)
                if vec is None:
                    raise KeyError(f"fix {fid} has no global vector")
                vec = np.asarray(vec, dtype=np.float64)
                if type == 1:
                    # reference contract: global-vector access returns
                    # ONE element, 0-based nrow (src/library.cpp
                    # fix->compute_vector(nrow))
                    return float(vec.reshape(-1)[nrow])
                if type == 2:
                    return float(np.atleast_2d(vec)[nrow, ncol])
                return vec
        raise KeyError(f"unknown fix id {fid!r}")

    def extract_variable(self, name: str, group: str | None = None):
        """lammps_extract_variable: equal-style -> float, atom-style ->
        per-atom double array, string/index -> str."""
        out = self._script.evaluate_variable(name)
        if isinstance(out, str):
            return out
        if np.ndim(out) == 0:
            return float(out)
        return np.asarray(jax.device_get(out), dtype=np.float64)

    def set_variable(self, name: str, value) -> int:
        """lammps_set_variable: reset a string/index-style variable."""
        vars_ = self._script.variables
        style = vars_.get(name, ("string", ""))[0]
        if style not in ("string", "index"):
            return -1
        vars_[name] = (style, str(value))
        return 0

    # ------------------------------------------------------------ box/etc
    def extract_box_full(self):
        """(boxlo, boxhi, xy, yz, xz, periodicity, box_change)."""
        sim = self.sim
        box = sim.state.box
        lo = np.asarray(jax.device_get(box.lo), dtype=np.float64)
        hi = np.asarray(jax.device_get(box.hi), dtype=np.float64)
        tilt = np.asarray(jax.device_get(box.tilt), dtype=np.float64)
        per = [int(p) for p in box.periodic]
        change = int(any(getattr(fx, "pstat", False)
                         or getattr(fx, "box_change", False)
                         for fx in sim.fixes))
        return lo, hi, float(tilt[0]), float(tilt[2]), float(tilt[1]), \
            per, change

    def reset_box(self, boxlo, boxhi, xy=0.0, yz=0.0, xz=0.0):
        """lammps_reset_box: move the box; atoms keep coordinates."""
        import jax.numpy as jnp
        sim = self.sim
        box = sim.state.box
        dt_ = box.lo.dtype
        new = box.replace(lo=jnp.asarray(boxlo, dt_),
                          hi=jnp.asarray(boxhi, dt_),
                          tilt=jnp.asarray([xy, xz, yz], dt_))
        sim.state = sim.state.replace(box=new)
        if sim._carry is not None:
            c = sim._carry
            sim._carry = (c[0].replace(box=new),) + tuple(c[1:])
            sim.state = sim._carry[0]
            sim.invalidate_ctx()

    def extract_setting(self, name: str) -> int:
        """lammps_extract_setting (src/library.cpp): sizes and flags."""
        sim = self.sim if self._script.sim is not None else None
        s = sim.state if sim is not None and sim.state is not None else None
        vals = {
            "bigint": 8, "tagint": 4, "imageint": 4, "dimension":
                (sim.dimension if sim else 3),
            "box_exist": int(s is not None),
            "nlocal": sim.natoms if sim else 0,
            "nghost": 0,
            "nall": sim.natoms if sim else 0,
            "natoms": sim.natoms if sim else 0,
            "ntypes": sim.ntypes if sim else 0,
            "molecule_flag": int(s is not None and s.molecule is not None),
            "q_flag": int(s is not None and s.q is not None),
            "rmass_flag": int(s is not None and s.rmass is not None),
            "triclinic": int(s is not None and bool(s.box.istriclinic)),
            "world_size": 1, "world_rank": 0,
            "universe_size": 1, "universe_rank": 0,
            "nthreads": 1, "newton_pair": 0, "newton_bond": 0,
        }
        if name not in vals:
            return -1
        return int(vals[name])

    def create_atoms(self, n, ids, types, x, v=None, image=None,
                     shrinkexceed=False):
        """lammps_create_atoms: inject atoms before the first run (the
        common driver pattern: create_box, then create_atoms from arrays).
        Returns the number of atoms created."""
        x = np.asarray(x, dtype=np.float64).reshape(n, 3)
        types = np.asarray(types, dtype=np.int64).reshape(n)
        ids = (np.asarray(ids, dtype=np.int64).reshape(n)
               if ids is not None else None)
        v = (np.asarray(v, dtype=np.float64).reshape(n, 3)
             if v is not None else None)
        self._script.inject_atoms(ids, types, x, v)
        return n

    # -------------------------------------------------------- fix external
    def _find_external(self, fid: str):
        from tpumd.md.fix_external import FixExternal
        for fx in self.sim.fixes:
            if getattr(fx, "id", None) == fid and isinstance(fx,
                                                             FixExternal):
                return fx
        raise KeyError(f"no fix external with id {fid!r}")

    def set_fix_external_callback(self, fid: str, fn, caller=None):
        """fn(caller, timestep, nlocal, ids, x, fexternal) — reference
        FixExternalFnPtr contract (src/library.h:280)."""
        fx = self._find_external(fid)

        def wrapper(step, x, ids, fext):
            fn(caller, step, x.shape[0], ids, x, fext)

        fx.callback = wrapper

    def fix_external_get_force(self, fid: str):
        fx = self._find_external(fid)
        return fx.host_force_buffer(self.sim)

    def fix_external_set_energy_global(self, fid: str, eng: float):
        self._find_external(fid).energy_global = float(eng)

    def fix_external_set_virial_global(self, fid: str, virial):
        self._find_external(fid).virial_global = np.asarray(
            virial, dtype=np.float64).reshape(6)

    def fix_external_set_energy_peratom(self, fid: str, eatom):
        self._find_external(fid).energy_peratom = np.asarray(
            eatom, dtype=np.float64).reshape(-1)

    def fix_external_set_virial_peratom(self, fid: str, vatom):
        self._find_external(fid).virial_peratom = np.asarray(
            vatom, dtype=np.float64).reshape(-1, 6)

    def fix_external_set_vector_length(self, fid: str, n: int):
        self._find_external(fid).set_vector_length(n)

    def fix_external_set_vector(self, fid: str, idx: int, val: float):
        self._find_external(fid).set_vector(idx, val)

    # ------------------------------------------------- neighbor-list API
    def neighlist_half(self):
        """Half neighbor list of the CURRENT configuration in local
        (tag-order, 0-based) indices: list of (i, int32 array of j).

        The reference exposes the pair style's actual list
        (src/library.cpp lammps_find_pair_neighlist /
        lammps_neighlist_element_neighbors); here the list is rebuilt
        host-side at the same cutoff (cutneigh = max_cutoff + skin) via
        numpy cell binning, independent of which device engine ran the
        forces."""
        import jax
        sim = self.sim
        s = sim.state
        tags = np.asarray(jax.device_get(s.tag))
        valid = tags > 0
        order = np.nonzero(valid)[0][np.argsort(tags[valid])]
        x = np.asarray(jax.device_get(s.x), np.float64)[order]
        lo = np.asarray(jax.device_get(s.box.lo), np.float64)
        ell = np.asarray(jax.device_get(s.box.lengths), np.float64)
        periodic = s.box.periodic
        cut = float(sim.max_cutoff() + sim.skin)
        n = x.shape[0]
        # cell binning: >= 1 cell per axis, cells >= cut wide
        nc = np.maximum(1, (ell / cut).astype(int))
        rel = x - lo
        for d in range(3):
            if periodic[d]:
                rel[:, d] %= ell[d]
        cidx = np.minimum((rel / (ell / nc)).astype(int), nc - 1)
        flat = (cidx[:, 0] * nc[1] + cidx[:, 1]) * nc[2] + cidx[:, 2]
        order2 = np.argsort(flat, kind="stable")
        neighbors: list = [[] for _ in range(n)]
        cutsq = cut * cut
        # group atom ids by cell
        cells: dict = {}
        for a in order2:
            cells.setdefault(int(flat[a]), []).append(int(a))
        offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                for dz in (-1, 0, 1)]
        for key, members in cells.items():
            cx, rem = divmod(key, nc[1] * nc[2])
            cy, cz = divmod(rem, nc[2])
            mi = np.asarray(members)
            for dx, dy, dz in offs:
                ox, oy, oz = cx + dx, cy + dy, cz + dz
                shift = np.zeros(3)
                oc = [ox, oy, oz]
                skip = False
                for d, o in enumerate(oc):
                    if 0 <= o < nc[d]:
                        continue
                    if not periodic[d] or nc[d] < 2:
                        if not periodic[d]:
                            skip = True
                            break
                        # single-cell periodic axis: same cell, shifted
                    shift[d] = -np.floor(o / nc[d]) * ell[d]
                    oc[d] = o % nc[d]
                if skip:
                    continue
                okey = (oc[0] * nc[1] + oc[1]) * nc[2] + oc[2]
                other = cells.get(int(okey))
                if other is None:
                    continue
                mj = np.asarray(other)
                d2 = rel[mi][:, None, :] - (rel[mj][None, :, :] - shift)
                # minimum image for single-cell axes
                for d in range(3):
                    if periodic[d] and nc[d] < 3:
                        d2[..., d] -= np.round(d2[..., d] / ell[d]) * ell[d]
                r2 = np.sum(d2 * d2, axis=-1)
                hit = r2 < cutsq
                for a, row in zip(mi, hit):
                    js = mj[row]
                    neighbors[a].extend(int(j) for j in js
                                        if j > a)
        return [(i, np.asarray(sorted(set(neighbors[i])), np.int32))
                for i in range(n)]

    # ---------------------------------------------------------- errors
    def has_error(self) -> bool:
        return self._script.last_error is not None

    def get_last_error_message(self):
        err = self._script.last_error
        self._script.last_error = None
        return err or ""

    # ------------------------------------------------------------ control
    def run(self, nsteps: int):
        self.sim.run(nsteps)

    def minimize(self, etol, ftol, maxiter, maxeval):
        return self.sim.minimize(etol, ftol, maxiter, maxeval)

    def close(self):
        self._script = None
