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

    # ------------------------------------------------------------ control
    def run(self, nsteps: int):
        self.sim.run(nsteps)

    def minimize(self, etol, ftol, maxiter, maxeval):
        return self.sim.minimize(etol, ftol, maxiter, maxeval)

    def close(self):
        self._script = None
