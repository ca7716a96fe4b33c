"""Python side of the C API shim (tpumd_capi.c).

Keeps a registry of embedded TpuMD instances addressed by integer
handles; every C `lammps_*` call forwards here.  Mirrors the contract of
the reference C library (src/library.h:123-253, src/library.cpp)."""

from __future__ import annotations

import numpy as np

_instances: dict[int, object] = {}
_next = [1]
_buffers: dict[int, list] = {}   # per-handle pinned arrays for extract_*


def open_instance(cmdargs=None) -> int:
    from tpumd.api import TpuMD
    h = _next[0]
    _next[0] += 1
    _instances[h] = TpuMD()
    _buffers[h] = []
    return h


def close_instance(h: int):
    _instances.pop(h, None)
    _buffers.pop(h, None)


def command(h: int, cmd: str):
    _instances[h].command(cmd)


def commands_string(h: int, text: str):
    _instances[h].commands_string(text)


def file(h: int, path: str):
    _instances[h].file(path)


def get_natoms(h: int) -> float:
    return float(_instances[h].get_natoms())


def get_thermo(h: int, name: str) -> float:
    return float(_instances[h].get_thermo(name))


def extract_global(h: int, name: str):
    """Returns (kind, value): kind 0 = double scalar, 1 = int scalar."""
    lmp = _instances[h]
    sim = lmp.sim
    vals = {
        "dt": (0, float(sim.dt)),
        "natoms": (1, int(sim.natoms)),
        "ntypes": (1, int(sim.ntypes)),
        "ntimestep": (1, int(sim.step)),
        "boxxlo": (0, float(np.asarray(sim.state.box.lo)[0])),
        "boxylo": (0, float(np.asarray(sim.state.box.lo)[1])),
        "boxzlo": (0, float(np.asarray(sim.state.box.lo)[2])),
        "boxxhi": (0, float(np.asarray(sim.state.box.hi)[0])),
        "boxyhi": (0, float(np.asarray(sim.state.box.hi)[1])),
        "boxzhi": (0, float(np.asarray(sim.state.box.hi)[2])),
    }
    if name not in vals:
        raise KeyError(name)
    return vals[name]


def extract_atom(h: int, name: str):
    """Returns a C-contiguous numpy array pinned for the handle's
    lifetime; C side wraps (N,3) arrays in a row-pointer table."""
    lmp = _instances[h]
    arr = np.ascontiguousarray(lmp.extract_atom(name))
    _buffers[h].append(arr)
    return arr


def gather_atoms(h: int, name: str):
    lmp = _instances[h]
    arr = np.ascontiguousarray(lmp.gather_atoms(name))
    _buffers[h].append(arr)
    return arr


def scatter_atoms(h: int, name: str, arr):
    _instances[h].scatter_atoms(name, np.asarray(arr))


def run(h: int, nsteps: int):
    _instances[h].run(int(nsteps))


def version() -> int:
    return 20230802  # parity contract: reference LAMMPS_VERSION "2 Aug 2023"
