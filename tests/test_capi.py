"""The C API shim (libtpumd.so): lammps_* symbols loaded via ctypes,
driving the engine through the embedded bridge (reference contract:
src/library.h:123-253)."""

import ctypes
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def lib():
    sys.path.insert(0, REPO)
    from tpumd.capi.build import build
    so = build("/tmp")
    lib = ctypes.CDLL(so)
    lib.lammps_open_no_mpi.restype = ctypes.c_void_p
    lib.lammps_open_no_mpi.argtypes = [ctypes.c_int, ctypes.c_void_p,
                                       ctypes.c_void_p]
    lib.lammps_command.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.lammps_commands_string.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.lammps_get_natoms.restype = ctypes.c_double
    lib.lammps_get_natoms.argtypes = [ctypes.c_void_p]
    lib.lammps_get_thermo.restype = ctypes.c_double
    lib.lammps_get_thermo.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.lammps_extract_atom.restype = ctypes.c_void_p
    lib.lammps_extract_atom.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.lammps_gather_atoms.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_int, ctypes.c_int,
                                        ctypes.c_void_p]
    lib.lammps_version.restype = ctypes.c_int
    lib.lammps_close.argtypes = [ctypes.c_void_p]
    return lib


DECK = b"""
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.44 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
neighbor 0.3 bin
neigh_modify delay 0 every 5 check no
fix 1 all nve
run 10
"""


def test_capi_drive(lib):
    h = lib.lammps_open_no_mpi(0, None, None)
    assert h
    assert lib.lammps_version(h) == 20230802
    lib.lammps_commands_string(h, DECK)
    assert lib.lammps_get_natoms(h) == 256.0
    pe = lib.lammps_get_thermo(h, b"pe")
    assert -8.0 < pe < -4.0
    # per-atom positions via the row-pointer table
    xptr = lib.lammps_extract_atom(h, b"x")
    rows = ctypes.cast(xptr, ctypes.POINTER(ctypes.POINTER(ctypes.c_double)))
    x0 = [rows[0][i] for i in range(3)]
    assert all(np.isfinite(x0))
    # gather into a flat C buffer
    buf = (ctypes.c_double * (256 * 3))()
    lib.lammps_gather_atoms(h, b"x", 0, 3, buf)
    arr = np.frombuffer(buf, dtype=np.float64).reshape(256, 3)
    assert np.isfinite(arr).all()
    lib.lammps_command(h, b"run 5")
    assert lib.lammps_get_thermo(h, b"step") == 15.0
    lib.lammps_close(h)
