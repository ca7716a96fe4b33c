"""PyLammps OO wrapper (python/lammps/pylammps.py:405 analog): command
methods via attribute dispatch, per-run thermo capture, atom/system/
variable object views."""

import numpy as np
import pytest

from tpumd.pylammps import PyLammps


@pytest.fixture()
def L():
    L = PyLammps()
    L.units("lj")
    L.atom_style("atomic")
    L.lattice("fcc", 0.8442)
    L.region("box", "block", 0, 4, 0, 4, 0, 4)
    L.create_box(1, "box")
    L.create_atoms(1, "box")
    L.mass(1, 1.0)
    L.velocity("all", "create", 1.44, 87287, "loop", "geom")
    L.pair_style("lj/cut", 2.5)
    L.pair_coeff(1, 1, 1.0, 1.0, 2.5)
    L.neighbor(0.3, "bin")
    L.fix(1, "all", "nve")
    yield L
    L.close()


def test_command_dispatch_and_system(L):
    assert L.system.natoms == 256
    assert L.system.ntypes == 1
    assert L.system.units == "lj"
    assert L.system.xhi > L.system.xlo


def test_run_captures_thermo(L):
    L.thermo(5)
    L.run(10)
    assert len(L.runs) == 1
    th = L.last_run.thermo
    # Step series covers the run at thermo-5 cadence (setup row + 5 + 10)
    assert th.Step[0] == 0 and th.Step[-1] == 10
    assert len(th.TotEng) == len(th.Step)
    # NVE conserves total energy loosely over 10 steps
    assert th.TotEng[-1] == pytest.approx(th.TotEng[0], rel=1e-3)


def test_atoms_view(L):
    atoms = L.atoms
    assert len(atoms) == 256
    a = atoms[0]
    assert a.id == 1
    assert a.type == 1
    assert a.mass == 1.0
    assert len(a.position) == 3
    # setter roundtrip
    old = a.position
    a.position = (old[0] + 0.01, old[1], old[2])
    assert atoms[0].position[0] == pytest.approx(old[0] + 0.01)


def test_variables_and_eval(L):
    L.variable("alpha", "equal", "3.0*2")
    v = L.variables["alpha"]
    assert v.style == "equal"
    assert v.value == 6.0
    assert L.eval("v_alpha+1") == 7.0
    assert L.eval("natoms") == 256.0


def test_version_and_history(L):
    assert L.version() == 20230802
    L.enable_cmd_history = True
    L.thermo(100)
    L.timestep(0.005)
    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "replay.in")
    L.write_script(path)
    text = open(path).read()
    assert "thermo 100" in text and "timestep 0.005" in text
