"""Golden tests vs the reference binary: water box exercising the rhodo
stack (harmonic bonds, CHARMM angles, lj/charmm/coul/long, PPPM, SHAKE
clusters, NPT).  Fixtures in tests/golden/ were produced by
tools/gen_golden.py running the locally built reference LAMMPS."""

import os

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def run_case(name):
    d = os.path.join(GOLDEN, name)
    script = LammpsScript()
    script.data_dir = d
    with open(os.path.join(d, "in.test")) as fh:
        deck = fh.read()
    # strip dump commands (not implemented as commands yet)
    deck = "\n".join(l for l in deck.splitlines()
                     if not l.startswith(("dump", "velocity")))
    # use the same deterministic velocities as the reference run
    deck = deck.replace("run             10",
                        "velocity        all create 300.0 48291 loop geom\n"
                        "run             10")
    script.run_string(deck)
    thermo = np.loadtxt(os.path.join(d, "thermo.csv"))
    return script.sim, thermo


@pytest.mark.parametrize("name", ["water_nve", "water_shake", "water_npt"])
def test_water_thermo(name):
    sim, ref = run_case(name)
    v = sim.last_thermo
    last = ref[-1]
    # under NPT the reference recomputes the PPPM Green's function at every
    # half-step box remap; we freeze it per segment, so long-range energies
    # carry an O(dV/V) offset (~4e-5 here) until device-side gf recompute
    etol = 2e-4 if name == "water_npt" else 2e-5
    # columns: step temp epair emol etotal press vol
    assert v["temp"] == pytest.approx(last[1], rel=2e-5, abs=1e-7)
    assert v["epair"] == pytest.approx(last[2], rel=etol)
    assert v["emol"] == pytest.approx(last[3], rel=2e-5, abs=2e-5)
    assert v["etotal"] == pytest.approx(last[4], rel=etol)
    assert v["press"] == pytest.approx(last[5], rel=2e-4, abs=0.5)
    assert v["vol"] == pytest.approx(last[6], rel=1e-6)
