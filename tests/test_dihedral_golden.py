"""Golden parity: CHARMM dihedrals (with weighted 1-4 terms), harmonic
impropers and angles vs the reference binary — exact to printed digits."""

import os

import pytest

from tpumd.script.parser import LammpsScript

D = os.path.join(os.path.dirname(__file__), "golden", "dihedral")


def test_dihedral_improper_parity():
    script = LammpsScript()
    script.data_dir = D
    with open(os.path.join(D, "in.di")) as fh:
        script.run_string(fh.read())
    v = script.sim.last_thermo
    # reference (log.di): step 10 row
    assert v["temp"] == pytest.approx(459.67393, rel=1e-6)
    assert v["epair"] == pytest.approx(-1.2369231, rel=1e-6)
    assert v["emol"] == pytest.approx(2069.221, rel=1e-6)
    assert v["etotal"] == pytest.approx(2214.5955, rel=1e-6)
    assert v["press"] == pytest.approx(253.90669, rel=1e-5)
