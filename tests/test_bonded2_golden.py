"""Golden parity for bonded breadth wave 2 vs the reference binary:
dihedral opls + improper cvff, dihedral multi/harmonic + improper
umbrella (108-atom butane-like lattice), bond fene/expand (32k chain
bench system) — final thermo exact to printed digits."""

import os

import pytest

from tpumd.script.parser import LammpsScript

D = os.path.join(os.path.dirname(__file__), "golden", "bonded2")


def run_deck(name, data_dir=None):
    script = LammpsScript()
    script.data_dir = data_dir or D
    with open(os.path.join(D, name)) as fh:
        script.run_string(fh.read())
    return script.sim.last_thermo


def test_opls_cvff():
    """dihedral opls (sbs assembly) + improper cvff multiplicity table
    (src/MOLECULE/dihedral_opls.cpp, improper_cvff.cpp)."""
    v = run_deck("in.opls",
                 data_dir=os.path.join(os.path.dirname(D), "dihedral"))
    assert v["temp"] == pytest.approx(260.42785, rel=1e-6)
    assert v["epair"] == pytest.approx(-1.2365899, rel=1e-6)
    assert v["emol"] == pytest.approx(34.101806, rel=1e-6)
    assert v["etotal"] == pytest.approx(115.92781, rel=1e-6)
    assert v["press"] == pytest.approx(210.92253, rel=1e-5)


def test_multiharmonic_umbrella():
    """dihedral multi/harmonic + improper umbrella (Wilson out-of-plane,
    src/MOLECULE/improper_umbrella.cpp)."""
    v = run_deck("in.multih",
                 data_dir=os.path.join(os.path.dirname(D), "dihedral"))
    assert v["temp"] == pytest.approx(264.88599, rel=1e-6)
    assert v["epair"] == pytest.approx(-1.2366082, rel=1e-6)
    assert v["emol"] == pytest.approx(7799.0451, rel=1e-6)
    assert v["etotal"] == pytest.approx(7882.293, rel=1e-6)
    assert v["press"] == pytest.approx(211.72696, rel=1e-5)


def test_fene_expand():
    """bond fene/expand on the 32k chain bench system
    (src/MOLECULE/bond_fene_expand.cpp)."""
    v = run_deck("in.feneexp", data_dir="/root/reference/bench")
    assert v["temp"] == pytest.approx(4.8076593, rel=1e-6)
    assert v["epair"] == pytest.approx(-0.078593433, rel=1e-5)
    assert v["emol"] == pytest.approx(23.004384, rel=1e-6)
    assert v["etotal"] == pytest.approx(30.137054, rel=1e-6)
    assert v["press"] == pytest.approx(12.16425, rel=1e-5)


def test_bonded_hybrids():
    """bond/angle/dihedral/improper hybrid multiplexers
    (src/bond_hybrid.cpp etc.): two sub-styles per kind routed by bonded
    type, golden vs the reference binary."""
    v = run_deck("in.hyb")
    assert v["temp"] == pytest.approx(359.54147, rel=1e-6)
    assert v["epair"] == pytest.approx(-1.2371373, rel=1e-6)
    assert v["emol"] == pytest.approx(1076.9249, rel=1e-6)
    assert v["etotal"] == pytest.approx(1190.3624, rel=1e-6)
    assert v["press"] == pytest.approx(220.39869, rel=1e-5)
