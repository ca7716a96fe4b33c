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


M2 = os.path.join(os.path.dirname(__file__), "golden", "bonded_misc2")


def _run_misc2(name):
    script = LammpsScript()
    script.data_dir = M2
    with open(os.path.join(M2, name)) as fh:
        script.run_string(fh.read())
    return script.sim.last_thermo


def test_nonlinear_cosine_periodic():
    """bond nonlinear + angle cosine/periodic (DREIDING Chebyshev
    recurrence, src/EXTRA-MOLECULE/angle_cosine_periodic.cpp)."""
    v = _run_misc2("in.bnd")
    assert v["temp"] == pytest.approx(1.2144657, rel=1e-6)
    assert v["emol"] == pytest.approx(0.075492146, rel=1e-6)
    assert v["etotal"] == pytest.approx(1.8592387, rel=1e-6)
    assert v["press"] == pytest.approx(0.011462214, rel=1e-5)


def test_angle_cosine():
    """angle cosine (src/MOLECULE/angle_cosine.cpp)."""
    v = _run_misc2("in.bnd2")
    assert v["temp"] == pytest.approx(1.322236, rel=1e-6)
    assert v["emol"] == pytest.approx(0.63134128, rel=1e-6)
    assert v["etotal"] == pytest.approx(2.5733754, rel=1e-6)


def test_angle_quartic():
    """angle quartic (src/EXTRA-MOLECULE/angle_quartic.cpp)."""
    v = _run_misc2("in.bnd3")
    assert v["temp"] == pytest.approx(1.1580812, rel=1e-6)
    assert v["emol"] == pytest.approx(0.52789457, rel=1e-6)
    assert v["etotal"] == pytest.approx(2.2288264, rel=1e-6)
