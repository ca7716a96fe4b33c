"""Golden parity: pair_style hybrid/overlay (lj/cut + morse, two types in
region halves) vs the reference binary — exact to printed digits."""

import os

import pytest

from tpumd.script.parser import LammpsScript

D = os.path.join(os.path.dirname(__file__), "golden", "hybrid")


def test_hybrid_overlay_parity():
    script = LammpsScript()
    with open(os.path.join(D, "in.hyb")) as fh:
        script.run_string(fh.read())
    v = script.sim.last_thermo
    assert v["temp"] == pytest.approx(1.0555844, rel=1e-6)
    assert v["epair"] == pytest.approx(-6.4562531, rel=1e-6)
    assert v["etotal"] == pytest.approx(-4.8790615, rel=1e-6)
    assert v["press"] == pytest.approx(-1.307234, rel=1e-5)


def test_hybrid_scaled_golden():
    """pair hybrid/scaled: per-sub-style scale factors
    (src/pair_hybrid_scaled.cpp), golden vs the reference binary."""
    import pytest
    from tpumd.script.parser import LammpsScript
    deck = """
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.44 87287 loop geom
pair_style hybrid/scaled 0.7 lj/cut 2.5 0.5 morse 2.5
pair_coeff 1 1 lj/cut 1.0 1.0 2.5
pair_coeff 1 1 morse 0.5 1.3 1.1 2.5
neighbor 0.3 bin
neigh_modify delay 0 every 5 check no
fix 1 all nve
thermo 10
run 10
"""
    script = LammpsScript()
    script.run_string(deck)
    v = script.sim.last_thermo
    assert v["temp"] == pytest.approx(1.2038164, rel=1e-6)
    assert v["epair"] == pytest.approx(-8.4014839, rel=1e-6)
    assert v["etotal"] == pytest.approx(-6.6028129, rel=1e-6)
    assert v["press"] == pytest.approx(-3.0784891, rel=1e-5)
