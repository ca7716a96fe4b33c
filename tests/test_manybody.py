"""Golden parity for many-body potentials (SW, Tersoff) on diamond Si
against the locally built reference binary — exact to all printed digits.
Forces are reverse-mode gradients of the energy; the virial is the strain
derivative, both validated here through 10 NVE steps."""

import pytest

from tpumd.script.parser import LammpsScript

DECK = """
units metal
atom_style atomic
lattice diamond 5.431
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 28.06
velocity all create 1200.0 376847 loop geom
pair_style {style}
pair_coeff * * /root/reference/potentials/{potfile} Si
neighbor 1.0 bin
neigh_modify every 1 delay 5 check yes
fix 1 all nve
timestep 0.001
thermo 5
run 10
"""

CASES = {
    # reference values from /tmp lmp runs of the same decks (metal units)
    "sw": ("Si.sw", dict(temp=636.58911, epair=-921.01306,
                         etotal=-903.32165, press=9572.773)),
    "tersoff": ("Si.tersoff", dict(temp=719.04296, epair=-986.77238,
                                   etotal=-966.78951, press=15660.948)),
}


@pytest.mark.parametrize("style", ["sw", "tersoff"])
def test_si_manybody(style):
    potfile, want = CASES[style]
    script = LammpsScript()
    script.run_string(DECK.format(style=style, potfile=potfile))
    v = script.sim.last_thermo
    assert v["temp"] == pytest.approx(want["temp"], rel=1e-6)
    assert v["epair"] == pytest.approx(want["epair"], rel=1e-6)
    assert v["etotal"] == pytest.approx(want["etotal"], rel=1e-6)
    assert v["press"] == pytest.approx(want["press"], rel=1e-5)


def test_eam_fs_golden():
    """eam/fs (Finnis-Sinclair setfl) on fcc Al vs the reference binary."""
    deck = """
units metal
atom_style atomic
lattice fcc 4.045
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
pair_style eam/fs
pair_coeff * * /root/reference/potentials/Al_mm.eam.fs Al
velocity all create 600.0 376847 loop geom
neighbor 1.0 bin
neigh_modify every 1 delay 5 check yes
fix 1 all nve
timestep 0.002
thermo 5
run 10
"""
    script = LammpsScript()
    script.run_string(deck)
    v = script.sim.last_thermo
    assert v["temp"] == pytest.approx(305.83089, rel=1e-6)
    assert v["epair"] == pytest.approx(-863.41544, rel=1e-6)
    assert v["etotal"] == pytest.approx(-853.33484, rel=1e-6)
    assert v["press"] == pytest.approx(16753.993, rel=1e-5)


MB2 = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "golden", "manybody2")

VARIANT_CASES = {
    # step-10 rows from tests/golden/manybody2/log.* (reference binary)
    "tmod": dict(temp=612.94474, epair=-983.72417, etotal=-966.68986,
                 press=14595.026),
    "zbl": dict(temp=1068.7817, epair=-1364.6513, etotal=-1334.9488,
                press=-35184.255),
    "vash": dict(temp=1160.0759, epair=-3203.8137, etotal=-3127.1885,
                 press=54735.436),
}


@pytest.mark.parametrize("case", ["tmod", "zbl", "vash"])
def test_manybody_variants(case, tmp_path):
    """tersoff/mod, tersoff/zbl, vashishta on Si diamond / SiC zincblende
    vs the reference binary (src/MANYBODY/pair_tersoff_mod.cpp,
    pair_tersoff_zbl.cpp, pair_vashishta.cpp)."""
    import os
    import shutil
    want = VARIANT_CASES[case]
    for f in ("data.sic", f"in.{case}"):
        p = os.path.join(MB2, f)
        if os.path.exists(p):
            shutil.copy(p, tmp_path)
    with open(os.path.join(MB2, f"in.{case}")) as fh:
        deck = fh.read()
    script = LammpsScript(data_dir=str(tmp_path))
    script.run_string(deck)
    v = script.sim.last_thermo
    assert v["temp"] == pytest.approx(want["temp"], rel=1e-6)
    assert v["epair"] == pytest.approx(want["epair"], rel=1e-6)
    assert v["etotal"] == pytest.approx(want["etotal"], rel=1e-6)
    assert v["press"] == pytest.approx(want["press"], rel=1e-5)


def test_atm_golden():
    """pair_style atm under hybrid/overlay with lj/cut on an fcc LJ
    crystal (the reference's examples/atm/in.atm at 6^3 cells), 10 NVE
    steps vs the locally built binary — exact to all printed digits.
    Also exercises manybody sub-styles inside pair_style hybrid."""
    deck = """
units           lj
atom_style      atomic
lattice         fcc 0.65
region          box block 0 6 0 6 0 6
create_box      1 box
create_atoms    1 box
pair_style      hybrid/overlay lj/cut 4.5 atm 4.5 2.5
pair_coeff      * * lj/cut 1.0 1.0
pair_coeff      * * atm * 0.072
mass            * 1.0
velocity        all create 1.033 12345678 loop geom
neighbor        0.3 bin
neigh_modify    every 1 delay 5 check yes
fix             1 all nve
timestep        0.002
run             10
"""
    script = LammpsScript()
    script.run_string(deck)
    v = script.sim.last_thermo
    assert v["temp"] == pytest.approx(1.0356248, rel=1e-6)
    assert v["epair"] == pytest.approx(-4.8425038, rel=1e-6)
    assert v["etotal"] == pytest.approx(-3.2908645, rel=1e-6)
    assert v["press"] == pytest.approx(-4.0872055, rel=1e-5)


ALCU_DECK = """
units           metal
atom_style      atomic
lattice         fcc 4.05
region          box block 0 4 0 4 0 4
create_box      2 box
create_atoms    1 box
region          half block 0 2 0 4 0 4
group           cu region half
set             group cu type 2
pair_style      {style}
pair_coeff      * * /root/reference/potentials/{pot} Al Cu
velocity        all create 600.0 376847 loop geom
neighbor        1.0 bin
neigh_modify    every 1 delay 5 check yes
fix             1 all nve
timestep        0.001
run             10
"""


def test_eam_alloy_two_element_golden():
    """Two-element eam/alloy vs the reference binary — regression for the
    transposed type2rhor provider/receiver mapping (density of neighbor
    j at i must use j's element table, PairEAMAlloy::file2array)."""
    script = LammpsScript()
    script.run_string(ALCU_DECK.format(style="eam/alloy",
                                       pot="AlCu.eam.alloy"))
    v = script.sim.last_thermo
    assert v["temp"] == pytest.approx(598.4307, rel=1e-6)
    assert v["epair"] == pytest.approx(-838.93772, rel=1e-7)
    assert v["etotal"] == pytest.approx(-819.21264, rel=1e-7)
    assert v["press"] == pytest.approx(-129885.05, rel=1e-6)


def test_adp_golden():
    """pair_style adp (angular-dependent EAM with dipole/quadrupole
    densities) on an Al/Cu bicrystal, 10 NVE steps vs the reference
    binary — exact to all printed digits."""
    script = LammpsScript()
    script.run_string(ALCU_DECK.format(style="adp", pot="AlCu.adp"))
    v = script.sim.last_thermo
    assert v["temp"] == pytest.approx(1105.1068, rel=1e-6)
    assert v["epair"] == pytest.approx(-830.96506, rel=1e-7)
    assert v["etotal"] == pytest.approx(-794.53926, rel=1e-7)
    assert v["press"] == pytest.approx(-199338.34, rel=1e-6)


def test_edip_golden():
    """pair_style edip on diamond Si, 10 NVE steps vs the reference
    binary.  The reference interpolates 8000/A linear grids; we evaluate
    the same functions analytically, so agreement is ~1e-7 rather than
    bit-exact (pair_edip.cpp initGrids)."""
    deck = """
units           metal
atom_style      atomic
lattice         diamond 5.431
region          box block 0 3 0 3 0 3
create_box      1 box
create_atoms    1 box
mass            1 28.06
velocity        all create 1200.0 376847 loop geom
pair_style      edip
pair_coeff      * * /root/reference/potentials/Si.edip Si
neighbor        1.0 bin
neigh_modify    every 1 delay 5 check yes
fix             1 all nve
timestep        0.001
run             10
"""
    script = LammpsScript()
    script.run_string(deck)
    v = script.sim.last_thermo
    assert v["temp"] == pytest.approx(602.46745, rel=1e-6)
    assert v["epair"] == pytest.approx(-987.74501, rel=1e-7)
    assert v["etotal"] == pytest.approx(-971.00187, rel=1e-7)
    assert v["press"] == pytest.approx(-160.22024, rel=1e-2, abs=1e-2)


def test_eim_golden():
    """pair_style eim (embedded-ion method) on the reference's molten
    NaCl example, 10 NVE steps vs the binary — exact to all printed
    digits (grids sampled from the same analytic ffield forms)."""
    deck = """
units           metal
atom_style      atomic
boundary        p p p
read_data       /root/reference/examples/eim/data.eim
pair_style      eim
pair_coeff      * * Na Cl /root/reference/examples/eim/ffield.eim Na Cl
neighbor        0.3 bin
neigh_modify    delay 0
timestep        0.001
velocity        all create 1400.0 43454 loop geom
fix             1 all nve
run             10
"""
    script = LammpsScript()
    script.run_string(deck)
    v = script.sim.last_thermo
    assert v["temp"] == pytest.approx(1205.7081, rel=1e-6)
    assert v["epair"] == pytest.approx(-5610.249, rel=1e-7)
    assert v["etotal"] == pytest.approx(-5298.7049, rel=1e-7)
    assert v["press"] == pytest.approx(-113418.46, rel=1e-6)
