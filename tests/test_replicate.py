"""replicate command: image-flag unwrapping across periodic molecules.

Step-0 thermo of the 2x-replicated 64k chain matches the reference
binary exactly (0.97028256 / 0.44484087 / 20.494523 / 4.6721833)."""

import pytest

from tpumd.script.parser import LammpsScript

DECK = """
units lj
atom_style bond
special_bonds fene
read_data /root/reference/bench/data.chain
replicate 2 1 1
neighbor 0.4 bin
neigh_modify every 1 delay 1
bond_style fene
bond_coeff 1 30.0 1.5 1.0 1.0
pair_style lj/cut 1.12
pair_modify shift yes
pair_coeff 1 1 1.0 1.0 1.12
fix 1 all nve
timestep 0.012
run 0
"""


@pytest.mark.slow
def test_replicated_chain_step0():
    script = LammpsScript()
    script.data_dir = "."
    script.run_string(DECK)
    v = script.sim.last_thermo
    assert script.sim.natoms == 64000
    assert v["temp"] == pytest.approx(0.97028256, rel=1e-7)
    assert v["epair"] == pytest.approx(0.44484087, rel=1e-7)
    assert v["emol"] == pytest.approx(20.494523, rel=1e-7)
    assert v["press"] == pytest.approx(4.6721833, rel=1e-6)
