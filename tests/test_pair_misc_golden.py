"""Golden parity for misc pair styles vs the reference binary: 10-step
NVE on the 256-atom fcc melt deck, values exact to printed digits."""

import pytest

from tpumd.script.parser import LammpsScript

DECK = """
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.44 87287 loop geom
pair_style {ps}
pair_coeff 1 1 {coeff}
neighbor 0.3 bin
neigh_modify delay 0 every 5 check no
fix 1 all nve
thermo 10
run 10
"""

CASES = {
    "morse": ("morse 2.5", "0.5 1.3 1.1 2.5",
              (1.4191326, -7.996779, -5.8763954, -2.1437836)),
    "buck": ("buck 2.5", "1000.0 0.3 1.5",
             (0.57290088, 138.01102, 138.86701, 168.85224)),
    "yukawa": ("yukawa 1.2 2.5", "2.0",
               (1.4247414, 4.2059177, 6.3346817, 4.5441673)),
    "soft": ("soft 2.5", "1.0",
             (1.4362572, 9.8179689, 11.963939, 10.53444)),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_pair_misc(name):
    ps, coeff, want = CASES[name]
    script = LammpsScript()
    script.run_string(DECK.format(ps=ps, coeff=coeff))
    v = script.sim.last_thermo
    assert v["temp"] == pytest.approx(want[0], rel=1e-6)
    assert v["epair"] == pytest.approx(want[1], rel=1e-6)
    assert v["etotal"] == pytest.approx(want[2], rel=1e-6)
    assert v["press"] == pytest.approx(want[3], rel=1e-5)
