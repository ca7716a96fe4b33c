"""Parallel tempering (temper command) — multi-replica Universe analog."""

import numpy as np

from tpumd.script.parser import LammpsScript

DECK = """
units           lj
atom_style      atomic
variable        t world 0.7 0.8 0.9 1.0
lattice         fcc 0.8442
region          box block 0 4 0 4 0 4
create_box      1 box
create_atoms    1 box
mass            1 1.0
velocity        all create $t 87287 loop geom
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
neigh_modify    delay 0 every 5 check no
fix             1 all nvt temp $t $t 0.5
temper          120 30 $t 1 3847 58382
"""


def test_temper_runs_and_swaps():
    s = LammpsScript()
    s.run_string(DECK)
    sims = s.replicas
    assert len(sims) == 4
    # every replica advanced the full horizon and is finite
    for sim in sims:
        assert sim.step == 120
        assert np.isfinite(sim.last_thermo["etotal"])
    # with closely spaced temperatures most attempts should be accepted
    acc = sum(a for a, _ in s.temper_accepts)
    att = sum(n for _, n in s.temper_accepts)
    assert att >= 4
    assert acc >= 1
    # replicas ended at distinct thermostat targets: mean KE ordering is
    # statistical, but each sim's thermostat target must differ
    targets = [sim.fixes[0].t_start for sim in sims]
    assert sorted(targets) == [0.7, 0.8, 0.9, 1.0]
