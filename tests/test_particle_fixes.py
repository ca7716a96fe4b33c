"""fix deposit / fix evaporate: host-side atom insertion/deletion."""

import numpy as np

from tpumd.script.parser import LammpsScript


def test_deposit_and_evaporate():
    s = LammpsScript()
    s.run_string("""
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 4 0 4 0 8
region          atoms block 0 4 0 4 0 4
region          top block 0 4 0 4 6 8
create_box      1 box
create_atoms    1 region atoms
mass            1 1.0
velocity        all create 1.0 87287 loop geom
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
neigh_modify    delay 0 every 5 check no
fix             1 all nve
run             0
""")
    sim = s.sim
    n0 = sim.natoms
    s.execute("fix 2 all deposit 3 1 10 1234 region top near 1.0")
    s.execute("run 40")
    assert sim.natoms == n0 + 3
    assert np.isfinite(sim.last_thermo["etotal"])
    n_before = sim.natoms
    s.execute("unfix 2")
    s.execute("fix 3 all evaporate 10 2 top 999")
    s.execute("run 20")
    assert sim.natoms < n_before
    assert np.isfinite(sim.last_thermo["etotal"])
