"""Named groups: gmask bits, fix group restriction."""

import numpy as np
import pytest

from tpumd.api import TpuMD

DECK = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 4 0 4 0 4
region          lower block 0 4 0 4 0 1.9
region          upper block 0 4 0 4 1.95 4
create_box      2 box
create_atoms    1 region lower
create_atoms    2 region upper
mass            * 1.0
velocity        all create 1.44 87287 loop geom
pair_style      lj/cut 2.5
pair_coeff      * * 1.0 1.0 2.5
neighbor        0.3 bin
neigh_modify    delay 0 every 5 check no
group           mobile type 2
group           frozen type 1
fix             1 mobile nve
fix             2 frozen setforce 0.0 0.0 0.0
velocity        frozen set 0.0 0.0 0.0
run             5
"""


def test_group_freeze(tmp_path):
    md = TpuMD(data_dir=str(tmp_path))
    md.commands_string(DECK)
    x0 = md.gather_atoms("x")
    types = md.gather_atoms("type")
    md.run(5)
    x1 = md.gather_atoms("x")
    moved = np.abs(x1 - x0).max(axis=1)
    assert (moved[types == 1] == 0).all()       # frozen atoms did not move
    assert (moved[types == 2] > 0).any()        # mobile atoms moved
