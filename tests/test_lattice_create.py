"""Lattice / create_atoms tests against values printed in the reference
bench logs (bench/log.6Oct16.lj.fixed.icc.1)."""

import numpy as np

from tpumd.core.create import create_atoms_lattice
from tpumd.core.lattice import Lattice
from tpumd.core.region import BlockRegion


def test_fcc_lj_spacing():
    lat = Lattice("fcc", 0.8442, units="lj")
    # log: "Lattice spacing in x,y,z = 1.6796 1.6796 1.6796"
    assert abs(lat.scale - (4.0 / 0.8442) ** (1.0 / 3.0)) == 0.0
    assert np.allclose(lat.spacing, lat.scale)


def test_fcc_metal_spacing():
    lat = Lattice("fcc", 3.615, units="metal")
    assert lat.scale == 3.615


def test_create_atoms_count_32000():
    lat = Lattice("fcc", 0.8442, units="lj")
    hi = 20 * lat.spacing
    x, t = create_atoms_lattice(lat, None, np.zeros(3), hi, 1)
    assert x.shape == (32000, 3)
    assert (t == 1).all()
    # box bounds from log: (0,0,0) to (33.5919,...)
    assert abs(hi[0] - 33.591924) < 1e-4
    assert (x >= 0).all() and (x < hi).all()
    # no duplicate positions
    assert len(np.unique(np.round(x, 9), axis=0)) == 32000


def test_create_atoms_region_subset():
    lat = Lattice("fcc", 0.8442, units="lj")
    hi = 20 * lat.spacing
    reg = BlockRegion(np.zeros(3), hi / 2)
    x, _ = create_atoms_lattice(lat, reg, np.zeros(3), hi, 1, fill_box=False)
    assert 0 < x.shape[0] < 32000
    assert (x <= hi / 2).all()


def test_lattice_custom_fcc_equivalent():
    """lattice custom reproducing fcc: bit-exact thermo vs the reference
    binary through 10 NVE steps (velocity loop geom hashes positions, so
    the a/basis arithmetic must match src/lattice.cpp:469-485 exactly)."""
    from tpumd.script.parser import LammpsScript
    deck = """
units           lj
atom_style      atomic
lattice         custom 0.8442 a1 1.0 0.0 0.0 a2 0.0 1.0 0.0 a3 0.0 0.0 1.0 basis 0.0 0.0 0.0 basis 0.5 0.5 0.0 basis 0.5 0.0 0.5 basis 0.0 0.5 0.5
region          box block 0 6 0 6 0 6
create_box      1 box
create_atoms    1 box
mass            1 1.0
velocity        all create 1.44 87287 loop geom
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
fix             1 all nve
run             10
"""
    s = LammpsScript()
    s.run_string(deck)
    v = s.sim.last_thermo
    import pytest as _pytest
    assert v["temp"] == _pytest.approx(1.1318629, rel=1e-6)
    assert v["epair"] == _pytest.approx(-6.3103405, rel=1e-7)
    assert v["etotal"] == _pytest.approx(-4.6145113, rel=1e-7)
