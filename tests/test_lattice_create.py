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
