"""r/k-space split (verlet/split analog): real-space forces on rk=0,
PPPM on rk=1, one psum merge — must match the fused evaluation."""

import jax
import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs 2 devices")


def test_rk_split_matches_fused():
    import os
    golden = os.path.join(os.path.dirname(__file__), "golden", "tip4p")
    deck = """
units           real
atom_style      full
bond_style      harmonic
angle_style     harmonic
pair_style      lj/cut/coul/long 6.0 7.0
kspace_style    pppm 1e-4
special_bonds   lj/coul 0.0 0.0 0.5
read_data       data.water
bond_coeff      1 450.0 0.9572
angle_coeff     1 55.0 104.52
pair_coeff      1 1 0.1521 3.1507
pair_coeff      2 2 0.0 1.0
neighbor        2.0 bin
fix             1 all nve
run             0
"""
    script = LammpsScript(data_dir=golden)
    script.run_string(deck)
    sim = script.sim
    from tpumd.parallel.rkspace import dryrun_rk_split
    f_split, f_ref = dryrun_rk_split(sim, 2)
    np.testing.assert_allclose(f_split, f_ref, rtol=0, atol=1e-11)
    assert np.abs(f_ref).max() > 0
