"""Cell-grid (gather-free) force path vs the exact matrix path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

DECK = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 6 0 6 0 6
create_box      1 box
create_atoms    1 box
mass            1 1.0
velocity        all create 1.44 87287 loop geom
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
neigh_modify    delay 0 every 20 check no
fix             1 all nve
"""


def _run(mode: str, nsteps: int):
    script = LammpsScript()
    script.run_string(DECK)
    sim = script.sim
    sim.verbose = False
    sim.neighbor_mode = mode
    sim.run(nsteps)
    return sim


def test_cellgrid_matches_matrix_step0():
    sm = _run("matrix", 0)
    sc = _run("cellgrid", 0)
    vm, vc = sm.last_thermo, sc.last_thermo
    assert vc["epair"] == pytest.approx(vm["epair"], rel=1e-12)
    assert vc["press"] == pytest.approx(vm["press"], rel=1e-12)
    assert vc["temp"] == pytest.approx(vm["temp"], rel=1e-12)
    # per-atom forces identical modulo the slot permutation (match by tag)
    fm = np.asarray(sm.state.f)
    fc = np.asarray(sc.state.f)
    tags_c = np.asarray(sc.state.tag)
    validc = tags_c > 0
    order = tags_c[validc] - 1
    np.testing.assert_allclose(fc[validc], fm[order], rtol=1e-10, atol=1e-12)


def test_cellgrid_trajectory_short():
    # identical rebuild cadence, 10 steps before first rebuild (every 20):
    # candidate supersets coincide, so trajectories agree to roundoff
    sm = _run("matrix", 10)
    sc = _run("cellgrid", 10)
    assert sc.last_thermo["etotal"] == pytest.approx(
        sm.last_thermo["etotal"], rel=1e-12)
    assert sc.last_thermo["temp"] == pytest.approx(
        sm.last_thermo["temp"], rel=1e-10)


def test_cellgrid_rebuild_and_conservation():
    sc = _run("cellgrid", 40)  # crosses two rebuilds
    v = sc.last_thermo
    assert np.isfinite(v["etotal"])
    # atoms preserved across permutations
    tags = np.sort(np.asarray(sc.state.tag))
    tags = tags[tags > 0]
    assert tags.tolist() == list(range(1, sc.natoms + 1))
