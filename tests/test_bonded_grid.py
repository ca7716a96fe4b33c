"""Gather-free bonded tuples on the cell grid (ops/cellgrid_tuples.py):
equivalence with the incidence path, slab-sharded invariance, and the
O(halo) HLO census for a molecular force evaluation (VERDICT r2 next #6;
ref src/comm_brick.cpp:538-639 ghost comm, src/ntopo.h tuple lists)."""
import os
import re

import jax
import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")

DATA = """4-atom bent chain

4 atoms
3 bonds
2 angles
1 dihedrals
1 impropers
1 atom types
1 bond types
1 angle types
1 dihedral types
1 improper types

0.0 2.8 xlo xhi
0.0 2.8 ylo yhi
0.0 2.8 zlo zhi

Masses

1 1.0

Atoms

1 1 1 0.5 0.5 0.5
2 1 1 1.5 0.5 0.5
3 1 1 2.2 1.2 0.5
4 1 1 2.3 1.6 1.4

Velocities

1 0.12 -0.05 0.02
2 -0.03 0.08 0.04
3 0.01 0.02 -0.07
4 0.05 -0.06 0.01

Bonds

1 1 1 2
2 1 2 3
3 1 3 4

Angles

1 1 1 2 3
2 1 2 3 4

Dihedrals

1 1 1 2 3 4

Impropers

1 1 1 2 3 4
"""


def _script(tmp_path, bonded_grid):
    p = tmp_path / "data.chain4"
    if not p.exists():
        p.write_text(DATA)
    deck = f"""
units           lj
atom_style      molecular
boundary        p p p
read_data       {p}
replicate       8 8 8
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
bond_style      harmonic
bond_coeff      1 60.0 1.05
angle_style     harmonic
angle_coeff     1 30.0 114.0
dihedral_style  opls
dihedral_coeff  1 1.2 -0.4 0.6 0.0
improper_style  harmonic
improper_coeff  1 8.0 15.0
neighbor        0.3 bin
neigh_modify    delay 0 every 5 check no
fix             1 all nve
"""
    s = LammpsScript()
    s.run_string(deck)
    s._finalize_atoms()
    sim = s.sim
    sim.verbose = False
    sim.neighbor_mode = "cellgrid"
    sim.bonded_grid = bonded_grid
    sim.setup()
    return sim


def test_grid_matches_incidence(tmp_path):
    """Same forces/energies from the tag-matched path and the row2slot
    incidence path, single device."""
    from tpumd.md.verlet import eval_energies
    sim_g = _script(tmp_path, True)
    sim_i = _script(tmp_path, False)
    assert sim_g._ctx.bonded_grid and not sim_i._ctx.bonded_grid

    fg, eg, vg, _ = eval_energies(sim_g._carry[0], sim_g._carry[1],
                                  sim_g._ctx, consts=sim_g._consts)
    fi, ei, vi, _ = eval_energies(sim_i._carry[0], sim_i._carry[1],
                                  sim_i._ctx, consts=sim_i._consts)
    for k in ei:
        np.testing.assert_allclose(np.asarray(eg[k]), np.asarray(ei[k]),
                                   rtol=1e-12, atol=1e-12, err_msg=k)
    np.testing.assert_allclose(np.asarray(fg), np.asarray(fi),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vg), np.asarray(vi),
                               rtol=1e-10, atol=1e-12)


def test_sharded_molecular_invariance(tmp_path):
    """5 steps on the 8-way z-slab mesh == 5 steps unsharded."""
    from tpumd.md.verlet import run_segment
    from tpumd.parallel.mesh import make_mesh, shard_carry
    sim = _script(tmp_path, True)
    ref = run_segment(sim._carry, sim._ctx, 5, consts=sim._consts)
    mesh = make_mesh(8)
    out = run_segment(shard_carry(sim._carry, mesh), sim._ctx, 5,
                      consts=sim._consts)
    np.testing.assert_allclose(np.asarray(out[0].x), np.asarray(ref[0].x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out[0].v), np.asarray(ref[0].v),
                               rtol=1e-12, atol=1e-12)
    assert len(out[0].x.sharding.device_set) == 8


def test_molecular_force_eval_is_halo_only(tmp_path):
    """HLO census: the full molecular force evaluation (pair + bonds +
    angles + dihedrals + impropers) moves O(halo) bytes per step —
    collective-permutes of boundary planes, zero all-gathers."""
    from tpumd.md.verlet import compute_forces
    from tpumd.parallel.mesh import make_mesh, shard_carry
    mesh = make_mesh(8)

    sim = _script(tmp_path, True)
    st, neigh = shard_carry(sim._carry, mesh)[:2]
    fn = jax.jit(lambda s, ne: compute_forces(
        s, ne, sim._ctx, False, False, consts=sim._consts)[0])
    txt = fn.lower(st, neigh).compile().as_text()
    assert len(re.findall(r"\ball-gather", txt)) == 0
    assert len(re.findall(r"\bcollective-permute", txt)) > 0


def test_sharded_water_pppm_cellgrid():
    """The full molecular+kspace stack (harmonic bonds, charmm angles,
    lj/charmm/coul/long pairs, PPPM) on the SHARDED cellgrid with the
    tag-matched bonded path: decomposition invariance at 1e-10 (VERDICT
    r2 weak #9: the rhodo-class stack's multi-chip path)."""
    from tpumd.md.verlet import run_segment
    from tpumd.parallel.mesh import make_mesh, shard_carry
    golden = os.path.join(os.path.dirname(__file__), "golden", "water_nve")
    s = LammpsScript()
    s.data_dir = golden
    with open(os.path.join(golden, "in.test")) as fh:
        deck = fh.read()
    deck = "\n".join(l for l in deck.splitlines()
                     if not l.startswith(("dump", "run")))
    deck = deck.replace("read_data       data.water",
                        "read_data       data.water\nreplicate 2 2 2")
    s.run_string(deck)
    sim = s.sim
    sim.verbose = False
    sim.neighbor_mode = "cellgrid"
    sim.bonded_grid = True
    sim._ctx = None
    sim.setup()
    assert sim._ctx.bonded_grid and sim._ctx.is_cellgrid
    ref = run_segment(sim._carry, sim._ctx, 3, consts=sim._consts)
    mesh = make_mesh(8)
    out = run_segment(shard_carry(sim._carry, mesh), sim._ctx, 3,
                      consts=sim._consts)
    np.testing.assert_allclose(np.asarray(out[0].x), np.asarray(ref[0].x),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out[0].v), np.asarray(ref[0].v),
                               rtol=1e-10, atol=1e-10)


def test_sharded_shake_water():
    """SHAKE on the sharded cellgrid: per-atom cluster tables +
    tag-matched member data, every member solving its own cluster
    (scatter-free).  (a) grid path == slotmap path on one device,
    (b) 3 sharded steps == unsharded at 1e-10 (the full rhodo-class fix
    stack's multi-chip story; ref src/RIGID/fix_shake.cpp)."""
    from tpumd.md.verlet import run_segment
    from tpumd.parallel.mesh import make_mesh, shard_carry
    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "water_shake")

    def build(bonded_grid):
        s = LammpsScript()
        s.data_dir = golden
        with open(os.path.join(golden, "in.test")) as fh:
            deck = fh.read()
        deck = "\n".join(l for l in deck.splitlines()
                         if not l.startswith(("dump", "run")))
        deck = deck.replace("read_data       data.water",
                            "read_data       data.water\nreplicate 2 2 2")
        s.run_string(deck)
        sim = s.sim
        sim.verbose = False
        sim.neighbor_mode = "cellgrid"
        sim.bonded_grid = bonded_grid
        sim._ctx = None
        sim.setup()
        return sim

    sim_g = build(True)
    sim_s = build(False)
    assert sim_g._ctx.bonded_grid
    assert "_shk_mtags" in sim_g._carry[0].extras
    ref_slot = run_segment(sim_s._carry, sim_s._ctx, 3,
                           consts=sim_s._consts)
    ref_grid = run_segment(sim_g._carry, sim_g._ctx, 3,
                           consts=sim_g._consts)
    np.testing.assert_allclose(np.asarray(ref_grid[0].x),
                               np.asarray(ref_slot[0].x),
                               rtol=1e-10, atol=1e-10)

    mesh = make_mesh(8)
    out = run_segment(shard_carry(sim_g._carry, mesh), sim_g._ctx, 3,
                      consts=sim_g._consts)
    np.testing.assert_allclose(np.asarray(out[0].x),
                               np.asarray(ref_grid[0].x),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out[0].v),
                               np.asarray(ref_grid[0].v),
                               rtol=1e-10, atol=1e-10)
