"""Slab-halo domain decomposition via the sharded cell grid.

The cell-grid engine stores atoms in z-major grid-slot order, so block-
sharding the flat slot arrays over the "dd" mesh axis IS a z-slab brick
decomposition; XLA's SPMD partitioner lowers the engine's z-rolls to
collective-permutes of one boundary plane — the TPU-native equivalent of
the reference's 6-swap ghost exchange (src/comm_brick.cpp:538-639) with
per-chip comm O(halo), not O(N).  Migration happens at rebuilds via the
global bin permutation (a sharded sort, the exchange() analog).

These tests prove (1) decomposition invariance for LJ and EAM on the
cell-grid engine and a PPPM water system on the matrix engine, and
(2) the O(halo) property: the compiled sharded force evaluation contains
NO all-gather, only collective-permute.
"""

import re

import jax
import numpy as np
import pytest

from tpumd.md.verlet import compute_forces, run_segment
from tpumd.parallel.mesh import make_mesh, shard_carry
from tpumd.script.parser import LammpsScript

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")

LJ_DECK = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 14 0 14 0 14
create_box      1 box
create_atoms    1 box
mass            1 1.0
velocity        all create 1.44 87287 loop geom
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
neigh_modify    delay 0 every 5 check no
fix             1 all nve
"""

EAM_DECK = """
units           metal
atom_style      atomic
lattice         fcc 3.615
region          box block 0 8 0 8 0 8
create_box      1 box
create_atoms    1 box
pair_style      eam
pair_coeff      1 1 /root/reference/bench/Cu_u3.eam
velocity        all create 1600.0 376847 loop geom
neighbor        1.0 bin
neigh_modify    every 1 delay 5 check yes
fix             1 all nve
timestep        0.005
"""


def _setup(deck, mode):
    script = LammpsScript()
    script.run_string(deck)
    script._finalize_atoms()
    sim = script.sim
    sim.verbose = False
    sim.neighbor_mode = mode
    sim.setup()
    return sim


@pytest.mark.parametrize("deck,tol", [(LJ_DECK, 1e-12), (EAM_DECK, 1e-9)])
def test_sharded_cellgrid_invariance(deck, tol):
    sim = _setup(deck, "cellgrid")
    ref = run_segment(sim._carry, sim._ctx, 5)
    mesh = make_mesh(8)
    out = run_segment(shard_carry(sim._carry, mesh), sim._ctx, 5)
    np.testing.assert_allclose(np.asarray(out[0].x), np.asarray(ref[0].x),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(out[0].v), np.asarray(ref[0].v),
                               rtol=tol, atol=tol)
    assert len(out[0].x.sharding.device_set) == 8


def test_force_eval_is_halo_only():
    """The sharded per-step force evaluation must move O(halo) bytes:
    collective-permutes of boundary planes, no all-gather of positions."""
    sim = _setup(LJ_DECK, "cellgrid")
    mesh = make_mesh(8)
    st, neigh, _, _ = shard_carry(sim._carry, mesh)
    fn = jax.jit(lambda s, ne: compute_forces(s, ne, sim._ctx,
                                              False, False)[0])
    txt = fn.lower(st, neigh).compile().as_text()
    assert len(re.findall(r"\ball-gather", txt)) == 0
    assert len(re.findall(r"\bcollective-permute", txt)) > 0


def test_sharded_pppm_water_invariance():
    """Sharded molecular system with PPPM (matrix engine): the kspace FFT,
    charge scatter and field gather must be decomposition-invariant."""
    import os
    golden = os.path.join(os.path.dirname(__file__), "golden", "water_nve")
    script = LammpsScript()
    script.data_dir = golden
    with open(os.path.join(golden, "in.test")) as fh:
        deck = fh.read()
    deck = "\n".join(l for l in deck.splitlines()
                     if not l.startswith(("dump", "run")))
    # 8 divides 375*8 atoms; replicate also exercises sharded topology
    deck = deck.replace("read_data       data.water",
                        "read_data       data.water\nreplicate 2 2 2")
    script.run_string(deck)
    sim = script.sim
    sim.verbose = False
    sim.setup()
    ref = run_segment(sim._carry, sim._ctx, 3, consts=sim._consts)
    mesh = make_mesh(8)
    out = run_segment(shard_carry(sim._carry, mesh), sim._ctx, 3,
                      consts=sim._consts)
    np.testing.assert_allclose(np.asarray(out[0].x), np.asarray(ref[0].x),
                               rtol=1e-10, atol=1e-10)
