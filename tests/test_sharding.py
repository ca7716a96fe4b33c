"""Multi-chip decomposition tests on the 8-device virtual CPU mesh.

Validates that the full step compiles and executes with per-atom arrays
block-sharded over a mesh, and that the sharded trajectory matches the
single-device one (decomposition invariance, the analog of the
reference's newton on/off and 1-vs-N rank golden checks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpumd.md.verlet import run_segment
from tpumd.parallel.mesh import make_mesh, shard_carry
from tpumd.script.parser import LammpsScript

DECK = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 4 0 4 0 4
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


def _setup():
    script = LammpsScript()
    script.run_string(DECK)
    sim = script.sim
    sim.verbose = False
    script._finalize_atoms()
    sim.setup()
    return sim


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_step_matches_single():
    sim = _setup()
    ctx = sim._ctx
    carry0 = sim._carry

    ref = run_segment(carry0, ctx, 10)

    mesh = make_mesh(8)
    sharded = shard_carry(carry0, mesh)
    out = run_segment(sharded, ctx, 10)

    np.testing.assert_allclose(np.asarray(out[0].x), np.asarray(ref[0].x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out[0].v), np.asarray(ref[0].v),
                               rtol=1e-12, atol=1e-12)
    # outputs keep the sharding on per-atom arrays
    assert len(out[0].x.sharding.device_set) == 8
