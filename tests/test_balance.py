"""balance command: RCB equal-atom row blocks (src/balance.cpp, rcb.cpp
analog for the sharded row decomposition)."""

import numpy as np
import pytest

from tpumd.parallel.balance import imbalance, rcb_order
from tpumd.script.parser import LammpsScript

DECK = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 8 0 8 0 8
create_box      1 box
region          half block 0 8 0 8 0 4
create_atoms    1 region half
mass            1 1.0
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
fix             1 all nve
balance         1.1 rcb
run             0
"""


def test_rcb_equal_count_blocks():
    rng = np.random.default_rng(7)
    # strongly nonuniform cloud: clustered + sparse tail
    x = np.concatenate([rng.normal(0, 1, (7000, 3)),
                        rng.uniform(-8, 8, (1000, 3))])
    order = rcb_order(x, 8)
    n = len(x)
    blocks = [order[n * k // 8:n * (k + 1) // 8] for k in range(8)]
    sizes = np.array([len(b) for b in blocks], float)
    assert imbalance(sizes) <= 1.001
    # blocks are spatially compact: mean block bbox volume far below the
    # full cloud bbox volume
    vol_full = np.prod(x.max(0) - x.min(0))
    vols = [np.prod(x[b].max(0) - x[b].min(0)) for b in blocks]
    assert np.mean(vols) < 0.3 * vol_full


def test_balance_command_runs(tmp_path):
    script = LammpsScript(data_dir=str(tmp_path))
    script.run_string(DECK)
    sim = script.sim
    # after balance: equal row blocks are spatially compact subdomains
    import jax
    x = np.asarray(jax.device_get(sim.state.x))
    tag = np.asarray(jax.device_get(sim.state.tag))
    x = x[tag > 0]
    n = len(x)
    nparts = 8
    vol_full = np.prod(x.max(0) - x.min(0))
    vols = []
    for k in range(nparts):
        blk = x[n * k // nparts:n * (k + 1) // nparts]
        vols.append(np.prod(blk.max(0) - blk.min(0)))
    assert np.mean(vols) < 0.5 * vol_full
    assert sim.last_thermo["epair"] < 0.0  # system still evaluates


def test_fix_balance_dynamic():
    """fix balance N thresh rcb: periodic host-side rebalancing — after
    atoms drift, the row blocks are re-permuted mid-run when imbalance
    exceeds the threshold, and the run continues with correct physics
    (src/fix_balance.cpp analog)."""
    from tpumd.script.parser import LammpsScript
    s = LammpsScript()
    s.run_string("""
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.44 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
neighbor 0.3 bin
fix 1 all nve
fix 2 all balance 10 1.0 rcb
thermo 10
""")
    s._finalize_atoms()
    s.sim.neighbor_mode = "matrix"
    s.sim.invalidate_ctx()
    s.sim.run(20)
    import numpy as np
    assert np.isfinite(float(s.sim.last_thermo["etotal"]))
    assert s.sim.step == 20
