"""Golden parity: the granular in.chute benchmark vs the reference log.

Targets from /root/reference/bench/log.6Oct16.chute.fixed.icc.1:
    Step Atoms KinEng      c_1        Volume
    0    32000 784139.13   1601.1263  29833.783
    100  32000 784292.08   1571.0968  29834.707
Exercises: atom_style sphere (radius/rmass/omega), pair gran/hooke/history
with per-contact shear history (incl. remap across 2 rebuilds), fix
gravity chute / freeze / nve/sphere, boundary p p fs shrink-wrap,
neigh_modify exclude group, group subtract, compute erotate/sphere,
thermo_modify norm no.
"""

import pytest

from tpumd.script.parser import LammpsScript

BENCH = "/root/reference/bench"


def _run(nsteps):
    deck = open(f"{BENCH}/in.chute").read()
    deck = deck.replace("run             100", f"run             {nsteps}")
    script = LammpsScript(data_dir=BENCH)
    script.sim = None
    script.run_string(deck)
    return script.sim


def _thermo(sim, key):
    if key == "c_1":
        return float(sim.computes["1"].evaluate(sim))
    return sim.last_thermo[key]


@pytest.mark.slow
def test_chute_bench_parity():
    sim = _run(100)
    sim.verbose = False
    assert sim.step == 100
    assert _thermo(sim, "ke") == pytest.approx(784292.08, rel=1e-7)
    assert _thermo(sim, "c_1") == pytest.approx(1571.0968, rel=1e-6)
    assert _thermo(sim, "vol") == pytest.approx(29834.707, rel=1e-7)
    # 2 rebuilds, like the reference log
    import jax
    assert int(jax.device_get(sim._carry[1].nbuilds)) - 1 == 2


def test_chute_step0():
    sim = _run(0)
    v = sim.last_thermo
    assert v["ke"] == pytest.approx(784139.13, rel=1e-7)
    assert _thermo(sim, "c_1") == pytest.approx(1601.1263, rel=1e-7)
    assert v["vol"] == pytest.approx(29833.783, rel=1e-7)


@pytest.mark.slow
def test_chute_parity_cellgrid():
    """Same deck on the rolled-grid granular kernel with DENSE candidate
    shear history (ops/cellgrid_gran.py), incl. the compact tag-keyed
    history carry across 2 rebuilds.  The grid's frozen 27-cell candidate
    superset can catch a contact forming between rebuilds that the frozen
    reference list misses, so parity is slightly looser than the matrix
    engine's."""
    deck = open(f"{BENCH}/in.chute").read()
    pre, _ = deck.rsplit("run", 1)
    script = LammpsScript(data_dir=BENCH)
    script.sim = None
    script.run_string(pre)
    sim = script.sim
    sim.neighbor_mode = "cellgrid"
    sim.run(100)
    assert sim._ctx.is_cellgrid
    assert sim._carry[1].shear is not None
    assert _thermo(sim, "ke") == pytest.approx(784292.08, rel=1e-5)
    assert _thermo(sim, "c_1") == pytest.approx(1571.0968, rel=1e-4)
    assert _thermo(sim, "vol") == pytest.approx(29834.707, rel=1e-6)
