"""Golden parity: the in.chain benchmark deck (FENE + langevin) vs the
reference thermo table (bench/log.6Oct16.chain.fixed.icc.1).

Exercises: read_data (bond style), FENE bonds, special_bonds exclusions,
fix langevin with bit-exact RanMars draws in the reference's setup-sorted
atom order, pair_modify shift.
"""

import pytest

from tpumd.script.parser import LammpsScript

BENCH = "/root/reference/bench"


@pytest.mark.slow
def test_chain_bench_parity():
    script = LammpsScript(data_dir=BENCH)
    script.data_dir = BENCH
    with open(f"{BENCH}/in.chain") as fh:
        script.run_string(fh.read())
    sim = script.sim
    v = sim.last_thermo
    assert sim.step == 100
    # log step-100 row: 0.9729966 0.4361122 20.507698 22.40326 4.6548819
    assert v["temp"] == pytest.approx(0.9729966, rel=1e-6)
    assert v["epair"] == pytest.approx(0.4361122, rel=1e-5)
    assert v["emol"] == pytest.approx(20.507698, rel=1e-6)
    assert v["etotal"] == pytest.approx(22.40326, rel=1e-6)
    assert v["press"] == pytest.approx(4.6548819, rel=1e-5)


def test_chain_step0():
    script = LammpsScript(data_dir=BENCH)
    script.data_dir = BENCH
    with open(f"{BENCH}/in.chain") as fh:
        deck = fh.read().replace("run             100", "run             0")
    script.run_string(deck)
    v = script.sim.last_thermo
    assert v["temp"] == pytest.approx(0.97029772, rel=1e-7)
    assert v["epair"] == pytest.approx(0.44484087, rel=1e-7)
    assert v["emol"] == pytest.approx(20.494523, rel=1e-7)
    assert v["press"] == pytest.approx(4.6721833, rel=1e-7)


@pytest.mark.slow
def test_chain_bench_parity_cellgrid():
    """Same deck on the cell-grid engine with FENE bonds evaluated
    IN-KERNEL (tag-matched against rolled candidates) — must reproduce
    the reference thermo like the matrix path does."""
    script = LammpsScript(data_dir=BENCH)
    with open(f"{BENCH}/in.chain") as fh:
        deck = fh.read()
    pre, _ = deck.rsplit("run", 1)
    script.run_string(pre)
    sim = script.sim
    sim.neighbor_mode = "cellgrid"
    sim.run(100)
    assert sim._ctx.kernel_bond is not None, "FENE must ride the kernel"
    assert sim._ctx.kernel_bond_excl, "special pass must collapse"
    assert not sim._ctx.bonded
    v = sim.last_thermo
    assert v["temp"] == pytest.approx(0.9729966, rel=1e-6)
    assert v["epair"] == pytest.approx(0.4361122, rel=1e-5)
    assert v["emol"] == pytest.approx(20.507698, rel=1e-6)
    assert v["etotal"] == pytest.approx(22.40326, rel=1e-6)
    assert v["press"] == pytest.approx(4.6548819, rel=1e-5)
