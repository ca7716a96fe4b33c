"""Golden parity: the in.eam benchmark deck (Cu EAM) vs the reference
thermo table (bench/log.6Oct16.eam.fixed.icc.1) — exact to all printed
digits in double precision."""

import pytest

from tpumd.script.parser import LammpsScript

BENCH = "/root/reference/bench"


def _run(nsteps=None):
    script = LammpsScript(data_dir=BENCH)
    script.data_dir = BENCH
    with open(f"{BENCH}/in.eam") as fh:
        deck = fh.read()
    if nsteps is not None:
        deck = deck.replace("run             100", f"run             {nsteps}")
    script.run_string(deck)
    return script.sim


def test_eam_step0():
    sim = _run(0)
    v = sim.last_thermo
    assert v["temp"] == pytest.approx(1600.0, rel=1e-10)
    assert v["epair"] == pytest.approx(-113280.0, rel=1e-7)
    assert v["etotal"] == pytest.approx(-106662.09, rel=1e-7)
    assert v["press"] == pytest.approx(18703.573, rel=1e-6)


@pytest.mark.slow
def test_eam_bench_parity():
    sim = _run()
    v = sim.last_thermo
    assert v["temp"] == pytest.approx(801.832, rel=1e-5)
    assert v["epair"] == pytest.approx(-109957.3, rel=1e-6)
    assert v["etotal"] == pytest.approx(-106640.77, rel=1e-6)
    assert v["press"] == pytest.approx(51322.821, rel=1e-5)
