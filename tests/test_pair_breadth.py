"""Golden thermo parity for the pair-style breadth wave: born,
lj/expand, coul/debye (fixtures from the reference binary)."""

import os

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("name", ["pair_born", "pair_ljexpand",
                                  "pair_couldebye"])
def test_pair_breadth_golden(name):
    d = os.path.join(GOLDEN, name)
    script = LammpsScript(data_dir=d)
    script.run_string(open(os.path.join(d, "in.test")).read())
    sim = script.sim
    ref = np.loadtxt(os.path.join(d, "thermo.csv"))[-1]
    v = sim.last_thermo
    assert v["temp"] == pytest.approx(ref[1], rel=1e-7)
    assert v["epair"] == pytest.approx(ref[2], rel=1e-7, abs=1e-9)
    assert v["etotal"] == pytest.approx(ref[4], rel=1e-7)
    assert v["press"] == pytest.approx(ref[5], rel=1e-6)
