"""Golden parity: pair_style hybrid/overlay (lj/cut + morse, two types in
region halves) vs the reference binary — exact to printed digits."""

import os

import pytest

from tpumd.script.parser import LammpsScript

D = os.path.join(os.path.dirname(__file__), "golden", "hybrid")


def test_hybrid_overlay_parity():
    script = LammpsScript()
    with open(os.path.join(D, "in.hyb")) as fh:
        script.run_string(fh.read())
    v = script.sim.last_thermo
    assert v["temp"] == pytest.approx(1.0555844, rel=1e-6)
    assert v["epair"] == pytest.approx(-6.4562531, rel=1e-6)
    assert v["etotal"] == pytest.approx(-4.8790615, rel=1e-6)
    assert v["press"] == pytest.approx(-1.307234, rel=1e-5)
