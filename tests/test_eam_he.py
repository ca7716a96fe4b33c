"""eam/he (src/MANYBODY/pair_eam_he.cpp): eam/fs over [rhomin, rhomax]
tables with linear embedding extrapolation — Pd crystal + He interstitial
golden vs the reference binary (PdHHe.eam.he)."""
import os

import pytest

from tpumd.script.parser import LammpsScript

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "golden", "eam_he")


def test_eam_he_golden():
    with open(os.path.join(GOLD, "in.he")) as fh:
        deck = fh.read()
    s = LammpsScript()
    s.run_string(deck)
    v = s.sim.last_thermo
    # step-20 row of tests/golden/eam_he/log.he (501 atoms incl. He)
    assert v["temp"] == pytest.approx(270.26707, rel=1e-6)
    assert v["epair"] == pytest.approx(-1928.3224, rel=1e-6)
    assert v["etotal"] == pytest.approx(-1910.855, rel=1e-6)
    assert v["press"] == pytest.approx(18365.158, rel=1e-5)
