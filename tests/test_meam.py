"""MEAM golden parity vs the reference binary (src/MEAM/, 4.2k LoC):
the SiC example deck (examples/meam/in.meam), 20 NVE steps — energy from
the reference-matched phi table + screening + angular densities, forces
as reverse-mode gradients of that energy, exact to all printed digits."""
import os
import shutil

import pytest

from tpumd.script.parser import LammpsScript

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "golden", "meam")


def test_meam_sic_golden(tmp_path):
    for f in ("data.meam", "library.meam", "SiC.meam"):
        shutil.copy(os.path.join(GOLD, f), tmp_path)
    with open(os.path.join(GOLD, "in.meam")) as fh:
        deck = fh.read().replace("run\t\t100", "thermo 10\nrun 20")
    s = LammpsScript(data_dir=str(tmp_path))
    s.run_string(deck)
    v = s.sim.last_thermo
    # step-20 row of tests/golden/meam/log.test
    assert v["temp"] == pytest.approx(1932.4467, rel=1e-6)
    assert v["epair"] == pytest.approx(-668.2581, rel=1e-6)
    assert v["etotal"] == pytest.approx(-636.53498, rel=1e-6)
    assert v["press"] == pytest.approx(-120223.52, rel=1e-5)


def test_meam_ni_golden(tmp_path):
    """Single-element Ni fcc (examples/meam/Ni.meam overlay)."""
    for f in ("library.meam", "Ni.meam"):
        shutil.copy(os.path.join(GOLD, f), tmp_path)
    with open(os.path.join(GOLD, "in.ni")) as fh:
        deck = fh.read()
    s = LammpsScript(data_dir=str(tmp_path))
    s.run_string(deck)
    v = s.sim.last_thermo
    # step-20 row of tests/golden/meam/log.ni
    assert v["temp"] == pytest.approx(630.48749, rel=1e-6)
    assert v["epair"] == pytest.approx(-1113.8207, rel=1e-6)
    assert v["etotal"] == pytest.approx(-1093.039, rel=1e-6)
    assert v["press"] == pytest.approx(28492.191, rel=1e-5)
