"""compute dipole + dipole/chunk golden vs the reference binary
(src/compute_dipole.cpp, compute_dipole_chunk.cpp): SPC-like water,
global dipole through 10 NVE steps + per-molecule dipoles at step 0."""
import os

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "golden", "dipole")
WATER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "golden", "water_nve")


def test_dipole_golden(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import shutil
    shutil.copy(os.path.join(WATER, "data.water"), tmp_path)
    with open(os.path.join(GOLD, "in.dip")) as fh:
        deck = fh.read()
    s = LammpsScript(data_dir=str(tmp_path))
    s.run_string(deck)
    v = s.sim.last_thermo
    # step-10 row of tests/golden/dipole/log.dip
    assert v["c_dip[1]"] == pytest.approx(2.3117235, rel=1e-6)
    assert v["c_dip[2]"] == pytest.approx(0.20828474, rel=1e-6)
    assert v["c_dip[3]"] == pytest.approx(3.5463385, rel=1e-6)
    assert v["c_dip"] == pytest.approx(4.2383918, rel=1e-6)

    # per-molecule dipoles (fix ave/time vector file at step 10)
    with open(os.path.join(GOLD, "out.chunk")) as fh:
        lines = [l for l in fh.read().splitlines()
                 if not l.startswith("#")]
    # frames of (header, n rows); compare the LAST (step 10)
    frames = []
    i = 0
    while i < len(lines):
        n = int(lines[i].split()[1])
        frames.append(np.array(
            [[float(t) for t in lines[i + 1 + j].split()[1:]]
             for j in range(n)]))
        i += 1 + n
    ref_rows = frames[-1]
    ours = np.asarray(s.sim.computes["dc"].evaluate(s.sim))
    np.testing.assert_allclose(ours, ref_rows, rtol=2e-5, atol=1e-7)
