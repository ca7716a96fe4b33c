"""ewald/disp golden parity: Ewald-split coulomb + geometric long-range
dispersion (src/KSPACE/ewald_disp.cpp, pair_lj_long_coul_long.cpp)."""

import os

import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "ewald_disp")


def _thermo_rows(path):
    rows, active = [], False
    for ln in open(path).read().splitlines():
        if ln.strip().startswith("Step"):
            active = True
            continue
        if active:
            p = ln.split()
            if not p or not p[0].lstrip("-").isdigit():
                active = False
                continue
            rows.append([float(v) for v in p])
    return rows


def test_ewald_disp_golden():
    script = LammpsScript(data_dir=GOLDEN)
    script.run_string(open(os.path.join(GOLDEN, "in.test")).read())
    sim = script.sim
    assert sim.kspace.g_ewald == pytest.approx(0.36199972, rel=1e-6)
    rows = _thermo_rows(os.path.join(GOLDEN, "log.ref"))
    r0, ref = rows[0], rows[-1]
    v = sim.last_thermo
    assert sim.step == int(ref[0]) == 10
    # columns: step temp evdwl ecoul elong etotal press
    assert v["elong"] == pytest.approx(ref[4], rel=1e-6)
    assert v["evdwl"] == pytest.approx(ref[2], rel=1e-5)
    assert v["ecoul"] == pytest.approx(ref[3], rel=1e-5)
    assert v["temp"] == pytest.approx(ref[1], rel=1e-5)
    assert v["etotal"] == pytest.approx(ref[5], rel=1e-4)
    assert v["press"] == pytest.approx(ref[6], rel=5e-3)
