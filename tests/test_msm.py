"""MSM golden parity: kspace_style msm + pair lj/cut/coul/msm vs the
reference binary (src/KSPACE/msm.cpp).  The level hierarchy's direct
sums are evaluated as circulant FFT products — same arithmetic content,
Fourier summation order."""

import os

import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "msm")


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


def test_msm_grid_selection():
    script = LammpsScript(data_dir=GOLDEN)
    deck = [ln for ln in
            open(os.path.join(GOLDEN, "in.test")).read().splitlines()
            if not ln.startswith(("run", "velocity"))]
    script.run_string("\n".join(deck) + "\nrun 0\n")
    ks = script.sim.kspace
    assert ks.ngrids[0] == (8, 8, 8)      # reference log: grid = 8 8 8
    assert ks.order == 10
    assert ks.levels == 3


def test_msm_golden():
    script = LammpsScript(data_dir=GOLDEN)
    script.run_string(open(os.path.join(GOLDEN, "in.test")).read())
    sim = script.sim
    rows = _thermo_rows(os.path.join(GOLDEN, "log.ref"))
    r0, ref = rows[0], rows[-1]
    v = sim.last_thermo
    assert sim.step == int(ref[0]) == 10
    # columns: step temp epair emol etotal elong press
    # the reference interpolates the short coulomb from lookup tables
    # (its own log warns "For better accuracy use pair_modify table 0");
    # we evaluate analytically, so 10-step trajectories drift ~1e-5
    assert v["elong"] == pytest.approx(ref[5], rel=2e-6)
    assert v["temp"] == pytest.approx(ref[1], rel=1e-4)
    assert v["epair"] == pytest.approx(ref[2], rel=2e-4)
    assert v["etotal"] == pytest.approx(ref[4], rel=3e-5)
    assert v["press"] == pytest.approx(ref[6], rel=2e-3)
