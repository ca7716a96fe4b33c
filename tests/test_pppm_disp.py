"""pppm/disp golden parity: dual-grid PPPM (coulomb + geometric-mixing
long-range dispersion, src/KSPACE/pppm_disp.cpp) vs the reference binary
on the lj/long/coul/long water system.

Covers the full parameter model: qopt-based coulomb grid sizing + Newton
g_ewald (set_grid_global :2650, adjust_gewald :2818), dispersion
bisection/Newton g_ewald_6 and qopt_6 auto grid (set_init_g6 :3529,
set_n_pppm_6 :3594), and a forced 12^3 dispersion mesh exercising the
grid solve (kspace_modify mesh/disp).
"""

import os

import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pppm_disp")


def _last_row(path):
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
    return rows[-1]


def _run(deck):
    script = LammpsScript(data_dir=GOLDEN)
    script.run_string(open(os.path.join(GOLDEN, deck)).read())
    return script.sim


def test_pppm_disp_auto_golden():
    sim = _run("in.test")
    ks = sim.kspace
    # parameter model vs the reference log header
    assert ks.g_ewald == pytest.approx(0.3845265861948978, rel=1e-7)
    assert (ks.nx, ks.ny, ks.nz) == (15, 15, 15)
    assert ks.g_ewald_6 == pytest.approx(0.2259063588304604, rel=1e-10)
    assert tuple(ks.n6) == (2, 2, 2)
    # step-10 thermo: step temp evdwl ecoul elong etotal press
    ref = _last_row(os.path.join(GOLDEN, "log.ref"))
    v = sim.last_thermo
    assert sim.step == int(ref[0]) == 10
    assert v["temp"] == pytest.approx(ref[1], rel=1e-5)
    assert v["evdwl"] == pytest.approx(ref[2], rel=1e-4)
    assert v["ecoul"] == pytest.approx(ref[3], rel=1e-5)
    assert v["elong"] == pytest.approx(ref[4], rel=1e-6)
    assert v["etotal"] == pytest.approx(ref[5], rel=1e-4)
    assert v["press"] == pytest.approx(ref[6], rel=1e-4)


def test_pppm_disp_mesh_golden():
    sim = _run("in.mesh")
    ks = sim.kspace
    assert ks.g_ewald_6 == pytest.approx(0.3726782264787978, rel=1e-10)
    assert tuple(ks.n6) == (12, 12, 12)
    ref = _last_row(os.path.join(GOLDEN, "log.mesh"))
    v = sim.last_thermo
    assert v["temp"] == pytest.approx(ref[1], rel=1e-5)
    assert v["evdwl"] == pytest.approx(ref[2], rel=1e-4)
    assert v["elong"] == pytest.approx(ref[4], rel=1e-6)
    assert v["etotal"] == pytest.approx(ref[5], rel=1e-4)
    assert v["press"] == pytest.approx(ref[6], rel=1e-4)
