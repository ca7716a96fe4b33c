"""TIP4P golden parity: lj/cut/tip4p/long + pppm/tip4p vs the reference
binary (src/KSPACE/pair_lj_cut_tip4p_long.cpp, pppm_tip4p.cpp).

The M charge site is an affine map of atom positions, so the coulomb
part runs on transformed coordinates with the exact chain-rule force
partition (fO=(1-a)fM, fH=a/2 fM, Feenstra 1999)."""

import os

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tip4p")


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


def test_tip4p_golden():
    script = LammpsScript(data_dir=GOLDEN)
    script.run_string(open(os.path.join(GOLDEN, "in.test")).read())
    sim = script.sim
    rows = _thermo_rows(os.path.join(GOLDEN, "log.ref"))
    ref = rows[-1]
    v = sim.last_thermo
    assert sim.step == int(ref[0]) == 10
    assert v["temp"] == pytest.approx(ref[1], rel=1e-6)
    assert v["epair"] == pytest.approx(ref[2], rel=1e-5)
    assert v["emol"] == pytest.approx(ref[3], rel=1e-5)
    assert v["etotal"] == pytest.approx(ref[4], rel=1e-5)
    # pressure: site-based strain virial vs the reference's distributed
    # tally + PPPM virial noise floor
    assert v["press"] == pytest.approx(ref[5], rel=5e-3)


def test_tip4p_alpha_and_sites():
    """alpha = qdist/(cos(theta0/2) b0) (init_style :479) and the M site
    on the bisector."""
    script = LammpsScript(data_dir=GOLDEN)
    deck = [ln for ln in
            open(os.path.join(GOLDEN, "in.test")).read().splitlines()
            if not ln.startswith(("run", "velocity"))]
    script.run_string("\n".join(deck) + "\nrun 0\n")
    sim = script.sim
    a_ref = 0.15 / (np.cos(np.radians(104.52) / 2) * 0.9572)
    assert sim.pair.alpha == pytest.approx(a_ref, rel=1e-12)
    import jax
    x = sim.state.x
    xq = np.asarray(sim.pair.charge_sites(x, sim.state.box))
    x = np.asarray(jax.device_get(x))
    typ = np.asarray(jax.device_get(sim.state.type))
    # H rows unchanged, O rows displaced by <= qdist
    np.testing.assert_array_equal(xq[typ == 2], x[typ == 2])
    d = np.linalg.norm(xq[typ == 1] - x[typ == 1], axis=1)
    assert (d > 0.0).all() and (d < 0.151).all()
    assert d.mean() == pytest.approx(0.15, abs=0.01)
