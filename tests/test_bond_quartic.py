"""bond_style quartic golden parity (src/MOLECULE/bond_quartic.cpp):
breakable polymer bonds.  The fixture deck breaks TWO bonds mid-run
(steps ~9 and ~17, visible as ~3.7/atom E_bond drops), exercising the
carried per-incidence alive mask (state.extras["bq_alive"]) and the
built-in FixBondBreakMask pre-force update, plus the WCA core and the
pair->single subtraction tallied as pair energy."""

import os
import shutil
import tempfile

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "bond_quartic")


def _rows(path):
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


@pytest.fixture(scope="module")
def quartic_run():
    tmpdir = tempfile.mkdtemp(prefix="tpumd_bq_")
    shutil.copy(os.path.join(GOLDEN, "data.bq"), tmpdir)
    script = LammpsScript(data_dir=tmpdir)
    script.run_string(open(os.path.join(GOLDEN, "in.test")).read())
    return script, os.path.join(tmpdir, "dump.bq")


def test_bond_quartic_thermo(quartic_run):
    script, _ = quartic_run
    sim = script.sim
    ref = _rows(os.path.join(GOLDEN, "log.test"))
    # two breaks happened: E_bond dropped by ~2*3.5 over the run
    assert ref[0][2] - ref[-1][2] > 6.0
    last = ref[-1]
    v = sim.last_thermo
    # step temp ebond epair etotal press
    assert sim.step == int(last[0]) == 60
    assert v["temp"] == pytest.approx(last[1], rel=1e-6)
    assert v["ebond"] == pytest.approx(last[2], rel=1e-6)
    assert v["epair"] == pytest.approx(last[3], rel=1e-5)
    assert v["etotal"] == pytest.approx(last[4], rel=1e-6)
    assert v["press"] == pytest.approx(last[5], rel=1e-4, abs=1e-6)


def test_bond_quartic_forces_and_mask(quartic_run):
    script, dump_path = quartic_run
    import jax

    def parse(path):
        out, lines, i = {}, open(path).readlines(), 0
        while i < len(lines):
            step = int(lines[i + 1])
            n = int(lines[i + 3])
            i += 9
            rows = np.loadtxt(lines[i:i + n]).reshape(n, -1)
            out[step] = rows[np.argsort(rows[:, 0])]
            i += n
        return out

    ours = parse(dump_path)
    theirs = parse(os.path.join(GOLDEN, "dump.bq"))
    for step in sorted(set(ours) & set(theirs)):
        scale = max(1.0, np.abs(theirs[step][:, 1:]).max())
        np.testing.assert_allclose(ours[step][:, 1:], theirs[step][:, 1:],
                                   atol=1e-8 * scale)
    # exactly two bonds broke -> 4 incidence entries went dead
    alive = np.asarray(jax.device_get(
        script.sim.state.extras["bq_alive"]))
    inc_alive = int(alive.sum())
    style = next(b for b in script.sim.bonded if b.kind == "bond")
    total = int(np.asarray(
        jax.device_get(style.device_incidence()[3])).sum())
    assert total - inc_alive == 4
