"""CLASS2 (COMPASS) bonded family golden parity: bond/angle/dihedral/
improper class2 with ALL cross terms live (bb, ba, mbt, ebt, at, aat,
bb13, aa), vs the reference binary (src/CLASS2/*.cpp).

Forces come from -grad of the exact per-tuple energies
(tpumd/models/bonded_class2.py); on this deck the whole 10-step
trajectory including per-atom forces is digit-identical to the
reference, which also pins the read-time Domain::remap image fold
(atom 2 of the fixture sits outside the box on purpose).
"""

import os
import shutil
import tempfile

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "class2")


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


def _parse_dump(path):
    out = {}
    with open(path) as fh:
        lines = fh.readlines()
    i = 0
    while i < len(lines):
        step = int(lines[i + 1])
        n = int(lines[i + 3])
        i += 9
        rows = np.loadtxt(lines[i:i + n]).reshape(n, -1)
        out[step] = rows[np.argsort(rows[:, 0])]
        i += n
    return out


@pytest.fixture(scope="module")
def class2_run():
    tmpdir = tempfile.mkdtemp(prefix="tpumd_class2_")
    shutil.copy(os.path.join(GOLDEN, "data.class2"), tmpdir)
    script = LammpsScript(data_dir=tmpdir)
    script.run_string(open(os.path.join(GOLDEN, "in.test")).read())
    return script.sim, os.path.join(tmpdir, "dump.class2")


def test_class2_thermo(class2_run):
    sim, _ = class2_run
    ref = _rows(os.path.join(GOLDEN, "log.test"))
    v = sim.last_thermo
    last = ref[-1]
    # step temp ebond eangle edihed eimp etotal press
    assert sim.step == int(last[0]) == 10
    assert v["temp"] == pytest.approx(last[1], rel=1e-7)
    assert v["ebond"] == pytest.approx(last[2], rel=1e-7)
    assert v["eangle"] == pytest.approx(last[3], rel=1e-7)
    assert v["edihed"] == pytest.approx(last[4], rel=1e-7)
    assert v["eimp"] == pytest.approx(last[5], rel=1e-7)
    assert v["etotal"] == pytest.approx(last[6], rel=1e-7)
    assert v["press"] == pytest.approx(last[7], rel=1e-7)


def test_class2_forces(class2_run):
    _, dump_path = class2_run
    ours = _parse_dump(dump_path)
    theirs = _parse_dump(os.path.join(GOLDEN, "dump.class2"))
    common = sorted(set(ours) & set(theirs))
    assert common == [0, 10]
    for step in common:
        scale = max(1.0, np.abs(theirs[step][:, 1:]).max())
        np.testing.assert_allclose(
            ours[step][:, 1:], theirs[step][:, 1:], atol=1e-9 * scale,
            err_msg=f"class2 forces differ at step {step}")
